"""Flagship TPC-H-style queries over the driver tables.

These exercise scan → filter → project → join → aggregate → sort
end-to-end through Catalyst, one row from almost every SURVEY.md §2B
family. Parity model: the reference runs the same shapes through
DuckDB v1.5.5 (SURVEY.md §0 — the engine layer IS DuckDB; ours is
Catalyst).

Determinism: floating aggregates go through exact DECIMAL(30,6)
intermediates (associative, order-independent) and are cast to DOUBLE
at the end — see catalog module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, query


def dec(c) -> F.Column:
    """Exact decimal intermediate for order-independent float aggregation."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(30,6)")


def dsum(c) -> F.Column:
    """SUM with exact decimal intermediate, surfaced as DOUBLE."""
    return F.sum(dec(c)).cast("double")


def qsum(c, scale: int = 6) -> F.Column:
    """Exact order-independent SUM as quantized LONG arithmetic.

    ``SUM(CAST(x AS DECIMAL(30,6)))`` is exact but Spark backs any
    decimal with precision > 18 by per-row BigDecimal boxing — ~4× the
    cost of a long sum on a full-table aggregate. Quantizing first
    (``floor(x·10^s + 0.5)`` = round-half-up for the non-negative
    measures used here) makes the accumulator a codegen long while
    computing the same rational sum; both engines then perform the
    identical int→double→÷10^s float ops, so cross-engine parity is
    bit-exact. Bound: the scaled sum must fit int64 — at scale 6 that
    is ~9.2e18 µunits ≈ $9.2e12 of revenue per group, ≥ sf1000 for
    TPC-H measures; past that, partition the aggregation or fall back
    to dsum (the reference corpus is far below it).
    """
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.sum(F.floor(col * F.lit(10**scale) + F.lit(0.5)).cast("bigint")).cast("double")
        / F.lit(float(10**scale))
    )


def qsum_sql(expr: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`qsum` (identical op sequence)."""
    return (
        f"CAST(SUM(CAST(floor(({expr}) * {10**scale} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {float(10**scale)}"
    )


Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {qsum_sql("l_quantity")} AS sum_qty,
  {qsum_sql("l_extendedprice")} AS sum_base_price,
  {qsum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  {qsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {qsum_sql("l_quantity")} / COUNT(*) AS avg_qty,
  {qsum_sql("l_extendedprice")} / COUNT(*) AS avg_price,
  {qsum_sql("l_discount")} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", oracle=Q1_ORACLE, tags=("agg", "flagship"))
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: grouped aggregation with 8 aggregates + sort.

    Parity: reference engine layer runs this via DuckDB hash agg;
    Spark plan is partial+final HashAggregate with map-side combine,
    shuffle only on the 2 low-cardinality group keys — scales to any
    row count (group-key cardinality bounded). The 8 measures use
    quantized-long sums (see qsum): same exact rational result as
    DECIMAL(30,6) intermediates at ~4× the throughput — on a
    full-table aggregate the accumulator representation IS the query
    cost, and at 100 TB this is the difference between long codegen
    and 10^11 BigDecimal allocations.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-06 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qsum("l_quantity").alias("sum_qty"),
            qsum("l_extendedprice").alias("sum_base_price"),
            qsum(disc_price).alias("sum_disc_price"),
            qsum(charge).alias("sum_charge"),
            (qsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (qsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (qsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", oracle=Q3_ORACLE, tags=("join", "agg", "topk", "flagship"))
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + grouped agg + top-k.

    Scale design: customer filter first (selective), broadcast the
    filtered customer side into orders, then shuffle-join lineitem on
    orderkey; LIMIT under ORDER BY becomes TakeOrderedAndProject (no
    full sort materialization). The merge hint on orders pins that
    shuffle join: the date filter keeps ~1/3 of orders — still
    fact-sized, so the local broadcast threshold's auto-BHJ is the
    wrong 100-TB shape and measurably slower once the hash table
    outgrows cache (r11 A/B at the 8x sf0.1 replica: 0.80→0.66 s;
    tie at sf0.1). Contrast q10, whose 3-month orders filter IS
    dimension-sized — there the auto-broadcast is correct and merge
    measured 30 % slower.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    ).hint("merge")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(qsum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("tpch_q5_local_supplier_volume", oracle=Q5_ORACLE, tags=("join", "agg", "flagship"))
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join. Dimension tables (region/nation/supplier)
    broadcast; fact-fact joins shuffle on their keys."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(qsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(floor(l_extendedprice * l_discount * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", oracle=Q6_ORACLE, tags=("agg", "filter", "flagship"))
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective scan + ungrouped agg. All four predicates
    push to the parquet scan (PushedFilters); single-stage partial agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(qsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("tpch_q10_returned_items", oracle=Q10_ORACLE, tags=("join", "agg", "topk"))
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item report; join + group + top-20."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(qsum(revenue).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q14_ORACLE = """
SELECT
  CAST(100.0 AS DOUBLE)
    * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
               THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
    AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
"""


@query("tpch_q14_promo_revenue", oracle=Q14_ORACLE, tags=("agg", "join", "flagship"))
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (adapted: testdata p_type is a plain category, no
    'PROMO%' prefix): promo revenue share in one month.

    Scale: part is the broadcast side; lineitem's month predicate
    pushes to the scan; single scalar output — no shuffle beyond the
    final ungrouped agg's partial merge."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
    return j.agg(
        (
            (F.lit(100.0) * F.sum(dec(promo)).cast("double"))
            / F.sum(dec(disc)).cast("double")
        ).alias("promo_revenue")
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@query("tpch_q18_large_volume_customer", oracle=Q18_ORACLE, tags=("agg", "join", "subquery", "flagship"))
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind orders whose total quantity
    exceeds 300 (IN-subquery with HAVING).

    Scale: the HAVING subquery aggregates lineitem once (shuffle on
    l_orderkey), its survivors semi-join back (small set → broadcast
    under AQE), and the surviving customer⋈orders rows are explicitly
    BROADCAST into the final lineitem join — survivors are the orders
    whose total quantity exceeds 300 (canonically ~0.01 % of orders),
    so the bounded side is pinned as the build and lineitem never
    shuffles for this join. Without the pin the local threshold
    broadcast the pruned lineitem slice instead (corpus-sized build;
    r11 audit — interleaved A/B at the 8x replica: 2.57→1.11 s, tie
    at sf0.1; the merge alternative measured 1.24 s)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    c = load(spark, sf_dir, "customer")
    j = F.broadcast(c.join(o, c.c_custkey == o.o_custkey)).join(
        li, F.col("o_orderkey") == li.l_orderkey
    )
    return j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice").agg(
        dsum("l_quantity").alias("total_qty")
    )


Q19_ORACLE = """
SELECT CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
"""


@query("tpch_q19_discounted_revenue", oracle=Q19_ORACLE, tags=("agg", "join", "flagship"))
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (adapted: no p_container in testdata): disjunction of
    brand/size/quantity conjunctions over an equi-join.

    Scale: despite the OR-of-ANDs, the p_partkey = l_partkey equi
    condition keeps this a hash join (broadcast part); the residual
    disjunction evaluates post-probe — the plan lint asserts no
    nested-loop regression."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )



Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
  )
GROUP BY o_orderpriority
"""


@query("tpch_q4_order_priority", oracle=Q4_ORACLE, tags=("agg", "subquery", "flagship"))
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: testdata has no l_commitdate/l_receiptdate,
    so "late" = shipped >60 days after order date): order-priority
    count over an EXISTS semi-join.

    Scale: semi-join probes lineitem once (no row multiplication),
    quarter predicate pushes to the orders scan. The merge hint on
    lineitem is load-bearing: a LEFT SEMI hash join can only BUILD on
    the right (lineitem) side, and because Spark estimates the
    PROJECTED size, the pruned 2-column lineitem slice stays under the
    broadcast threshold long after the table itself is huge — the r11
    audit caught it broadcast at the 8x replica (4.8M-row build;
    interleaved A/B 2.28→0.60 s with the merge pin, 0.61→0.44 s even
    at sf0.1)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").hint("merge")
    j = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return j.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


Q7_ORACLE = """
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
"""


@query("tpch_q7_volume_shipping", oracle=Q7_ORACLE, tags=("agg", "join", "flagship"))
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year between two nations.

    Scale: dimensions broadcast; the nation-pair disjunction evaluates
    post-probe. orders is a FACT table, so its lineitem join is pinned
    to a co-partitioned merge join — the local broadcast threshold
    would auto-BHJ it, which is the wrong 100-TB shape and slower here
    once the hash table outgrows cache (r11 A/B at the 8x sf0.1
    replica: 1.10→0.83 s; tie at sf0.1)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    o = load(spark, sf_dir, "orders").hint("merge")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


Q8_ORACLE = """
WITH all_nations AS (
  SELECT
    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT
  o_year,
  CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
    / CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
"""


@query("tpch_q8_market_share", oracle=Q8_ORACLE, tags=("agg", "join", "flagship"))
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted: p_type category, fixed nation names):
    a nation's market share of PROMO-part volume sold into ASIA.

    Scale: 7-way join where only lineitem and orders are large;
    dims broadcast; the share division happens after one grouped agg.
    orders (fact-sized, unfiltered) is pinned to a co-partitioned
    merge join with lineitem — the r11 audit caught the local
    threshold auto-broadcasting it, the q21-class shape that cannot
    run at 100 TB."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").hint("merge")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("ck_n"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("sk_n"), F.col("n_name").alias("nation"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("ck_n"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk_n"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (F.sum(dec(target)).cast("double") / F.sum(dec(vol)).cast("double")).alias(
                "mkt_share"
            )
        )
    )


Q9_ORACLE = """
SELECT
  n_name AS nation,
  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity
           AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
"""


@query("tpch_q9_product_profit", oracle=Q9_ORACLE, tags=("agg", "join", "flagship"))
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp table, so supply cost is
    modeled as 0.5 × p_retailprice): profit by nation and year for a
    part-name pattern. orders (fact-sized, unfiltered) joins lineitem
    via a pinned co-partitioned merge join rather than the local
    threshold's auto-broadcast (r11 A/B at the 8x sf0.1 replica:
    1.13→0.79 s; tie at sf0.1)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").hint("merge")
    n = load(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(dsum(profit).alias("sum_profit"))


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("tpch_q13_customer_distribution", oracle=Q13_ORACLE, tags=("agg", "join", "flagship"))
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: filter on priority instead of the missing
    o_comment): distribution of order counts per customer, keeping
    zero-order customers via the outer join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("tpch_q15_top_supplier", oracle=Q15_ORACLE, tags=("agg", "subquery", "flagship"))
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue (CTE reused
    for both the per-supplier aggregate and its max).

    Scale: revenue aggregates once; the scalar max broadcasts back —
    no second scan of lineitem (the CTE result is reused)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


@query("tpch_q17_small_quantity", oracle=Q17_ORACLE, tags=("agg", "subquery", "flagship"))
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted: brand filter only, no container): revenue
    of orders below 20%% of a part's average quantity.

    Scale: the correlated AVG decorrelates into a WINDOW avg over the
    brand-filtered join output (r12 — the q21 family). The previous
    groupBy-joined-back form aggregated the ENTIRE lineitem table to
    compute averages for every part when only the brand's ~4 % of
    parts can ever be probed; the window computes the per-part avg
    from exactly the surviving lines (semantically identical: the
    brand filter culls whole parts, never lines within a part), in
    one pass, one small exchange. A/B: 0.22 → 0.17 s at ×1, wash at
    the ×16 replica (0.48/0.54 s, overlapping spreads) — the win is
    structural: at 100 TB the old shape pays a full-corpus aggregate
    for a 4 %-of-parts query."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    w = Window.partitionBy("l_partkey")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("qty_cut", F.lit(0.2) * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return j.agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))


Q22_ORACLE = """
WITH eligible AS (
  SELECT c_custkey, c_nationkey % 5 AS cntrycode, c_acctbal
  FROM customer
  WHERE c_acctbal > (
    SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
)
SELECT
  cntrycode,
  COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
FROM eligible
GROUP BY cntrycode
"""


@query("tpch_q22_global_sales_opportunity", oracle=Q22_ORACLE, tags=("agg", "subquery", "flagship"))
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: country code from nationkey, "never
    ordered" relaxed to "no large orders" since every customer has
    orders in testdata): wealthy inactive customers per country."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    eligible = (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select((F.col("c_nationkey") % 5).alias("cntrycode"), "c_acctbal")
    )
    return eligible.groupBy("cntrycode").agg(
        F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal")
    )


Q12A_ORACLE = """
SELECT
  l_returnflag AS ship_class,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
       AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
       AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
GROUP BY l_returnflag
"""


@query("tpch_q12_late_shipment_priority", oracle=Q12A_ORACLE, tags=("tpch", "join", "agg"))
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted to the testdata schema (reference product =
    DuckDB core, so Q12's shape is in scope; the driver tables lack
    l_shipmode/l_receiptdate, so 'late shipment' is shipdate > 60 days
    after order date and the mode dimension is l_returnflag). Same
    plan shape as canonical Q12: fact-fact equi join + conditional
    two-way counts. Both sides are fact tables, so the join is PINNED
    to a co-partitioned merge join on the order key — without the hint
    the local broadcast threshold quietly auto-BHJs orders, the exact
    shape this docstring always said must not happen at scale (caught
    and measured in r11: 1.05→0.75 s at the 8x sf0.1 replica, tie at
    sf0.1)."""
    o = load(spark, sf_dir, "orders").hint("merge")
    li = load(spark, sf_dir, "lineitem")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(late)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(hi.cast("int")).cast("bigint").alias("high_line_count"),
            F.sum((~hi).cast("int")).cast("bigint").alias("low_line_count"),
        )
    )


Q21A_ORACLE = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
              THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
), ag AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS nsup,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nlate
  FROM lo GROUP BY 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lo
JOIN ag USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE lo.late = 1 AND ag.nsup > 1 AND ag.nlate = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("tpch_q21_waiting_supplier", oracle=Q21A_ORACLE, tags=("tpch", "join", "subquery"))
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no l_commitdate/l_receiptdate in testdata:
    'late' = shipped >90 days after order date). Keeps Q21's defining
    shape — EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier) — but decorrelated by hand into one
    order-level aggregate (supplier count, late-supplier count)
    computed as WINDOW functions over the per-(order, supplier) rows:
    the two correlated subqueries become window columns on the SAME
    pass instead of an aggregate-and-join-back, which is also the
    right plan at 100 TB (everything after the fact-fact join rides
    one l_orderkey clustering; window groups are bounded by suppliers
    per order, so no skew exposure beyond the join itself).
    """
    li = load(spark, sf_dir, "lineitem")
    # The merge hint is load-bearing twice over. orders is a FACT
    # table (it scales with lineitem, ~1:4), so letting the local
    # broadcast threshold put it on the build side of a BroadcastHash-
    # Join is the wrong 100-TB plan — and it is also slower HERE: the
    # r11 scale-amortization breakdown showed the 1.2M-entry broadcast
    # probe dominating q21 at 8x sf0.1 (+0.86 s of 1.95 s; random
    # access into a hash table that long outgrew cache). The merge
    # hint makes the join a co-partitioned shuffle join on orderkey
    # whose exchange ALSO satisfies both downstream groupBys and the
    # per_sup⋈ag self-join (subset rule: HashPartitioning(orderkey)
    # clusters (orderkey, suppkey)), so the per-side exchange replaces
    # — not adds to — the explicit repartition the broadcast variant
    # needed. Measured interleaved A/B at sf0.1/x8-replica: 0.78→0.67 s
    # and 1.84→1.34 s medians; the x1→x8 head-to-head marginal ratio
    # vs DuckDB falls from ~6.2x to ~2.9x (CHANGES_r11.md). Sort-merge
    # over shuffled-hash: measured equal (1.34 vs 1.36 s at x8) and
    # SMJ spills gracefully when a 1000-executor partition misjudges.
    o = load(spark, sf_dir, "orders").hint("merge")
    s = load(spark, sf_dir, "supplier")
    lo = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
            .cast("int")
            .alias("late"),
        )
    )
    # One groupBy to (order, supplier) instead of two COUNT(DISTINCT)s:
    # a multi-distinct aggregate plans as an Expand (row duplication
    # per distinct column) — collapsing to (order, supplier) first
    # computes both counts from plain rows, no expansion, same shuffle
    # key. Carrying the per-supplier late-LINE count through that
    # aggregate also removes the second consumer of ``lo``: joining the
    # raw late lines back would re-execute the lineitem⋈orders join.
    per_sup = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").alias("n_late_lines"),
        F.max("late").alias("sup_late"),
    )
    # The order-level counts are WINDOW functions over per_sup, not a
    # second groupBy joined back (the r11 shape). The r12 interleaved
    # stage breakdown at the x16 replica attributed ~1.1 s of q21's
    # 2.5 s to that self-join branch: the l_orderkey exchange is
    # reused, but its SORT + the per_sup aggregate re-EXECUTE for the
    # ag side, then the join adds a third sort. The window computes
    # nsup/nlate in one pass over the already-clustered rows — zero
    # additional exchanges (AQE plan: the window rides the join's
    # hash(l_orderkey) clustering), groups bounded by suppliers/order.
    # Interleaved A/B, exact-parity checked: 2.12 -> 1.39 s at x16,
    # 0.51 -> 0.38 s at x1 (SCALE.md r12 section).
    w = Window.partitionBy("l_orderkey")
    cand = per_sup.withColumn("nsup", F.count("*").over(w)).withColumn(
        "nlate", F.sum("sup_late").over(w)
    )
    return (
        cand.filter(
            (F.col("sup_late") == 1) & (F.col("nsup") > 1) & (F.col("nlate") == 1)
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --- derived partsupp: q2/q11/q16/q20 ------------------------------------
# The testdata has no partsupp table; the four queries that need it run
# over a DERIVED one — distinct (part, supplier) pairs from lineitem
# with ps_supplycost = min unit price (deterministic double: same
# per-row quotient and same min on both engines) and ps_availqty =
# total shipped quantity (exact BIGINT). Both engines derive it with
# the same text, so the oracle checks the full query including the
# derivation.

_DUCK_PARTSUPP = """
SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       min(l_extendedprice / l_quantity) AS ps_supplycost,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
FROM lineitem
GROUP BY 1, 2
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"),
    )


Q2A_ORACLE = f"""
WITH ps AS ({_DUCK_PARTSUPP}),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
costs AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, eu.s_name, eu.s_acctbal, eu.n_name
  FROM ps JOIN eu ON ps.ps_suppkey = eu.s_suppkey
),
mins AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM costs GROUP BY 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
FROM costs
JOIN mins ON costs.ps_partkey = mins.ps_partkey AND costs.ps_supplycost = mins.min_cost
JOIN part ON p_partkey = costs.ps_partkey
WHERE p_size = 15
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("tpch_q2_min_cost_supplier", oracle=Q2A_ORACLE, tags=("tpch", "join", "subquery"))
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 over the derived partsupp (see module comment): for
    size-15 parts, the EUROPE supplier(s) at the per-part minimum
    supply cost. The correlated min decorrelates into a WINDOW min
    over the cost rows (r12 — the q21 family: the previous
    aggregate-joined-back form consumed ``costs`` twice, re-executing
    the partsupp derivation's sort/agg for the mins branch; the window
    computes the per-part min in ONE pass over one ps_partkey
    clustering — A/B 0.87 → 0.77 s at the ×16 replica, 0.63 → 0.57 s
    at ×1, exact parity). Dims (supplier×nation×region) broadcast; the
    only big shuffles are the partsupp derivation and the one
    per-part clustering."""
    ps = _partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = ps.join(eu, ps["ps_suppkey"] == eu["s_suppkey"]).select(
        "ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name"
    )
    w = Window.partitionBy("ps_partkey")
    return (
        costs.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q11A_ORACLE = f"""
WITH ps AS ({_DUCK_PARTSUPP}),
v AS (
  SELECT ps_partkey,
         CAST(SUM(CAST(floor(ps_supplycost * 100) AS BIGINT) * ps_availqty) AS BIGINT) AS val_c
  FROM ps GROUP BY 1
),
t AS (SELECT CAST(SUM(val_c) AS BIGINT) AS total_c FROM v)
SELECT ps_partkey, CAST(val_c AS DOUBLE) / 100 AS part_value
FROM v, t
WHERE val_c > total_c * 0.0005
"""


@query("tpch_q11_important_stock", oracle=Q11A_ORACLE, tags=("tpch", "agg", "subquery"))
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 over the derived partsupp: parts whose inventory value
    exceeds 0.05% of the total. Supply cost is quantized to integer
    cents with floor() (deterministic on identical doubles) BEFORE the
    value product, so every sum is exact BIGINT — a direct
    CAST(cost*qty AS DECIMAL(30,6)) diverges in the last ulp because
    the two engines round a full-precision double to 6dp differently
    (shortest-repr vs exact-binary). The global total is a 1-row
    broadcast cross join."""
    ps = _partsupp(spark, sf_dir)
    cost_c = F.floor(F.col("ps_supplycost") * 100).cast("bigint")
    v = ps.groupBy("ps_partkey").agg(
        F.sum(cost_c * F.col("ps_availqty")).alias("val_c")
    )
    t = v.agg(F.sum("val_c").cast("bigint").alias("total_c"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("val_c") > F.col("total_c") * 0.0005)
        .select("ps_partkey", (F.col("val_c").cast("double") / 100).alias("part_value"))
    )


Q16A_ORACLE = f"""
WITH ps AS ({_DUCK_PARTSUPP})
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#13'
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
GROUP BY 1, 2, 3
"""


@query("tpch_q16_supplier_part_count", oracle=Q16A_ORACLE, tags=("tpch", "agg", "subquery"))
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 over the derived partsupp: distinct supplier count per
    part attribute group, excluding one brand and a NOT-IN supplier
    list (the testdata has no complaint strings, so the excluded set is
    a deterministic key predicate). NOT IN compiles to a broadcast
    anti join — no shuffle of the fact side."""
    ps = _partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#13")
    excl = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 == 0).select(
        "s_suppkey"
    )
    return (
        ps.join(excl, ps["ps_suppkey"] == excl["s_suppkey"], "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


Q20A_ORACLE = f"""
WITH ps AS ({_DUCK_PARTSUPP}),
shipped96 AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
excess AS (
  SELECT ps_suppkey
  FROM ps
  JOIN shipped96 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
    AND ps_availqty > 2 * qty96
)
SELECT DISTINCT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


@query("tpch_q20_excess_stock_supplier", oracle=Q20A_ORACLE, tags=("tpch", "join", "subquery"))
def tpch_q20_excess_stock_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 over the derived partsupp: suppliers of '%bolt%'
    parts whose all-time availqty exceeds 2× their 1996 shipments —
    the nested IN-chain (part list → excess partsupp → supplier)
    becomes two semi joins, all integer arithmetic."""
    ps = _partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    shipped96 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty96"))
    )
    bolt_parts = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    excess = (
        ps.join(bolt_parts, ps["ps_partkey"] == F.col("p_partkey"), "left_semi")
        .join(
            shipped96,
            (F.col("ps_partkey") == shipped96["l_partkey"])
            & (F.col("ps_suppkey") == shipped96["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty96"))
        .select("ps_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(excess, s["s_suppkey"] == excess["ps_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
    )
