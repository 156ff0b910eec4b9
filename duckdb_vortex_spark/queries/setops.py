"""Set operations, sort/limit/top-k, and query-structure entries
(SURVEY.md §2B "Set operations", "Sort / limit / top-k",
"Query structure").

The UNION trap pinned by the reference (/root/reference/test/sql/
nulls.test:17): SQL ``UNION`` deduplicates; Spark's ``DataFrame.union``
is UNION ALL — the catalog encodes ``union().distinct()`` for SQL-UNION
semantics.

LIMIT/OFFSET entries always order by a unique key first — an unordered
LIMIT is nondeterministic in any parallel engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query, register_views, sql_query

UNION_DISTINCT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
"""


@query("setop_union_distinct", oracle=UNION_DISTINCT_ORACLE, tags=("setop",))
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION (deduplicating) — Spark union() + distinct()."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


UNION_ALL_ORACLE = """
SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 9500
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier WHERE s_acctbal > 9500
"""


@query("setop_union_all", oracle=UNION_ALL_ORACLE, tags=("setop",))
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — Spark's native union()."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500).select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9500).select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.union(s)


INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
"""


@query("setop_intersect", oracle=INTERSECT_ORACLE, tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s)


EXCEPT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
"""


@query("setop_except", oracle=EXCEPT_ORACLE, tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


INTERSECT_ALL_ORACLE = """
SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey % 100 = 0
INTERSECT ALL
SELECT l_suppkey AS k FROM lineitem WHERE l_partkey % 100 = 0
"""


@query("setop_intersect_all", oracle=INTERSECT_ALL_ORACLE, tags=("setop",))
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection, multiplicity = min of sides)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 100 == 0).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_partkey") % 100 == 0).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


EXCEPT_ALL_ORACLE = """
SELECT l_suppkey AS k FROM lineitem WHERE l_orderkey % 100 = 0
EXCEPT ALL
SELECT l_suppkey AS k FROM lineitem WHERE l_partkey % 100 = 0
"""


@query("setop_except_all", oracle=EXCEPT_ALL_ORACLE, tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") % 100 == 0).select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_partkey") % 100 == 0).select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b)


LIMIT_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
"""


@query("sort_limit_offset", oracle=LIMIT_OFFSET_ORACLE, tags=("sort",))
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT + OFFSET (deterministic: unique tiebreaker)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(20)
    )


NULLS_ORDER_ORACLE = """
SELECT seq, nullable_val
FROM (
  SELECT seq, CASE WHEN seq % 4 = 0 THEN NULL ELSE seq END AS nullable_val
  FROM generate_series(1, 50) AS t(seq)
) t
ORDER BY nullable_val DESC NULLS LAST, seq
LIMIT 15
"""


@query("sort_nulls_ordering", oracle=NULLS_ORDER_ORACLE, tags=("sort", "nulls"))
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST under LIMIT — DuckDB defaults NULLS LAST on
    ASC, Spark NULLS FIRST; always explicit in the catalog (SURVEY §7)."""
    seq = F.col("seq")
    base = (
        spark.range(1, 51)
        .select(F.col("id").alias("seq"))
        .select(seq, F.when(seq % 4 == 0, F.lit(None).cast("bigint")).otherwise(seq).alias("nullable_val"))
    )
    return (
        base.orderBy(F.col("nullable_val").desc_nulls_last(), seq)
        .limit(15)
    )


TOPK_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
"""


@query("sort_topk", oracle=TOPK_ORACLE, tags=("sort", "topk"))
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K: LIMIT under ORDER BY. Spark plans TakeOrderedAndProject —
    per-partition heaps + driver merge, no full sort at any scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    ).select("l_orderkey", "l_linenumber", "l_extendedprice").limit(25)


# --- query structure ----------------------------------------------------

# CTE: identical syntax both engines.
sql_query(
    "structure_cte",
    """
WITH big_orders AS (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders
  WHERE o_totalprice > 150000
),
order_lines AS (
  SELECT l_orderkey, COUNT(*) AS n_lines
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT b.o_orderkey, b.o_totalprice, ol.n_lines
FROM big_orders b
JOIN order_lines ol ON b.o_orderkey = ol.l_orderkey
""",
    tags=("structure", "cte"),
)

# Scalar subquery: identical syntax; deterministic via decimal-avg.
sql_query(
    "structure_scalar_subquery",
    """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
  FROM orders
)
""",
    tags=("structure", "subquery"),
)

# IN subquery.
sql_query(
    "structure_in_subquery",
    """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
""",
    tags=("structure", "subquery"),
)

# Correlated EXISTS.
sql_query(
    "structure_correlated_exists",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
    tags=("structure", "subquery"),
)


VALUES_ORACLE = """
SELECT t.id, t.label
FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(id, label)
"""


@query("structure_values_inline", oracle=VALUES_ORACLE, tags=("structure",))
def structure_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES row constructor (Spark SQL inline table)."""
    return spark.sql(
        "SELECT id, label FROM VALUES (1, 'one'), (2, 'two'), (3, 'three') AS t(id, label)"
    )


UNION_BY_NAME_ORACLE = """
SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind FROM customer
UNION ALL BY NAME
SELECT 'supplier' AS kind, s_name AS entity_name, s_suppkey AS entity_key FROM supplier
"""


@query("setop_union_by_name", oracle=UNION_BY_NAME_ORACLE, tags=("setop",))
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent union (DuckDB ``UNION ALL BY NAME`` ≡ Spark
    ``unionByName``): columns are matched by name, not ordinal — the
    safe way to append corpus shards whose writers emitted different
    column orders."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("entity_name"),
        F.col("s_suppkey").alias("entity_key"),
    )
    return c.unionByName(s)


PARAM_ORACLE = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
FROM orders
WHERE o_totalprice > 300000.0
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderstatus
"""


@query("structure_parameterized_query", oracle=PARAM_ORACLE, tags=("structure",))
def structure_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prepared-statement parity (SURVEY §2B query structure): DuckDB
    prepared statements map to Spark's parameterized SQL — named
    ``:param`` markers bound server-side with typed values, not string
    interpolation (same injection-safety property as PREPARE/EXECUTE).
    The oracle inlines the literals."""
    import datetime

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice > :minprice AND o_orderdate >= :mindate
        GROUP BY o_orderstatus
        """,
        args={"minprice": 300000.0, "mindate": datetime.datetime(1996, 1, 1)},
    )


# --- NOT IN with NULLs (three-valued logic) -------------------------------

sql_query(
    "structure_not_in_null_semantics",
    """
WITH probe AS (
  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
  UNION ALL
  SELECT CAST(NULL AS BIGINT)
)
SELECT
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey IN (SELECT k FROM probe)) AS BIGINT) AS n_in,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM probe)) AS BIGINT)
    AS n_not_in_with_null,
  CAST((SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL))
        AS BIGINT) AS n_not_in_null_filtered
""",
    tags=("structure", "expression"),
)
# ^ The classic three-valued-logic trap, pinned as an entry: a probe
# list containing ONE NULL makes every `NOT IN` row UNKNOWN, so
# n_not_in_with_null MUST be 0 in any conforming engine (Spark plans
# this as a null-aware anti join), while the null-filtered variant
# returns the complement. IN is unaffected for matching rows. The
# common-dialect SQL runs verbatim on both engines — the entry exists
# because getting this wrong silently drops or invents rows in any
# exclusion filter built on NOT IN (the dedup/contamination removal
# shapes), and an engine port MUST preserve it.
