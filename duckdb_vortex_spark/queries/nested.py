"""Nested types, lateral joins, pivot/unpivot, and recursive queries
(SURVEY.md §2B: "map & struct fns", "positional/lateral join",
"Query structure" recursive CTE; pivot is DuckDB-core PIVOT).

All entries extract nested values back to scalar columns before
returning, so the driver's column-sorted value hash compares engine
results without depending on either engine's nested-type rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query, register_views, sql_query
from ..plans.recursive import recursive_cte

# --- struct & map functions ---------------------------------------------

STRUCT_MAP_ORACLE = """
SELECT
  o_orderkey,
  (struct_pack(status := o_orderstatus, total := o_totalprice)).status AS status_field,
  (struct_pack(status := o_orderstatus, total := o_totalprice)).total  AS total_field,
  map(['status','priority'], [o_orderstatus, o_orderpriority])['priority'][1] AS prio_val,
  map(['status','priority'], [o_orderstatus, o_orderpriority])['missing'][1] AS missing_val
FROM orders
WHERE o_orderkey % 50 = 0
"""


@query("struct_map_functions", oracle=STRUCT_MAP_ORACLE, tags=("nested", "struct", "map"))
def struct_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access, map construction +
    element_at (present and missing keys)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    st = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("total")
    )
    mp = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        st.getField("status").alias("status_field"),
        st.getField("total").alias("total_field"),
        F.element_at(mp, "priority").alias("prio_val"),
        F.element_at(mp, "missing").alias("missing_val"),
    )


# --- lateral / positional join ------------------------------------------

sql_query(
    "join_lateral_explode",
    """
SELECT p_partkey, word
FROM part
LATERAL VIEW explode(split(p_name, ' ')) t AS word
""",
    oracle="""
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
FROM part
""",
    tags=("join", "lateral", "nested"),
)

# Correlated LATERAL subquery (Spark 3.4+/DuckDB both support the ANSI
# form): per order, its 2 cheapest line items.
sql_query(
    "join_lateral_subquery",
    """
SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
FROM orders o,
LATERAL (
  SELECT l_linenumber, l_extendedprice
  FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice, l_linenumber
  LIMIT 2
) t
WHERE o.o_orderkey % 100 = 0
""",
    tags=("join", "lateral", "structure"),
)

# --- pivot / unpivot -----------------------------------------------------

PIVOT_ORACLE = """
SELECT
  o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_pivot", oracle=PIVOT_ORACLE, tags=("agg", "pivot"))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority × status (explicit value list —
    at scale an implicit list would force an extra distinct pass)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


UNPIVOT_ORACLE = """
SELECT o_orderkey, metric, value FROM (
  SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS value FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
) t
WHERE o_orderkey % 100 = 0
"""


@query("agg_unpivot", oracle=UNPIVOT_ORACLE, tags=("agg", "pivot"))
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide → long on two numeric order columns."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "value")


# --- recursive CTE -------------------------------------------------------

RECURSIVE_ORACLE = """
WITH RECURSIVE
edges AS (
  SELECT a.n_nationkey AS src, b.n_nationkey AS dst
  FROM nation a JOIN nation b
    ON b.n_regionkey = a.n_regionkey
   AND b.n_nationkey = (
     SELECT min(c.n_nationkey) FROM nation c
     WHERE c.n_regionkey = a.n_regionkey AND c.n_nationkey > a.n_nationkey
   )
),
chain AS (
  SELECT n_regionkey AS region, CAST(min(n_nationkey) AS BIGINT) AS node,
         CAST(0 AS BIGINT) AS depth
  FROM nation GROUP BY n_regionkey
  UNION ALL
  SELECT c.region, CAST(e.dst AS BIGINT), c.depth + 1
  FROM chain c JOIN edges e ON e.src = c.node
)
SELECT region, node, depth FROM chain
"""


@query("structure_recursive_cte", oracle=RECURSIVE_ORACLE, tags=("structure", "recursive"))
def structure_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE as an iterative DataFrame loop: walk each
    region's nation chain (ordered successor edges) from its first
    nation, emitting (region, node, depth) per step — the frontier
    loop in plans/recursive.py against DuckDB's native recursion."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    w_next = (
        n.alias("a")
        .join(
            n.alias("b"),
            (F.col("b.n_regionkey") == F.col("a.n_regionkey"))
            & (F.col("b.n_nationkey") > F.col("a.n_nationkey")),
        )
        .groupBy(F.col("a.n_nationkey").alias("src"))
        .agg(F.min("b.n_nationkey").alias("dst"))
    )
    edges = w_next.select("src", "dst")
    seed = (
        n.groupBy(F.col("n_regionkey").alias("region"))
        .agg(F.min("n_nationkey").cast("bigint").alias("node"))
        .withColumn("depth", F.lit(0).cast("bigint"))
    )

    def step(frontier: DataFrame) -> DataFrame:
        return (
            frontier.join(edges, frontier.node == edges.src)
            .select(
                "region",
                F.col("dst").cast("bigint").alias("node"),
                (F.col("depth") + 1).alias("depth"),
            )
        )

    return recursive_cte(seed, step, max_iterations=50)


_ = register_views  # re-exported for sql_query builders


LIST_SETOP_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS a,
         ['the', 'a', 'scan', 'join', 'merge'] AS b
  FROM documents
  WHERE doc_id % 5 = 0
)
SELECT
  doc_id,
  COALESCE(array_to_string(list_sort(list_filter(a, x -> list_contains(b, x))), ','), '')
    AS inter_csv,
  COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '')
    AS union_csv,
  COALESCE(array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '')
    AS except_csv
FROM t
"""


@query("list_set_operations", oracle=LIST_SETOP_ORACLE, tags=("array",))
def list_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (array_intersect/union/except ≡ DuckDB list
    filters over membership), order-normalized with array_sort and
    serialized to CSV for cross-engine value comparison (engines repr
    arrays differently; DuckDB array_to_string is NULL on empty lists
    where Spark array_join is empty-string - COALESCEd in the oracle)."""
    from ..operators.text import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    a = F.array_distinct(tokens("text"))
    b = F.array(*[F.lit(w) for w in ("the", "a", "scan", "join", "merge")])
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("inter_csv"),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("union_csv"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("except_csv"),
    )
