"""Graph traversal as bounded fixed-point iteration.

Complements connected components (operators/dedup.py) with DISTANCE
labeling: multi-hop BFS from a seed set over the part↔supplier
bipartite graph derived from lineitem — "which suppliers/parts are
within k hops of the seed parts" is the supply-chain blast-radius
query. Pure integer arithmetic end-to-end, so the iterative Spark
loop and DuckDB's recursive CTE agree exactly.

Scale: each hop is two equi joins (frontier⋈edges by side), shuffled
on the node key; the frontier is localCheckpoint-ed per iteration
(plans/recursive.py's lineage discipline), and hop count bounds the
loop — state is O(reached nodes), never O(paths)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query
from .recursive import recursive_cte


def bfs_hops(
    edges: DataFrame,  # (p, s) bipartite edge list
    seeds: DataFrame,  # (id) seed nodes on the 'p' side
    max_hops: int = 3,
) -> DataFrame:
    """Min hop distance (≤ max_hops) from the seed set to every
    reached node. Returns (kind, id, min_dist) with kind ∈ {'p','s'}."""
    seed = seeds.select(
        F.lit("p").alias("kind"), F.col("id"), F.lit(0).cast("bigint").alias("dist")
    )

    def step(frontier: DataFrame) -> DataFrame:
        f = frontier.filter(F.col("dist") < max_hops)
        from_p = (
            f.filter(F.col("kind") == "p")
            .join(edges, f["id"] == edges["p"])
            .select(F.lit("s").alias("kind"), edges["s"].alias("id"), (f["dist"] + 1).alias("dist"))
        )
        from_s = (
            f.filter(F.col("kind") == "s")
            .join(edges, f["id"] == edges["s"])
            .select(F.lit("p").alias("kind"), edges["p"].alias("id"), (f["dist"] + 1).alias("dist"))
        )
        return from_p.union(from_s)

    reach = recursive_cte(seed, step, distinct=True, max_iterations=max_hops + 1)
    return reach.groupBy("kind", "id").agg(F.min("dist").alias("min_dist"))


BFS_ORACLE = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), reach(kind, id, dist) AS (
  SELECT 'p', p_partkey, CAST(0 AS BIGINT) FROM part WHERE p_size = 1
  UNION
  SELECT nxt.kind, nxt.id, nxt.dist FROM (
    SELECT 's' AS kind, e.s AS id, r.dist + 1 AS dist
    FROM reach r JOIN edges e ON r.kind = 'p' AND e.p = r.id
    WHERE r.dist < 3
    UNION
    SELECT 'p' AS kind, e.p AS id, r.dist + 1 AS dist
    FROM reach r JOIN edges e ON r.kind = 's' AND e.s = r.id
    WHERE r.dist < 3
  ) nxt
)
SELECT kind, id, MIN(dist) AS min_dist
FROM reach
GROUP BY kind, id
"""


@query("graph_bfs_hops", oracle=BFS_ORACLE, tags=("graph", "structure"))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS distance labels from size-1 parts over the
    part↔supplier bipartite graph (module docstring): iterative
    frontier loop on Spark, recursive CTE on DuckDB, exact integer
    agreement."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    seeds = part.filter(F.col("p_size") == 1).select(F.col("p_partkey").alias("id"))
    return bfs_hops(edges, seeds, max_hops=3)
