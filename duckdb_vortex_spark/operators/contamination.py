"""Cross-corpus contamination detection (SURVEY.md §2C north-star).

The train/test-overlap question every large-scale training pipeline
has to answer: which corpus partitions (here: ``documents.source``)
share verbatim n-gram content? Implemented as shingle inverted-index
self-join — the same join shape as MinHash-LSH candidate generation
(dedup.py), but aggregated to the corpus-pair level instead of the
document level.

Scale design (100 TB): the exploded (source, shingle) index is built
map-side and deduplicated with one hash shuffle keyed by shingle;
hot "stop shingles" (present in more than ``max_sources`` partitions)
are dropped *before* the self-join — they carry no contamination
signal and are exactly the keys that would skew the join (a shingle
in k sources contributes k² candidate rows). The surviving join is
bounded by rare keys, and the final aggregate is one pair-keyed
hash agg over at most |sources|² rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, query
from .dedup import _DUCK_TOKS, _duck_shingles, shingles_from_tokens
from .text import tokens


def cross_source_shared_shingles(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    max_sources: int = 10,
) -> DataFrame:
    """Per pair of groups: count of distinct n-gram shingles present in
    both — the corpus-level contamination matrix."""
    # One shuffle, no self-join: group by shingle collecting its source
    # SET (collect_set dedups, so no pre-distinct pass), drop stop
    # shingles, then expand each shingle's ordered source pairs
    # map-side. Each shingle row contributes every pair exactly once,
    # so a plain count IS the distinct-shingle count — the previous
    # formulation (inverted-index self-join + countDistinct) computed
    # the same matrix with 5 shuffles and a pair-explosion join.
    # Tokenize ONCE per row behind an EXCHANGE barrier: Catalyst inlines
    # expression trees into per-index lambdas (no CSE), so building
    # shingles straight off tokens(text) re-runs split+filter per
    # shingle — 5× slower (see shingles() docstring). A round-robin
    # repartition materializes the tokenized projection into shuffle
    # files (compute-once) WITHOUT pinning the full tokenized corpus in
    # executor memory the way persist() does — at 100 TB the persist is
    # a standing memory tax, the exchange is streamed local disk.
    spark = df.sparkSession
    tk = df.select(
        F.col(group_col).alias("src"), tokens(text_col).alias("toks")
    ).repartition(spark.sparkContext.defaultParallelism)
    sh = tk.select(
        "src", F.explode(shingles_from_tokens(F.col("toks"), n)).alias("sh")
    )
    sets = (
        sh.groupBy("sh")
        .agg(F.collect_set("src").alias("srcs"))
        .filter((F.size("srcs") >= 2) & (F.size("srcs") <= max_sources))
    )
    s = F.array_sort(F.col("srcs"))
    pairs = F.flatten(
        F.transform(
            s,
            lambda x, i: F.transform(
                F.slice(s, i + 2, F.size(s)),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )


CONTAMINATION_ORACLE = f"""
WITH t AS (
  SELECT source, {_duck_shingles(_DUCK_TOKS)} AS sh FROM documents
), e AS (
  SELECT DISTINCT source AS src, unnest(sh) AS s FROM t
), f AS (
  SELECT s FROM e GROUP BY s HAVING COUNT(DISTINCT src) <= 10
), g AS (
  SELECT e.src, e.s FROM e JOIN f USING (s)
)
SELECT a.src AS src_a, b.src AS src_b, COUNT(DISTINCT a.s) AS n_shared
FROM g a JOIN g b ON a.s = b.s AND a.src < b.src
GROUP BY 1, 2
"""


@query(
    "contamination_cross_source",
    oracle=CONTAMINATION_ORACLE,
    tags=("dedup", "llm", "join"),
)
def contamination_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination matrix over the documents corpus: distinct
    3-gram shingles shared per source pair, stop-shingle-filtered
    (see module docstring for the skew analysis)."""
    d = load(spark, sf_dir, "documents")
    return cross_source_shared_shingles(d, "source", "text", n=3, max_sources=10)


# --- benchmark decontamination (removal) ----------------------------------

DECONTAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, {_duck_shingles(_DUCK_TOKS)} AS sh FROM documents
), eval_sh AS (
  SELECT DISTINCT unnest(sh) AS s FROM t WHERE source = 'src0'
), train AS (
  SELECT doc_id, source, unnest(sh) AS s FROM t WHERE source <> 'src0'
), hits AS (
  SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_shared
  FROM train tr JOIN eval_sh e ON e.s = tr.s
  GROUP BY tr.doc_id
)
SELECT t.doc_id, t.source,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_shingles,
       h.doc_id IS NULL AS is_kept
FROM t LEFT JOIN hits h ON h.doc_id = t.doc_id
WHERE t.source <> 'src0'
"""


@query(
    "contamination_eval_removal",
    oracle=DECONTAM_ORACLE,
    tags=("llm", "dedup", "join"),
)
def contamination_eval_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION as a removal op (the GPT-3 appendix-C
    / PaLM procedure): any training document sharing at least one
    3-gram shingle with the held-out set (source 'src0' stands in for
    the benchmark) is flagged out of the corpus; the shared-shingle
    count rides along for auditability. Complements
    contamination_cross_source, which SCORES source pairs — this one
    produces the cleaned training corpus against a designated eval
    set.

    Scale: eval sets are small by nature, so the eval shingle set is
    the classic broadcast side (here it flows through a hash join on
    the shingle key — one shuffle of the training shingles, no
    pairwise work); training docs never join each other. At 100 TB
    the eval shingle set (~10⁵ rows) broadcasts and the whole op is
    map-side."""
    d = load(spark, sf_dir, "documents")
    spark_ctx = d.sparkSession
    tk = d.select("doc_id", "source", tokens("text").alias("toks")).repartition(
        spark_ctx.sparkContext.defaultParallelism
    )
    sh = tk.select(
        "doc_id", "source", F.explode(shingles_from_tokens(F.col("toks"), 3)).alias("s")
    )
    eval_sh = sh.filter(F.col("source") == "src0").select("s").distinct()
    train = sh.filter(F.col("source") != "src0")
    hits = (
        train.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.countDistinct("s").alias("n_shared"))
        .withColumnRenamed("doc_id", "hit_id")
    )
    base = tk.filter(F.col("source") != "src0").select("doc_id", "source")
    return base.join(hits, base.doc_id == F.col("hit_id"), "left").select(
        "doc_id",
        "source",
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared_shingles"),
        F.col("hit_id").isNull().alias("is_kept"),
    )
