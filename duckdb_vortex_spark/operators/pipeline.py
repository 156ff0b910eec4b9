"""End-to-end training-data preparation pipeline (SURVEY.md §2C): the
composition every pretraining corpus goes through — quality filter →
exact dedup (keep canonical) → deterministic train/val split — as ONE
declarative DataFrame expression with a full SQL oracle.

The point of this entry is that the *composition* stays a single
Catalyst plan: the quality filter folds into the scan stage, dedup is
the only shuffle (hash by content key), and the split assignment is a
per-row hash — so the whole pipeline costs one pass + one shuffle at
any corpus size. A pipeline built as separate materialized steps would
pay a scan per stage; this one does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load, query
from .dedup import _DUCK_TOKS, _duck_shingles, shingles_from_tokens
from .text import md5_fingerprint, quality_score, token_count, tokens


def prepare_training_data(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.75,
    train_buckets: int = 8,
    n_buckets: int = 10,
) -> DataFrame:
    """documents → (id, split, n_tokens, fingerprint) training manifest."""
    filtered = df.filter(quality_score(text_col) >= min_quality)
    content_key = F.md5(
        F.array_join(F.sort_array(F.array_distinct(tokens(text_col))), " ")
    )
    keyed = filtered.withColumn("content_key", content_key)
    keep = F.min(id_col).over(Window.partitionBy("content_key"))
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_buckets
    )
    return (
        keyed.withColumn("keep_id", keep)
        .filter(F.col(id_col) == F.col("keep_id"))
        .select(
            id_col,
            F.when(bucket < train_buckets, F.lit("train"))
            .otherwise(F.lit("val"))
            .alias("split"),
            token_count(text_col).alias("n_tokens"),
            md5_fingerprint(text_col).alias("fingerprint"),
        )
    )


PIPELINE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks, length(text) AS n_chars
  FROM documents
), m AS (
  SELECT
    doc_id, text, toks,
    CAST(
      CAST(n_chars BETWEEN 100 AND 20000 AS INTEGER)
      + CAST(CAST(len(list_filter(toks, x -> lower(x) IN
              ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
          / greatest(len(toks), 1) > 0.05 AS INTEGER)
      + CAST(CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
          / greatest(n_chars, 1) < 0.2 AS INTEGER)
      + CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / greatest(len(toks), 1) BETWEEN 2.0 AND 12.0 AS INTEGER)
    AS DOUBLE) / 4.0 AS quality
  FROM t
), q AS (
  SELECT doc_id, text, toks,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS content_key
  FROM m WHERE quality >= 0.75
), dd AS (
  SELECT doc_id, text, toks,
         min(doc_id) OVER (PARTITION BY content_key) AS keep_id
  FROM q
)
SELECT
  doc_id,
  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
       THEN 'train' ELSE 'val' END AS split,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM dd
WHERE doc_id = keep_id
"""


@query(
    "pipeline_training_data_prep",
    oracle=PIPELINE_ORACLE,
    tags=("llm", "dedup", "flagship"),
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup-keep-canonical → reproducible
    80/20 split, as one Catalyst plan (see module docstring)."""
    return prepare_training_data(load(spark, sf_dir, "documents"))


# --- stratified sampling --------------------------------------------------

STRATIFIED_ORACLE = """
SELECT lang, COUNT(*) AS n_kept
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
      < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 5 END
GROUP BY lang
"""


@query("sample_stratified_hash", oracle=STRATIFIED_ORACLE, tags=("sample", "llm"))
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-class rates (50%/20%/5% by lang)
    from the same portable md5 bucket as sample_hash_deterministic —
    the language-rebalancing primitive for corpus mixing. Still a
    scan-stage filter: per-row hash, no shuffle of rejected rows."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 50).when(F.col("lang") == "de", 20).otherwise(5)
    )
    return (
        d.filter(bucket < rate).groupBy("lang").agg(F.count("*").alias("n_kept"))
    )


# --- per-class balancing --------------------------------------------------

BALANCE_ORACLE = """
SELECT doc_id, lang, rnk
FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
  FROM documents
) t
WHERE rnk <= 30
"""


@query("balance_downsample_per_class", oracle=BALANCE_ORACLE, tags=("sample", "llm"))
def balance_downsample_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balancing: cap each language at 30 documents, chosen in
    deterministic hash order (not "first 30 in storage order", which
    is partitioning-dependent and biased toward old shards). One
    shuffle on the class key; rank-limit pushdown keeps the per-group
    sort bounded."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= 30)
    )


# --- token-budget packing -------------------------------------------------

PACKING_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS BIGINT)
           AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS bin
FROM c
"""


@query("pack_documents_token_bins", oracle=PACKING_ORACLE, tags=("llm", "window"))
def pack_documents_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed 2048-token training
    bins by running token count within each source shard (bin = tokens
    consumed before this doc ÷ budget — the streaming-concat packing
    rule). Exact integer window sum, so bin assignment is reproducible
    under any partitioning; one shuffle on the shard key."""
    from pyspark.sql.window import Window

    from .text import token_count

    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", token_count("text").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        ((cum - F.col("n_tokens")) / 2048).cast("bigint").alias("bin"),
    )


# --- curation with LM filtering -------------------------------------------

CURATION_LM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks, length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id, text, toks,
    CAST(
      CAST(n_chars BETWEEN 100 AND 20000 AS INTEGER)
      + CAST(CAST(len(list_filter(toks, x -> lower(x) IN
              ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
          / greatest(len(toks), 1) > 0.05 AS INTEGER)
      + CAST(CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
          / greatest(n_chars, 1) < 0.2 AS INTEGER)
      + CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / greatest(len(toks), 1) BETWEEN 2.0 AND 12.0 AS INTEGER)
    AS DOUBLE) / 4.0 AS quality
  FROM t
), big AS (
  SELECT t.doc_id, t.toks[i] AS a, t.toks[i+1] AS b
  FROM t, unnest(range(1, len(t.toks))) AS r(i)
), bcnt AS (
  SELECT a, b, COUNT(*) AS n_ab FROM big GROUP BY a, b
), ucnt AS (
  SELECT a, SUM(n_ab) AS n_a FROM bcnt GROUP BY a
), probs AS (
  SELECT bcnt.a, bcnt.b,
    CAST(floor(CAST(bcnt.n_ab AS DOUBLE) / ucnt.n_a * 1000000 + 0.5) AS BIGINT)
      AS p_q
  FROM bcnt JOIN ucnt USING (a)
), lm AS (
  SELECT big.doc_id,
    CAST(SUM(p.p_q) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_prob
  FROM big JOIN probs p ON big.a = p.a AND big.b = p.b
  GROUP BY big.doc_id
), q AS (
  SELECT m.doc_id, m.text, m.toks, lm.mean_prob,
         md5(array_to_string(list_sort(list_distinct(m.toks)), ' ')) AS content_key
  FROM m JOIN lm ON m.doc_id = lm.doc_id
  WHERE m.quality >= 0.75 AND lm.mean_prob >= 0.02
), dd AS (
  SELECT doc_id, toks, mean_prob,
         min(doc_id) OVER (PARTITION BY content_key) AS keep_id
  FROM q
)
SELECT
  doc_id,
  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 8
       THEN 'train' ELSE 'val' END AS split,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  mean_prob
FROM dd
WHERE doc_id = keep_id
"""


@query("pipeline_curation_with_lm", oracle=CURATION_LM_ORACLE, tags=("llm", "dedup", "flagship"))
def pipeline_curation_with_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain as one plan: heuristic quality filter →
    corpus-LM outlier removal (text.lm_scores: model trained on the
    same corpus in the same plan) → exact-dedup keep-canonical →
    reproducible 80/20 split. Still declarative end-to-end — the LM
    model tables are vocabulary-bounded broadcasts inside the plan, so
    the pipeline's distributed cost remains one corpus pass plus the
    dedup shuffle."""
    from .text import lm_scores

    d = load(spark, sf_dir, "documents")
    lm = lm_scores(d).select("doc_id", "mean_prob", "is_outlier")
    filtered = (
        d.filter(quality_score("text") >= 0.75)
        .join(lm, "doc_id")
        .filter(~F.col("is_outlier"))
    )
    content_key = F.md5(
        F.array_join(F.sort_array(F.array_distinct(tokens("text"))), " ")
    )
    keyed = filtered.withColumn("content_key", content_key)
    keep = F.min("doc_id").over(Window.partitionBy("content_key"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    return (
        keyed.withColumn("keep_id", keep)
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select(
            "doc_id",
            F.when(bucket < 8, F.lit("train")).otherwise(F.lit("val")).alias("split"),
            token_count("text").alias("n_tokens"),
            "mean_prob",
        )
    )


# --- temperature-smoothed source mixture ---------------------------------

MIXTURE_ORACLE = """
WITH per_source AS (
  SELECT
    source,
    COUNT(*) AS n_docs,
    CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))) AS BIGINT)
      AS n_tokens
  FROM documents
  GROUP BY source
), q AS (
  SELECT source, n_docs, n_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS qq
  FROM per_source
), tot AS (
  SELECT SUM(n_tokens) AS tok_total, SUM(qq) AS q_norm FROM q
)
SELECT
  s.source,
  s.n_docs,
  s.n_tokens,
  CAST(s.n_tokens AS DOUBLE) / t.tok_total AS p_raw,
  CAST(s.qq AS DOUBLE) / t.q_norm AS p_smoothed,
  LEAST(1.0,
        (CAST(s.qq AS DOUBLE) / t.q_norm)
        * (0.5 * t.tok_total) / s.n_tokens) AS sample_rate
FROM q s CROSS JOIN tot t
"""


@query("pipeline_source_mixture_weights", oracle=MIXTURE_ORACLE, tags=("llm", "agg", "sample"))
def pipeline_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixing (the multinomial α-sampling
    of XLM-R / mC4, α = 0.5): per-source token mass → smoothed
    sampling distribution q_i ∝ p_i^α → per-source sampling RATE that
    realizes q over a token budget of half the corpus. Downweights
    runaway-head sources and upweights the tail — the standard recipe
    for balancing heterogeneous pretraining corpora.

    Scale: one groupBy(source) aggregate (map-side partial; source
    cardinality is tiny), the corpus totals join back as a 1-row
    broadcast — no driver scalar, no second pass over the corpus.
    Output is |sources| rows; the rates then drive a deterministic
    hash-sample (sample_hash_deterministic) over the full corpus."""
    from .text import tokens

    d = load(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    budget_frac = 0.5
    # α = 0.5 realized as sqrt; quantized to exact BIGINT before the
    # normalizing SUM so the result is partitioning-order independent
    # (double sums are not associative — the repo-wide exactness rule).
    qsrc = per_source.withColumn(
        "qq",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    tot = qsrc.agg(
        F.sum("n_tokens").alias("tok_total"), F.sum("qq").alias("q_norm")
    )
    q = F.col("qq").cast("double") / F.col("q_norm")
    return (
        qsrc.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("tok_total")).alias("p_raw"),
            q.alias("p_smoothed"),
            F.least(
                F.lit(1.0),
                q * (F.lit(budget_frac) * F.col("tok_total")) / F.col("n_tokens"),
            ).alias("sample_rate"),
        )
    )


# --- mixture rates APPLIED as a deterministic sample ----------------------

MIXTURE_APPLIED_ORACLE = """
WITH per_source AS (
  SELECT
    source,
    COUNT(*) AS n_docs,
    CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))) AS BIGINT)
      AS n_tokens
  FROM documents
  GROUP BY source
), q AS (
  SELECT source, n_docs, n_tokens,
         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS qq
  FROM per_source
), tot AS (
  SELECT SUM(n_tokens) AS tok_total, SUM(qq) AS q_norm FROM q
), rates AS (
  SELECT s.source, s.n_docs,
         CAST(floor(LEAST(1.0,
              (CAST(s.qq AS DOUBLE) / t.q_norm)
              * (0.5 * t.tok_total) / s.n_tokens) * 10000 + 0.5) AS BIGINT) AS rate_bp
  FROM q s CROSS JOIN tot t
)
SELECT
  d.source,
  r.n_docs,
  r.rate_bp,
  COUNT(*) FILTER (
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 10000 < r.rate_bp
  ) AS n_kept
FROM documents d JOIN rates r USING (source)
GROUP BY d.source, r.n_docs, r.rate_bp
"""


@query(
    "sample_temperature_mixture",
    oracle=MIXTURE_APPLIED_ORACLE,
    tags=("sample", "llm", "agg"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture rates APPLIED: each document keeps/drops by the
    portable md5 bucket (basis points) against its source's
    temperature-smoothed sampling rate — the end-to-end corpus
    rebalancing step (rates from pipeline_source_mixture_weights,
    mechanism from sample_hash_deterministic). Output is the
    per-source audit: docs, rate, kept count.

    Scale: the rate table is |sources| rows broadcast onto a
    scan-stage filter — rejected rows never shuffle; the audit
    aggregate is the only exchange."""
    rates = pipeline_source_mixture_weights(spark, sf_dir).select(
        "source",
        "n_docs",
        F.floor(F.col("sample_rate") * 10000 + F.lit(0.5)).cast("bigint").alias("rate_bp"),
    )
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10000
    )
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "rate_bp")
        .agg(F.count(F.when(bucket < F.col("rate_bp"), 1)).alias("n_kept"))
        .select("source", "n_docs", "rate_bp", "n_kept")
    )


# --- dataset card ---------------------------------------------------------

DATASET_CARD_ORACLE = r"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars,
         len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_toks,
         md5(text) AS h
  FROM documents
), tc AS (
  -- window, not an inner join back onto GROUP BY h (ADVICE r12): the
  -- join form silently dropped NULL-text rows from EVERY count (NULL
  -- never equals NULL in a join); the window keeps them in one NULL
  -- partition — the same semantics as the Spark side, so parity holds
  -- even if documents ever carry NULL text
  SELECT *, COUNT(*) OVER (PARTITION BY h) AS c FROM t
)
SELECT CASE WHEN GROUPING(tc.lang) = 1 THEN '<all>' ELSE tc.lang END AS lang,
       CASE WHEN GROUPING(tc.source) = 1 THEN '<all>' ELSE tc.source END AS source,
       COUNT(*) AS n_docs,
       CAST(SUM(tc.n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(tc.n_chars) AS BIGINT) AS total_chars,
       COUNT(*) FILTER (WHERE tc.c > 1) AS n_exact_dup_docs,
       COUNT(*) FILTER (WHERE tc.n_toks < 20) AS n_short_docs
FROM tc
GROUP BY ROLLUP (tc.lang, tc.source)
"""


@query("pipeline_dataset_card", oracle=DATASET_CARD_ORACLE, tags=("llm", "agg", "stats"))
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet in one plan (the 'dataset card' every corpus
    release ships — Gebru et al. 2021): per (lang, source) cell plus
    lang and corpus rollup totals — doc/token/char volumes, exact-
    duplicate incidence (md5 content groups >1), and short-doc counts.
    The numbers a data curator reads BEFORE choosing mixture weights
    (pipeline_source_mixture_weights consumes exactly these margins).

    Scale: one tokenize pass, one content-hash WINDOW for dup-cluster
    sizes (r12 — was an aggregate joined back, which consumed the
    tokenize+md5 pass twice), and one ROLLUP aggregate — Spark
    computes all three grouping sets in a single Expand+
    partial-aggregate pass, so the card costs one h clustering plus
    one grouped-count shuffle at 100 TB."""
    from .text import tokens

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokens("text")).alias("n_toks"),
        F.md5("text").alias("h"),
    )
    # Duplicate-cluster size as a WINDOW count over the content hash
    # (r12 q21-family sweep): the previous groupBy(h)-joined-back form
    # consumed the tokenize+md5 pass twice; the window computes c in
    # one pass over one h clustering, partitions bounded by duplicate-
    # cluster size. Interleaved A/B at sf0.1: 0.78 -> 0.61 s, exact
    # parity.
    # NULL-text semantics (ADVICE r12, intentional): the old inner
    # join on h=md5(text) silently DROPPED NULL-text rows from the
    # dup-cluster count (NULL never equals NULL in a join); the window
    # keeps them in one NULL partition, so NULL-text docs now count as
    # an exact-dup cluster when there are ≥2 of them. The window
    # semantics are the deliberate ones (a missing-text doc is still a
    # doc, and two of them ARE content-identical); the DuckDB oracle
    # counts the same way, so parity pins the choice. Current testdata
    # has no NULL text — this note is the contract if that changes.
    t = t.withColumn("c", F.count("*").over(Window.partitionBy("h")))
    return (
        t.rollup("lang", "source")
        .agg(
            # GROUPING() (not COALESCE on the key) labels rollup rows:
            # a real NULL lang/source cell stays NULL instead of being
            # conflated with the '<all>' subtotal row.
            F.when(F.grouping("lang") == 1, F.lit("<all>"))
            .otherwise(F.col("lang"))
            .alias("lang_label"),
            F.when(F.grouping("source") == 1, F.lit("<all>"))
            .otherwise(F.col("source"))
            .alias("source_label"),
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count(F.when(F.col("c") > 1, 1)).alias("n_exact_dup_docs"),
            F.count(F.when(F.col("n_toks") < 20, 1)).alias("n_short_docs"),
        )
        .select(
            F.col("lang_label").alias("lang"),
            F.col("source_label").alias("source"),
            "n_docs",
            "n_tokens",
            "total_chars",
            "n_exact_dup_docs",
            "n_short_docs",
        )
    )


# --- leakage-safe holdout split -------------------------------------------

GROUP_HOLDOUT_ORACLE = """
SELECT split,
  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT source, n_chars,
    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT source, n_chars,
      CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 100 AS b
    FROM documents
  )
)
GROUP BY split
"""


@query("sample_group_holdout_split", oracle=GROUP_HOLDOUT_ORACLE, tags=("sample", "llm"))
def sample_group_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is a hash of the
    GROUP key (source), not the row, so every document from one source
    lands in exactly one split — near-duplicate documents within a
    source (the dominant leakage channel in web corpora: same site,
    boilerplate, mirrored pages) can never straddle the train/eval
    boundary. Row-hash splits (sample_hash_deterministic) cannot give
    this guarantee.

    80/10/10 by the same portable md5 basis-point bucket as the rest
    of the sampling family; realized split sizes converge to the
    ratios only as the number of GROUPS grows (the price of the
    leakage guarantee — with few huge groups the variance is the
    groups', not the rows'; the per-split n_sources audit column makes
    that skew visible, and Σ n_sources = |sources| certifies the
    partition is exact).

    Scale: a per-row hash + CASE at the scan — no shuffle to decide
    membership, no group table to join; the only exchange is the
    3-group audit aggregate. Works identically as a streaming-scan
    filter when materializing each split."""
    d = load(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# --- per-epoch deterministic reshuffle ------------------------------------

EPOCH_SHARDS_ORACLE = """
WITH e AS (
  SELECT d.doc_id, ep.epoch,
    md5(CAST(ep.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS hx
  FROM documents d, (SELECT unnest([0, 1, 2]) AS epoch) ep
)
SELECT CAST(epoch AS BIGINT) AS epoch,
  CAST(CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8 AS BIGINT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  arg_min(doc_id, hx) AS lead_doc,
  CAST(SUM(doc_id) AS BIGINT) AS doc_id_checksum
FROM e
GROUP BY 1, 2
"""


@query("pipeline_epoch_shuffle_shards", oracle=EPOCH_SHARDS_ORACLE, tags=("sample", "llm"))
def pipeline_epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch reshuffle plan: for each training epoch,
    every document is assigned a shard (md5(epoch:doc) % 8) and an
    intra-shard order (the full md5 string) — a different but fully
    reproducible permutation per epoch, the property data loaders need
    for exactly-repeatable training runs (seeded shuffling without a
    central shuffle service; Spark's own rand() is partition-dependent
    and irreproducible across cluster layouts).

    The audit output is per (epoch, shard): document count (spread
    check), the order-leading document (pins the intra-shard ordering
    — ties impossible: the full 32-hex md5 of distinct keys), and an
    id checksum (pins membership). Everything is hash arithmetic —
    across engines AND across cluster sizes the plan is bit-identical.

    Scale: shard assignment is a per-row hash at the scan — the epoch
    fan-out is an explode (no join), rows shuffle once on their
    (epoch, shard) key, and writing epoch files is
    partitionBy(epoch, shard) on exactly this frame. Intra-shard order
    is a local sort within each written shard, never a global one."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    e = d.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("epoch")
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
            )
        ).alias("hx"),
    )
    return (
        e.groupBy(
            F.col("epoch").cast("bigint").alias("epoch"),
            (F.conv(F.substring("hx", 1, 8), 16, 10).cast("bigint") % 8).alias("shard"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min_by("doc_id", "hx").alias("lead_doc"),
            F.sum("doc_id").cast("bigint").alias("doc_id_checksum"),
        )
    )


# --- tokenizer vocabulary coverage ----------------------------------------

VOCAB_COVERAGE_ORACLE = r"""
WITH st AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM (
    SELECT source,
      unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS tok
    FROM documents
  )
  GROUP BY source, tok
), vocab AS (
  SELECT tok FROM (
    SELECT tok, row_number() OVER (
      ORDER BY SUM(n) DESC, tok) AS rnk
    FROM st GROUP BY tok
  ) WHERE rnk <= 100
)
SELECT st.source,
  CAST(SUM(st.n) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN v.tok IS NULL THEN st.n ELSE 0 END) AS BIGINT)
    AS oov_tokens,
  CAST(CAST(SUM(CASE WHEN v.tok IS NULL THEN st.n ELSE 0 END) AS BIGINT)
    AS DOUBLE) / CAST(CAST(SUM(st.n) AS BIGINT) AS DOUBLE) AS oov_rate
FROM st LEFT JOIN vocab v ON v.tok = st.tok
GROUP BY st.source
"""


@query(
    "pipeline_vocab_coverage",
    oracle=VOCAB_COVERAGE_ORACLE,
    tags=("text", "llm", "sample"),
)
def pipeline_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build a top-100 vocabulary
    from corpus frequencies, then report each source's out-of-
    vocabulary token rate — the go/no-go check before committing a
    tokenizer to a corpus mix (a source with high OOV inflates
    sequence lengths and burns training compute on <unk>/byte
    fallbacks).

    The corpus is tokenized ONCE: the (source, token) count table
    feeds both the global vocabulary ranking (a re-aggregate of the
    same table) and the per-source coverage sums — no second pass
    over documents. The vocabulary pick is total-ordered (count desc,
    token asc), all counts are exact BIGINTs, and the OOV rate is one
    final division.

    Scale: the (source, token) table is |sources|·|vocabulary|-
    bounded, tiny next to the token stream that built it; the ranking
    window runs over distinct tokens only, and the 100-row vocabulary
    joins back as a broadcast. At 100 TB the vocabulary would come
    from the real tokenizer instead — the audit plan is unchanged."""
    from .text import tokens

    d = load(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    vocab = (
        st.groupBy("tok")
        .agg(F.sum("n").alias("cnt"))
        .select("tok", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "tok")).alias("rnk"))
        .filter(F.col("rnk") <= 100)
        .select(F.col("tok").alias("vtok"))
    )
    joined = st.join(F.broadcast(vocab), st["tok"] == vocab["vtok"], "left")
    oov = F.sum(F.when(F.col("vtok").isNull(), F.col("n")).otherwise(F.lit(0))).cast(
        "bigint"
    )
    return joined.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("total_tokens"),
        oov.alias("oov_tokens"),
        (oov.cast("double") / F.sum("n").cast("bigint").cast("double")).alias("oov_rate"),
    )


# --- full corpus → training-shard manifest (r7 mega-entry) ----------------

SHARDS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, text, {_DUCK_TOKS} AS toks, length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id, source, toks,
    CAST(
      CAST(n_chars BETWEEN 100 AND 20000 AS INTEGER)
      + CAST(CAST(len(list_filter(toks, x -> lower(x) IN
              ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
          / greatest(len(toks), 1) > 0.05 AS INTEGER)
      + CAST(CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
          / greatest(n_chars, 1) < 0.2 AS INTEGER)
      + CAST(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / greatest(len(toks), 1) BETWEEN 2.0 AND 12.0 AS INTEGER)
    AS DOUBLE) / 4.0 AS quality
  FROM t
), q AS (
  SELECT doc_id, source, toks,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS content_key
  FROM m WHERE quality >= 0.75
), dd AS (
  SELECT doc_id, source, toks,
         min(doc_id) OVER (PARTITION BY content_key) AS keep_id
  FROM q
), surv AS (
  SELECT doc_id, source, toks FROM dd WHERE doc_id = keep_id
), eval_sh AS (
  SELECT DISTINCT unnest({_duck_shingles("toks")}) AS s FROM t WHERE source = 'src0'
), tr_sh AS (
  SELECT doc_id, unnest({_duck_shingles("toks")}) AS s
  FROM surv WHERE source <> 'src0'
), contaminated AS (
  SELECT DISTINCT tr.doc_id FROM tr_sh tr JOIN eval_sh e ON e.s = tr.s
), clean AS (
  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
           AS pack_group
  FROM surv
  WHERE source <> 'src0'
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
), c AS (
  SELECT doc_id, source, n_tokens, pack_group,
         CAST(SUM(n_tokens) OVER (PARTITION BY source, pack_group ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM clean
)
SELECT doc_id, source, n_tokens,
       CAST(pack_group AS BIGINT) AS pack_group,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
       CAST(CAST(('0x' || substr(md5(source || '#' || CAST(pack_group AS VARCHAR)
                  || '#' || CAST((cum - n_tokens) // 2048 AS VARCHAR)), 1, 8))
            AS BIGINT) % 16 AS BIGINT) AS shard
FROM c
"""


def corpus_to_shards(
    df: DataFrame,
    eval_source: str = "src0",
    min_quality: float = 0.75,
    token_budget: int = 2048,
    pack_groups: int = 8,
    n_shards: int = 16,
    decontam_ngram: int = 3,
) -> DataFrame:
    """documents → (doc_id, source, n_tokens, pack_group, bin, shard)
    training-shard manifest: the full curation chain as ONE plan.

    Stages and their shuffles (everything else stays in the scan
    stage or reuses an exchange):

    1. quality filter — pure column algebra, folds into the scan;
       rejected rows are never shuffled.
    2. exact dedup, keep-canonical — min(doc_id) window over the
       content key: shuffle #1 (hash by content_key).
    3. benchmark decontamination (GPT-3 appendix-C shape) — survivors'
       3-gram shingles anti-joined against the eval set's shingle
       set: shuffle #2 on the shingle key. Eval sets are small by
       nature, so at scale the eval side broadcasts and the anti-join
       is map-side; here it flows through AQE.
    4. token packing — running token sum over (source, pack_group):
       shuffle #3. pack_group = md5-bucket(doc_id) % 8 bounds the
       per-partition sort: packing only needs locality within a
       training shard, not a global order, so a source that is 10 TB
       sorts as 8 independent 1.25 TB streams (and pack_groups scales
       with corpus size — the knob is the manifest's parallelism).
    5. shard assignment — per-row md5 hash of (source, pack_group,
       bin): no shuffle, reproducible under any partitioning.

    Tokenization happens ONCE behind a round-robin exchange barrier
    before the shingle explosion ([[hof-recompute-and-aqe-cliff]]:
    Catalyst inlines expression trees into per-index HOF lambdas, so
    unbarriered shingles re-run split+filter per gram).
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism

    # quality gate + content key, then keep-canonical via window —
    # same shapes as prepare_training_data (oracle-pinned there)
    filtered = df.filter(quality_score("text") >= min_quality)
    content_key = F.md5(
        F.array_join(F.sort_array(F.array_distinct(tokens("text"))), " ")
    )
    keep = F.min("doc_id").over(Window.partitionBy("content_key"))
    surv = (
        filtered.withColumn("content_key", content_key)
        .withColumn("keep_id", keep)
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "source", "text")
    )

    # tokenize-once barriers (shingle HOFs explode ~|toks| rows/doc)
    surv_tk = surv.select(
        "doc_id", "source", tokens("text").alias("toks")
    ).repartition(par)
    eval_tk = (
        df.filter(F.col("source") == eval_source)
        .select(tokens("text").alias("toks"))
        .repartition(par)
    )

    eval_sh = eval_tk.select(
        F.explode(shingles_from_tokens("toks", decontam_ngram)).alias("s")
    ).distinct()
    train = surv_tk.filter(F.col("source") != eval_source)
    tr_sh = train.select(
        "doc_id",
        F.explode(shingles_from_tokens("toks", decontam_ngram)).alias("s"),
    )
    contaminated = tr_sh.join(eval_sh, "s").select("doc_id").distinct()
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % pack_groups
    )
    clean = train.join(contaminated, "doc_id", "left_anti").select(
        "doc_id",
        "source",
        F.size("toks").cast("bigint").alias("n_tokens"),
        bucket.alias("pack_group"),
    )

    w = (
        Window.partitionBy("source", "pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    binned = clean.withColumn(
        "bin", ((cum - F.col("n_tokens")) / token_budget).cast("bigint")
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("source"),
                        F.col("pack_group").cast("string"),
                        F.col("bin").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    )
    return binned.select(
        "doc_id", "source", "n_tokens", "pack_group", "bin", shard.alias("shard")
    )


@query(
    "pipeline_corpus_to_shards",
    oracle=SHARDS_ORACLE,
    tags=("llm", "dedup", "flagship", "join", "window"),
)
def pipeline_corpus_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end integration shape a real pretraining pipeline
    runs (VERDICT r6 #7a): quality filter → exact dedup → benchmark
    decontamination (vs the 'src0' eval set) → fixed-token-budget
    packing → shard assignment, composed as a single Catalyst plan —
    three shuffles total for the whole chain (see corpus_to_shards).
    The unit-level entries (pipeline_training_data_prep,
    contamination_eval_removal, pack_documents_token_bins) pin each
    stage alone; this one pins their COMPOSITION, where stage
    boundaries are where real pipelines silently break (a dedup that
    reorders, a decontam that drops the wrong side, a packing window
    that sees pre-dedup rows)."""
    return corpus_to_shards(load(spark, sf_dir, "documents"))


# --- fuzzy curation manifest (the FineWeb/RefinedWeb shape) ----------------

FUZZY_MANIFEST_ORACLE = f"""
WITH RECURSIVE
q AS (
  SELECT doc_id, source, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens, text
  FROM documents
  WHERE source <> 'src0' AND len({_DUCK_TOKS}) >= 30
),
sh AS (
  SELECT doc_id AS id, {_duck_shingles(_DUCK_TOKS)} AS sh FROM q
),
pairs AS (
  SELECT a.id AS doc_a, b.id AS doc_b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT id AS node, id AS r FROM sh
  UNION
  SELECT reach.node, edges.b FROM reach JOIN edges ON edges.a = reach.r
),
cc AS (
  SELECT node AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY node
),
esh AS (
  SELECT doc_id AS id, {_duck_shingles(_DUCK_TOKS)} AS sh
  FROM documents WHERE source = 'src0'
),
dec AS (
  SELECT s.id AS doc_id, MAX(
           CAST(len(list_intersect(s.sh, e.sh)) AS DOUBLE)
             / (len(s.sh) + len(e.sh) - len(list_intersect(s.sh, e.sh)))
         ) AS mj
  FROM sh s
  JOIN cc ON cc.doc_id = s.id AND cc.canonical_id = s.id
  JOIN esh e
    ON CAST(len(list_intersect(s.sh, e.sh)) AS DOUBLE)
         / (len(s.sh) + len(e.sh) - len(list_intersect(s.sh, e.sh))) >= 0.8
  GROUP BY s.id
)
SELECT q.doc_id, q.source, q.n_tokens, cc.canonical_id,
       (cc.canonical_id = q.doc_id) AS keep_dedup,
       CASE WHEN cc.canonical_id = q.doc_id
            THEN COALESCE(dec.mj, 0.0) END AS max_eval_jaccard,
       (cc.canonical_id = q.doc_id AND dec.doc_id IS NULL) AS is_kept
FROM q JOIN cc USING (doc_id) LEFT JOIN dec USING (doc_id)
"""


@query(
    "pipeline_fuzzy_curation_manifest",
    oracle=FUZZY_MANIFEST_ORACLE,
    tags=("llm", "dedup", "join"),
)
def pipeline_fuzzy_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FUZZY curation chain modern pretraining corpora go through
    (RefinedWeb / FineWeb recipe): token-count quality floor → MinHash
    near-dup dedup with keep-canonical cluster resolution → fuzzy
    decontamination of the survivors against the designated eval
    source 'src0' — emitted as a per-document audit MANIFEST with
    per-stage attribution (canonical_id, keep_dedup, max_eval_jaccard,
    final is_kept), the artifact a real pipeline publishes alongside
    the cleaned corpus. Complements `pipeline_corpus_to_shards`, whose
    dedup/decontamination stages are EXACT; here both are near-dup.

    Scale: the quality floor folds into the scan; near-dup dedup is the
    banded-LSH + pointer-jumping-components path (`minhash_dedup_keep`
    — never all-pairs); decontamination runs only on dedup SURVIVORS
    against a broadcast eval index (`neardup_decontaminate` — nothing
    corpus-sized shuffles). The oracle replays the whole chain with a
    recursive transitive closure over brute-force Jaccard pairs."""
    from .contamination import neardup_decontaminate
    from .dedup import minhash_dedup_keep

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("source") == "src0")
    q = (
        docs.filter(F.col("source") != "src0")
        .withColumn("n_tokens", F.size(tokens("text")).cast("bigint"))
        .filter(F.col("n_tokens") >= 30)
    )
    kd = minhash_dedup_keep(q, threshold=0.8)
    surv = q.join(
        kd.filter(F.col("is_kept")).select("doc_id"), "doc_id", "left_semi"
    )
    dc = neardup_decontaminate(surv, ev, threshold=0.8)
    return (
        q.select("doc_id", "source", "n_tokens")
        .join(
            kd.select(
                "doc_id", "canonical_id", F.col("is_kept").alias("keep_dedup")
            ),
            "doc_id",
        )
        .join(
            dc.select(
                F.col("id").alias("doc_id"),
                "max_jaccard",
                F.col("is_kept").alias("__dk"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "canonical_id",
            "keep_dedup",
            F.when(
                F.col("keep_dedup"), F.coalesce("max_jaccard", F.lit(0.0))
            ).alias("max_eval_jaccard"),
            (F.col("keep_dedup") & F.coalesce(F.col("__dk"), F.lit(False))).alias(
                "is_kept"
            ),
        )
    )


# --- data-quality audit (ingest gate checks) --------------------------------

QUALITY_AUDIT_ORACLE = """
SELECT 'orders_orphan_custkey' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS violation_count
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'lineitem_quantity_range',
       CAST(COUNT(*) FILTER (l_quantity <= 0 OR l_quantity > 50) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_duplicate_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'customer_null_name',
       CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT)
FROM customer
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(COUNT(*) FILTER (l_discount < 0 OR l_discount > 0.1) AS BIGINT)
FROM lineitem
"""


@query(
    "pipeline_data_quality_audit",
    oracle=QUALITY_AUDIT_ORACLE,
    tags=("llm", "agg", "stats"),
)
def pipeline_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate data-quality audit (the Great-Expectations shape):
    referential integrity, range, uniqueness and null-rate checks emitted as ONE compact
    (check_name, violation_count) table — the artifact a pipeline
    asserts on before promoting a snapshot.

    Scale: every per-table check folds into a single conditional
    aggregate over that table's scan (one pass per table, map-side
    partials — adding checks adds expressions, not passes);
    referential integrity is ONE key-shuffled anti join (customer is
    fact-scale — it grows with the data, so the join strategy is left
    to the planner rather than broadcast-hinted; a true fixed-size
    dimension would broadcast). The audit table is O(#checks) rows
    regardless of data size."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")

    def one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("violation_count"),
        )

    orphan = one(
        "orders_orphan_custkey",
        o.join(
            c.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        ).agg(F.count("*").alias("n")),
    )
    # coalesce: F.sum over an empty table is NULL, the oracle's
    # COUNT FILTER is 0 — an empty snapshot must audit clean, not null
    li_checks = li.agg(
        F.coalesce(
            F.sum(
                ((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)).cast(
                    "bigint"
                )
            ),
            F.lit(0),
        ).alias("qty"),
        F.coalesce(
            F.sum(
                ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast(
                    "bigint"
                )
            ),
            F.lit(0),
        ).alias("disc"),
    )
    qty = one("lineitem_quantity_range", li_checks.select(F.col("qty").alias("n")))
    disc = one(
        "lineitem_discount_range", li_checks.select(F.col("disc").alias("n"))
    )
    dup = one(
        "orders_duplicate_orderkey",
        o.agg((F.count("*") - F.countDistinct("o_orderkey")).alias("n")),
    )
    nullname = one(
        "customer_null_name",
        c.agg(
            F.coalesce(
                F.sum(F.col("c_name").isNull().cast("bigint")), F.lit(0)
            ).alias("n")
        ),
    )
    return orphan.unionByName(qty).unionByName(dup).unionByName(nullname).unionByName(
        disc
    )


# --- dataset snapshot diff (version comparison) ----------------------------

SNAPSHOT_DIFF_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
), v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders
)
SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v1.o_orderkey IS NULL THEN 'added'
            WHEN v2.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM v1 FULL JOIN v2 USING (o_orderkey)
WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
   OR v1.o_totalprice <> v2.o_totalprice
"""


def snapshot_diff(
    v1: DataFrame, v2: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Row-level diff of two dataset versions on a unique key:
    (key, change_type) for every added / removed / value-changed row.
    One co-partitioned full outer join on the key — the audit a
    versioned training-data store runs between snapshots; unchanged
    rows (the overwhelming majority at scale) are filtered before any
    downstream work. Presence is tracked with explicit per-side
    markers (a NULL data value must not read as an absent row) and
    change detection is null-safe (a value changing to or from NULL
    IS a change). With ``compare_cols=[]`` the diff is presence-only
    (added/removed)."""
    a = v1.select(
        key,
        F.lit(True).alias("__in_a"),
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
    )
    b = v2.select(
        key,
        F.lit(True).alias("__in_b"),
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
    return (
        a.join(b, key, "full")
        .select(
            key,
            F.when(F.col("__in_a").isNull(), F.lit("added"))
            .when(F.col("__in_b").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
            changed.alias("__chg"),
        )
        .filter((F.col("change_type") != "changed") | F.col("__chg"))
        .drop("__chg")
    )


@query(
    "pipeline_snapshot_diff",
    oracle=SNAPSHOT_DIFF_ORACLE,
    tags=("llm", "join", "stats"),
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot diff of a versioned dataset: two
    deterministic derived versions of `orders` (v1 drops every 7th
    key — 'added' in v2; v2 bumps every 5th key's total — 'changed'),
    diffed to (key, change_type). At 100 TB both snapshot scans
    co-partition on the key (a real store would bucket-write on it,
    making the full outer join shuffle-free) and unchanged rows never
    leave the join stage."""
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 7 != 0).select("o_orderkey", "o_totalprice")
    v2 = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(v1, v2, "o_orderkey", ["o_totalprice"])
