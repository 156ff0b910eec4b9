"""Statistical aggregates, bit/bool aggregates, deterministic sampling,
and string-distance operators (SURVEY.md §2B "Aggregation" + scalar
function families; DuckDB v1.5.5 core surface [public]).

Determinism strategy (same as aggregates.py): corr / covariance /
regression / higher-moment aggregates are computed from **exact decimal
moment sums** (Σx, Σx², Σx³, Σx⁴, Σxy — associative, order-independent)
and combined with the *identical* double-arithmetic expression tree on
both engines, so results are bit-identical. Native corr()/skewness()
use Welford-style streaming updates whose value depends on accumulation
order — non-deterministic under Spark's shuffle, and differently biased
between engines (DuckDB skewness/kurtosis are sample-corrected, Spark's
are population) — so they are deliberately not used in oracle-checked
entries.

Scale notes: every entry is a single groupBy with map-side partial
aggregation (moment sums combine associatively), so the shuffle carries
one row per (partition, key) — the canonical 100 TB aggregate shape.
The sampling entry filters *before* any shuffle, so downstream work
scales with the sample, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, query
from .tpch import dec

# --- correlation / covariance / linear regression -----------------------

_MOMENTS_XY = """
SELECT
  l_returnflag,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
  CAST(SUM(round(CAST(l_extendedprice AS DECIMAL(25,6)) * CAST(l_extendedprice AS DECIMAL(25,6)),
                 1)) AS DOUBLE) AS syy,
  CAST(SUM(round(CAST(l_quantity AS DECIMAL(10,0)) * CAST(l_extendedprice AS DECIMAL(25,6)),
                 3)) AS DOUBLE) AS sxy
FROM lineitem
GROUP BY l_returnflag
"""

CORR_ORACLE = f"""
WITH m AS ({_MOMENTS_XY})
SELECT
  l_returnflag,
  n,
  (sxy - sx * sy / n) / (n - 1) AS covar_samp,
  (sxy - sx * sy / n) / n AS covar_pop,
  (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_xy,
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
  sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n) AS regr_intercept,
  ((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    * ((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) AS regr_r2
FROM m
"""


@query("agg_corr_covar_regr", oracle=CORR_ORACLE, tags=("agg", "stats"))
def agg_corr_covar_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / covar_pop / regr_slope / regr_intercept /
    regr_r2 between l_quantity and l_extendedprice, from exact decimal
    moment sums (see module docstring for why not the native aggs)."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    # Moment-sum determinism has TWO constraints, not one:
    # (1) each addend must be an exact integer/decimal (associative sum);
    # (2) the final sum's scaled integer must stay below 2^53, because
    #     DuckDB converts decimal→double as round(int128→double)/10^s —
    #     a second rounding that diverges from Spark's correctly-rounded
    #     BigDecimal→double once the integer exceeds 2^53.
    # So: quantity moments are pure BIGINT (qty is integral); price
    # products are exact decimal×decimal rounded to a coarse scale
    # (1 resp. 3) that keeps Σ·10^s ≪ 2^53 at oracle scale factors.
    xb = x.cast("bigint")
    dy = y.cast("decimal(18,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xb).cast("double").alias("sx"),
        F.sum(dec(y)).cast("double").alias("sy"),
        F.sum(xb * xb).cast("double").alias("sxx"),
        F.sum(F.round(dy * dy, 1)).cast("double").alias("syy"),
        F.sum(F.round(x.cast("decimal(10,0)") * dy, 3)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    corr = num / F.sqrt(denx * deny)
    return m.select(
        "l_returnflag",
        "n",
        ((sxy - sx * sy / n) / (n - F.lit(1))).alias("covar_samp"),
        ((sxy - sx * sy / n) / n).alias("covar_pop"),
        corr.alias("corr_xy"),
        (num / denx).alias("regr_slope"),
        (sy / n - (num / denx) * (sx / n)).alias("regr_intercept"),
        (corr * corr).alias("regr_r2"),
    )


# --- skewness / kurtosis (population, from raw moments) ------------------

_MOMENTS_X4 = """
SELECT
  l_returnflag,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
           * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
           * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s4
FROM lineitem
GROUP BY l_returnflag
"""

SKEW_ORACLE = f"""
WITH m AS ({_MOMENTS_X4})
SELECT
  l_returnflag,
  n,
  s1 / n AS mean_qty,
  s2 / n - (s1 / n) * (s1 / n) AS m2,
  (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
    / ((s2 / n - (s1 / n) * (s1 / n)) * sqrt(s2 / n - (s1 / n) * (s1 / n))) AS skewness_pop,
  (s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
     - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
    / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3 AS kurtosis_excess
FROM m
"""


@query("agg_skewness_kurtosis", oracle=SKEW_ORACLE, tags=("agg", "stats"))
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness (g1 = m3/m2^1.5) and excess kurtosis
    (m4/m2² − 3) from exact decimal raw-moment sums. The central
    moments are expanded in raw moments with the same literal
    expression tree on both engines (see module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    # l_quantity is integral (TPC-H 1..50): integer power sums are exact
    # in BIGINT on both engines (max Σq⁴ ≈ 4e13 ≪ 2^63), so the raw
    # moments are bit-identical with no decimal mediation at all.
    xb = F.col("l_quantity").cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xb).cast("double").alias("s1"),
        F.sum(xb * xb).cast("double").alias("s2"),
        F.sum(xb * xb * xb).cast("double").alias("s3"),
        F.sum(xb * xb * xb * xb).cast("double").alias("s4"),
    )
    n = F.col("n")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - F.lit(3) * mu * (s2 / n) + F.lit(2) * mu * mu * mu
    m4 = (
        s4 / n
        - F.lit(4) * mu * (s3 / n)
        + F.lit(6) * mu * mu * (s2 / n)
        - F.lit(3) * mu * mu * mu * mu
    )
    return m.select(
        "l_returnflag",
        "n",
        mu.alias("mean_qty"),
        m2.alias("m2"),
        (m3 / (m2 * F.sqrt(m2))).alias("skewness_pop"),
        (m4 / (m2 * m2) - F.lit(3)).alias("kurtosis_excess"),
    )


# --- bool_and / bool_or / bit_and / bit_or / bit_xor ---------------------

BOOLBIT_ORACLE = """
SELECT
  event_type,
  bool_and(value > 0) AS all_positive,
  bool_or(value > 900) AS any_large,
  CAST(bit_and(CAST(user_id AS BIGINT)) AS BIGINT) AS uid_bit_and,
  CAST(bit_or(CAST(user_id AS BIGINT)) AS BIGINT) AS uid_bit_or,
  CAST(bit_xor(CAST(user_id AS BIGINT)) AS BIGINT) AS uid_bit_xor
FROM events
GROUP BY event_type
"""


@query("agg_bool_bit", oracle=BOOLBIT_ORACLE, tags=("agg",))
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or and bitwise AND/OR/XOR aggregates — exact
    integer/boolean lattice operations, associative and commutative,
    so map-side partial aggregation is trivially correct at scale."""
    ev = load(spark, sf_dir, "events")
    uid = F.col("user_id").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 900).alias("any_large"),
        F.bit_and(uid).cast("bigint").alias("uid_bit_and"),
        F.bit_or(uid).cast("bigint").alias("uid_bit_or"),
        F.bit_xor(uid).cast("bigint").alias("uid_bit_xor"),
    )


# --- deterministic hash sampling -----------------------------------------

SAMPLE_ORACLE = """
SELECT
  o_orderstatus,
  COUNT(*) AS n_sampled,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sampled_price
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 20 = 0
GROUP BY o_orderstatus
"""


@query("sample_hash_deterministic", oracle=SAMPLE_ORACLE, tags=("sample", "llm"))
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~5% Bernoulli sample via a portable key hash
    (md5-prefix bucket), then a downstream aggregate.

    This is the 100 TB sampling primitive: unlike TABLESAMPLE /
    df.sample (engine- and partitioning-dependent RNG), a key-hash
    bucket is stable across engines, runs, and repartitions, so
    experiment subsets are exactly reproducible anywhere. The filter
    evaluates in the scan stage — no shuffle touches unsampled rows.
    """
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 20
    )
    from .tpch import dsum

    return (
        o.filter(bucket == 0)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_sampled"), dsum("o_totalprice").alias("sampled_price"))
    )


# --- string similarity (edit distance) -----------------------------------

LEVENSHTEIN_ORACLE = """
SELECT
  a.n_name AS name_a,
  b.n_name AS name_b,
  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist
FROM nation a
JOIN nation b ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 2
"""


@query("string_levenshtein_pairs", oracle=LEVENSHTEIN_ORACLE, tags=("string", "join"))
def string_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All near-identical name pairs by Levenshtein edit distance ≤ 2.

    Spark plans the theta-join as BroadcastNestedLoopJoin (nation is
    tiny); at scale the same operator runs as blocked fuzzy matching:
    LSH/prefix blocking first, edit distance only inside blocks —
    exactly the shape of dedup_minhash_lsh_pairs' verify stage.
    """
    n = load(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("key_a"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("key_b"), F.col("n_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, (F.col("key_a") < F.col("key_b")) & (dist <= 2))
        .select("name_a", "name_b", dist.cast("bigint").alias("edit_dist"))
    )


# --- count-min sketch (mergeable approximate counters) ---------------------

CMS_ORACLE = """
WITH rb AS (
  SELECT r.r,
         CAST(('0x' || substr(md5(r.r || ':' || event_type), 1, 8)) AS BIGINT) % 64 AS b
  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)
), sketch AS (
  SELECT r, b, COUNT(*) AS c FROM rb GROUP BY r, b
), keys AS (
  SELECT DISTINCT event_type FROM events
), probes AS (
  SELECT k.event_type, r.r,
         CAST(('0x' || substr(md5(r.r || ':' || k.event_type), 1, 8)) AS BIGINT) % 64 AS b
  FROM keys k CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)
), est AS (
  SELECT p.event_type, MIN(s.c) AS cms_est
  FROM probes p JOIN sketch s ON s.r = p.r AND s.b = p.b
  GROUP BY p.event_type
), exact AS (
  SELECT event_type, COUNT(*) AS exact_n FROM events GROUP BY event_type
)
SELECT e.event_type,
       e.exact_n,
       CAST(s.cms_est AS BIGINT) AS cms_est,
       s.cms_est >= e.exact_n AS never_underestimates
FROM exact e JOIN est s USING (event_type)
"""


@query("sketch_count_min_estimate", oracle=CMS_ORACLE, tags=("agg", "stats", "approx"))
def sketch_count_min_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) built as a
    TABLE — the mergeable-sketch shape for streaming/distributed
    frequency estimation: d=4 hash rows × w=64 buckets of exact
    partial counts (one groupBy — partials merge map-side, which is
    the entire point of a linear sketch), probed with the same
    portable md5 bucket function; estimate = min over the d rows.
    Guarantees est ≥ exact always, est ≤ exact + N/w w.h.p. — the
    never-underestimates bound is part of the checked output.

    Scale: the sketch is d×w rows REGARDLESS of input size — build is
    one map-side-combinable aggregate over the corpus, merge of two
    sketches is elementwise addition, probe cost is |keys|·d. The
    oracle runs the identical pipeline, so estimates match exactly."""
    ev = load(spark, sf_dir, "events")
    d_, w_ = 4, 64

    def bucket(r: int, col):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}:"), col)), 1, 8), 16, 10)
            .cast("bigint") % w_
        )

    rb = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), bucket(r, F.col("event_type")).alias("b")
                    )
                    for r in range(d_)
                ]
            )
        ).alias("rb")
    ).select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    sketch = rb.groupBy("r", "b").agg(F.count("*").alias("c"))
    keys = ev.select("event_type").distinct()
    probes = keys.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), bucket(r, F.col("event_type")).alias("b")
                    )
                    for r in range(d_)
                ]
            )
        ).alias("p"),
    ).select("event_type", F.col("p.r").alias("r"), F.col("p.b").alias("b"))
    est = (
        probes.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("event_type")
        .agg(F.min("c").alias("cms_est"))
    )
    exact = ev.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("never_underestimates"),
    )


# --- HyperLogLog (mergeable distinct-count sketch) --------------------------

HLL_ORACLE = """
WITH h AS (
  SELECT md5(CAST(o_custkey AS VARCHAR)) AS hx FROM orders
), bw AS (
  SELECT CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % 64 AS bucket,
         CAST(('0x' || substr(hx, 3, 14)) AS BIGINT) AS w
  FROM h
), regs AS (
  SELECT bucket, MAX(57 - length(bin(w))) AS m FROM bw GROUP BY bucket
), s AS (
  SELECT CAST(SUM(CAST(power(2, 32 - LEAST(m, 32)) AS BIGINT)) AS BIGINT)
         + (64 - COUNT(*)) * CAST(4294967296 AS BIGINT) AS denom,
         COUNT(*) AS n_regs
  FROM regs
), est AS (
  SELECT CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(denom AS DOUBLE)
           AS hll_est,
         n_regs
  FROM s
), ex AS (
  SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders
)
SELECT ex.exact_distinct,
       est.hll_est,
       est.n_regs,
       abs(est.hll_est / CAST(ex.exact_distinct AS DOUBLE) - 1.0) <= 0.35
         AS within_bound
FROM ex CROSS JOIN est
"""


@query("sketch_hll_distinct", oracle=HLL_ORACLE, tags=("agg", "stats", "approx"))
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (Flajolet et al. 2007) built as a TABLE of 64
    registers — the mergeable distinct-count sketch: md5 splits into a
    6-bit bucket and a 56-bit word whose leading-zero run (via the
    portable ``bin()``-length trick, identical in Spark and DuckDB)
    feeds a per-bucket MAX. The harmonic mean runs in exact integer
    arithmetic over a common 2^32 denominator (``SUM(2^(32-M))`` as
    BIGINT) so the only float ops are one multiply chain and one
    divide on identical operands — bit-identical across engines and
    partitionings.

    Scale: register build is one map-side-combinable MAX aggregate to
    64 rows regardless of input size; merging two sketches is an
    elementwise MAX — the shape Spark's own approx_count_distinct
    uses, here exposed as a first-class relational sketch that can be
    persisted, unioned across corpus shards, and probed later. The
    exact COUNT(DISTINCT) rides along only to make the ±35 % error
    bound (m=64 → σ≈13 %) oracle-decidable."""
    o = load(spark, sf_dir, "orders")
    hx = F.md5(F.col("o_custkey").cast("string"))
    bucket = (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % 64).alias("bucket")
    w = F.conv(F.substring(hx, 3, 14), 16, 10).cast("bigint")
    rho = (F.lit(57) - F.length(F.bin(w))).alias("rho")
    regs = o.select(bucket, rho).groupBy("bucket").agg(F.max("rho").alias("m"))
    s = regs.agg(
        (
            F.sum(
                F.pow(F.lit(2.0), (F.lit(32) - F.least(F.col("m"), F.lit(32))).cast("double"))
                .cast("bigint")
            )
            + (F.lit(64) - F.count("*")) * F.lit(4294967296).cast("bigint")
        ).alias("denom"),
        F.count("*").alias("n_regs"),
    )
    est = s.select(
        (
            F.lit(0.709) * F.lit(4096.0) * F.lit(4294967296.0)
            / F.col("denom").cast("double")
        ).alias("hll_est"),
        F.col("n_regs").cast("bigint").alias("n_regs"),
    )
    ex = o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return ex.crossJoin(F.broadcast(est)).select(
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        "hll_est",
        "n_regs",
        (
            F.abs(F.col("hll_est") / F.col("exact_distinct").cast("double") - F.lit(1.0))
            <= F.lit(0.35)
        ).alias("within_bound"),
    )


# --- fixed-bin histogram quantile sketch ------------------------------------

HIST_QUANTILE_ORACLE = """
WITH ext AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi, COUNT(*) AS n
  FROM orders
), binned AS (
  SELECT LEAST(CAST(floor((o_totalprice - ext.lo)
                          / ((ext.hi - ext.lo) / 1024.0)) AS BIGINT),
               1023) AS bin
  FROM orders CROSS JOIN ext
), hist AS (
  SELECT bin, COUNT(*) AS c FROM binned GROUP BY bin
), cum AS (
  SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum_n FROM hist
), qs AS (
  SELECT CAST(qq.q AS DOUBLE) AS quantile,
         MIN(CASE WHEN cum.cum_n
                       >= CAST(ceil(CAST(qq.q AS DOUBLE) * ext.n) AS BIGINT)
                  THEN cum.bin END) AS qbin
  FROM cum CROSS JOIN ext CROSS JOIN (VALUES (0.5), (0.9), (0.99)) qq(q)
  GROUP BY CAST(qq.q AS DOUBLE)
)
SELECT qs.quantile,
       ext.lo + (qs.qbin + 1) * ((ext.hi - ext.lo) / 1024.0) AS est,
       (ext.hi - ext.lo) / 1024.0 AS bin_width,
       ext.n AS n_rows
FROM qs CROSS JOIN ext
ORDER BY qs.quantile
"""


@query(
    "sketch_histogram_quantile",
    oracle=HIST_QUANTILE_ORACLE,
    tags=("agg", "stats", "approx", "window"),
)
def sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass mergeable quantile sketch: a 1024-bin equi-width
    histogram (extent from a 1-row broadcast, in-plan — no driver
    scalar), cumulative counts over the 1024-row sketch, and the
    p50/p90/p99 upper-edge estimates. Error is bounded by one bin
    width ((hi-lo)/1024) by construction.

    Scale: exact quantiles need a full sort (or Spark's GK sketch);
    this is ONE map-side-combinable groupBy to ≤1024 rows regardless
    of input size, and two histograms merge by adding counts — the
    shape for percentile dashboards over a 100 TB corpus. The window
    cumsum runs over the 1024-row sketch, not the data. All float ops
    (bin width, bin index, edge) are identical IEEE expressions in
    both engines, so estimates match bit-exactly."""
    o = load(spark, sf_dir, "orders")
    ext = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count("*").alias("n"),
    )
    binw = (F.col("hi") - F.col("lo")) / F.lit(1024.0)
    binned = o.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / binw).cast("bigint"),
            F.lit(1023),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    cum = hist.select(
        "bin", F.sum("c").over(Window.orderBy("bin")).alias("cum_n")
    )
    qvals = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("quantile")
    )
    qs = (
        cum.crossJoin(F.broadcast(ext))
        .crossJoin(F.broadcast(qvals))
        .groupBy("quantile")
        .agg(
            F.min(
                F.when(
                    F.col("cum_n")
                    >= F.ceil(F.col("quantile") * F.col("n")).cast("bigint"),
                    F.col("bin"),
                )
            ).alias("qbin")
        )
    )
    return (
        qs.crossJoin(F.broadcast(ext))
        .select(
            "quantile",
            (F.col("lo") + (F.col("qbin") + 1) * binw).alias("est"),
            binw.alias("bin_width"),
            F.col("n").cast("bigint").alias("n_rows"),
        )
        .orderBy("quantile")
    )


# --- HLL sketch MERGE over time --------------------------------------------

HLL_CUM_ORACLE = """
WITH h AS (
  SELECT date_trunc('day', ts) AS day, md5(CAST(event_id AS VARCHAR)) AS hx
  FROM events
), bw AS (
  SELECT day,
         CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % 64 AS bucket,
         57 - length(bin(CAST(('0x' || substr(hx, 3, 14)) AS BIGINT))) AS rho
  FROM h
), daily AS (
  SELECT day, bucket, MAX(rho) AS m FROM bw GROUP BY day, bucket
), grid AS (
  SELECT d.day, b.bucket
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) b
), cum AS (
  SELECT g.day, g.bucket,
         MAX(dl.m) OVER (PARTITION BY g.bucket ORDER BY g.day) AS m_cum
  FROM grid g LEFT JOIN daily dl ON dl.day = g.day AND dl.bucket = g.bucket
), per_day AS (
  SELECT day,
         CAST(SUM(CAST(power(2, 32 - LEAST(COALESCE(m_cum, 0), 32)) AS BIGINT)) AS BIGINT) AS denom,
         COUNT(m_cum) AS n_regs
  FROM cum GROUP BY day
), est AS (
  SELECT day,
         CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(denom AS DOUBLE)
           AS hll_cum_est,
         n_regs
  FROM per_day
), daily_n AS (
  SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT event_id) AS dn
  FROM events GROUP BY date_trunc('day', ts)
), exact_cum AS (
  SELECT day, CAST(SUM(dn) OVER (ORDER BY day) AS BIGINT) AS exact_cum_n
  FROM daily_n
)
SELECT CAST(CAST(e.day AS TIMESTAMP) AS VARCHAR) AS day_str,
       x.exact_cum_n,
       e.hll_cum_est,
       e.n_regs,
       x.exact_cum_n < 256
       OR abs(e.hll_cum_est / CAST(x.exact_cum_n AS DOUBLE) - 1.0) <= 0.35
         AS bound_ok
FROM est e JOIN exact_cum x ON x.day = e.day
"""


@query(
    "sketch_hll_daily_cumulative",
    oracle=HLL_CUM_ORACLE,
    tags=("agg", "stats", "approx", "window"),
)
def sketch_hll_daily_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POINT of a mergeable sketch, demonstrated: per-day HLL
    register tables (64 rows/day) merged CUMULATIVELY — a running
    cumulative MAX per register over days — give distinct-events-to-
    date for every day from one pass over each day's data, no re-scan
    of history. This is the dashboard/shard-union shape: persist each
    partition's registers, answer any union's cardinality later by an
    elementwise MAX.

    Raw HLL (no linear-counting small-range correction — that needs
    libm log, banned repo-wide for cross-engine determinism) is only
    quotable above ~4m; bound_ok therefore gates the ±35 % check to
    days with exact ≥ 256 (the estimate itself is still emitted and
    hash-compared on every row). Exact cumulative counts ride along
    via a window cumsum of per-day distincts (event ids are unique,
    so daily distincts sum exactly).

    Scale: register build is one (day, bucket) aggregate; the merge
    works on the days×64 grid — constant width regardless of event
    volume."""
    ev = load(spark, sf_dir, "events")
    hx = F.md5(F.col("event_id").cast("string"))
    day = F.date_trunc("day", "ts")
    bw = ev.select(
        day.alias("day"),
        (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % 64).alias("bucket"),
        (F.lit(57) - F.length(F.bin(F.conv(F.substring(hx, 3, 14), 16, 10).cast("bigint"))))
        .alias("rho"),
    )
    daily = bw.groupBy("day", "bucket").agg(F.max("rho").alias("m"))
    days = daily.select("day").distinct()
    buckets = spark.range(64).select(F.col("id").alias("bucket"))
    grid = days.crossJoin(F.broadcast(buckets))
    cum = (
        grid.join(daily, ["day", "bucket"], "left")
        .select(
            "day",
            "bucket",
            F.max("m")
            .over(Window.partitionBy("bucket").orderBy("day"))
            .alias("m_cum"),
        )
    )
    per_day = cum.groupBy("day").agg(
        F.sum(
            F.pow(
                F.lit(2.0),
                (F.lit(32) - F.least(F.coalesce(F.col("m_cum"), F.lit(0)), F.lit(32)))
                .cast("double"),
            ).cast("bigint")
        ).cast("bigint").alias("denom"),
        F.count("m_cum").alias("n_regs"),
    )
    est = per_day.select(
        "day",
        (
            F.lit(0.709) * F.lit(4096.0) * F.lit(4294967296.0)
            / F.col("denom").cast("double")
        ).alias("hll_cum_est"),
        F.col("n_regs").cast("bigint").alias("n_regs"),
    )
    daily_n = ev.groupBy(day.alias("day")).agg(F.countDistinct("event_id").alias("dn"))
    exact_cum = daily_n.select(
        "day",
        F.sum("dn").over(Window.orderBy("day")).cast("bigint").alias("exact_cum_n"),
    )
    return est.join(exact_cum, "day").select(
        F.col("day").cast("string").alias("day_str"),
        "exact_cum_n",
        "hll_cum_est",
        "n_regs",
        (
            (F.col("exact_cum_n") < 256)
            | (
                F.abs(
                    F.col("hll_cum_est") / F.col("exact_cum_n").cast("double")
                    - F.lit(1.0)
                )
                <= F.lit(0.35)
            )
        ).alias("bound_ok"),
    )


# --- Gini impurity (log-free distribution concentration) -------------------

GINI_ORACLE = """
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), t AS (
  SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS total,
         CAST(SUM(n * n) AS BIGINT) AS sum_sq
  FROM c GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       total AS n_orders,
       1.0e0 - CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
         AS gini_impurity
FROM t
"""


@query("agg_gini_impurity", oracle=GINI_ORACLE, tags=("agg", "stats"))
def agg_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity (1 − Σp²) of the order-status distribution per
    priority — the decision-tree split criterion and the log-FREE
    concentration measure (entropy needs libm log, banned repo-wide
    for cross-engine determinism; Gini ranks distributions the same
    way for this use). Exact BIGINT count and count² sums; the single
    final division runs on identical operands in both engines.

    Scale: two stacked map-side-combinable aggregates (cell counts,
    then per-group moments) — one shuffle carries cells, the second
    only |priorities| rows."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("n"))
    t = c.groupBy("o_orderpriority").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
    )
    return t.select(
        "o_orderpriority",
        F.col("total").alias("n_orders"),
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double"))
        ).alias("gini_impurity"),
    )


# --- grouped histogram quantiles -------------------------------------------

GROUPED_QUANTILE_ORACLE = """
WITH ext AS (
  SELECT o_orderpriority AS grp, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
), binned AS (
  SELECT e.grp,
         LEAST(CAST(floor((o.o_totalprice - e.lo) / ((e.hi - e.lo) / 256.0)) AS BIGINT),
               255) AS bin
  FROM orders o JOIN ext e ON e.grp = o.o_orderpriority
), hist AS (
  SELECT grp, bin, COUNT(*) AS c FROM binned GROUP BY grp, bin
), cum AS (
  SELECT grp, bin, SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS cum_n FROM hist
), qs AS (
  SELECT cum.grp, CAST(qq.q AS DOUBLE) AS quantile,
         MIN(CASE WHEN cum.cum_n >= CAST(ceil(CAST(qq.q AS DOUBLE) * e.n) AS BIGINT)
                  THEN cum.bin END) AS qbin
  FROM cum JOIN ext e ON e.grp = cum.grp
  CROSS JOIN (VALUES (0.5), (0.95)) qq(q)
  GROUP BY cum.grp, CAST(qq.q AS DOUBLE)
)
SELECT qs.grp AS o_orderpriority, qs.quantile,
       e.lo + (qs.qbin + 1) * ((e.hi - e.lo) / 256.0) AS est,
       (e.hi - e.lo) / 256.0 AS bin_width,
       CAST(e.n AS BIGINT) AS n_rows
FROM qs JOIN ext e ON e.grp = qs.grp
"""


@query(
    "sketch_histogram_grouped_quantiles",
    oracle=GROUPED_QUANTILE_ORACLE,
    tags=("agg", "stats", "approx", "window"),
)
def sketch_histogram_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 PER GROUP via per-group 256-bin histograms — the
    percentile-by-dimension dashboard query, done as grouped mergeable
    sketches instead of per-group sorts: each group gets its own
    extent (one rollup, broadcast back), bins fill in one
    map-side-combinable (group, bin) aggregate, and the window cumsum
    walks the ≤256-row-per-group sketch. Error ≤ one per-group bin
    width by construction.

    Scale: exact grouped percentiles re-sort every group's rows;
    this is two small-keyed aggregates + a sketch-sized window at any
    data size, and per-group histograms merge by adding counts (the
    same property the global sketch_histogram_quantile exploits)."""
    o = load(spark, sf_dir, "orders")
    ext = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count("*").alias("n"),
    )
    binw = (F.col("hi") - F.col("lo")) / F.lit(256.0)
    binned = o.join(
        F.broadcast(ext), o.o_orderpriority == ext.grp
    ).select(
        "grp",
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / binw).cast("bigint"),
            F.lit(255),
        ).alias("bin"),
    )
    hist = binned.groupBy("grp", "bin").agg(F.count("*").alias("c"))
    cum = hist.select(
        "grp", "bin",
        F.sum("c").over(Window.partitionBy("grp").orderBy("bin")).alias("cum_n"),
    )
    qvals = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.95))).alias("quantile")
    )
    qs = (
        cum.join(F.broadcast(ext), "grp")
        .crossJoin(F.broadcast(qvals))
        .groupBy("grp", "quantile")
        .agg(
            F.min(
                F.when(
                    F.col("cum_n")
                    >= F.ceil(F.col("quantile") * F.col("n")).cast("bigint"),
                    F.col("bin"),
                )
            ).alias("qbin")
        )
    )
    return qs.join(F.broadcast(ext), "grp").select(
        F.col("grp").alias("o_orderpriority"),
        "quantile",
        (F.col("lo") + (F.col("qbin") + 1) * binw).alias("est"),
        binw.alias("bin_width"),
        F.col("n").cast("bigint").alias("n_rows"),
    )


# --- distribution-drift monitor (chi-square, log-free) ---------------------

DRIFT_ORACLE = """
WITH ext AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
), binned AS (
  SELECT o_orderkey % 2 AS half,
         LEAST(CAST(floor((o_totalprice - ext.lo)
                          / ((ext.hi - ext.lo) / 64.0)) AS BIGINT), 63) AS bin
  FROM orders CROSS JOIN ext
), cells AS (
  SELECT bin,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS n_ref,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref, CAST(SUM(n_cur) AS BIGINT) AS t_cur
  FROM cells
), terms AS (
  SELECT c.bin,
         CASE WHEN c.n_ref + c.n_cur > 0 THEN
           CAST(floor(
             (CAST(c.n_cur AS DOUBLE) * t.t_ref - CAST(c.n_ref AS DOUBLE) * t.t_cur)
             * (CAST(c.n_cur AS DOUBLE) * t.t_ref - CAST(c.n_ref AS DOUBLE) * t.t_cur)
             / (CAST(c.n_ref + c.n_cur AS DOUBLE)
                * CAST(t.t_ref AS DOUBLE) * CAST(t.t_cur AS DOUBLE))
             * 1000000000.0 + 0.5) AS BIGINT)
         ELSE 0 END AS term_q,
         t.t_ref, t.t_cur
  FROM cells c CROSS JOIN tot t
)
SELECT
  CAST(CAST(SUM(term_q) AS BIGINT) AS DOUBLE) / 1000000000.0 AS chi_square,
  CAST(COUNT(*) FILTER (WHERE term_q IS NOT NULL AND t_ref + t_cur > 0) - 1 AS BIGINT)
    AS dof,
  t_ref, t_cur
FROM terms
GROUP BY t_ref, t_cur
"""


@query("stats_drift_chi_square", oracle=DRIFT_ORACLE, tags=("stats", "agg", "approx"))
def stats_drift_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: Pearson chi-square between two
    cohorts' order-value histograms (here the even/odd orderkey halves
    — identically distributed, so the statistic lands ≈ its dof, the
    calibrated no-drift baseline). The ML-ops shift detector in its
    log-FREE form: PSI/KL need libm log (banned repo-wide); chi-square
    ranks drifts comparably from pure count arithmetic.

    Determinism: each bin's term is one double expression over exact
    integer counts, quantized to nano-units before the cross-partition
    sum (the repo's quantized-sum rule — a raw double Σ over 64 bins
    would be partition-order dependent). Scale: one shared-extent
    histogram pass (map-side combinable), then 64-row arithmetic."""
    o = load(spark, sf_dir, "orders")
    ext = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    binw = (F.col("hi") - F.col("lo")) / F.lit(64.0)
    binned = o.crossJoin(F.broadcast(ext)).select(
        (F.col("o_orderkey") % 2).alias("half"),
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / binw).cast("bigint"),
            F.lit(63),
        ).alias("bin"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.when(F.col("half") == 0, 1)).cast("bigint").alias("n_ref"),
        F.count(F.when(F.col("half") == 1, 1)).cast("bigint").alias("n_cur"),
    )
    tot = cells.agg(
        F.sum("n_ref").cast("bigint").alias("t_ref"),
        F.sum("n_cur").cast("bigint").alias("t_cur"),
    )
    d = F.col("n_cur").cast("double") * F.col("t_ref") - F.col("n_ref").cast("double") * F.col("t_cur")
    term = (
        d * d
        / (
            (F.col("n_ref") + F.col("n_cur")).cast("double")
            * F.col("t_ref").cast("double")
            * F.col("t_cur").cast("double")
        )
    )
    terms = cells.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.col("n_ref") + F.col("n_cur") > 0,
            F.floor(term * F.lit(1000000000.0) + F.lit(0.5)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")).alias("term_q"),
        "t_ref",
        "t_cur",
    )
    return terms.groupBy("t_ref", "t_cur").agg(
        (F.sum("term_q").cast("bigint").cast("double") / F.lit(1000000000.0)).alias("chi_square"),
        (F.count(F.when(F.col("term_q").isNotNull() & (F.col("t_ref") + F.col("t_cur") > 0), 1)) - 1)
        .cast("bigint")
        .alias("dof"),
    ).select("chi_square", "dof", "t_ref", "t_cur")


# --- grouped HLL ----------------------------------------------------------

HLL_GROUPED_ORACLE = """
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events
), bw AS (
  SELECT event_type,
         CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % 64 AS bucket,
         57 - length(bin(CAST(('0x' || substr(hx, 3, 14)) AS BIGINT))) AS rho
  FROM h
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS m FROM bw GROUP BY event_type, bucket
), s AS (
  SELECT event_type,
         CAST(SUM(CAST(power(2, 32 - LEAST(m, 32)) AS BIGINT)) AS BIGINT)
         + (64 - COUNT(*)) * CAST(4294967296 AS BIGINT) AS denom,
         COUNT(*) AS n_regs
  FROM regs GROUP BY event_type
), ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT s.event_type,
       ex.exact_distinct,
       CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(s.denom AS DOUBLE)
         AS hll_est,
       CAST(s.n_regs AS BIGINT) AS n_regs,
       ex.exact_distinct < 256
       OR abs((CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(s.denom AS DOUBLE))
              / CAST(ex.exact_distinct AS DOUBLE) - 1.0) <= 0.35 AS bound_ok
FROM s JOIN ex ON ex.event_type = s.event_type
"""


@query("sketch_hll_grouped", oracle=HLL_GROUPED_ORACLE, tags=("agg", "stats", "approx"))
def sketch_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users PER EVENT TYPE as grouped HLL sketches — the
    group-by-dimension cardinality dashboard, in O(64) state per group
    instead of a distinct per group. Completes the sketch family's
    symmetry: global (sketch_hll_distinct), time-merged
    (sketch_hll_daily_cumulative), streaming
    (stream_hll_distinct_events), and grouped. Same exact-integer
    estimate arithmetic; bound gated to the raw-HLL quotable regime."""
    ev = load(spark, sf_dir, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    bw = ev.select(
        "event_type",
        (F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint") % 64).alias("bucket"),
        (F.lit(57) - F.length(F.bin(F.conv(F.substring(hx, 3, 14), 16, 10).cast("bigint"))))
        .alias("rho"),
    )
    regs = bw.groupBy("event_type", "bucket").agg(F.max("rho").alias("m"))
    s = regs.groupBy("event_type").agg(
        (
            F.sum(
                F.pow(F.lit(2.0), (F.lit(32) - F.least(F.col("m"), F.lit(32))).cast("double"))
                .cast("bigint")
            )
            + (F.lit(64) - F.count("*")) * F.lit(4294967296).cast("bigint")
        ).alias("denom"),
        F.count("*").alias("n_regs"),
    )
    ex = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_distinct"))
    est = (
        F.lit(0.709) * F.lit(4096.0) * F.lit(4294967296.0)
        / F.col("denom").cast("double")
    )
    return s.join(ex, "event_type").select(
        "event_type",
        "exact_distinct",
        est.alias("hll_est"),
        F.col("n_regs").cast("bigint").alias("n_regs"),
        (
            (F.col("exact_distinct") < 256)
            | (
                F.abs(est / F.col("exact_distinct").cast("double") - F.lit(1.0))
                <= F.lit(0.35)
            )
        ).alias("bound_ok"),
    )


# --- Kolmogorov–Smirnov drift ---------------------------------------------

KS_ORACLE = """
WITH s AS (
  SELECT value,
    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS a,
    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS b
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY value
), c AS (
  SELECT value,
    CAST(SUM(a) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
    CAST(SUM(b) OVER (ORDER BY value
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
  FROM s
), n AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2 FROM s
)
SELECT n1, n2, CAST(MAX(abs(ca * n2 - cb * n1)) AS BIGINT) AS d_num,
  CAST(CAST(MAX(abs(ca * n2 - cb * n1)) AS BIGINT) AS DOUBLE)
    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d,
  CAST(MAX(abs(ca * n2 - cb * n1)) AS BIGINT) * 20 > n1 * n2 AS drifted
FROM c CROSS JOIN n
GROUP BY n1, n2
"""


@query("stats_drift_ks", oracle=KS_ORACLE, tags=("stats", "agg"))
def stats_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the
    'click' and 'purchase' value distributions — the nonparametric
    companion to stats_drift_chi_square: no binning choice, sensitive
    to ANY distributional difference (location, scale, shape), and,
    like the rest of the repo's monitors, libm-free.

    Exactness: D = max_x |F1(x) − F2(x)| is evaluated CROSS-MULTIPLIED
    — d_num = max |c1(x)·n2 − c2(x)·n1| over exact BIGINT cumulative
    counts, so the max is integer arithmetic and partitioning-
    independent; the only float op is the final division by n1·n2.
    The drift flag (D > 0.05) compares integers (d_num·20 > n1·n2),
    so the verdict itself never touches a double.

    Scale: the ECDF window runs over the DISTINCT-value table, not the
    raw events — bounded by value cardinality. For unbounded-
    cardinality streams, bin first (sketch_histogram_quantile is the
    mergeable-sketch scale path; KS over the 1024-bin sketch bounds
    the exact statistic within one bin's mass). The cohort totals stay
    in-plan as a 1-row broadcast (no driver scalar)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("bigint").alias("a"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).cast("bigint").alias("b"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = s.select(
        F.sum("a").over(w).cast("bigint").alias("ca"),
        F.sum("b").over(w).cast("bigint").alias("cb"),
    )
    n = s.agg(
        F.sum("a").cast("bigint").alias("n1"), F.sum("b").cast("bigint").alias("n2")
    )
    gap = F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1"))
    return (
        c.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(F.max(gap).cast("bigint").alias("d_num"))
        .select(
            "n1",
            "n2",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_d"),
            (F.col("d_num") * 20 > F.col("n1") * F.col("n2")).alias("drifted"),
        )
    )


# --- bloom membership sketch ----------------------------------------------

BLOOM_ORACLE = """
WITH keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), probes AS (
  SELECT k, i,
    CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1 + 8 * i, 8)) AS BIGINT)
      % 63488 AS p
  FROM keys, (SELECT unnest([0, 1, 2, 3]) AS i)
), regs AS (
  SELECT p // 62 AS idx, CAST(bit_or(1::BIGINT << (p % 62)) AS BIGINT) AS reg
  FROM probes GROUP BY 1
), cand AS (
  SELECT c.c_custkey,
    CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)), 1 + 8 * i.i, 8))
      AS BIGINT) % 63488 AS p
  FROM customer c, (SELECT unnest([0, 1, 2, 3]) AS i) i
), hit AS (
  SELECT c_custkey,
    CAST(bool_and(((COALESCE(r.reg, 0) >> (cand.p % 62)) & 1) = 1) AS BOOLEAN)
      AS bloom_pos
  FROM cand LEFT JOIN regs r ON r.idx = cand.p // 62
  GROUP BY c_custkey
), truth AS (
  SELECT h.c_custkey, h.bloom_pos, (k.k IS NOT NULL) AS exact_member
  FROM hit h LEFT JOIN keys k ON k.k = h.c_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(COUNT(*) FILTER (WHERE exact_member) AS BIGINT) AS n_members,
  CAST(COUNT(*) FILTER (WHERE bloom_pos) AS BIGINT) AS n_bloom_pos,
  CAST(COUNT(*) FILTER (WHERE bloom_pos AND NOT exact_member) AS BIGINT)
    AS n_false_pos,
  CAST(COUNT(*) FILTER (WHERE exact_member AND NOT bloom_pos) AS BIGINT) = 0
    AS no_false_negatives
FROM truth
"""


@query("sketch_bloom_membership", oracle=BLOOM_ORACLE, tags=("stats", "agg", "approx"))
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a RELATIONAL sketch — 1024 rows of (register
    idx, 62-bit BIGINT; ~8 KiB), k=4 md5-derived probes per key — built over the
    custkeys present in orders, probed by every customer, and audited
    against exact membership. Completes the sketch family's coverage
    of the four streaming questions: cardinality (HLL), frequency
    (count-min), quantiles (histogram), and now MEMBERSHIP.

    Exactness: construction and probing are pure integer bit algebra
    (bit positions from md5 substrings, registers OR-merged — 62 bits
    per register because a 1<<63 BIGINT shift is an overflow error in
    DuckDB), so the sketch is bit-identical across engines; the
    no-false-negatives invariant is STRUCTURAL (OR-merge can only add
    bits) and the oracle asserts it as a boolean column.

    Scale: the register build is one map-side-combining aggregate to
    ≤1024 rows — mergeable across shards/days exactly like the HLL
    tables (bit_or is associative-commutative); probing joins each
    candidate's 4 probe rows against the ≤1024-row broadcast. This is
    the relational form of the runtime bloom pruning Spark itself
    injects (pinned in test_plan_contracts)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    idx4 = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")

    def pos(key_col):
        return (
            F.conv(
                F.substring(F.md5(key_col.cast("string")), F.lit(1) + F.lit(8) * F.col("i"), 8),
                16,
                10,
            ).cast("bigint")
            % 63488
        )

    keys = o.select(F.col("o_custkey").alias("k")).distinct()
    probes = keys.select("k", idx4).select("k", pos(F.col("k")).alias("p"))
    regs = (
        probes.groupBy(F.expr("p DIV 62").alias("idx"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 62 AS INT)))").alias("reg"))
    )
    cand = c.select(F.col("c_custkey"), idx4).select(
        "c_custkey", pos(F.col("c_custkey")).alias("p")
    )
    # LEFT join: a probe landing in a never-set register must refute
    # membership (reg absent => bit unset => bloom_pos false), not be
    # silently dropped by an inner join before the bool_and.
    hit = (
        cand.join(F.broadcast(regs), F.expr("idx = p DIV 62"), "left")
        .groupBy("c_custkey")
        .agg(
            F.expr(
                "bool_and(((coalesce(reg, CAST(0 AS BIGINT)) >> CAST(p % 62 AS INT)) & 1) = 1)"
            ).alias("bloom_pos")
        )
    )
    truth = hit.join(keys, hit["c_custkey"] == keys["k"], "left").select(
        "c_custkey", "bloom_pos", F.col("k").isNotNull().alias("exact_member")
    )
    return truth.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.count(F.when(F.col("exact_member"), 1)).cast("bigint").alias("n_members"),
        F.count(F.when(F.col("bloom_pos"), 1)).cast("bigint").alias("n_bloom_pos"),
        F.count(F.when(F.col("bloom_pos") & ~F.col("exact_member"), 1))
        .cast("bigint")
        .alias("n_false_pos"),
        (
            F.count(F.when(F.col("exact_member") & ~F.col("bloom_pos"), 1)).cast("bigint")
            == F.lit(0)
        ).alias("no_false_negatives"),
    )


# --- HLL set intersection -------------------------------------------------

HLL_INTERSECT_ORACLE = """
WITH m AS (
  SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS s,
         md5(CAST(user_id AS VARCHAR)) AS hx
  FROM events WHERE event_type IN ('click', 'purchase')
), bw AS (
  SELECT s, CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % 64 AS bucket,
         57 - length(bin(CAST(('0x' || substr(hx, 3, 14)) AS BIGINT))) AS rho
  FROM m
), regs AS (
  SELECT s, bucket, MAX(rho) AS mr FROM bw GROUP BY s, bucket
), alls AS (
  SELECT s, bucket, mr FROM regs
  UNION ALL
  SELECT 'u', bucket, MAX(mr) FROM regs GROUP BY bucket
), den AS (
  SELECT s,
    CAST(SUM(CAST(power(2, 32 - LEAST(mr, 32)) AS BIGINT)) AS BIGINT)
      + (64 - COUNT(*)) * CAST(4294967296 AS BIGINT) AS denom
  FROM alls GROUP BY s
), est AS (
  SELECT s,
    CAST(0.709 AS DOUBLE) * 4096.0 * 4294967296.0 / CAST(denom AS DOUBLE) AS e
  FROM den
), piv AS (
  SELECT MAX(CASE WHEN s = 'a' THEN e END) AS est_a,
         MAX(CASE WHEN s = 'b' THEN e END) AS est_b,
         MAX(CASE WHEN s = 'u' THEN e END) AS est_u
  FROM est
), ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY user_id
  ) t WHERE ca = 1 AND cb = 1
)
SELECT ex.exact_inter,
  piv.est_a + piv.est_b - piv.est_u AS inter_est,
  piv.est_u AS union_est,
  abs((piv.est_a + piv.est_b - piv.est_u) - CAST(ex.exact_inter AS DOUBLE))
    <= 0.25e0 * (piv.est_a + piv.est_b) + 64.0e0 AS within_bound
FROM ex CROSS JOIN piv
"""


@query(
    "sketch_hll_set_intersection",
    oracle=HLL_INTERSECT_ORACLE,
    tags=("agg", "stats", "approx"),
)
def sketch_hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from SKETCHES ALONE: clickers ∩
    purchasers by inclusion–exclusion over three HLLs — A, B, and
    their union (an elementwise register MAX, the merge that makes
    persisted per-segment sketches composable without re-reading
    either segment). The set-algebra closure of the sketch family:
    HLLs answer |A|, |B|, |A∪B| natively and |A∩B| falls out as
    est_a + est_b − est_u.

    Exactness: registers and denominators are the global-HLL integer
    pipeline (bit-identical across engines); the three estimates and
    the inclusion–exclusion are one fixed sequence of IEEE ops on
    identical operands. Intersection error compounds the three
    sketches' σ (the known weakness of I–E on small overlaps), so the
    oracle-decidable bound is deliberately loose — |err| ≤
    0.25·(est_a+est_b) + 64 — and the exact overlap rides along to
    decide it.

    Scale: one pass builds both register sets (map-side-combining MAX
    to ≤128 rows), the union sketch derives from those 128 rows, and
    the exact-overlap audit is one user-key aggregate — at production
    scale the audit drops and ONLY the ≤128-row sketch tables need
    to exist."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    m = ev.select(
        F.when(F.col("event_type") == "click", "a").otherwise("b").alias("s"),
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    )
    bucket = (F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint") % 64).alias("bucket")
    rho = (
        F.lit(57) - F.length(F.bin(F.conv(F.substring("hx", 3, 14), 16, 10).cast("bigint")))
    ).alias("rho")
    regs = m.select("s", bucket, rho).groupBy("s", "bucket").agg(F.max("rho").alias("mr"))
    uregs = (
        regs.groupBy("bucket")
        .agg(F.max("mr").alias("mr"))
        .select(F.lit("u").alias("s"), "bucket", "mr")
    )
    alls = regs.select("s", "bucket", "mr").union(uregs)
    den = alls.groupBy("s").agg(
        (
            F.sum(
                F.pow(F.lit(2.0), (F.lit(32) - F.least(F.col("mr"), F.lit(32))).cast("double"))
                .cast("bigint")
            )
            + (F.lit(64) - F.count("*")) * F.lit(4294967296).cast("bigint")
        ).alias("denom")
    )
    est = den.select(
        "s",
        (
            F.lit(0.709) * F.lit(4096.0) * F.lit(4294967296.0)
            / F.col("denom").cast("double")
        ).alias("e"),
    )
    piv = est.agg(
        F.max(F.when(F.col("s") == "a", F.col("e"))).alias("est_a"),
        F.max(F.when(F.col("s") == "b", F.col("e"))).alias("est_b"),
        F.max(F.when(F.col("s") == "u", F.col("e"))).alias("est_u"),
    )
    ex = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("ca"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("cb"),
        )
        .filter((F.col("ca") == 1) & (F.col("cb") == 1))
        .agg(F.count("*").cast("bigint").alias("exact_inter"))
    )
    inter = F.col("est_a") + F.col("est_b") - F.col("est_u")
    return ex.crossJoin(F.broadcast(piv)).select(
        "exact_inter",
        inter.alias("inter_est"),
        F.col("est_u").alias("union_est"),
        (
            F.abs(inter - F.col("exact_inter").cast("double"))
            <= F.lit(0.25) * (F.col("est_a") + F.col("est_b")) + F.lit(64.0)
        ).alias("within_bound"),
    )
