"""Similarity search over embedding columns (SURVEY.md §2C):
brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
approximate variant as the scale path.

Embeddings are ``array<float>`` columns. All dot products are computed
with ``F.zip_with`` + ``F.aggregate`` over doubles — JVM-side, and
(verified) bit-identical to DuckDB's sequential ``list_sum`` reduction,
which is what makes the brute-force entry oracle-checkable.

Scale design:
- brute force is O(|Q|·|C|) — exact, used for small query sets and as
  the verifier/recall-oracle for the approximate path.
- the LSH path buckets vectors by random-hyperplane sign signatures
  (signatures per-row, no shuffle; probes only same-bucket candidates).
  At 100 TB the candidate join shuffles on the bucket key; recall is
  tuned by (n_planes, n_tables).
"""

from __future__ import annotations

import math as _math
from typing import NamedTuple

from pyspark import StorageLevel
from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load, query
from ..session import scoped_persist

# Storage levels for the PQ interpreted-HOF persist barriers (the
# distance-table / codes subtrees that MUST cache — a repartition
# barrier does not survive RepartitionByExpression projection
# pushdown, see pq_adc_topk). Module-level so
# scripts/retime_ivfpq_ab.py can A/B levels in ONE session.
#
# Split by what the barrier holds (VERDICT r5 #4): the CODES side
# grows ∝ corpus — SCALE.md's standing rule is that pinning executor
# heap ∝ corpus is a tax at 100 TB — so it caches DISK_ONLY
# (serialized, off the GC heap). The r6 A/B run set a nonexistent
# attribute and measured nothing (ADVICE r6); the FIXED script
# (r7, 2×7 interleaved runs, sf0.1, each arm actually driving
# PQ_CODES_STORAGE) measured DISK_ONLY median 2.649 s vs
# MEMORY_AND_DISK 2.700 s — the scale-safe level is locally free,
# now for real. The QUERY side is bounded (|queries| × m·k doubles)
# and stays on the default level. The r5 11 s GC-tail outlier has
# not reproduced in any A/B session — box noise, not a plan
# property.
PQ_CODES_STORAGE = StorageLevel.DISK_ONLY
PQ_QUERY_STORAGE = StorageLevel.MEMORY_AND_DISK


def _pq_barrier(df: DataFrame, corpus: bool = False) -> DataFrame:
    return scoped_persist(df, PQ_CODES_STORAGE if corpus else PQ_QUERY_STORAGE)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine over two list expressions, folded in the same
    left-to-right double sequence as the Spark HOF ``cosine`` — proven
    bit-identical by the brute-force entry's driver hash match."""

    def sq(v: str) -> str:
        return f"list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) "
        f"/ (sqrt({sq(a)}) * sqrt({sq(b)}))"
    )


def topk_bruteforce(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).
    Cross join + per-query window; ties broken by candidate id."""
    # Norms are precomputed per side (|Q|+|C| norm evaluations instead
    # of 2·|Q|·|C| inside the cross join); the value is IEEE-identical
    # to computing them per pair, so oracle parity is unaffected.
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = candidates_df.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    # Broadcast the QUERY side, stream the corpus (r11 audit): the
    # linear scan is the declared cost of this oracle-tier baseline,
    # but which side the nested loop BUILDS is still a scale choice —
    # without the pin, the local threshold broadcast the corpus-sized
    # candidate table, the one side that must never be resident.
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 20 = 0
),
scored AS (
  SELECT
    q.query_id,
    c.vec_id AS cand_id,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      AS cos_sim
  FROM q JOIN embeddings c ON c.vec_id != q.query_id
)
SELECT query_id, cand_id, cos_sim, rnk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rnk
  FROM scored
) t
WHERE rnk <= 10
"""


@query("similarity_topk_bruteforce", oracle=TOPK_ORACLE, tags=("similarity", "llm", "flagship"))
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for a 5% query sample against the full
    embedding table."""
    emb = load(spark, sf_dir, "embeddings")
    return topk_bruteforce(emb.filter(F.col("vec_id") % 20 == 0), emb, k=10)


def _hyperplane(dim: int, plane: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: components
    derived from a hash of (table, plane, dim index). Deterministic so
    signatures are reproducible across runs and executors — no RNG
    state shipped to workers."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).digest()
        v = int.from_bytes(h[:8], "big", signed=True) / 2**63
        comps.append(v)
    return comps


def lsh_topk(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing, probe only
    same-bucket candidates, exact cosine re-rank within the bucket.

    Recall vs brute force is a function of (n_planes, n_tables);
    tests/test_similarity.py asserts it on the driver corpus. At scale
    each table's bucket join is a shuffle on (table, signature) — no
    cross join anywhere."""
    planes = [
        [_hyperplane(dim, p, t) for p in range(n_planes)] for t in range(n_tables)
    ]

    def signature_sql(t: int) -> str:
        # ONE F.expr per table (see pq_encode PERF note: building the
        # 8×64 literals through Column calls costs thousands of py4j
        # round trips — ~7 s of driver time per plan; even the SQL-text
        # parse is ~0.5 s per expression, so the four table expressions
        # are built ONCE against a standardized column name and reused
        # by both join sides). Identical arithmetic/order to the
        # previous per-plane Column form and to the DuckDB oracle, so
        # signatures are value-identical.
        planes_lit = (
            "array("
            + ",".join(
                "array(" + ",".join(f"{v!r}D" for v in planes[t][p]) + ")"
                for p in range(n_planes)
            )
            + ")"
        )
        return (
            f"concat('{t}:', concat_ws('', transform({planes_lit}, pl -> "
            f"CAST(CAST(aggregate(zip_with(__vec, pl, "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            f"(a, b) -> a + b) > 0 AS INT) AS STRING))))"
        )

    sigs_arr = F.array(*[F.expr(signature_sql(t)) for t in range(n_tables)])

    def with_sigs(df: DataFrame, idname: str, vecname: str) -> DataFrame:
        return (
            df.withColumnRenamed(vecname, "__vec")
            .select(idname, "__vec", F.explode(sigs_arr).alias("sig"))
            .withColumnRenamed("__vec", vecname)
        )

    q = with_sigs(
        queries_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id",
        "qv",
    )
    c = with_sigs(
        candidates_df.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")),
        "cand_id",
        "cv",
    )
    # The bucket join SHUFFLES on sig, as the docstring promises — the
    # r11 audit caught the local threshold silently broadcasting the
    # corpus-side signature table instead (corpus-sized build, the
    # wrong 100-TB shape). shuffle_hash on the query side makes the
    # per-partition build the |Q|-share of each sig partition.
    cand = (
        q.hint("shuffle_hash")
        .join(c, "sig")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "qv", "cand_id", "cv")
        .distinct()
    )
    scored = cand.select(
        "query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


def _lsh_ann_oracle(n_planes: int = 8, n_tables: int = 4, dim: int = 64, k: int = 10) -> str:
    """DuckDB oracle running the IDENTICAL LSH algorithm: the
    hyperplanes are deterministic md5-derived floats computed driver-
    side and inlined as literals in BOTH plans (repr round-trips
    doubles exactly), and the dot-product fold order matches the Spark
    HOF (bit-identical per the brute-force entry), so every signature
    bit — and therefore every bucket, candidate, and ranked result —
    agrees across engines."""

    def dot(vec: str, plane: list[float]) -> str:
        lits = ", ".join(repr(v) for v in plane)
        return (
            f"list_sum(list_transform(list_zip({vec}, [{lits}]), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        )

    sigs = []
    for t in range(n_tables):
        bits = " || ".join(
            f"(CASE WHEN {dot('embedding', _hyperplane(dim, p, t))} > 0 "
            f"THEN '1' ELSE '0' END)"
            for p in range(n_planes)
        )
        sigs.append(f"'{t}:' || {bits}")
    sig_list = ",\n    ".join(sigs)
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, unnest([
    {sig_list}
  ]) AS sig
  FROM embeddings
), qs AS (
  SELECT vec_id AS query_id, embedding AS qv, sig FROM sigs WHERE vec_id % 20 = 0
), cs AS (
  SELECT vec_id AS cand_id, embedding AS cv, sig FROM sigs
), cand AS (
  SELECT DISTINCT query_id, qv, cand_id, cv
  FROM qs JOIN cs USING (sig)
  WHERE cand_id != query_id
), scored AS (
  SELECT query_id, cand_id, {_sql_cos("qv", "cv")} AS cos_sim FROM cand
)
SELECT query_id, cand_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk FROM scored)
WHERE rnk <= {k}
"""


@query(
    "similarity_lsh_ann",
    oracle=_lsh_ann_oracle(),
    tags=("similarity", "llm", "approx"),
)
def similarity_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 (the 100 TB scale path).
    FULLY oracle-checked (upgraded from rows-only): the hyperplanes
    are deterministic literals shared with the oracle SQL and the
    whole bucket→probe→re-rank pipeline is deterministic HOF math, so
    DuckDB reproduces the exact ranked output. Recall vs the exact
    baseline is additionally asserted in pytest."""
    emb = load(spark, sf_dir, "embeddings")
    return lsh_topk(emb.filter(F.col("vec_id") % 20 == 0), emb, k=10)


# --- IVF (inverted-file) ANN ---------------------------------------------


def _centroid_hash(id_col: Column) -> Column:
    """Engine-portable deterministic sample key: a Knuth-style
    multiplicative hash in plain BIGINT arithmetic — ``((id % 2^32) *
    1000003) % 2^32`` — expressible identically in any SQL engine
    (unlike xxhash64), so an external oracle can reproduce the exact
    centroid pick. Range-bounded first so the product never overflows
    a signed 64-bit int."""
    return ((id_col % F.lit(4294967296)) * F.lit(1000003)) % F.lit(4294967296)


def sample_centroids(
    df: DataFrame, n_clusters: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid sample: hash-order the corpus (portable
    multiplicative hash — see _centroid_hash), take the first
    ``n_clusters``. orderBy+limit executes as a distributed top-K
    (TakeOrderedAndProject) — per-partition heaps, no global sort, no
    single-partition window — and the K winning rows collect to the
    driver, which is fine because centroids are small by definition
    (they get broadcast right back out). cluster_id = rank in
    (hash, id) order, so the mapping is itself reproducible."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(_centroid_hash(F.col(id_col)), F.col(id_col))
        .limit(n_clusters)
        .collect()
    )
    return df.sparkSession.createDataFrame(
        [(i, list(r[1])) for i, r in enumerate(rows)],
        f"cluster_id int, centroid array<{dict(df.dtypes)[vec_col].split('<')[1]}",
    )


# Plan-size guard for lloyd_refine's literal-embedded assignment
# expression (VERDICT r14 wrong #2): the expression holds k*(dim+1)
# literal doubles (k centroid arrays + k folded norms). The binding
# limit is Catalyst plan/codegen size, not data: 65_536 literals keeps
# the expression tree in the regime this repo has measured (k<=64,
# dim<=128 is ~4k literals; a k=4096 x dim=768 production coarse
# quantizer would be ~3.1M — refuse and route to the join-based
# assignment instead). Same trade as pq_encode's codebook literals,
# which documents it; this one enforces it.
LLOYD_LITERAL_BUDGET = 65_536

# Guard bound for the r15 probe-side broadcasts (ADVICE r15, medium):
# the query side of the ANN probe joins is bounded *by convention*
# (|Q|·n_probe rows of m·k-double distance tables), but nothing
# validated it — a caller probing a huge query batch would hit Spark's
# 8 GiB / 512M-row broadcast hard cap and FAIL outright where the
# unhinted join degraded gracefully to sort-merge. 1 GiB leaves
# comfortable headroom under the hard cap and the default driver heap.
PROBE_BROADCAST_MAX_BYTES = 1 << 30

# Bounded-count memo keyed weakly on the query DataFrame: tuning-curve
# style sweeps probe the same frame many times; the size estimate is a
# plan-time decision, so one LIMIT-bounded count per frame suffices.
_PROBE_COUNT_CACHE: "weakref.WeakKeyDictionary" = None  # initialized below


def _probe_bounded_count(df: DataFrame, bound: int) -> int:
    """min(|df|, bound+1) via a LIMIT-bounded scan — the guard never
    pays a full count of an arbitrarily large query set. Memoized per
    frame (weakly): a cached value is reusable when it was exact
    (≤ its own limit) or already exceeds the current bound."""
    global _PROBE_COUNT_CACHE
    if _PROBE_COUNT_CACHE is None:
        import weakref

        _PROBE_COUNT_CACHE = weakref.WeakKeyDictionary()
    try:
        cached = _PROBE_COUNT_CACHE.get(df)
    except TypeError:  # non-weakref-able frame flavor
        cached = None
    if cached is not None:
        n, lim = cached
        if n <= lim or n > bound:
            return n
    n = df.limit(bound + 1).count()
    try:
        _PROBE_COUNT_CACHE[df] = (n, bound)
    except TypeError:
        pass
    return n


def _probe_broadcast_ok(queries_df: DataFrame, n_probe: int, row_bytes: int) -> bool:
    """True when the probe side's estimated broadcast footprint
    (|Q| · n_probe rows × row_bytes) fits PROBE_BROADCAST_MAX_BYTES."""
    max_rows = max(1, PROBE_BROADCAST_MAX_BYTES // max(1, n_probe * row_bytes))
    return _probe_bounded_count(queries_df, max_rows) <= max_rows


def _arr_sql(vals: list[float]) -> str:
    """One SQL array literal of doubles. repr doubles: shortest exact
    round-trip decimal, so SQL-text construction is value-exact."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


def _centroid_csim_sqls(
    rows: list[tuple[int, list[float]]], vec_col: str, vnorm_col: str
) -> list[str]:
    """One SQL cosine expression PER centroid in ``rows`` order, each
    computed per-row from CENTROID LITERALS — no join, no shuffle. The
    fold order and casts mirror _dot/_norm exactly (A/B'd bit-identical
    to the crossJoin+groupBy argmin on the driver corpus), and the
    literal cnorm constant-folds to the same double the row-wise form
    computes."""
    return [
        f"(aggregate(zip_with({vec_col}, {_arr_sql(v)}, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x) "
        f"/ ({vnorm_col} * sqrt(aggregate(transform({_arr_sql(v)}, x -> x * x), "
        f"0.0D, (acc, x) -> acc + x))))"
        for _, v in rows
    ]


def _centroid_literal_argmin(
    rows: list[tuple[int, list[float]]], vec_col: str, vnorm_col: str
) -> str:
    """SQL expression: 0-based index (in ``rows`` order) of the
    nearest centroid by cosine — per-row from centroid literals via
    :func:`_centroid_csim_sqls`.

    Argmin key is -s, NOT 1 - s (ADVICE r14): negation is exact and
    order-reversing for EVERY double, while 1 - s is only exact on
    [0.5, 2] (Sterbenz) — distinct near-zero/negative cosines could
    round 1-s equal and silently hand the tie-break to cluster index,
    breaking the "csim desc, cluster_id asc" rule."""
    csims = _centroid_csim_sqls(rows, vec_col, vnorm_col)
    return (
        f"array_min(zip_with(array({','.join(csims)}), "
        f"sequence(0, {len(rows) - 1}), "
        f"(s, i) -> struct(-s AS d, i AS i))).i"
    )


def lloyd_refine(
    df: DataFrame,
    centroids: DataFrame,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd iteration(s) over a centroid table
    (VERDICT r13 next #3): assign every vector to its nearest centroid
    (map-side, centroids broadcast), replace each centroid with its
    cluster's mean, keep the old centroid for empty clusters.

    Hash-sampled centroids are the recall floor of the whole IVF
    family; one refine pass moves them toward the data's actual
    density at the cost of one aggregate pass per iteration — and that
    pass is genuinely map-side (r14 review: the first cut assigned via
    ``ivf_assign``, whose argmin groupBy exchanges one (id, embedding,
    norm) row PER CORPUS VECTOR — a full corpus shuffle per iteration,
    exactly the cost the docstring denied). The assignment is instead
    computed per-row from CENTROID LITERALS (the pq_encode pattern —
    the k centroids are already collected here; each row evaluates k
    literal dots + a struct-min, no join, no per-id aggregation),
    pinned bit-identical to ``ivf_assign``'s rule (csim desc,
    cluster_id asc) in tests. The only exchange per iteration is the
    groupBy(cluster) of k×(dim+1) algebraic partials.

    Determinism: element sums run in quantized BIGINT arithmetic
    (floor(x·10^6 + 0.5), exact long addition — order-independent,
    unlike a distributed double sum), divided back once per element.
    Same inputs → bit-identical centroids on any partitioning, so a
    refined index is as replayable as the hash-sampled one. Between
    iterations the centroid frame is re-collected so literals always
    reproduce the STORED values (float32 columns round-trip through
    their exact cast, keeping iteration N+1 consistent with what a
    written/reloaded index would hold).

    Bounds (r15): the literal-embedded assignment is refused loudly
    when k*(dim+1) exceeds :data:`LLOYD_LITERAL_BUDGET` (plan/codegen
    size is the binding limit, not data — see SCALE.md). Rows whose
    embedding is null, dim-mismatched, or carries null elements assign
    to no cluster and are skipped (they previously crashed the build
    with a null group, an array-index overflow, or — for null
    elements — silently biased cluster 0's mean).
    """
    Q = 1_000_000
    vec_t = dict(centroids.dtypes)["centroid"]

    for _ in range(iters):
        rows = sorted(
            ((r["cluster_id"], [float(x) for x in r["centroid"]])
             for r in centroids.collect()),
        )
        if not rows:
            raise ValueError("lloyd_refine needs a non-empty centroid table")
        dim = len(rows[0][1])
        if len(rows) * (dim + 1) > LLOYD_LITERAL_BUDGET:
            # VERDICT r14 wrong #2: the assignment expression embeds
            # ALL k centroid arrays as plan literals — k aggregate-HOFs
            # per row. Fine at this repo's k <= 64; at a production
            # coarse quantizer (k in the thousands, dim 768) the single
            # expression blows past codegen/plan-size limits long
            # before the data does, failing obscurely deep in Catalyst.
            # Refuse loudly at a named bound instead.
            raise ValueError(
                f"lloyd_refine: k*(dim+1) = {len(rows)}*({dim}+1) = "
                f"{len(rows) * (dim + 1)} literal doubles in one "
                f"assignment expression exceeds LLOYD_LITERAL_BUDGET="
                f"{LLOYD_LITERAL_BUDGET} (plan/codegen size, not data "
                "size, is the binding limit — see SCALE.md). Use fewer "
                "clusters per refine call, or assign via ivf_assign "
                "(join-based; costs one corpus shuffle per iteration) "
                "for coarse quantizers this large."
            )
        idx_to_cid = [cid for cid, _ in rows]
        assign = _centroid_literal_argmin(rows, vec_col, "__vn")
        asg = (
            # Invalid embeddings crash or bias the build (ADVICE r14 +
            # r15 self-review): a null vector nulls the assignment
            # (idx_to_cid[None] TypeError); a SHORT vector nulls every
            # csim and the sums loop's vec[i] throws
            # INVALID_ARRAY_INDEX; a vector with a null ELEMENT also
            # nulls every csim, and the struct-argmin then FORCE-PICKS
            # cluster index 0 (a struct whose d field is NULL compares
            # SMALLEST, so array_min returns it — the __ci-null filter
            # alone never fires), inflating cluster 0's count while
            # the element sums skip nulls: a silently biased mean.
            # Participation therefore requires exactly the centroids'
            # dim AND no null elements; the residual __ci filter is
            # belt-and-suspenders only.
            df.filter(
                F.col(vec_col).isNotNull()
                & (F.size(F.col(vec_col)) == dim)
                & ~F.exists(F.col(vec_col), lambda x: x.isNull())
            )
            .select(F.col(vec_col), _norm(F.col(vec_col)).alias("__vn"))
            .withColumn("__ci", F.expr(assign))
            .filter(F.col("__ci").isNotNull())
        )
        sums = asg.groupBy("__ci").agg(
            F.count("*").alias("__n"),
            *[
                F.sum(
                    F.floor(F.col(vec_col)[i].cast("double") * Q + F.lit(0.5)).cast(
                        "bigint"
                    )
                ).alias(f"__s{i}")
                for i in range(dim)
            ],
        ).collect()
        new = dict(rows)  # empty clusters keep their old centroid
        for r in sums:
            n = r["__n"]
            new[idx_to_cid[r["__ci"]]] = [r[f"__s{i}"] / (Q * n) for i in range(dim)]
        centroids = df.sparkSession.createDataFrame(
            [(cid, new[cid]) for cid in sorted(new)],
            f"cluster_id int, centroid {vec_t}",
        )
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by
    cosine. Centroids are broadcast (|C| is small by construction), so
    assignment is a map-side-only pass — no shuffle of the vectors.

    Precondition (ADVICE r15): ``id_col`` values are expected UNIQUE.
    The literal paths emit probe rows per INPUT row, while the
    over-budget n_probe=1 fallback's groupBy(id) argmin collapses
    duplicate ids to a single row — with duplicate ids the two forms
    return different row counts. Every in-repo caller passes unique
    ids (corpus vec_ids / doc_ids); dedup upstream if yours are not."""
    if n_probe >= 1:
        # r15/r16 optimization (guide §2.4, remove shuffles outright):
        # the probe assignment is computed per-row from CENTROID
        # LITERALS (the lloyd_refine machinery, pinned bit-identical
        # to the join forms in tests/test_similarity_ivf) — no |C|-way
        # crossJoin row explosion, no exchange. n_probe=1 (r15) is a
        # pure map-side argmin projection replacing a groupBy
        # min(struct) that exchanged one (id, vec, norm, struct) row
        # per corpus vector at every index build. n_probe>1 (r16,
        # VERDICT r15 next #4) keeps the top-n_probe cells per row via
        # slice(array_sort(struct(d, i))) — the exact machinery the
        # two-level assigner pinned in r15 — and explodes them: a
        # map-side Generate instead of the crossJoin + per-id
        # row_number window (one Exchange of |rows|·|C| scored pairs)
        # it replaces. The join forms below remain the fallback for
        # centroid tables past the literal plan-size budget (same
        # bound as lloyd_refine) or with non-finite values (ADVICE
        # r15: repr'd 'nan'/'inf' literals do not parse as Spark SQL
        # doubles, so the literal route would raise where the join
        # form computes through).
        crows = sorted(
            (r["cluster_id"], [float(x) for x in r["centroid"]])
            for r in centroids.select("cluster_id", "centroid").collect()
        )
        dims = {len(v) for _, v in crows}
        if (
            crows
            and len(dims) == 1
            and len(crows) * (len(crows[0][1]) + 1) <= LLOYD_LITERAL_BUDGET
            and all(_math.isfinite(x) for _, v in crows for x in v)
        ):
            cid_t = dict(centroids.dtypes)["cluster_id"]
            idx_arr = "array(" + ",".join(
                f"CAST({cid} AS {cid_t})" for cid, _ in crows
            ) + ")"
            base = df.select(
                F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("vnorm")
            )
            if n_probe == 1:
                assign = _centroid_literal_argmin(crows, vec_col, "vnorm")
                return base.withColumn(
                    "cluster_id", F.expr(f"element_at({idx_arr}, ({assign}) + 1)")
                )
            # top-n_probe cells, map-side. Sort key d = coalesce(-s,
            # +Inf): negation is the exact order-reversing argmin key
            # (see _centroid_literal_argmin), and the coalesce maps a
            # NULL csim to +Infinity = the window form's `csim DESC`
            # NULLS LAST placement (a bare struct sort would put a
            # null-d struct FIRST). In practice csims null per-row
            # all-or-nothing (null/short/null-element vectors null
            # EVERY centroid's csim; a per-centroid null would need a
            # zero-norm centroid, whose division THROWS identically in
            # both forms under Spark 4's default ANSI mode), and the
            # all-null tie falls through to i asc = the window's
            # cluster_id asc secondary key either way.
            csims = _centroid_csim_sqls(crows, vec_col, "vnorm")
            structs = ",".join(
                f"struct(coalesce(-({s}), CAST('Infinity' AS DOUBLE)) AS d, "
                f"{i} AS i)"
                for i, s in enumerate(csims)
            )
            probed = (
                f"transform(slice(array_sort(array({structs})), 1, {n_probe}), "
                f"pp -> element_at({idx_arr}, pp.i + 1))"
            )
            return base.withColumn("cluster_id", F.explode(F.expr(probed)))
    c = centroids.select(
        F.col("cluster_id"), F.col("centroid"), _norm(F.col("centroid")).alias("cnorm")
    )
    v = df.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("vnorm")
    )
    scored = v.join(F.broadcast(c), how="cross").select(
        id_col,
        vec_col,
        "vnorm",
        "cluster_id",
        (
            _dot(F.col(vec_col), F.col("centroid")) / (F.col("vnorm") * F.col("cnorm"))
        ).alias("csim"),
    )
    if n_probe == 1:
        # argmin via groupBy min-of-struct: partial aggregation happens
        # map-side (each task reduces its |C| candidate rows per vector
        # before any shuffle), unlike a window which must sort. Key is
        # -csim, not 1 - csim (r15, generalizing ADVICE r14's
        # lloyd_refine finding): negation is exact and order-reversing
        # for every double, while 1 - csim is only exact on [0.5, 2]
        # (Sterbenz) — distinct near-zero/negative cosines could round
        # equal and silently switch the tie-break to cluster index,
        # diverging from the window form's csim desc, cluster_id asc.
        best = scored.groupBy(id_col).agg(
            F.min(F.struct((-F.col("csim")).alias("d"), F.col("cluster_id"))).alias("b"),
            F.first(vec_col).alias(vec_col),
            F.first("vnorm").alias("vnorm"),
        )
        return best.select(id_col, vec_col, "vnorm", F.col("b.cluster_id").alias("cluster_id"))
    w = W.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cluster_id"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_probe)
        .drop("__r", "csim")
    )


class IvfIndex(NamedTuple):
    """A built IVF index: the small centroid TABLE (a DataFrame of
    (cluster_id, centroid), broadcast at every use — ADVICE r13: this
    is a frame, not a Python list; write_ivf_index writes it as the
    parquet sidecar) + the corpus assigned to its nearest cluster
    (norms precomputed). Build ONCE with :func:`ivf_index`, probe many
    times with :func:`ivf_probe` — sweeping ``n_probe``/``k`` must not
    re-train centroids or re-assign the corpus (at 100 TB the assigned
    frame is a persisted bucketed-by-cluster table; re-deriving it per
    tuning point is the recompute this split exists to forbid — r13,
    measured 45 s → ~17 s on the driver-gate tuning-curve entry)."""

    centroids: DataFrame  # (cluster_id, centroid) — k rows, broadcast-sized
    cand: DataFrame  # (cand_id, cv, cn, cluster_id)


def ivf_index(
    candidates_df: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> IvfIndex:
    """Build the IVF index: deterministic centroid sample → nearest-
    centroid partition of the corpus (1 probe), norms riding along.

    ``refine_iters=N`` runs N deterministic Lloyd passes over the
    sampled centroids before assignment (:func:`lloyd_refine`) —
    better-centered clusters raise recall at fixed n_probe for one
    extra aggregate pass per iteration at BUILD time only (measured
    table in SCALE.md). Default 0 preserves the hash-sample behavior
    (and every catalog oracle)."""
    centroids = sample_centroids(candidates_df, n_clusters, id_col, vec_col)
    if refine_iters:
        centroids = lloyd_refine(
            candidates_df, centroids, refine_iters, id_col, vec_col
        )
    # Norms ride along from assignment (computed once per vector);
    # each probed pair then costs ONE array fold (the dot), not three.
    cand = ivf_assign(candidates_df, centroids, 1, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"),
        F.col("vnorm").alias("cn"), "cluster_id",
    )
    return IvfIndex(centroids, cand)


def ivf_topk(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: :func:`ivf_index` + :func:`ivf_probe`
    in one call (build-per-call form for one-shot queries).

    The 100 TB shape: centroids broadcast; the corpus shuffles ONCE on
    cluster_id (and would be written bucketed-by-cluster for reuse);
    each query touches n_probe/n_clusters of the data instead of all
    of it. Recall vs brute force asserted in tests."""
    return ivf_probe(
        ivf_index(candidates_df, n_clusters, id_col, vec_col),
        queries_df, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
    )


def ivf_probe(
    index: IvfIndex,
    queries_df: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a built IVF index: queries probe their ``n_probe``
    nearest clusters → exact cosine re-rank within probed clusters."""
    centroids, cand = index.centroids, index.cand
    qry = ivf_assign(queries_df, centroids, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("vnorm").alias("qn"), "cluster_id",
    )
    # No distinct(): candidates live in exactly one cluster (1-probe
    # partition) and a query probes n_probe DISTINCT clusters, so each
    # (query, cand) pair appears at most once — a dedup here would be
    # a second full shuffle of the scored pairs for nothing.
    # r15: broadcast the query side (|Q|*n_probe rows) so the
    # corpus-sized cand frame is never exchanged/sorted on the
    # low-cardinality cluster_id key (guide §3.1/§2.4 — same fix as
    # ivfpq_probe; the before-plan showed the planner falling to
    # sort-merge when cand comes from a reloaded/persisted artifact
    # with no usable size estimate). r16 (ADVICE r15): the hint is
    # GUARDED — a query batch whose estimated footprint exceeds
    # PROBE_BROADCAST_MAX_BYTES falls back to the unhinted join
    # (graceful sort-merge) instead of failing on the broadcast cap.
    first_q = queries_df.select(F.size(F.col(vec_col)).alias("d")).first()
    row_bytes = 8 * int(first_q["d"] or 1) + 48 if first_q else 56
    if _probe_broadcast_ok(queries_df, n_probe, row_bytes):
        probe_side = F.broadcast(qry)
    else:
        probe_side = qry
    scored = (
        probe_side.join(cand, "cluster_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


IVF_ANN_ORACLE = f"""
WITH h AS (
  SELECT vec_id, embedding,
         ((vec_id % 4294967296) * 1000003) % 4294967296 AS hk
  FROM embeddings
), c AS (
  SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM h
  QUALIFY row_number() OVER (ORDER BY hk, vec_id) <= 16
), asg AS (
  SELECT v.vec_id, v.embedding, c.cluster_id,
         {_sql_cos("v.embedding", "c.centroid")} AS csim
  FROM embeddings v CROSS JOIN c
), cand AS (
  SELECT vec_id AS cand_id, embedding AS cv, cluster_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS r FROM asg)
  WHERE r = 1
), qry AS (
  SELECT vec_id AS query_id, embedding AS qv, cluster_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS r
        FROM asg WHERE vec_id % 20 = 0)
  WHERE r <= 4
), scored AS (
  SELECT q.query_id, cand.cand_id,
         {_sql_cos("q.qv", "cand.cv")} AS cos_sim
  FROM qry q JOIN cand
    ON q.cluster_id = cand.cluster_id AND cand.cand_id != q.query_id
)
SELECT query_id, cand_id
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk FROM scored)
WHERE rnk <= 10
"""


@query(
    "similarity_ivf_ann",
    oracle=IVF_ANN_ORACLE,
    tags=("similarity", "llm", "approx"),
)
def similarity_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-10 (the bucketed-corpus scale
    path, complementing the LSH variant). Runs the per-cluster-BLAS
    probe stage (ivf_topk_vectorized) — result-equal to the HOF form
    ivf_topk, pinned in tests.

    FULLY oracle-checked (upgraded from rows-only): centroid selection
    is a portable multiplicative hash and every later step (1-probe
    assignment, 4-probe query fan-out, in-cluster exact cosine, global
    top-10) is deterministic, so DuckDB runs the IDENTICAL algorithm.
    Output is the pair SET (query_id, cand_id) — the BLAS probe stage
    accumulates in a different order than a sequential SQL fold, so
    raw cos_sim can differ by ulps while the selected set is identical
    (no ulp-scale ties at the k boundary in this corpus, same contract
    as similarity_topk_vectorized)."""
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk_vectorized(emb.filter(F.col("vec_id") % 20 == 0), emb, k=10).select(
        "query_id", "cand_id"
    )


KNN_JOIN_ORACLE = f"""
WITH h AS (
  SELECT vec_id, embedding,
         ((vec_id % 4294967296) * 1000003) % 4294967296 AS hk
  FROM embeddings
), c AS (
  SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM h
  QUALIFY row_number() OVER (ORDER BY hk, vec_id) <= 16
), asg AS (
  SELECT v.vec_id, v.embedding, c.cluster_id,
         {_sql_cos("v.embedding", "c.centroid")} AS csim
  FROM embeddings v CROSS JOIN c
), cand AS (
  SELECT vec_id AS cand_id, embedding AS cv, cluster_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS r FROM asg)
  WHERE r = 1
), qry AS (
  SELECT vec_id AS query_id, embedding AS qv, cluster_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS r FROM asg)
  WHERE r <= 4
), scored AS (
  SELECT q.query_id, cand.cand_id,
         {_sql_cos("q.qv", "cand.cv")} AS cos_sim
  FROM qry q JOIN cand
    ON q.cluster_id = cand.cluster_id AND cand.cand_id != q.query_id
)
SELECT query_id, cand_id
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk FROM scored)
WHERE rnk <= 5
"""


@query(
    "similarity_knn_join_cogrouped",
    oracle=KNN_JOIN_ORACLE,
    tags=("similarity", "llm", "approx"),
)
def similarity_knn_join_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF kNN-JOIN: every corpus vector is a query (|Q| == corpus —
    the self-join shape a SemDeDup-style pipeline runs, and the
    documented intended tool once |Q| stops being a small probe set;
    VERDICT r5 #6 promoted it to a driver entry). Each cogroup task
    scores ONE cluster's queries against that cluster's candidates in
    a single BLAS matmul, so resident memory per task is
    (corpus/|clusters|)² at worst and clusters run in parallel —
    nothing global is quadratic and nothing collects to the driver.

    FULLY oracle-checked like similarity_ivf_ann: portable
    multiplicative-hash centroids, deterministic 1-probe assignment /
    4-probe fan-out / exact in-cluster cosine / global top-5, so
    DuckDB replays the identical algorithm; output is the pair SET
    (ulp contract as similarity_topk_vectorized)."""
    emb = load(spark, sf_dir, "embeddings")
    return ivf_topk_vectorized(emb, emb, k=5).select("query_id", "cand_id")


PAIRS_ORACLE = """
WITH pairs AS (
  SELECT
    a.vec_id AS id_a,
    b.vec_id AS id_b,
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.30
"""


@query("similarity_neardup_pairs", oracle=PAIRS_ORACLE, tags=("similarity", "dedup", "llm"))
def similarity_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.30 — the synthetic
    embeddings are near-orthogonal, max pairwise cos ≈ 0.41, so a
    production-style 0.95 threshold would test nothing) over a 10%
    sample — the embedding-space analogue of MinHash dedup."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.30)
    )


# --- label-centroid cosine matrix ----------------------------------------

CENTROID_SIM_ORACLE = """
WITH pe AS (
  SELECT label,
         unnest(range(1, len(embedding) + 1)) AS dim,
         unnest(embedding) AS v
  FROM embeddings
), q AS (
  SELECT CAST(label AS BIGINT) AS label, dim,
         CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT) AS vi
  FROM pe
), s AS (
  SELECT label, dim, CAST(SUM(vi) AS BIGINT) AS si FROM q GROUP BY 1, 2
), n AS (
  SELECT label, CAST(SUM(si * si) AS BIGINT) AS n2 FROM s GROUP BY 1
)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(SUM(a.si * b.si) AS DOUBLE)
         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
FROM s a
JOIN s b ON a.dim = b.dim AND a.label < b.label
JOIN n na ON na.label = a.label
JOIN n nb ON nb.label = b.label
GROUP BY a.label, b.label, na.n2, nb.n2
"""


@query("similarity_label_centroid_matrix", oracle=CENTROID_SIM_ORACLE, tags=("similarity", "llm"))
def similarity_label_centroid_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label mean embeddings,
    computed exactly in a distributed-deterministic way:

    - cosine is scale-invariant, so per-label SUM vectors replace mean
      vectors (no division, no float accumulation order);
    - components are quantized to integers (floor(v·1000)) *before*
      aggregation, so every sum is exact BIGINT arithmetic — the result
      is bit-identical regardless of partitioning, and Σ(Σvi)² stays
      < 2^63 through sf10 at this quantization;
    - the long (label, dim) form keeps the shuffle key-count at
      |labels|·dims rows — independent of corpus size — and the final
      pair join touches 64·|labels|² rows at most.
    """
    e = load(spark, sf_dir, "embeddings")
    pe = e.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode("embedding").alias("dim0", "v"),
    )
    q = pe.select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * 1000).cast("bigint").alias("vi"),
    )
    s = q.groupBy("label", "dim").agg(F.sum("vi").alias("si"))
    n = s.groupBy("label").agg(F.sum(F.col("si") * F.col("si")).alias("n2"))
    a = s.select(F.col("label").alias("label_a"), "dim", F.col("si").alias("sa"))
    b = s.select(F.col("label").alias("label_b"), F.col("dim").alias("dim_b"), F.col("si").alias("sb"))
    dot = (
        a.join(b, (F.col("dim") == F.col("dim_b")) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot"))
    )
    na = n.select(F.col("label").alias("label_a"), F.col("n2").alias("n2a"))
    nb = n.select(F.col("label").alias("label_b"), F.col("n2").alias("n2b"))
    return (
        dot.join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double")))
            ).alias("cos_sim"),
        )
    )


# --- Arrow-vectorized exact top-k -----------------------------------------


def topk_vectorized(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_block: int = 65536,
) -> DataFrame:
    """Exact cosine top-k, Arrow/numpy path: the query block is
    broadcast to every task, and each candidate partition computes a
    (batch × queries) similarity matrix with one BLAS matmul, keeping
    only its local top-k per query. The global top-k then aggregates
    |partitions|·k rows per query — the standard two-phase top-k.

    Driver memory is BOUNDED: queries are streamed off the cluster via
    ``toLocalIterator`` in blocks of at most ``max_query_block`` rows
    (64k × 64 dims × 8 B ≈ 32 MB per broadcast), one candidate pass per
    block, results unioned. Only one block is resident on the driver at
    a time, so |Q| can grow without a driver OOM; for |Q| approaching
    |corpus| the cogrouped IVF path (ivf_topk_vectorized) is the right
    tool and this function is the lookup-side primitive.

    Same results as topk_bruteforce (pinned by tests) at a fraction of
    the cost: the JVM HOF path folds 64-element lambdas per pair,
    while this path does one dgemm per Arrow batch. Candidates stream
    — nothing but the current query block is ever resident."""
    import numpy as np
    import pandas as pd

    spark = queries_df.sparkSession
    cand = candidates_df.select(F.col(id_col), F.col(vec_col))
    schema = "query_id long, cand_id long, cos_sim double"

    def block_topk(q_block):
        q_ids = np.array([r[0] for r in q_block], dtype=np.int64)
        q_mat = np.array([r[1] for r in q_block], dtype=np.float64)
        q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
        bc = spark.sparkContext.broadcast((q_ids, q_mat))

        def local_topk(batches):
            ids, mat = bc.value
            for pdf in batches:
                c_ids = pdf[id_col].to_numpy(dtype=np.int64)
                c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
                sims = c_mat @ mat.T  # (batch, n_queries)
                kk = min(k + 1, len(c_ids))  # +1 absorbs self-matches
                top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
                out = {
                    "query_id": np.repeat(ids, kk),
                    "cand_id": c_ids[top].T.ravel(),
                    "cos_sim": np.take_along_axis(sims, top, axis=0).T.ravel(),
                }
                yield pd.DataFrame(out)

        return cand.mapInPandas(local_topk, schema)

    locals_: list[DataFrame] = []
    block: list = []
    for r in queries_df.select(id_col, vec_col).toLocalIterator():
        block.append(r)
        if len(block) >= max_query_block:
            locals_.append(block_topk(block))
            block = []
    if block:
        locals_.append(block_topk(block))
    if not locals_:
        return spark.createDataFrame([], schema + ", rnk bigint").select(
            "query_id", "cand_id", "cos_sim", "rnk"
        )
    local = locals_[0]
    for extra in locals_[1:]:
        local = local.unionAll(extra)
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        local.filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


TOPK_PAIRS_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 20 = 0
),
scored AS (
  SELECT
    q.query_id,
    c.vec_id AS cand_id,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      AS cos_sim
  FROM q JOIN embeddings c ON c.vec_id != q.query_id
)
SELECT query_id, cand_id
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rnk
  FROM scored
) t
WHERE rnk <= 10
"""


@query(
    "similarity_topk_vectorized",
    oracle=TOPK_PAIRS_ORACLE,
    tags=("similarity", "llm", "udf"),
)
def similarity_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10, Arrow-vectorized (BLAS matmul per batch) — the
    fast exact path. Oracle-checked on the top-k PAIR SET (query_id,
    cand_id): dgemm accumulates in a different order than a sequential
    SQL fold, so raw cos_sim can differ by ulps while the selected
    set is identical (the corpus has no ulp-scale score ties at the
    k boundary); rank/score equality with the HOF brute force is
    additionally pinned in tests/test_similarity_ivf.py."""
    emb = load(spark, sf_dir, "embeddings")
    return topk_vectorized(emb.filter(F.col("vec_id") % 20 == 0), emb, k=10).select(
        "query_id", "cand_id"
    )


def ivf_topk_vectorized(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with the probe stage as per-cluster BLAS: queries and
    candidates are cogrouped by cluster_id and each cluster computes
    one (|Q_c| × |C_c|) similarity matrix in numpy, emitting its local
    top-k per query; the global window then ranks n_probe·k rows per
    query. Candidate selection is identical to ivf_topk (same
    assignment, same probed clusters, exact cosine), so results match
    it exactly up to fp association — pinned in tests.

    This is the cluster-scale shape: each cogroup task holds ONE
    cluster (corpus/|clusters| rows), so memory per task is bounded
    and clusters process in parallel; nothing quadratic is resident.
    """
    import numpy as np
    import pandas as pd

    centroids = sample_centroids(candidates_df, n_clusters, id_col, vec_col)
    cand = ivf_assign_vectorized(candidates_df, centroids, 1, id_col, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), "cluster_id"
    )
    qry = ivf_assign_vectorized(queries_df, centroids, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cluster_id"
    )

    def score(qpdfs, cpdfs) -> pd.DataFrame:
        q = pd.concat(list(qpdfs)) if not isinstance(qpdfs, pd.DataFrame) else qpdfs
        c = pd.concat(list(cpdfs)) if not isinstance(cpdfs, pd.DataFrame) else cpdfs
        if len(q) == 0 or len(c) == 0:
            return pd.DataFrame({"query_id": [], "cand_id": [], "cos_sim": []}).astype(
                {"query_id": "int64", "cand_id": "int64", "cos_sim": "float64"}
            )
        qm = np.array(list(q["qv"]), dtype=np.float64)
        cm = np.array(list(c["cv"]), dtype=np.float64)
        qm /= np.linalg.norm(qm, axis=1, keepdims=True)
        cm /= np.linalg.norm(cm, axis=1, keepdims=True)
        sims = cm @ qm.T  # (|C_c|, |Q_c|)
        kk = min(k + 1, len(c))  # +1 absorbs self-matches
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        return pd.DataFrame(
            {
                "query_id": np.repeat(q["query_id"].to_numpy(), kk),
                "cand_id": c["cand_id"].to_numpy()[top].T.ravel(),
                "cos_sim": np.take_along_axis(sims, top, axis=0).T.ravel(),
            }
        )

    local = (
        qry.groupBy("cluster_id")
        .cogroup(cand.groupBy("cluster_id"))
        .applyInPandas(
            lambda lq, rc: score(lq, rc),
            "query_id long, cand_id long, cos_sim double",
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        local.filter(F.col("query_id") != F.col("cand_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
    )


def ivf_assign_vectorized(
    df: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy twin of ivf_assign: centroids collect to a numpy
    matrix (broadcast via closure capture — they are tiny) and each
    Arrow batch assigns with one matmul + argsort. Ordering matches
    the HOF form: cosine descending, cluster_id ascending on ties."""
    import numpy as np
    import pandas as pd

    rows = centroids.select("cluster_id", "centroid").collect()
    c_ids = np.array([r[0] for r in rows], dtype=np.int64)
    c_mat = np.array([r[1] for r in rows], dtype=np.float64)
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
    order = np.argsort(c_ids)
    c_ids, c_mat = c_ids[order], c_mat[order]  # id-ascending → stable ties

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            vm_n = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sims = vm_n @ c_mat.T  # (batch, |C|)
            # stable argsort keeps id-ascending order on exact ties
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_probe),
                    vec_col: [v for v in pdf[vec_col] for _ in range(n_probe)],
                    "cluster_id": c_ids[top].ravel(),
                }
            )

    vec_type = dict(df.dtypes)[vec_col]
    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, {vec_col} {vec_type}, cluster_id int"
    )


# --- product quantization (PQ) -------------------------------------------

# Named points on the measured code-budget/recall curve (r10 sweep,
# SCALE.md "PQ code budget vs recall"; recall@10 vs exact at sf0.1,
# n_probe=4, 64-dim embeddings — monotone in both axes at every sf):
#
#   profile      m   k_codes  bytes/vec  recall@10   use when
#   PQ_COMPACT   4   16       4          0.052       memory-floor scans;
#                                                    oracle-parity entries
#   PQ_QUALITY   16  64       16         0.278       the default answer —
#                                                    5.3× the recall, still
#                                                    16× below raw (256 B)
#
# The bare-API defaults below are PQ_QUALITY (VERDICT r10 wrong #3: a
# user copying the old m=4/k_codes=16 default got the measured recall
# plateau). Catalog entries pin PQ_COMPACT explicitly — their DuckDB
# oracles replay the exact parameters, and the compact point keeps the
# oracle's m-way cross join cheap — with docstrings pointing here.
PQ_COMPACT = {"m": 4, "k_codes": 16}
PQ_QUALITY = {"m": 16, "k_codes": 64}


def pq_codebooks(
    df: DataFrame,
    m: int = PQ_QUALITY["m"],
    k: int = PQ_QUALITY["k_codes"],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the same portable-hash-ordered
    first-``k`` vectors that seed IVF (sample_centroids) supply the
    per-subspace codebooks — subspace s's centroids are the s-th
    slices of those k vectors. Returns [m][k][dsub] floats.

    Like IVF's centroid pick, the sample is a distributed top-K
    (TakeOrderedAndProject) and the k×dim result collects to the
    driver only to be re-broadcast as plan literals — constant-size
    at any corpus scale."""
    cent = (
        centroids if centroids is not None
        else sample_centroids(df, k, id_col=id_col, vec_col=vec_col)
    ).collect()
    dim = len(cent[0]["centroid"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [[float(x) for x in r["centroid"][s * dsub : (s + 1) * dsub]] for r in cent]
        for s in range(m)
    ]


def _cb_sql(cb: list[list[float]]) -> str:
    """One nested-array SQL literal for a subspace codebook. Double
    literals via repr (shortest round-trip decimal; Double.parseDouble
    recovers the exact bits), so SQL-text construction is value-exact."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{x!r}D" for x in cent) + ")" for cent in cb
        )
        + ")"
    )


def _d2_vec_sql(vec_col: str, cb: list[list[float]], s: int, dsub: int) -> str:
    """SQL for the k-vector of squared-L2 distances between subspace s
    of ``vec_col`` and the codebook — identical arithmetic (and
    evaluation order) to the DuckDB oracle's list_sum/list_transform
    form."""
    return (
        f"transform({_cb_sql(cb)}, c -> aggregate(zip_with("
        f"slice({vec_col}, {s * dsub + 1}, {dsub}), c, "
        f"(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"0.0D, (a, b) -> a + b))"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as m sub-quantizer codes (nearest codebook
    entry per subspace by squared L2, ties to the lowest code) plus
    the total quantization error. 64 float dims compress to m=4 bytes
    — the memory layout that lets an ANN index hold 100 TB of vectors
    in RAM (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011).

    Map-side only: codebooks are plan literals (broadcast), encoding
    is per-row column algebra — zero shuffle at any scale. All
    arithmetic is double with a fixed evaluation order, so an external
    SQL engine reproduces codes AND error bit-for-bit.

    PERF: each subspace's argmin is ONE F.expr SQL string (a
    struct-min over the distance vector) — building the same tree
    through per-literal Column calls costs ~3000 py4j round trips and
    ~6 s of driver time per plan; SQL-text construction is ~10 calls."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    k = len(codebooks[0])
    # struct-min: lexicographic (d2, index) min == argmin with ties to
    # the lowest code — same tie rule as the oracle's ORDER BY d2, cid
    mins = [
        F.expr(
            f"array_min(zip_with({_d2_vec_sql(vec_col, codebooks[s], s, dsub)}, "
            f"sequence(0, {k - 1}), (d, i) -> struct(d AS d, i AS i)))"
        ).alias(f"__m{s}")
        for s in range(m)
    ]
    step = df.select(F.col(id_col), *[F.col(c) for c in passthrough], *mins)
    codes = F.array(*[F.col(f"__m{s}.i").cast("int") for s in range(m)])
    qerr = F.col("__m0.d")
    for s in range(1, m):
        qerr = qerr + F.col(f"__m{s}.d")
    return step.select(
        F.col(id_col), *[F.col(c) for c in passthrough],
        codes.alias("codes"), qerr.alias("qerr"),
    )


# The oracle runs the IDENTICAL algorithm in SQL: portable-hash
# centroid pick, per-subspace squared-L2 argmin (ties to lowest code),
# in-order error sum — every double computed in the same order.
PQ_ORACLE = """
WITH cent AS (
  SELECT
    row_number() OVER (
      ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
    ) - 1 AS cid,
    embedding
  FROM embeddings
  ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
  LIMIT 16
), dists AS (
  SELECT
    e.vec_id,
    s.s,
    c.cid,
    list_sum(list_transform(
      list_zip(e.embedding[s.s * 16 + 1 : s.s * 16 + 16],
               c.embedding[s.s * 16 + 1 : s.s * 16 + 16]),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
           * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
    )) AS d2
  FROM embeddings e
  CROSS JOIN cent c
  CROSS JOIN (VALUES (0), (1), (2), (3)) s(s)
), best AS (
  SELECT vec_id, s, cid, d2,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
  FROM dists
)
SELECT
  vec_id,
  CAST(max(CASE WHEN s = 0 THEN cid END) AS INTEGER) AS c0,
  CAST(max(CASE WHEN s = 1 THEN cid END) AS INTEGER) AS c1,
  CAST(max(CASE WHEN s = 2 THEN cid END) AS INTEGER) AS c2,
  CAST(max(CASE WHEN s = 3 THEN cid END) AS INTEGER) AS c3,
  list_sum(list(d2 ORDER BY s)) AS qerr
FROM best
WHERE rn = 1
GROUP BY vec_id
"""


@query("similarity_pq_codes", oracle=PQ_ORACLE, tags=("similarity", "llm", "approx"))
def similarity_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the embeddings corpus (m=4
    subspaces × k=16 codes): each 64-dim float vector becomes 4 small
    codes + its quantization error. Completes the ANN family —
    brute-force (exact), LSH (hash prefilter), IVF (bucketed), PQ
    (compressed storage); at scale PQ codes are what the IVF clusters
    store. See :func:`pq_encode` for the scale/exactness design.

    Output is SCALAR columns ``c0..c3 INT`` (not the internal
    ``codes`` array): the driver's canonicalizer sorts a pandas frame
    by every column and dies on unhashable Python lists (the round-4
    red row). Catalog contract: no entry emits Array/Map/Struct —
    enforced for every entry in tests/test_catalog_oracle.py."""
    emb = load(spark, sf_dir, "embeddings")
    enc = pq_encode(emb, pq_codebooks(emb, m=4, k=16))
    return enc.select(
        "vec_id",
        *[enc["codes"][i].alias(f"c{i}") for i in range(4)],
        "qerr",
    )


def pq_adc_topk(
    queries_df: DataFrame,
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k: each full-precision
    query builds an m×k distance TABLE against the codebooks (per-row
    column algebra), then scans candidates' codes summing m table
    lookups — the PQ search kernel (Jégou et al. 2011 §IV).

    Scale shape: the scan is deliberately a query×codes cross join —
    ADC *is* a linear scan over compressed codes; its win is the 64×
    memory compression (4 bytes vs 256), not scan avoidance. At 100 TB
    the codes live inside IVF clusters (IVF-ADC): the same kernel runs
    per probed cluster only, and this composition is ivf_topk with
    codes_df as the per-cluster payload. Top-k per query is a window
    over the scan — TakeOrdered shape, no global sort."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # one F.expr per subspace (see pq_encode PERF note): the transform
    # over the nested codebook literal IS the distance table
    dtab_cols = [
        F.expr(_d2_vec_sql(vec_col, codebooks[s], s, dsub)).alias(f"__dtab{s}")
        for s in range(m)
    ]
    # persist() both join inputs: higher-order functions are interpreted
    # (no codegen) and the optimizer inlines the 64 distance-table
    # aggregates (and the encoder's 64 argmin aggregates) past the
    # join, re-evaluating them once per PAIR instead of once per row —
    # measured 8.4 s vs 1.5 s at sf0.1. A repartition barrier does NOT
    # stop it (the projection is pushed through RepartitionByExpression);
    # persist does, and matches reality at scale: the codes table is
    # pre-materialized storage (4 bytes/vector — the point of PQ) and
    # the query-side table is |queries| × m·k doubles, both bounded.
    # Same persist-the-reused-subtree pattern as minhash signatures.
    q = _pq_barrier(queries_df.select(F.col(id_col).alias("query_id"), *dtab_cols))
    c = _pq_barrier(codes_df.select(F.col(id_col).alias("cand_id"), "codes"), corpus=True)
    ad2 = None
    for s in range(m):
        term = F.element_at(f"__dtab{s}", F.col("codes")[s] + 1)
        ad2 = term if ad2 is None else ad2 + term
    # Broadcast the query-side distance tables (|Q| × m·k doubles —
    # bounded by construction), stream the codes: ADC's linear scan is
    # the declared cost, but the CODES table is the corpus and must
    # never be the broadcast build side (r11 audit: the local
    # threshold picked exactly that).
    scored = F.broadcast(q).crossJoin(c).select("query_id", "cand_id", ad2.alias("approx_d2"))
    w = W.partitionBy("query_id").orderBy("approx_d2", "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "approx_d2")
    )


PQ_ADC_ORACLE = """
WITH cent AS (
  SELECT
    row_number() OVER (
      ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
    ) - 1 AS cid,
    embedding
  FROM embeddings
  ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
  LIMIT 16
), dists AS (
  SELECT
    e.vec_id,
    s.s,
    c.cid,
    list_sum(list_transform(
      list_zip(e.embedding[s.s * 16 + 1 : s.s * 16 + 16],
               c.embedding[s.s * 16 + 1 : s.s * 16 + 16]),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
           * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
    )) AS d2
  FROM embeddings e
  CROSS JOIN cent c
  CROSS JOIN (VALUES (0), (1), (2), (3)) s(s)
), codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT vec_id, s, cid,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
), scan AS (
  SELECT dq.vec_id AS query_id, cd.vec_id AS cand_id,
         list_sum(list(dq.d2 ORDER BY dq.s)) AS approx_d2
  FROM codes cd
  JOIN dists dq ON dq.s = cd.s AND dq.cid = cd.cid
  WHERE dq.vec_id % 20 = 0
  GROUP BY dq.vec_id, cd.vec_id
)
SELECT query_id, cand_id, approx_d2 FROM (
  SELECT query_id, cand_id, approx_d2,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d2, cand_id) AS rn
  FROM scan
) WHERE rn <= 10
"""


@query("similarity_pq_adc_topk", oracle=PQ_ADC_ORACLE, tags=("similarity", "llm", "approx"))
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC approximate top-10 over PQ codes (queries = every 20th
    vector). Fully oracle-checked: codebook pick, encoding, distance
    tables, and the in-order lookup sum are all deterministic doubles,
    so DuckDB reproduces approx_d2 bit-for-bit via its own join-form
    of the same algorithm."""
    emb = load(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m=4, k=16)
    codes = pq_encode(emb, books)
    return pq_adc_topk(emb.filter(F.col("vec_id") % 20 == 0), codes, books, k=10)


class IvfPqIndex(NamedTuple):
    """A built IVF-PQ index: the centroid TABLE (DataFrame — ADVICE
    r13: only ``books`` is a true Python-literal list; the centroids
    are a (cluster_id, centroid) frame that write_ivfpq_index writes
    as a parquet sidecar), the [m][k][dsub] codebook literals, and the
    corpus encoded to PQ codes, cluster-assigned, behind the persist
    barrier. Build ONCE (:func:`ivfpq_index`), probe many times
    (:func:`ivfpq_probe`) — the encoded-codes frame IS the stored
    index (4 B/vector, the point of PQ); re-encoding it per tuning
    point is the recompute the split forbids (r13)."""

    centroids: DataFrame  # (cluster_id, centroid) — k rows, broadcast-sized
    books: list  # [m][k][dsub] floats — plan literals, the only true list
    cand: DataFrame  # (cand_id, cluster_id, codes)
    # Optional raw-vector sidecar (r15, VERDICT r14 wrong #1): the
    # corpus vectors WITH their cluster_id, written PARTITIONED BY
    # cluster_id by write_ivfpq_index(..., corpus_df=...). Rerank's
    # exact-vector fetch against this frame joins on
    # (cluster_id, cand_id), so the scan partition-prunes to the
    # shortlist's clusters — the point-read the docstring promises —
    # instead of one full map-side pass over the raw vector table.
    vectors: DataFrame | None = None


def ivfpq_index(
    corpus_df: DataFrame,
    n_clusters: int = 16,
    m: int = PQ_QUALITY["m"],
    k_codes: int = PQ_QUALITY["k_codes"],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> IvfPqIndex:
    """Build the IVF-PQ index: centroids, per-subspace codebooks, and
    the corpus encoded + cluster-assigned behind the persist barrier.

    ``refine_iters=N`` Lloyd-refines the COARSE quantizer only (the
    IVF centroids — :func:`lloyd_refine`); the PQ codebooks keep the
    raw hash-sampled seed vectors, since refining them is a different
    axis (sub-vector quantization error) with its own sweep
    (scripts/sweep_pq_params.py). Default 0 = r13 behavior and every
    catalog oracle."""
    sample = sample_centroids(corpus_df, n_clusters, id_col, vec_col)
    centroids = (
        lloyd_refine(corpus_df, sample, refine_iters, id_col, vec_col)
        if refine_iters
        else sample
    )
    # the SAME collected sample seeds both structures when
    # n_clusters == k_codes: one distributed top-K pass, not two —
    # and encoding runs directly on the assigned frame (cluster_id as
    # a passthrough), removing the id-key join entirely
    books = pq_codebooks(
        corpus_df, m=m, k=k_codes, id_col=id_col, vec_col=vec_col,
        centroids=sample if k_codes == n_clusters else None,
    )
    cand = _pq_barrier(  # same interpreted-HOF barrier as pq_adc_topk
        pq_encode(
            ivf_assign(corpus_df, centroids, 1, id_col, vec_col),
            books, id_col, vec_col, passthrough=("cluster_id",),
        ).select(F.col(id_col).alias("cand_id"), "cluster_id", "codes"),
        corpus=True,
    )
    return IvfPqIndex(centroids, books, cand)


def ivfpq_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = PQ_QUALITY["m"],
    k_codes: int = PQ_QUALITY["k_codes"],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-ADC composition (Jégou et al. 2011 §V — the production ANN
    layout): :func:`ivfpq_index` + :func:`ivfpq_probe` in one call.

    This is the 100 TB shape end-to-end: centroids + codebooks are
    broadcast literals; the corpus shuffles once on cluster_id (and
    would persist bucketed-by-cluster for reuse); per query the scan
    cost is n_probe/n_clusters of the codes — 4 bytes per candidate —
    instead of a full-precision linear scan. pq_adc_topk is the
    degenerate n_probe = n_clusters case."""
    return ivfpq_probe(
        ivfpq_index(corpus_df, n_clusters, m, k_codes, id_col, vec_col),
        queries_df, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col,
    )


def ivfpq_probe(
    index: IvfPqIndex,
    queries_df: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    corpus_df: DataFrame | None = None,
) -> DataFrame:
    """Probe a built IVF-PQ index: a query probes its ``n_probe``
    nearest clusters and runs the ADC kernel only over those
    clusters\' codes.

    ``rerank=R`` (VERDICT r13 next #2) adds the production refinement
    step (Jégou et al. 2011 §V.C): ADC distances are biased by
    quantization, so take the top ``R >= k`` candidates by ADC, fetch
    their EXACT vectors from ``corpus_df`` by id, and return the top
    ``k`` by exact cosine. Output schema changes accordingly:
    ``(query_id, cand_id, approx_d2)`` without rerank,
    ``(query_id, cand_id, cos_sim)`` with — the two orderings are
    different metrics and must not be conflated.

    Scale shape of the fetch (r15 — VERDICT r14 wrong #1 + ADVICE):
    the ADC shortlist is |Q|·R rows — BOUNDED by construction — and
    carries each candidate's ``cluster_id``. When the raw-vector
    table is cluster-partitioned (``index.vectors`` — the sidecar
    ``write_ivfpq_index(..., corpus_df=...)`` lands, used
    automatically when ``corpus_df`` is omitted), the broadcast
    fetch joins on ``(cluster_id, cand_id)`` and dynamic partition
    pruning restricts the scan to the shortlist's clusters: a genuine
    point-read against the stored artifact (plan-pinned —
    ``dynamicpruning`` on the vectors scan in
    tests/test_similarity_ivf.py). An EXPLICIT ``corpus_df`` always
    fetches by ``cand_id`` alone — one map-side pass over the corpus,
    filtered after the scan, no shuffle of corpus-sized data — even
    if it happens to carry a ``cluster_id`` column: a caller-side
    label is not trusted to match THIS index's assignment (a stale
    one would silently drop shortlist candidates in the two-key
    join). Pruning engages only for the index's own sidecar. The query side is
    broadcast-attached the same way. The only exchange this path adds
    is the final top-k window's hash-partition of the BOUNDED |Q|·R
    exact frame (the prior "no new shuffle at any corpus size" claim
    overstated — ADVICE r14); the rerank kernel itself is |Q|·R
    exact dots.
    """
    if rerank:
        # Partition-pruned fetch ONLY against the index's own sidecar
        # (r15 self-review): deciding by a column literally named
        # cluster_id in a caller-passed corpus_df would let a STALE
        # assignment (a prior ivf_assign with different clusters, an
        # older index's sidecar) silently drop shortlist candidates in
        # the (cluster_id, cand_id) join — wrong top-k, no error. The
        # sidecar is the one frame whose labels are this index's by
        # construction; an explicit corpus_df always fetches by
        # cand_id alone.
        pruned = corpus_df is None or corpus_df is index.vectors
        if corpus_df is None:
            corpus_df = index.vectors  # cluster-partitioned sidecar
        pruned = pruned and corpus_df is not None
        if corpus_df is None:
            raise ValueError(
                "rerank=R needs exact vectors for the ADC shortlist — "
                "the PQ index stores only 4 B/vec codes. Pass "
                "corpus_df (the raw-vector table), or build the index "
                "artifact with write_ivfpq_index(..., corpus_df=...) "
                "so the reloaded index carries its cluster-partitioned "
                "vector sidecar (index.vectors)"
            )
        if rerank < k:
            raise ValueError(f"rerank={rerank} must be >= k={k}")
    centroids, books, cand = index.centroids, index.books, index.cand
    m = len(books)
    dsub = len(books[0][0])
    dtab_cols = [
        F.expr(_d2_vec_sql(vec_col, books[s], s, dsub)).alias(f"__dtab{s}")
        for s in range(m)
    ]
    # r15: no persist barrier on the probe side — the broadcast below
    # IS the materialization barrier (the relation is built once and
    # the per-pair ADC sum references its materialized __dtab columns;
    # A/B'd with no re-evaluation blowup and one fewer cached frame +
    # cache-write job per probe). pq_adc_topk's crossJoin keeps its
    # persist: that is the shape the r5 inlining blowup was measured on.
    qry = (
        ivf_assign(queries_df, centroids, n_probe, id_col, vec_col)
        .select(F.col(id_col).alias("query_id"), "cluster_id", F.col(vec_col))
        .select("query_id", "cluster_id", *dtab_cols)
    )
    ad2 = None
    for s in range(m):
        term = F.element_at(f"__dtab{s}", F.col("codes")[s] + 1)
        ad2 = term if ad2 is None else ad2 + term
    # r15 optimization (guide §3.1/§2.4): the probe side is bounded in
    # the designed regime (|Q|*n_probe rows of m*k-double distance
    # tables) while cand is the corpus-sized codes frame. Without the
    # hint the persisted probe frame's unknown size estimate made the
    # planner SORT-MERGE this join — exchanging + sorting the ENTIRE
    # codes frame on a 16-value cluster_id key (r15 before-plan): a
    # skewed corpus shuffle at any scale. Broadcasting the query side
    # makes the scan of the codes map-side: zero corpus-sized exchange
    # in the probe. r16 (ADVICE r15): the hint is GUARDED — past
    # PROBE_BROADCAST_MAX_BYTES the join falls back unhinted with the
    # r5 persist barrier restored (the barrier the broadcast replaced),
    # degrading gracefully instead of failing on the 8 GiB cap.
    dtab_bytes = m * len(books[0]) * 8 + 48
    if _probe_broadcast_ok(queries_df, n_probe, dtab_bytes):
        probe_side = F.broadcast(qry)
    else:
        probe_side = _pq_barrier(qry)
    scored = (
        probe_side.join(cand, "cluster_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "cluster_id", ad2.alias("approx_d2"))
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "cand_id")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    if not rerank:
        return ranked.filter(F.col("rn") <= k).select(
            "query_id", "cand_id", "approx_d2"
        )
    # cluster_id rides along (VERDICT r14 wrong #1): each candidate
    # lives in exactly one cluster, so the shortlist stays |Q|*R rows
    # and its clusters are exactly what the exact-vector fetch needs
    # to prune a cluster-partitioned vector table.
    shortlist = ranked.filter(F.col("rn") <= rerank).select(
        "query_id", "cand_id", "cluster_id"
    )
    cv = corpus_df.select(
        *(["cluster_id"] if pruned else []),
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    qv = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    # broadcast the bounded shortlist (|Q|*R rows) against the vector
    # table: with a cluster-partitioned table the (cluster_id, cand_id)
    # join lets dynamic partition pruning skip every un-probed
    # cluster's files; otherwise the fetch is one map-side pass. Then
    # the (equally bounded) result broadcasts against the query vectors.
    exact = (
        cv.join(
            F.broadcast(shortlist),
            ["cluster_id", "cand_id"] if pruned else ["cand_id"],
        )
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "cand_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cos_sim")
    )


def write_ivf_index(index: IvfIndex, path: str) -> None:
    """Persist a built IVF index as its stored artifact (r13): the
    assigned corpus written PARTITIONED BY cluster_id — the on-disk
    form of the bucketed-by-cluster layout, so a probe's cluster_id
    join prunes to its n_probe cluster directories (statically when
    the probed ids are literals, via dynamic partition pruning when
    they come from the query side) — plus the centroid table as a
    small parquet sidecar. Everything goes through the Hadoop FS
    layer (no driver-local file I/O), so the same call targets S3/HDFS
    on a real cluster. At 100 TB this artifact is built once and
    probed for months; see SCALE.md. (No raw-vector sidecar option
    here, unlike :func:`write_ivfpq_index`: IVF's ``cand`` already
    stores the full vectors + norms cluster-partitioned — probes are
    exact within probed clusters, so there is nothing to re-rank.)"""
    index.cand.write.partitionBy("cluster_id").mode("overwrite").parquet(
        f"{path}/cand"
    )
    index.centroids.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )


def read_ivf_index(spark: SparkSession, path: str) -> IvfIndex:
    """Load a :func:`write_ivf_index` artifact. The returned index
    probes identically to the in-memory one (pinned in
    tests/test_similarity_ivf.py); the cand scan is partition-pruned
    by cluster_id."""
    return IvfIndex(
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/cand"),
    )


def write_ivfpq_index(
    index: IvfPqIndex,
    path: str,
    corpus_df: DataFrame | None = None,
    id_col: str = "vec_id",
) -> None:
    """Persist a built IVF-PQ index: PQ codes partitioned by
    cluster_id (4 B/vector — the artifact IS the compressed corpus),
    centroids, and the codebooks flattened to (s, c, centroid) rows —
    parquet doubles round-trip exactly, so the reloaded ADC kernel is
    bit-identical.

    ``corpus_df=`` (r15, VERDICT r14 wrong #1) additionally lands the
    RAW vectors as a ``vectors/`` sidecar PARTITIONED BY cluster_id
    (each vector tagged with its IVF assignment from ``index.cand``).
    This is what makes ``ivfpq_probe(..., rerank=R)``'s exact-vector
    fetch a point-read against the stored artifact: the shortlist's
    (cluster_id, cand_id) join partition-prunes the sidecar scan to
    the probed clusters instead of re-scanning the whole raw table.
    The sidecar costs one extra copy of the corpus on disk — the
    trade a deployment makes when rerank quality is wanted at probe
    time without keeping the original table hot."""
    index.cand.write.partitionBy("cluster_id").mode("overwrite").parquet(
        f"{path}/cand"
    )
    index.centroids.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    spark = index.centroids.sparkSession
    rows = [
        (s, c, [float(x) for x in vec])
        for s, book in enumerate(index.books)
        for c, vec in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "s int, c int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/books")
    if corpus_df is not None:
        # The index's own assignment is authoritative: a cluster_id
        # already on corpus_df (e.g. the frame came through ivf_assign,
        # or is an older index's sidecar) would duplicate the column in
        # the join below — an analysis error at write time at best, a
        # sidecar partitioned by a STALE assignment at worst (r15
        # self-review). Drop it before tagging.
        (
            corpus_df.drop("cluster_id")
            .join(
                index.cand.select(
                    F.col("cand_id").alias(id_col), "cluster_id"
                ),
                id_col,
            )
            .write.partitionBy("cluster_id")
            .mode("overwrite")
            .parquet(f"{path}/vectors")
        )


def read_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    """Load a :func:`write_ivfpq_index` artifact; probes identically
    to the in-memory index (pinned in tests/test_similarity_pq.py).
    If the artifact carries a raw-vector sidecar (written with
    ``corpus_df=``), it is attached as ``index.vectors`` and rerank
    probes partition-prune against it automatically."""
    rows = spark.read.parquet(f"{path}/books").collect()
    m = max(r.s for r in rows) + 1
    k = max(r.c for r in rows) + 1
    books: list = [[None] * k for _ in range(m)]
    for r in rows:
        books[r.s][r.c] = list(r.centroid)
    try:
        vectors = spark.read.parquet(f"{path}/vectors")
    except AnalysisException as e:
        # Only ABSENCE degrades to vectors=None (the artifact was
        # written without corpus_df=). A sidecar that EXISTS but fails
        # to read (permissions, corruption, transient object-store
        # error) must surface loudly — swallowing it would make a
        # later rerank probe claim "no sidecar, pass corpus_df" while
        # the real failure is infrastructure (r15 self-review).
        if "PATH_NOT_FOUND" not in str(e) and "does not exist" not in str(e):
            raise
        vectors = None
    return IvfPqIndex(
        spark.read.parquet(f"{path}/centroids"),
        books,
        spark.read.parquet(f"{path}/cand"),
        vectors,
    )


IVFPQ_ORACLE = f"""
WITH cent AS (
  SELECT
    row_number() OVER (
      ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
    ) - 1 AS cid,
    embedding
  FROM embeddings
  ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
  LIMIT 16
), csim AS (
  SELECT e.vec_id, c.cid,
         {{cos}} AS csim
  FROM embeddings e CROSS JOIN cent c
), cand_asg AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
    FROM csim
  ) WHERE rn = 1
), qry_asg AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
    FROM csim WHERE vec_id % 20 = 0
  ) WHERE rn <= 4
), dists AS (
  SELECT
    e.vec_id,
    s.s,
    c.cid,
    list_sum(list_transform(
      list_zip(e.embedding[s.s * 16 + 1 : s.s * 16 + 16],
               c.embedding[s.s * 16 + 1 : s.s * 16 + 16]),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
           * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
    )) AS d2
  FROM embeddings e
  CROSS JOIN cent c
  CROSS JOIN (VALUES (0), (1), (2), (3)) s(s)
), codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT vec_id, s, cid,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
    FROM dists
  ) WHERE rn = 1
), scan AS (
  SELECT dq.vec_id AS query_id, cd.vec_id AS cand_id,
         list_sum(list(dq.d2 ORDER BY dq.s)) AS approx_d2
  FROM codes cd
  JOIN cand_asg ca ON ca.vec_id = cd.vec_id
  JOIN dists dq ON dq.s = cd.s AND dq.cid = cd.cid
  JOIN qry_asg qa ON qa.vec_id = dq.vec_id AND qa.cluster_id = ca.cluster_id
  WHERE dq.vec_id != cd.vec_id
  GROUP BY dq.vec_id, cd.vec_id
)
SELECT query_id, cand_id, approx_d2 FROM (
  SELECT query_id, cand_id, approx_d2,
         row_number() OVER (PARTITION BY query_id ORDER BY approx_d2, cand_id) AS rn
  FROM scan
) WHERE rn <= 10
""".format(cos=_sql_cos("e.embedding", "c.embedding"))


@query("similarity_ivfpq_ann", oracle=IVFPQ_ORACLE, tags=("similarity", "llm", "approx"))
def similarity_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC approximate top-10 (queries = every 20th vector): the
    composed production ANN — IVF cluster pruning × PQ compressed
    scan. The oracle reproduces centroid pick, cosine cluster
    assignment, PQ encoding, and the in-order ADC sums bit-for-bit,
    restricted to (query, candidate) pairs whose clusters the query
    probes.

    Pins the PQ_COMPACT point (m=4/k_codes=16) DELIBERATELY: the
    oracle's m-way subspace cross join replays these exact parameters
    and the entry checks plan parity, not retrieval quality. The
    bare-API default (`ivfpq_topk` with no m/k_codes) is PQ_QUALITY —
    5.3× the recall at 16 B/vec; see the profile table at the PQ
    section header and SCALE.md "PQ code budget vs recall"."""
    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb.filter(F.col("vec_id") % 20 == 0), emb,
        k=10, n_clusters=16, n_probe=4,
        m=PQ_COMPACT["m"], k_codes=PQ_COMPACT["k_codes"],
    )


SEMDEDUP_ORACLE = f"""
WITH cent AS (
  SELECT row_number() OVER (
           ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
         ) - 1 AS cid,
         embedding
  FROM embeddings
  ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
  LIMIT 16
), asg AS (
  SELECT v.vec_id, v.embedding, c.cid,
         {{cos}} AS csim
  FROM embeddings v CROSS JOIN cent c
), cl AS (
  SELECT vec_id, embedding, cid AS cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS r
    FROM asg
  ) WHERE r = 1
), rm AS (
  SELECT DISTINCT b.vec_id
  FROM cl a JOIN cl b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {{paircos}} >= 0.30
)
SELECT cl.vec_id, CAST(cl.cluster_id AS BIGINT) AS cluster_id,
       rm.vec_id IS NULL AS is_kept
FROM cl LEFT JOIN rm ON rm.vec_id = cl.vec_id
""".format(
    cos=_sql_cos("v.embedding", "c.embedding"),
    paircos=_sql_cos("a.embedding", "b.embedding"),
)


@query("dedup_semantic_cluster", oracle=SEMDEDUP_ORACLE, tags=("dedup", "similarity", "llm"))
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding-space
    near-duplicates are pruned WITHIN k-means-style clusters — a row
    is removed when a lower-id member of its own cluster sits above
    the cosine threshold (one-pass greedy; the threshold is 0.30
    because the synthetic embeddings are near-orthogonal, mirroring
    similarity_neardup_pairs). Cross-cluster near-dups are invisible
    by design — exactly the approximation the paper makes to avoid
    the quadratic all-pairs pass.

    Scale: the centroid set is a broadcast literal; assignment is
    map-side; the pair join is hash-partitioned ON cluster_id, so
    total pair work is Σ|cluster|², bounded by the cluster balance
    the IVF slow tier measures (max/median 1.1) — never |corpus|².
    At 100 TB with √n clusters this is the linear-ish pass that makes
    semantic dedup feasible at all."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = sample_centroids(emb, 16)
    cl = ivf_assign(emb, centroids, 1).select(
        "vec_id", "embedding", "vnorm", "cluster_id"
    )
    a = cl.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("vnorm").alias("na"), "cluster_id",
    )
    b = cl.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("vnorm").alias("nb"), "cluster_id",
    )
    rm = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))) >= 0.30
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    return cl.join(rm, "vec_id", "left").select(
        "vec_id",
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.col("__rm").isNull().alias("is_kept"),
    )


# --- ADC search over a STORED codes artifact (VERDICT r6 #7c) -------------


def adc_topk_over_codes(
    queries_df: DataFrame,
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-ADC search against a PRE-BUILT codes table — the decoupled
    form of ivfpq_topk for when the index artifact already exists.
    ``codes_df`` must carry (cand_id, cluster_id, codes): exactly what
    ``pq_encode(ivf_assign(...), passthrough=("cluster_id",))``
    produces and what a production deployment stores once and searches
    many times (the 100 TB regime: the index build is one corpus pass,
    amortized over every query batch that follows; codes are 4 bytes a
    vector, so the stored artifact is the only corpus-sized thing a
    query ever touches).

    Same kernel as ivfpq_topk's tail: codebooks/centroids broadcast
    as literals, queries build m×k distance tables row-local, the join
    is hash-partitioned on cluster_id (probed clusters only), top-k is
    a per-query window (WindowGroupLimit, no global sort)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dtab_cols = [
        F.expr(_d2_vec_sql(vec_col, codebooks[s], s, dsub)).alias(f"__dtab{s}")
        for s in range(m)
    ]
    # no probe-side persist: the broadcast is the barrier (see
    # ivfpq_probe — same r15 change, same A/B)
    qry = (
        ivf_assign(queries_df, centroids, n_probe, id_col, vec_col)
        .select(F.col(id_col).alias("query_id"), "cluster_id", F.col(vec_col))
        .select("query_id", "cluster_id", *dtab_cols)
    )
    cand = _pq_barrier(
        codes_df.select("cand_id", "cluster_id", "codes"), corpus=True
    )
    ad2 = None
    for s in range(m):
        term = F.element_at(f"__dtab{s}", F.col("codes")[s] + 1)
        ad2 = term if ad2 is None else ad2 + term
    # broadcast the bounded probe side (same r15 optimization as
    # ivfpq_probe — see the comment there): the stored codes frame is
    # the corpus-sized side and must not be exchanged/sorted on the
    # low-cardinality cluster_id key. r16 (ADVICE r15): guarded — past
    # PROBE_BROADCAST_MAX_BYTES the join falls back unhinted with the
    # persist barrier restored (see ivfpq_probe).
    dtab_bytes = m * len(codebooks[0]) * 8 + 48
    if _probe_broadcast_ok(queries_df, n_probe, dtab_bytes):
        probe_side = F.broadcast(qry)
    else:
        probe_side = _pq_barrier(qry)
    scored = (
        probe_side.join(cand, "cluster_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", ad2.alias("approx_d2"))
    )
    w = W.partitionBy("query_id").orderBy("approx_d2", "cand_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "approx_d2")
    )


@query(
    "similarity_adc_stored_codes",
    oracle=IVFPQ_ORACLE,
    tags=("similarity", "llm", "approx", "vortex"),
)
def similarity_adc_stored_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC over a STORED codes artifact: build the PQ index once
    (ivf_assign → pq_encode), COPY it to a vortex dataset, read it
    back through the vortex DataSource, and search the stored copy —
    the composition pq_adc_topk's docstring promises, now exercised
    end-to-end through real storage. Results are bit-identical to
    similarity_ivfpq_ann (same oracle): the store/load hop must be
    value-neutral for bigint ids and int-list codes (A14 list
    layouts), which is precisely what makes codes a durable index
    artifact rather than a per-session computation."""
    import os
    import tempfile

    from ..sources.vortex import register

    emb = load(spark, sf_dir, "embeddings")
    centroids = sample_centroids(emb, 16)
    books = pq_codebooks(emb, m=4, k=16, centroids=centroids)
    codes = pq_encode(
        ivf_assign(emb, centroids, 1), books, passthrough=("cluster_id",)
    ).select(
        F.col("vec_id").alias("cand_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "codes",
    )
    register(spark)
    path = os.path.join(
        tempfile.gettempdir(), f"dvs_adc_codes_{os.getpid()}.vortex"
    )
    import shutil

    from ..sources.vortex import write_sorted

    shutil.rmtree(path, ignore_errors=True)
    # cluster-sorted layout — the IVF inverted-list form: codes of one
    # cluster are contiguous, every chunk's cluster_id zone map is a
    # tight interval, so a probed-cluster read prunes to O(n_probe)
    # chunks (and the range-partitioned write keeps file count small)
    write_sorted(codes, path, sort_cols=["cluster_id"])
    # fresh single-consumption load → opt-in chunk pruning is safe and
    # gives the probed-cluster point reads this layout exists for
    stored = spark.read.format("vortex").option("pushdown", "true").load(path)
    return adc_topk_over_codes(
        emb.filter(F.col("vec_id") % 20 == 0), stored, books, centroids,
        k=10, n_probe=4,
    )


# --- two-level IVF assignment (r7: the semdedup assignment-wall fix) ------


def ivf_assign_two_level(
    df: DataFrame,
    centroids: DataFrame,
    n_coarse: int | None = None,
    n_probe_coarse: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hierarchical (coarse→fine) nearest-centroid assignment: the
    designated fix for the flat-assignment wall the r7 slow-tier
    breakdown named (scripts/breakdown_slow_tier.py): with cluster
    count k ∝ corpus (SemDeDup's fixed-cluster-SIZE regime), flat
    assignment does n·k cosines — the one super-linear term in the
    whole recipe. Two levels make it n·(n_coarse +
    n_probe_coarse·k/n_coarse); at n_coarse = √k that is n·√k·(1 +
    n_probe_coarse) — for LAION-scale k = 50 000 that's ~220
    cosines/vector of coarse work instead of 50 000.

    Mechanics (all centroid-side work is driver/numpy on the
    constant-size collected centroid set, re-broadcast — the same
    budget sample_centroids already spends):

    1. coarse representatives = the first ``n_coarse`` fine centroids
       in cluster_id order (cluster_id is already hash-rank order, so
       this is a deterministic subsample);
    2. every fine centroid maps to its nearest coarse representative
       (driver-side k·n_coarse cosines, exact);
    3. phase 1: each vector scores the ``n_coarse`` broadcast reps and
       keeps its ``n_probe_coarse`` best cells (map-side, no shuffle);
    4. phase 2: an EQUI join on coarse_id against the broadcast fine
       centroids (not a cross join — each vector only ever sees the
       probed cells' fine members), then argmin via the same
       map-side min-of-struct as ivf_assign.

    Exactness: with ``n_probe_coarse = n_coarse`` the result is
    IDENTICAL to ``ivf_assign(df, centroids, 1)`` (every fine centroid
    is reachable); below that it is the standard IVF approximation —
    a vector whose true nearest fine centroid lives in an unprobed
    coarse cell gets its best probed-cell centroid instead. Output
    schema matches ivf_assign(n_probe=1): (id, vec, vnorm,
    cluster_id).

    Oracle-parity note (ADVICE r7): step 2's fine→coarse map is the
    one surface where PYTHON arithmetic (``_cos`` below: generator
    ``sum`` + ``math.sqrt``) is replayed by the DuckDB oracle
    (``_sql_cos``: ``list_reduce`` fold + ``sqrt``) rather than by a
    Spark expression. Both are strict LEFT folds of IEEE-754 doubles
    over the same element order — Python's ``sum`` accumulates
    left-to-right, DuckDB's ``list_reduce`` folds list order — and
    ``x*y``/``sqrt``/``/`` are all correctly-rounded single ops, so
    the per-pair cosines are bit-identical, not merely close; an
    EXACT tie between coarse reps is then broken by lowest coarse id
    on both sides (``-j`` here, ``coarse_id ASC`` in the oracle).
    If either engine ever re-associated its fold (e.g. pairwise
    summation), this map — and the catalog hash — would flag it."""
    import math

    crows = centroids.select("cluster_id", "centroid").orderBy("cluster_id").collect()
    k = len(crows)
    if n_coarse is None:
        n_coarse = max(1, int(math.isqrt(k)))
    n_probe_coarse = min(n_probe_coarse, n_coarse)
    reps = crows[:n_coarse]

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return num / (na * nb)

    # fine centroid -> nearest coarse rep (ties: lowest coarse id)
    fine_rows = []
    for cid, cvec in crows:
        best = max(
            range(n_coarse), key=lambda j: (_cos(cvec, reps[j][1]), -j)
        )
        fine_rows.append((int(cid), int(best), list(cvec)))

    # r15 optimization (guide §2.4, OPTIMIZATION_r15 deferred item #1):
    # BOTH phases as one map-side projection from CENTROID LITERALS —
    # the join form below paid TWO corpus exchanges (phase 1's
    # row_number window partitioned by id over the |corpus|·n_coarse
    # crossJoin, then phase 2's groupBy argmin over the probed-cell
    # fan-out). Per row: score the n_coarse reps (literal csims, the
    # _centroid_csim_sqls machinery already pinned bit-identical to
    # the join arithmetic), keep the n_probe_coarse best cells by the
    # window's exact order (csim desc → -s asc, coarse id asc), then
    # CASE-dispatch on each probed cell id to THAT cell's literal
    # member-csim structs only — the evaluated work per row stays
    # n_coarse + Σ|probed cells|, the same n·√k·(1+probe) the join
    # form does, with zero exchange. array_min over the flattened
    # (d=-csim, fine_id) structs is the same lexicographic rule as
    # the groupBy min(struct). The join form remains the fallback
    # past the literal budget, for a degenerate probe count, or if a
    # duplicate rep leaves a coarse cell EMPTY (the inner join drops
    # pairings there; the literal form cannot).
    members: dict[int, list[tuple[int, list[float]]]] = {
        j: [] for j in range(n_coarse)
    }
    for cid, cj, cvec in fine_rows:
        members[cj].append((cid, cvec))
    dims = {len(v) for _, v in crows}
    if (
        crows
        and n_probe_coarse >= 1
        and len(dims) == 1
        and all(members[j] for j in range(n_coarse))
        and (len(crows) + n_coarse) * (len(crows[0][1]) + 1)
        <= LLOYD_LITERAL_BUDGET
        # ADVICE r15: repr'd non-finite doubles ('nan'/'inf' + 'D') do
        # not parse as Spark SQL literals — fall back to the join form,
        # which computes through, instead of raising in Catalyst
        and all(_math.isfinite(x) for _, v in crows for x in v)
    ):
        rep_csims = _centroid_csim_sqls(
            [(j, list(reps[j][1])) for j in range(n_coarse)], vec_col, "vnorm"
        )
        rep_structs = ",".join(
            f"struct(-({s}) AS d, {j} AS i)" for j, s in enumerate(rep_csims)
        )
        probed = (
            f"transform(slice(array_sort(array({rep_structs})), "
            f"1, {n_probe_coarse}), pp -> pp.i)"
        )
        cells = []
        for j in range(n_coarse):
            mem_csims = _centroid_csim_sqls(members[j], vec_col, "vnorm")
            cells.append(
                "array(" + ",".join(
                    f"struct(-({s}) AS d, CAST({cid} AS INT) AS i)"
                    for (cid, _), s in zip(members[j], mem_csims)
                ) + ")"
            )
        dispatch = "CASE p " + " ".join(
            f"WHEN {j} THEN {cells[j]}" for j in range(n_coarse)
        ) + " END"
        best_s = f"array_min(flatten(transform({probed}, p -> {dispatch})))"
        return df.select(
            F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("vnorm")
        ).withColumn("cluster_id", F.expr(f"({best_s}).i"))

    spark = df.sparkSession
    elem = dict(df.dtypes)[vec_col].split("<")[1]
    fine = spark.createDataFrame(
        fine_rows, f"cluster_id int, coarse_id int, centroid array<{elem}"
    )
    coarse = spark.createDataFrame(
        [(int(j), list(reps[j][1])) for j in range(n_coarse)],
        f"cluster_id int, centroid array<{elem}",
    )

    probed = ivf_assign(df, coarse, n_probe_coarse, id_col, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("vnorm"),
        F.col("cluster_id").alias("coarse_id"),
    )
    fc = fine.select(
        "coarse_id", F.col("cluster_id").alias("fine_id"), "centroid",
        _norm(F.col("centroid")).alias("cnorm"),
    )
    scored = probed.join(F.broadcast(fc), "coarse_id").select(
        id_col, vec_col, "vnorm", "fine_id",
        (
            _dot(F.col(vec_col), F.col("centroid")) / (F.col("vnorm") * F.col("cnorm"))
        ).alias("csim"),
    )
    best = scored.groupBy(id_col).agg(
        # -csim, not 1 - csim: exact argmin key (see ivf_assign)
        F.min(F.struct((-F.col("csim")).alias("d"), F.col("fine_id"))).alias("b"),
        F.first(vec_col).alias(vec_col),
        F.first("vnorm").alias("vnorm"),
    )
    return best.select(id_col, vec_col, "vnorm", F.col("b.fine_id").alias("cluster_id"))


TWO_LEVEL_ASSIGN_ORACLE = f"""
WITH cent AS (
  SELECT
    row_number() OVER (
      ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
    ) - 1 AS cid,
    embedding
  FROM embeddings
  ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
  LIMIT 16
), reps AS (
  SELECT cid AS coarse_id, embedding FROM cent WHERE cid < 4
), fmap AS (
  SELECT cid, coarse_id FROM (
    SELECT c.cid, r.coarse_id,
           row_number() OVER (
             PARTITION BY c.cid
             ORDER BY {_sql_cos("c.embedding", "r.embedding")} DESC, r.coarse_id
           ) AS rn
    FROM cent c CROSS JOIN reps r
  ) WHERE rn = 1
), p1 AS (
  SELECT vec_id, coarse_id FROM (
    SELECT e.vec_id, r.coarse_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_cos("e.embedding", "r.embedding")} DESC, r.coarse_id
           ) AS rn
    FROM embeddings e CROSS JOIN reps r
  ) WHERE rn <= 2
), p2 AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_cos("e.embedding", "c.embedding")} DESC, c.cid
           ) AS rn
    FROM embeddings e
    JOIN p1 ON p1.vec_id = e.vec_id
    JOIN fmap ON fmap.coarse_id = p1.coarse_id
    JOIN cent c ON c.cid = fmap.cid
  ) WHERE rn = 1
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM p2
"""


@query(
    "similarity_assign_two_level",
    oracle=TWO_LEVEL_ASSIGN_ORACLE,
    tags=("similarity", "llm", "approx"),
)
def similarity_assign_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (coarse→fine) IVF assignment as a driver entry:
    k=16 fine centroids, 4 coarse cells (the first 4 in hash-rank
    order), probe 2 — the n·√k assignment path the r7 slow-tier
    breakdown designated as the SemDeDup assignment-wall fix. The
    oracle replays both levels exactly (fine→coarse mapping, coarse
    probe top-2, fine argmax within probed cells), so the whole
    approximation is hash-checked, not just the degenerate
    full-probe case pytest pins."""
    emb = load(spark, sf_dir, "embeddings")
    cents = sample_centroids(emb, 16)
    return ivf_assign_two_level(emb, cents, n_coarse=4, n_probe_coarse=2).select(
        "vec_id", F.col("cluster_id").cast("bigint").alias("cluster_id")
    )


SEMDEDUP_TWO_LEVEL_ORACLE = f"""
WITH cent AS (
  SELECT
    row_number() OVER (
      ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
    ) - 1 AS cid,
    embedding
  FROM embeddings
  ORDER BY ((vec_id % 4294967296) * 1000003) % 4294967296, vec_id
  LIMIT 16
), reps AS (
  SELECT cid AS coarse_id, embedding FROM cent WHERE cid < 4
), fmap AS (
  SELECT cid, coarse_id FROM (
    SELECT c.cid, r.coarse_id,
           row_number() OVER (
             PARTITION BY c.cid
             ORDER BY {_sql_cos("c.embedding", "r.embedding")} DESC, r.coarse_id
           ) AS rn
    FROM cent c CROSS JOIN reps r
  ) WHERE rn = 1
), p1 AS (
  SELECT vec_id, coarse_id FROM (
    SELECT e.vec_id, r.coarse_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_cos("e.embedding", "r.embedding")} DESC, r.coarse_id
           ) AS rn
    FROM embeddings e CROSS JOIN reps r
  ) WHERE rn <= 2
), cl AS (
  SELECT vec_id, embedding, cid AS cluster_id FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_cos("e.embedding", "c.embedding")} DESC, c.cid
           ) AS rn
    FROM embeddings e
    JOIN p1 ON p1.vec_id = e.vec_id
    JOIN fmap ON fmap.coarse_id = p1.coarse_id
    JOIN cent c ON c.cid = fmap.cid
  ) WHERE rn = 1
), rm AS (
  SELECT DISTINCT b.vec_id
  FROM cl a JOIN cl b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {_sql_cos("a.embedding", "b.embedding")} >= 0.30
)
SELECT cl.vec_id, CAST(cl.cluster_id AS BIGINT) AS cluster_id,
       rm.vec_id IS NULL AS is_kept
FROM cl LEFT JOIN rm ON rm.vec_id = cl.vec_id
"""


@query(
    "dedup_semantic_cluster_two_level",
    oracle=SEMDEDUP_TWO_LEVEL_ORACLE,
    tags=("dedup", "similarity", "llm"),
)
def dedup_semantic_cluster_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end in its 100 TB shape: greedy within-cluster
    cosine pruning (same recipe as dedup_semantic_cluster) but with
    cluster membership from the TWO-LEVEL assignment
    (ivf_assign_two_level, n·√k·(1+probe) instead of n·k) — the exact
    composition the r7 slow-tier breakdown prescribes once flat
    assignment becomes the recipe's dominant super-linear term. The
    oracle replays the full chain: coarse subsample, fine→coarse map,
    probe-2 coarse assignment, fine argmax, pair prune, keep flags —
    so the approximation is hash-checked, not just recall-tested."""
    emb = load(spark, sf_dir, "embeddings")
    cents = sample_centroids(emb, 16)
    cl = ivf_assign_two_level(emb, cents, n_coarse=4, n_probe_coarse=2)
    a = cl.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        F.col("vnorm").alias("na"), "cluster_id",
    )
    b = cl.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        F.col("vnorm").alias("nb"), "cluster_id",
    )
    rm = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))) >= 0.30
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    return cl.join(rm, "vec_id", "left").select(
        "vec_id",
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        F.col("__rm").isNull().alias("is_kept"),
    )
