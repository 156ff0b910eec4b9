"""Integrated incremental ingest: exact → near-dup → semantic, ONE stream.

The r7 incremental trio proved each gate alone (`incremental_dedup`,
`incremental_neardup`, `incremental_semdedup`) with separate scratch
stores. A real ingest pipeline runs them as ONE chain per micro-batch
over ONE landed corpus (VERDICT r7 next-round #5): a document dropped
by the exact gate never reaches the near-dup index; a near-dup never
reaches the semantic index; and every gate's verification reads from
the SAME shared landed-batch store the chain itself writes.

Per micro-batch (documents already joined to their embeddings):

0. land the raw batch (id, fp, text, vec) id-sorted into the SHARED
   raw store — the one corpus artifact every gate reads back (fp =
   the exact-gate fingerprint, fused in as a column since r16: the
   separate fp/ store rewrote the same scan for one 8-byte column);
1. EXACT gate: xxhash64 over whitespace-normalized lowercased text;
   in-batch first-wins by id, then drop ids whose fingerprint appears
   in the landed history (the raw store's fp column, column-pruned —
   8 B/doc read). Survivors s1;
2. NEAR-DUP gate over s1: MinHash signatures + LSH band buckets;
   candidates = in-batch (smaller id earlier) ∪ buckets ⋈ the
   persistent LSH index (which holds every doc that REACHED this gate
   — prior s1 sets); hot-bucket cap applied uniformly from
   point-in-time history+batch counts (same degradation contract as
   `incremental_neardup`); exact shingle-Jaccard verify re-shingles
   ONLY candidate old docs, fetched from the SHARED raw store by id
   semi-join (zone-map point reads — the store is id-sorted per
   batch). Survivors s2; ALL s1 buckets append to the index;
3. SEMANTIC gate over s2: 1-probe assignment against the static
   broadcast codebook (offline-trained, `sample_centroids` over the
   full embeddings table so the oracle can replay the pick);
   candidates = earlier same-batch same-cluster rows ∪ the persistent
   cluster-SORTED IVF index rows in the batch's probed clusters only
   (holds every doc that reached this gate — prior s2 sets); exact
   cosine >= threshold. Survivors s3; ALL s2 assignments append
   cluster-sorted;
4. manifest row per batch document: first failing gate
   (stage ∈ exact | near_dup | semantic | kept).

Chain semantics (what the DuckDB oracle replays): with gates indexing
exactly the docs that reach them,
  keep_e(d)  = no earlier doc with the same normalized text;
  drop_n(d)  = d ∈ reach2 and some earlier reach2-doc has J >= 0.8;
  drop_s(d)  = d ∈ reach3 and some earlier reach3-doc in the same
               cluster has cosine >= threshold,
where reach2 = keep_e, reach3 = keep_e ∧ ¬drop_n, and "earlier" is
smaller id. PRECONDITION — id-ordered ingest, exactly as
`incremental_neardup`/`incremental_semdedup` state it: the streamed
manifest equals this batch-mode chain independent of chopping iff
batch order refines global id order. The exact gate compares
fingerprints where the oracle compares normalized text — identical
answers absent a 64-bit hash collision (~n²/2⁶⁴; the hash IS the
design at 100 TB, where shuffling full text to dedup would dwarf
every other cost).

Store contention note: the raw store is written by stage 0 and read
back by stage 2's verifier IN THE SAME BATCH only for cross-batch
candidates (strictly-earlier dirs, `batch_dirs`' contract), so the
shared store never reads its own half-written batch.

State: fingerprints 8 B/doc (a raw-store column) + LSH
~384 B/reach2-doc + IVF
(vec + norm)/reach3-doc — each gate's state is bounded by the docs
that SURVIVED the cheaper gates before it, which is the point of
running the chain in this order (cheapest first, each gate shrinks
the next one's index).

Lineage is CUT at every gate boundary (`localCheckpoint`, not
`persist`): persist caches data but keeps the full logical plan, so
each downstream action re-ANALYZES the whole accumulated chain —
measured at sf0.01, the final manifest join of three tiny cached
dropped-sets spent 38 s in Catalyst analysis/optimization alone and
the 3-batch entry took 117 s; with checkpoints the same entry runs
46 s and the manifest join plans in milliseconds. The trade is
standard foreachBatch practice: checkpointed partitions are
executor-local (no lineage replay on executor loss), and the batch
protocol already retries a failed batch WHOLESALE from
strictly-earlier state, so intra-batch recompute-from-lineage buys
nothing here.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, query
from ..operators.dedup import (
    _DUCK_TOKS,
    _duck_shingles,
    _with_jaccard,
    band_buckets,
    minhash_signatures,
    shingle_table,
)
from ..operators.similarity import _dot, _sql_cos, ivf_assign, sample_centroids
from .incremental_dedup import fingerprint
from .sinks import batch_dirs as _batch_dirs
from .sinks import overwrite_batch_atomic as _overwrite_batch
from .sinks import (
    STATE_FILES,
    land_session_dataset,
    overlapped_batch_writes,
    state_dirs,
)


def _read_batches(
    spark, base: str, before: int, schema=None, **options
) -> DataFrame | None:
    """State visible to batch ``before``: tiered listing (compaction
    segments + strictly-earlier uncompacted batch dirs), so every store
    the chain maintains can be incrementally compacted BETWEEN
    micro-batches (`sinks.compact_dataset_incremental`) without
    breaking the retry contract — see `sinks.state_dirs` for the
    invariant.

    ``schema`` (r16): the chain KNOWS each store's schema (it wrote
    it — the store is the prior batches' frame), so passing it skips
    the DataSource's bind step (a Python planning worker merging every
    part file's footer) on every per-batch state read."""
    dirs = state_dirs(base, before)
    if not dirs:
        return None
    r = spark.read.format("vortex").option("paths", json.dumps(dirs))
    if schema is not None:
        from pyspark.sql.types import StructField, StructType

        r = r.schema(
            StructType(
                [StructField(f.name, f.dataType, True) for f in schema.fields]
            )
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


# Sort keys for each per-batch state store the chain reads back —
# compaction must cluster on the key the per-batch read prunes on
# (raw: candidate-id point fetches — the fingerprint column rides in
# the raw store since r16, read via column pruning; lsh: (band,h)
# bucket join; ivf: probed-cluster zone-map scan). The manifest store
# is append-only output, never read per batch, so it is not
# maintained here.
CHAIN_STORE_SORT = {
    "raw": ["id"],
    "lsh": ["band", "h"],
    "ivf": ["cluster_id", "id"],
}


def compact_chain_stores(
    spark: SparkSession,
    root: str,
    max_segments: int | str = "auto",
    max_files: int = STATE_FILES,
    before: int | None = None,
    level_ratio: float = 2.0,
) -> dict[str, str | None]:
    """Maintenance pass over the chain's state stores: one
    incremental (tiered) compaction each, bounded to ``max_files``
    part files per segment and a leveled live-segment cap
    (run fold past it — see `sinks.compact_dataset_incremental`).
    The default cap is ``"auto"`` (r11, ADVICE r10): it grows as
    max(4, ceil(log_ratio(history))), which is what keeps per-row
    rewrite cost O(log n) on an UNBOUNDED 24/7 stream — a constant
    cap forces polynomial tail refolds (Θ(n^(1+1/K)) total work,
    ~74×/row by 20k batches at K=4). Pass a constant int only for
    bounded-history stores where a hard listing bound matters more.
    Run BETWEEN micro-batches on checkpoint-committed batches only;
    with it interleaved every N batches, a per-batch state read opens
    at most ``cap + N`` dirs / ``(cap + N) * max_files`` files —
    constant for int caps, O(log batches) for ``"auto"`` — the bound
    the r9 flatness harness and `test_chain_state_file_count_bounded`
    pin.

    ``before`` (ADVICE r9 — REQUIRED when called from inside a
    stream's foreachBatch): the current batch id. A crash mid-batch-N
    leaves partial per-store state for N (the chain lands raw/ first),
    and an unbounded maintenance pass on restart would fold those dirs
    into a segment with upto = N — after which every retry of batch N
    trips `state_dirs`' "still retryable" guard forever, permanently
    wedging the stream. With ``before=N`` the pass only ever folds
    batch ids strictly below the batch about to (re)run, so the
    retry's atomic overwrite replaces the partial dirs as designed.
    Returns {store: new segment path or None}."""
    from .sinks import compact_dataset_incremental

    out: dict[str, str | None] = {}
    for store, cols in CHAIN_STORE_SORT.items():
        p = os.path.join(root, store)
        if os.path.isdir(p):
            out[store] = compact_dataset_incremental(
                spark,
                p,
                cols,
                max_files=max_files,
                max_segments=max_segments,
                before=before,
                level_ratio=level_ratio,
            )
    return out


def ingest_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    centroids: DataFrame,
    root: str,
    near_threshold: float = 0.8,
    sem_threshold: float = 0.4,
    num_hashes: int = 32,
    n: int = 3,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
) -> None:
    """One micro-batch of the integrated chain. ``batch_df`` carries
    (doc_id, source, text, vec). Writes batch-id-scoped artifacts under
    ``root``: raw/ (shared corpus, fingerprint column included — the
    exact store, fused r16), lsh/ (near-dup index), ivf/ (semantic
    index), man/ (the manifest)."""
    spark_ = batch_df.sparkSession
    raw_d, lsh_d, ivf_d, man_d = (
        os.path.join(root, s) for s in ("raw", "lsh", "ivf", "man")
    )

    def _label(stage: str) -> None:
        # guide §1.5: label every action so per-batch cost attributes
        # to a chain stage in the UI / status store (lazy-checkpoint
        # materializations inherit the label of the action that
        # triggers them). Best-effort: Connect has no sparkContext.
        try:
            spark_.sparkContext.setJobDescription(f"chain b{batch_id}: {stage}")
        except Exception:
            pass

    with overlapped_batch_writes(spark_) as bw:
        # 0. land the raw batch into the SHARED store (id-sorted: stage-2
        # candidate fetches and any audit replay are zone-map point reads).
        # r16 (VERDICT r15 next #1, "fuse store writes that share a scan"):
        # the exact-gate fingerprint rides along as a COLUMN of the raw
        # store instead of a separate fp/ store — the fp write scanned the
        # same checkpointed rows to emit one 8-byte column, and the exact
        # gate's history read now column-prunes the raw store (columnar
        # format: it reads just fp). One fewer store write + state read +
        # maintained store per batch.
        #
        # r16 write overlap (guide §2.6): the raw/lsh/ivf store writes are
        # INDEPENDENT of the downstream gate compute — every state read in
        # this batch lists strictly-earlier batch dirs only (`state_dirs`'
        # contract), and the retry protocol overwrites any partial write
        # set atomically per store — so each write is submitted to the
        # shared pool where it used to run inline, and joined before the
        # batch returns (see `overlapped_batch_writes`). Sequencing the
        # writes was pure latency: ~3 write turnarounds per batch that the
        # gate actions now hide.
        _label("land raw")
        rows = (
            batch_df.select(
                F.col("doc_id").alias("id"), fingerprint("text").alias("fp"),
                "text", "vec",
            )
            .repartitionByRange(STATE_FILES, "id")
            .sortWithinPartitions("id")
            .localCheckpoint(eager=False)
        )
        bw.submit(
            _overwrite_batch, rows, raw_d, batch_id, max_files=None,
            label=f"chain b{batch_id}: land raw (write)",
        )

        _label("exact gate")
        # 1. EXACT gate ---------------------------------------------------------
        # r16 (guide §2.3): the first-wins window only ranks ids within a
        # fingerprint — keep text/vec OUT of its exchange (the previous
        # shape shuffled both payload columns on the __fp key just to
        # compute __rn).
        fp = rows.select("id", F.col("fp").alias("__fp"))
        fp = fp.withColumn(
            "__rn", F.row_number().over(Window.partitionBy("__fp").orderBy("id"))
        ).localCheckpoint(eager=False)
        seen_raw = _read_batches(spark_, raw_d, batch_id, schema=rows.schema)
        seen = seen_raw.select("fp") if seen_raw is not None else None
        if seen is not None:
            # r16 (guide §3.1): checkpointed frames carry NO size stats, so
            # the planner sort-merged the batch against the WHOLE
            # fingerprint store (two exchanges, one of them history-sized)
            # at every batch. The batch side is bounded by construction —
            # broadcast it INTO the history scan (map-side inner join, one
            # (id) per matching history row) and partial aggregation
            # reduces the lone exchange to the matched batch ids.
            hist_dup = (
                seen.withColumnRenamed("fp", "__fp")
                .join(F.broadcast(fp.select("id", "__fp")), "__fp")
                .select("id")
                .distinct()
            )
        else:
            hist_dup = None
        in_batch_dup = fp.filter(F.col("__rn") > 1).select("id")
        exact_dropped = (
            in_batch_dup.unionByName(hist_dup).distinct()
            if hist_dup is not None
            else in_batch_dup
        ).localCheckpoint(eager=False)
        s1 = rows.join(
            F.broadcast(exact_dropped), "id", "left_anti"
        ).localCheckpoint(eager=False)

        _label("neardup gate")
        # 2. NEAR-DUP gate over s1 ---------------------------------------------
        sig = minhash_signatures(s1, "text", "id", num_hashes, n, engine="jvm").localCheckpoint(eager=False)
        buckets = band_buckets(sig, num_hashes, rows_per_band).localCheckpoint(eager=False)
        idx = _read_batches(
            spark_, lsh_d, batch_id, schema=buckets.select("band", "h", "id").schema
        )
        bkeys = buckets.select("band", "h")
        if idx is not None:
            # r16 (guide §2.3/§3.1): only the BATCH's bucket keys are ever
            # consulted by the join below, so prune the index scan to them
            # map-side (broadcast semi) before counting — the hot-bucket
            # aggregate's exchange is then bounded by the batch's buckets
            # instead of every (band, h) ever landed. Counts for the
            # surviving keys are unchanged (the semi keeps every
            # occurrence of a kept key).
            hist_bh = idx.select("band", "h").join(
                F.broadcast(bkeys), ["band", "h"], "left_semi"
            ).unionByName(bkeys)
        else:
            hist_bh = bkeys
        ok = (
            hist_bh.groupBy("band", "h")
            .agg(F.count("*").alias("bn"))
            .filter(F.col("bn") <= max_bucket)
            .select("band", "h")
        )
        # r16: buck_ok feeds THREE consumers (a, b, cross) and cand feeds
        # two more — and every F.broadcast() build is its own query
        # execution, so without a materialization barrier each build
        # RE-COMPUTES the whole gate subtree below it (including the
        # hot-bucket aggregate over the index): measured as six escalating
        # 0.6→2.0 s broadcast-build jobs per batch at sf0.01. Checkpoint
        # the two shared frames so each is computed once.
        buck_ok = buckets.join(F.broadcast(ok), ["band", "h"]).localCheckpoint(
            eager=False
        )
        a = buck_ok.select("band", "h", F.col("id").alias("doc_a"))
        b = buck_ok.select("band", "h", F.col("id").alias("doc_b"))
        cand = (
            a.join(F.broadcast(b), ["band", "h"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        if idx is not None:
            # index streams map-side; the bounded batch buckets broadcast
            cross = (
                idx.withColumnRenamed("id", "doc_a")
                .join(F.broadcast(buck_ok), ["band", "h"])
                .select("doc_a", F.col("id").alias("doc_b"))
            )
            cand = cand.unionByName(cross)
        cand = cand.distinct().localCheckpoint(eager=False)
        new_sh = sig.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"))
        old_in_batch = sig.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
        prior_raw = seen_raw
        if prior_raw is not None:
            old_docs = prior_raw.join(
                F.broadcast(cand.select(F.col("doc_a").alias("id")).distinct()),
                "id",
                "left_semi",
            )
            old_sh = (
                shingle_table(old_docs, "text", "id", n)
                .select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"))
                .unionByName(old_in_batch)
            )
        else:
            old_sh = old_in_batch
        near_dropped = (
            _with_jaccard(
                old_sh.join(F.broadcast(cand), "doc_a")
                .join(F.broadcast(new_sh), "doc_b")
            )
            .filter(F.col("jaccard") >= near_threshold)
            .select(F.col("doc_b").alias("id"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # single consumer (asg, checkpointed below): no checkpoint —
        # each localCheckpoint call costs ~0.4 s of driver-side
        # planning/AQE stage execution per batch (r16 cProfile)
        s2 = s1.join(F.broadcast(near_dropped), "id", "left_anti")
        bw.submit(
            _overwrite_batch, buckets.select("band", "h", "id"), lsh_d, batch_id,
            label=f"chain b{batch_id}: lsh store (write)",
        )

        _label("semantic gate")
        # 3. SEMANTIC gate over s2 ----------------------------------------------
        asg = (
            ivf_assign(s2.select("id", "vec"), centroids, 1, "id", "vec")
            .select("cluster_id", "id", "vec", "vnorm")
            .localCheckpoint(eager=False)
        )
        _label("probed clusters")
        probed = sorted(
            r["cluster_id"] for r in asg.select("cluster_id").distinct().collect()
        )
        new_side = asg.select(
            "cluster_id",
            F.col("id").alias("id_b"),
            F.col("vec").alias("vec_b"),
            F.col("vnorm").alias("n_b"),
        )
        old_side = asg.select(
            "cluster_id",
            F.col("id").alias("id_a"),
            F.col("vec").alias("vec_a"),
            F.col("vnorm").alias("n_a"),
        )
        landed = _read_batches(
            spark_, ivf_d, batch_id, schema=asg.schema, pushdown="true"
        )
        if landed is not None:
            landed = landed.filter(F.col("cluster_id").isin(probed)).select(
                "cluster_id",
                F.col("id").alias("id_a"),
                F.col("vec").alias("vec_a"),
                F.col("vnorm").alias("n_a"),
            )
            old_side = landed.unionByName(old_side)
        sem_dropped = (
            # batch side bounded → broadcast; history IVF rows stream.
            # Single consumer (the manifest join): no checkpoint (see s2).
            old_side.join(F.broadcast(new_side), "cluster_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                (_dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b")))
                >= sem_threshold
            )
            .select(F.col("id_b").alias("id"))
            .distinct()
        )
        bw.submit(
            _overwrite_batch,
            asg.repartitionByRange(STATE_FILES, "cluster_id", "id").sortWithinPartitions(
                "cluster_id", "id"
            ),
            ivf_d,
            batch_id,
            max_files=None,
            label=f"chain b{batch_id}: ivf store (write)",
        )

        # 4. manifest: first failing gate ----------------------------------------
        manifest = (
            batch_df.select(F.col("doc_id").alias("id"), "source")
            .join(F.broadcast(exact_dropped.withColumn("__e", F.lit(True))), "id", "left")
            .join(F.broadcast(near_dropped.withColumn("__n", F.lit(True))), "id", "left")
            .join(F.broadcast(sem_dropped.withColumn("__s", F.lit(True))), "id", "left")
            .select(
                F.col("id").alias("doc_id"),
                "source",
                F.when(F.col("__e"), F.lit("exact"))
                .when(F.col("__n"), F.lit("near_dup"))
                .when(F.col("__s"), F.lit("semantic"))
                .otherwise(F.lit("kept"))
                .alias("stage"),
                (F.col("__e").isNull() & F.col("__n").isNull() & F.col("__s").isNull()).alias(
                    "is_kept"
                ),
            )
        )
        _label("manifest")
        _overwrite_batch(manifest, man_d, batch_id)
        _label("idle")


def incremental_ingest_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    centroids: DataFrame,
    root: str,
    checkpoint: str,
    maintain_every: int | None = None,
    maintain_max_segments: int | str = "auto",
    **kwargs,
):
    """Start the integrated chain on a streaming DataFrame of
    (doc_id, source, text, vec) with a static offline codebook;
    returns the StreamingQuery. Whole-history manifest = the
    batch-mode chain under id-ordered ingest (module docstring).

    ``maintain_every`` (r10) builds the 24/7 posture in: every N-th
    micro-batch, `compact_chain_stores` runs INSIDE the sink BEFORE
    the batch is processed — the one point in a stream's life where
    maintenance is safe by construction (the processor is the only
    reader, no plan spans the pass, and ``before=batch_id`` keeps a
    crashed predecessor attempt's partial state foldable-proof, the
    ADVICE r9 wedge). With it set, a batch's state read opens at most
    (cap + maintain_every) dirs per store — cap is constant for an
    int ``maintain_max_segments``, O(log batches-ever-landed) for the
    default ``"auto"`` (which is also what keeps per-row rewrite cost
    O(log n) on an unbounded stream — see `compact_chain_stores`);
    without it, callers own maintenance (between sessions, or their
    own in-sink wiring)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if maintain_every and batch_id >= 1 and batch_id % maintain_every == 0:
            compact_chain_stores(
                spark, root, max_segments=maintain_max_segments, before=batch_id
            )
        ingest_process_batch(batch_df, batch_id, centroids, root, **kwargs)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# catalog entry: streamed chain manifest equals the batch-mode chain
# ---------------------------------------------------------------------------

INGEST_PIPELINE_ORACLE = f"""
WITH ex AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY lower(regexp_replace(text, '\\s+', ' ', 'g'))
           ORDER BY doc_id) = 1 AS keep_e
  FROM documents
),
sh AS (
  SELECT doc_id AS id, {_duck_shingles(_DUCK_TOKS)} AS sh
  FROM documents
  WHERE doc_id IN (SELECT doc_id FROM ex WHERE keep_e)
),
nd AS (
  SELECT DISTINCT b.id AS doc_id
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
),
r3 AS (
  SELECT doc_id FROM ex
  WHERE keep_e AND doc_id NOT IN (SELECT doc_id FROM nd)
),
hk AS (
  SELECT vec_id, embedding,
         ((vec_id % 4294967296) * 1000003) % 4294967296 AS hk
  FROM embeddings
),
c AS (
  SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cluster_id,
         embedding AS centroid
  FROM hk
  QUALIFY row_number() OVER (ORDER BY hk, vec_id) <= 16
),
asg AS (
  SELECT v.vec_id, v.embedding, c.cluster_id,
         {_sql_cos("v.embedding", "c.centroid")} AS csim
  FROM embeddings v CROSS JOIN c
  WHERE v.vec_id IN (SELECT doc_id FROM r3)
),
a1 AS (
  SELECT vec_id, embedding, cluster_id
  FROM (SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY csim DESC, cluster_id) AS r FROM asg)
  WHERE r = 1
),
sd AS (
  SELECT DISTINCT b.vec_id AS doc_id
  FROM a1 a JOIN a1 b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {_sql_cos("a.embedding", "b.embedding")} >= 0.4
)
SELECT ex.doc_id, ex.source,
       CASE WHEN NOT ex.keep_e THEN 'exact'
            WHEN ex.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup'
            WHEN ex.doc_id IN (SELECT doc_id FROM sd) THEN 'semantic'
            ELSE 'kept' END AS stage,
       (ex.keep_e
        AND ex.doc_id NOT IN (SELECT doc_id FROM nd)
        AND ex.doc_id NOT IN (SELECT doc_id FROM sd)) AS is_kept
FROM ex
"""


@query(
    "stream_incremental_ingest_pipeline",
    oracle=INGEST_PIPELINE_ORACLE,
    tags=("streaming", "dedup", "similarity", "llm", "flagship"),
)
def stream_incremental_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents (joined to their embeddings on doc_id = vec_id)
    ingested in three id-ordered micro-batches through the INTEGRATED
    exact → near-dup → semantic chain over one shared landed-batch
    store, emitting a per-document manifest with first-failing-gate
    attribution. The unioned manifests must equal the batch-mode
    chain the oracle replays (normalized-text first-wins, then
    Jaccard >= 0.8 among exact survivors, then same-cluster cosine
    >= 0.4 among near-dup survivors with the replayed codebook) —
    the property that makes backfill and streaming ingest
    interchangeable for the WHOLE pipeline, not just each gate alone."""
    from ..sources.vortex import register

    register(spark)
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec")),
        "doc_id",
    )
    # persist: ivf_assign's literal path collects this frame once per
    # micro-batch — cache the 16-row sample instead of re-running the
    # sampling query each batch
    centroids = sample_centroids(emb, 16).persist()
    batched = corpus.withColumn(
        "__b", F.ntile(3).over(Window.orderBy("doc_id"))
    ).persist()
    root = tempfile.mkdtemp(prefix="dvs_ingest_")
    try:
        for i in (1, 2, 3):
            ingest_process_batch(
                batched.filter(F.col("__b") == i).drop("__b"), i, centroids, root
            )
        out = (
            spark.read.format("vortex")
            .option("paths", json.dumps(_batch_dirs(os.path.join(root, "man"), 10**9)))
            .load()
            .select("doc_id", "source", "stage", "is_kept")
        )
        # Land executor-side before the scratch dir disappears (the
        # driver may collect lazily after this function returns) —
        # never through a driver collect (VERDICT r8 wrong #1).
        return land_session_dataset(out, "ingest-manifest")
    finally:
        batched.unpersist()
        centroids.unpersist()
        shutil.rmtree(root, ignore_errors=True)
