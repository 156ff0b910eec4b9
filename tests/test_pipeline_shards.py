"""pipeline_corpus_to_shards integration contract (VERDICT r6 #7a):
the end-to-end curation chain must (1) produce the identical manifest
whether the corpus is read from parquet or through the vortex
DataSource — the integration shape a real pipeline runs — and (2)
keep its stage semantics composed correctly (dedup before packing,
decontam only dropping eval-overlapping training docs).

The value-level gate vs DuckDB is tests/test_catalog_oracle.py (this
entry has a full oracle); these tests pin what the oracle can't see:
the storage-layer integration and the plan shape.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.pipeline import corpus_to_shards

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_manifest_identical_over_vortex_datasource(spark, tmp_path):
    """Write documents as a .vortex dataset, run the SAME pipeline
    over the vortex scan, and require a row-identical manifest: the
    chain's semantics must not depend on the storage layer (chunk
    boundaries, encoding round-trips, pushed filters)."""
    from duckdb_vortex_spark.sources.vortex import register, write_sorted

    register(spark)
    docs = load(spark, SF_DIR, "documents")
    want = _canon(corpus_to_shards(docs))
    vpath = str(tmp_path / "documents_vortex")
    docs.write.format("vortex").mode("append").save(vpath)
    vdocs = spark.read.format("vortex").load(vpath)
    assert _canon(corpus_to_shards(vdocs)) == want

    # hazard layout: many chunks SORTED by source, so the eval
    # branch's '=src0' hint would genuinely prune chunks if hints were
    # recorded — r8 makes the DEFAULT scan filter-independent, so
    # multi-branch filtered reuse of one relation is exact with no
    # option (see vortex.pushFilters)
    spath = str(tmp_path / "documents_sorted")
    write_sorted(docs, spath, sort_cols=["source"], chunk_rows=64)
    sdocs = spark.read.format("vortex").load(spath)
    assert _canon(corpus_to_shards(sdocs)) == want


def test_no_eval_source_rows_and_no_duplicate_content(spark):
    docs = load(spark, SF_DIR, "documents")
    out = corpus_to_shards(docs)
    assert out.filter(F.col("source") == "src0").count() == 0
    # every surviving doc_id is unique (dedup ran before packing)
    assert out.count() == out.select("doc_id").distinct().count()


def test_bins_are_contiguous_per_pack_group(spark):
    """Within (source, pack_group), bins must start at 0 and be
    non-decreasing in doc_id order with no gaps — the streaming-concat
    packing invariant a shuffle-order bug would break."""
    docs = load(spark, SF_DIR, "documents")
    out = corpus_to_shards(docs).orderBy("source", "pack_group", "doc_id")
    rows = out.collect()
    last: dict[tuple, int] = {}
    for r in rows:
        key = (r.source, r.pack_group)
        prev = last.get(key, -1)
        assert r.bin >= 0 and prev <= r.bin <= prev + max(
            1, (r.n_tokens // 2048) + 1
        ), f"bin sequence broken at {r}"
        last[key] = r.bin
    assert rows, "pipeline produced an empty manifest at test SF"


def test_shard_assignment_is_partitioning_invariant(spark):
    """shard is a pure row hash: repartitioning the input must not
    change any assignment (reproducibility under cluster layout)."""
    docs = load(spark, SF_DIR, "documents")
    a = _canon(corpus_to_shards(docs))
    b = _canon(corpus_to_shards(docs.repartition(7, "lang")))
    assert a == b


def test_snapshot_diff_covers_all_change_types(spark):
    """Synthetic versions exercising added, removed AND changed (the
    catalog entry's derived versions produce no 'removed' rows)."""
    from duckdb_vortex_spark.operators.pipeline import snapshot_diff

    mk = lambda rows: spark.createDataFrame(rows, "k bigint, v double, w string")
    v1 = mk([(1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c"), (4, 4.0, "d")])
    v2 = mk([(1, 1.0, "a"), (2, 2.5, "b"), (4, 4.0, "D"), (5, 5.0, "e")])
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(v1, v2, "k", ["v", "w"]).collect()
    }
    # 1 unchanged (absent), 2 changed (v), 3 removed, 4 changed (w), 5 added
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_quality_audit_detects_planted_violations(spark, tmp_path):
    """The audit's checks must fire on corrupted data — run the entry
    against a scratch sf_dir whose tables carry one violation each."""
    import duckdb_vortex_spark.operators.pipeline as pl
    from duckdb_vortex_spark.catalog import load

    for t in ("orders", "lineitem", "customer"):
        df = load(spark, SF_DIR, t)
        if t == "orders":
            bad = df.limit(1).withColumn("o_custkey", F.lit(-999).cast("bigint"))
            dup = df.limit(1)  # duplicate orderkey
            df = df.unionByName(bad).unionByName(dup)
        elif t == "lineitem":
            bad = df.limit(1).withColumn("l_quantity", F.lit(-5.0)).withColumn(
                "l_discount", F.lit(0.9)
            )
            df = df.unionByName(bad)
        else:
            bad = df.limit(1).withColumn(
                "c_name", F.lit(None).cast("string")
            ).withColumn("c_custkey", F.lit(10**9).cast("bigint"))
            df = df.unionByName(bad)
        df.write.parquet(str(tmp_path / f"{t}.parquet"))
    got = {
        r["check_name"]: r["violation_count"]
        for r in pl.pipeline_data_quality_audit(spark, str(tmp_path)).collect()
    }
    assert got["orders_orphan_custkey"] >= 1
    assert got["lineitem_quantity_range"] == 1
    # the orphan row and the dup row both reuse the first orderkey:
    # 3 occurrences of one key -> 2 surplus rows
    assert got["orders_duplicate_orderkey"] == 2
    assert got["customer_null_name"] == 1
    assert got["lineitem_discount_range"] == 1


def test_snapshot_diff_null_semantics(spark):
    """NULL data values must not read as absent rows, and a value
    changing to/from NULL IS a change; empty compare_cols degrades to
    a presence-only diff."""
    from duckdb_vortex_spark.operators.pipeline import snapshot_diff

    mk = lambda rows: spark.createDataFrame(rows, "k bigint, v double, w string")
    v1 = mk([(1, None, "a"), (2, 2.0, "b"), (3, None, None), (4, 4.0, "d")])
    v2 = mk([(1, None, "a"), (2, 2.0, None), (3, None, None), (5, 5.0, "e")])
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(v1, v2, "k", ["v", "w"]).collect()
    }
    # 1: identical incl. NULL v -> absent; 2: w 'b'->NULL = changed;
    # 3: identical all-NULL payload -> absent; 4 removed; 5 added
    assert got == {2: "changed", 4: "removed", 5: "added"}
    presence = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(v1, v2, "k", []).collect()
    }
    assert presence == {4: "removed", 5: "added"}
