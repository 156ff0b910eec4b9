"""Chunking + embedding transform tests (values vs numpy where no SQL
oracle exists; structural properties of the chunker)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vortex_spark.catalog import load
from duckdb_vortex_spark.operators.chunking import (
    chunk_documents,
    embedding_mean_pool,
    normalize_embeddings,
    quantize_int8,
)

from .conftest import SF_DIR


def test_chunker_covers_every_token(spark):
    """Stride ≤ window → concatenating stride-prefixes of chunks plus
    the tail of the last chunk reconstructs the token stream; weaker
    invariant checked distributively: total tokens over non-overlapping
    chunking (stride == window) equals doc token count."""
    docs = load(spark, SF_DIR, "documents")
    chunks = chunk_documents(docs, chunk_tokens=10, stride=10)
    per_doc = chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("n"))
    orig = docs.select(
        "doc_id", F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n0")
    )
    # every start offset 1, 11, 21, ... < len is a chunk start; last
    # chunk may exceed len → slice truncates, so sums must be equal
    # except docs whose token count < 2 (single-window clamp)
    j = per_doc.join(orig, "doc_id")
    bad = j.filter((F.col("n") != F.col("n0")) & (F.col("n0") >= 2)).count()
    assert bad == 0


def test_chunker_overlap(spark):
    docs = load(spark, SF_DIR, "documents").limit(20)
    chunks = chunk_documents(docs, chunk_tokens=8, stride=4).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.chunk_id)
        for a, b in zip(rows, rows[1:]):
            ta, tb = a.chunk_text.split(" "), b.chunk_text.split(" ")
            if len(ta) == 8:  # full window: next chunk overlaps by 4
                assert ta[4:] == tb[: len(ta[4:])]


def test_mean_pool_matches_numpy(spark):
    emb = load(spark, SF_DIR, "embeddings")
    got: dict = {}
    for r in embedding_mean_pool(spark, SF_DIR).collect():
        got.setdefault(r.group_id, {})[r.dim_idx] = r.mean_val
    pdf = emb.select("vec_id", "embedding").toPandas()
    mats = {}
    for _, row in pdf.iterrows():
        mats.setdefault(row.vec_id % 50, []).append(np.array(row.embedding[:8], dtype=np.float64))
    for g, vecs in mats.items():
        want = np.mean(np.stack(vecs), axis=0)
        have = [got[g][i + 1] for i in range(8)]
        # micro-unit quantization: each element within 0.5e-6 of the
        # true value before averaging
        assert np.allclose(have, want, atol=1e-6), g


def test_quantize_int8_bounds_and_roundtrip(spark):
    emb = normalize_embeddings(load(spark, SF_DIR, "embeddings").limit(100))
    q = emb.select("vec_id", quantize_int8(F.col("embedding")).alias("q8"))
    rows = q.select(
        F.array_min("q8").alias("lo"), F.array_max("q8").alias("hi")
    ).agg(F.min("lo"), F.max("hi")).collect()[0]
    assert rows[0] >= -127 and rows[1] <= 127
    # dequantized cosine with itself ≈ 1 → max |q/127| close to the
    # original component magnitude
    joined = emb.join(q, "vec_id").select(
        F.aggregate(
            F.zip_with("embedding", "q8", lambda x, y: F.abs(x.cast("double") - y / 127.0)),
            F.lit(0.0),
            lambda a, x: F.greatest(a, x),
        ).alias("max_err")
    )
    assert joined.agg(F.max("max_err")).collect()[0][0] <= 0.5 / 127.0 + 1e-9
