"""Multimodal column operators (SURVEY.md §2C): image/audio/video as
opaque ``binary`` columns with typed metadata.

Design for 100 TB (pointer-style storage): a media item is a struct
``(uri, byte_offset, n_bytes, media_type, payload)`` where ``payload``
is nullable — large blobs stay in object storage and are fetched
inside the decode UDF per batch; small blobs inline. The Spark-side
plumbing here (schemas, mapInPandas batch shape, partition sizing) is
real and tested; the actual codec decode is STUBBED (image/audio libs
aren't in this container) behind ``_decode_payload``, which raises
NotImplementedError for real codecs and provides a deterministic fake
for the 'fake/raw' codec so the pipeline is end-to-end testable.

The geo column note (SURVEY.md §2A A17): WKB geometry is likewise an
opaque binary column; the encode/decode pair lives in
``functions/geo.py``, keeping parity "peripheral" as BASELINE.json
directs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load, query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("uri", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_min", T.LongType(), True),
        T.StructField("byte_max", T.LongType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)


def _decode_payload(media_type: str, payload: bytes) -> dict:
    """Decode one media payload to features.

    STUB: real codecs (PIL/libsndfile/ffmpeg) are not in this
    container. 'fake/raw' payloads are treated as raw byte streams with
    an 8-byte (width,height) header — deterministic and testable.
    """
    if media_type == "fake/raw":
        if len(payload) < 8:
            return {"byte_mean": None, "byte_min": None, "byte_max": None, "width": None, "height": None}
        width, height = struct.unpack("<ii", payload[:8])
        body = payload[8:]
        return {
            "byte_mean": (sum(body) / len(body)) if body else None,
            "byte_min": min(body) if body else None,
            "byte_max": max(body) if body else None,
            "width": width,
            "height": height,
        }
    raise NotImplementedError(
        f"codec for {media_type!r} not available in this environment; "
        "plug a real decoder into _decode_payload"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    Arrow-batched: each pandas batch holds whole payload blobs; Spark
    partition sizing (not batch row count) bounds executor memory, so
    repartition upstream by total n_bytes for giant media. Columns are
    pruned to what the UDF needs before the exchange."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_payload(mt, bytes(p)) if p is not None else
                {"byte_mean": None, "byte_min": None, "byte_max": None, "width": None, "height": None}
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out

    pruned = media.select("doc_id", "media_type", "n_bytes", "payload")
    return pruned.mapInPandas(batches, FEATURE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: wraps the documents table as a media table with
    'fake/raw' payloads (8-byte header + utf-8 text bytes), so the
    whole multimodal path is exercised on driver testdata."""
    payload = F.concat(
        _le_int32(F.length("text").cast("int")),
        _le_int32(F.lit(1)),
        F.encode("text", "UTF-8"),
    )
    return df.select(
        "doc_id",
        F.concat(F.lit("mem://documents/"), F.col("doc_id").cast("string")).alias("uri"),
        F.lit("fake/raw").alias("media_type"),
        (F.length(F.encode("text", "UTF-8")) + 8).cast("bigint").alias("n_bytes"),
        payload.alias("payload"),
    )


def _le_int32(c: Column) -> Column:
    """Little-endian int32 bytes of a non-negative int column (pure
    column algebra — builds the 4 bytes via bit shifts + char)."""
    b = [F.chr(F.shiftright(c, 8 * i).bitwiseAND(F.lit(255))) for i in range(4)]
    return F.encode(F.concat(*b), "ISO-8859-1")


# --- catalog entries ------------------------------------------------------

BINARY_META_ORACLE = """
SELECT
  doc_id,
  octet_length(encode(text)) AS n_bytes,
  ascii(substr(text, 1, 1)) AS first_byte,
  md5(text) AS payload_md5
FROM documents
"""


@query("multimodal_binary_metadata", oracle=BINARY_META_ORACLE, tags=("multimodal", "llm"))
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata plumbing: byte length, first byte,
    content hash — the typed-metadata side of the multimodal design,
    oracle-checked (BLOB semantics parity with table.test:26,49)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.ascii(F.substring("text", 1, 1)).cast("bigint").alias("first_byte"),
        F.md5(F.encode("text", "UTF-8")).alias("payload_md5"),
    )


@query(
    "multimodal_feature_extract",
    oracle=None,  # mapInPandas decode stub — not SQL-expressible; features tested in pytest
    tags=("multimodal", "llm", "udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal path: documents → media structs (binary
    payload + header) → Arrow-batched mapInPandas feature extraction.
    Value correctness is pinned by tests/test_operators_quality.py."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    return extract_features(media)


FRAME_SAMPLE_ORACLE = """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / 64) AS BIGINT))) AS frame_idx
  FROM documents
)
SELECT
  doc_id,
  frame_idx,
  md5(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_md5,
  CAST(length(substring(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS BIGINT) AS frame_len
FROM f
WHERE frame_idx % 4 = 0
"""


@query("multimodal_frame_sample", oracle=FRAME_SAMPLE_ORACLE, tags=("multimodal", "llm"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque payloads: split each payload into
    fixed-size 64-unit frames and keep every 4th — the video
    keyframe-sampling access pattern, kept entirely in column algebra
    (sequence → filter → explode → substring), zero Python. A real
    codec slots in as a mapInPandas stage *after* sampling, so only
    sampled frames ever cross into Python — at 100 TB the sampler
    prunes the decode work 4x before it happens. Payload here is the
    document text (ASCII corpus: chars == bytes), so the oracle checks
    frame boundaries and hashes exactly."""
    d = load(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / F.lit(64)).cast("bigint")
    sampled = F.filter(
        F.sequence(F.lit(0).cast("bigint"), n_frames - 1), lambda i: i % 4 == 0
    )
    frame = F.expr("substring(text, CAST(frame_idx * 64 + 1 AS INT), 64)")
    return (
        d.select("doc_id", "text", F.explode(sampled).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.md5(frame).alias("frame_md5"),
            F.length(frame).cast("bigint").alias("frame_len"),
        )
    )
