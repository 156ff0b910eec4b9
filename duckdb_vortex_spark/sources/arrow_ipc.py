"""Arrow-based in-memory array exchange (SURVEY.md §2A row A16).

The reference exchanges Vortex arrays in memory via the ``vortex-ipc``
crate (Cargo.lock:4397-4413). The Spark-world equivalent is Apache
Arrow: Spark 4 DataFrames convert to Arrow tables losslessly, and the
Arrow IPC stream format is the portable serialization. These helpers
cover the three exchange shapes:

- driver-side: ``DataFrame ⇄ pyarrow.Table`` (``toArrow`` /
  ``createDataFrame``; Arrow-backed, no row-at-a-time conversion)
- file/socket: IPC stream bytes write/read
- executor-side: ``mapInArrow`` passthrough for batch-level custom
  logic against ``pyarrow.RecordBatch`` (the per-batch FFI shape the
  reference's scan uses, SURVEY.md §3.2 step 5)

Scale note: driver-side exchange is for small results/dimension
tables by construction (it materializes on one machine); the
executor-side form is the one that scales — each task exchanges only
its partition's batches.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


def to_arrow_table(df: DataFrame):
    """DataFrame → pyarrow.Table (Arrow-path collect)."""
    return df.toArrow()


def from_arrow_table(spark: SparkSession, table) -> DataFrame:
    """pyarrow.Table → DataFrame (Arrow-path createDataFrame)."""
    return spark.createDataFrame(table)


def to_ipc_bytes(df: DataFrame) -> bytes:
    """Serialize a DataFrame's rows as one Arrow IPC stream."""
    import io

    import pyarrow as pa

    table = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def from_ipc_bytes(spark: SparkSession, data: bytes) -> DataFrame:
    """Arrow IPC stream bytes → DataFrame."""
    import io

    import pyarrow as pa

    with pa.ipc.open_stream(io.BytesIO(data)) as r:
        table = r.read_all()
    return spark.createDataFrame(table)


def map_arrow_batches(
    df: DataFrame,
    fn: Callable[[Iterator], Iterator],
    schema,
) -> DataFrame:
    """Executor-side batch exchange: apply ``fn`` to each partition's
    iterator of pyarrow.RecordBatch (the scalable exchange path)."""
    return df.mapInArrow(fn, schema)
