"""duckdb_vortex_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the
vortex-data/duckdb-vortex DuckDB extension (reference: /root/reference)
as an idiomatic Apache Spark package:

- ``catalog``    — the oracle-checked relational operator catalog
                   (SURVEY.md §2B surface).
- ``sources``    — a "vortex"-semantics Spark Python DataSource
                   (schema-from-footer bind, partitioned scan, column
                   pruning, filter pushdown, compressed columnar write;
                   SURVEY.md §2A rows A1-A9).
- ``operators``  — LLM-data-pipeline operators designed for 100 TB
                   scale: dedup (exact / MinHash-LSH / SimHash / n-gram
                   Jaccard), similarity search, text analysis,
                   multimodal binary columns (SURVEY.md §2C).
- ``streaming``  — Structured Streaming patterns over the events table.

Nothing here is ported from the reference's C++/Rust; the engine layer
is Spark SQL / Catalyst, exactly as DuckDB is the engine layer there
(see /root/reference/src/vortex_extension.cpp:9-11 for how thin the
shim is).
"""

__version__ = "0.1.0"


def version() -> str:
    """Extension self-version, parity with ``vortex_version()``
    (/root/reference/src/vortex_extension.cpp:48-50)."""
    return __version__
