"""Relational operator catalog modules (SURVEY.md §2B).

Each module registers entries via ``duckdb_vortex_spark.catalog.query``.
"""
