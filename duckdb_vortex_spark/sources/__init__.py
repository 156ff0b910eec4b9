"""Vortex-semantics Spark data sources (SURVEY.md §2A)."""
