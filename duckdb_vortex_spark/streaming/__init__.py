"""Structured Streaming patterns (SURVEY.md §2B Streaming)."""
