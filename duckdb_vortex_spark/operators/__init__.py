"""LLM-data-pipeline operators (SURVEY.md §2C)."""
