"""Placeholder — filled in Phase 1."""
