"""Scalar/vector helper functions."""
