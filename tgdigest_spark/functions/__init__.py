"""Scalar helper functions (calendar bucketing, formatting, spans)."""
