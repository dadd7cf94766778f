"""Structured-streaming sketch maintenance."""
