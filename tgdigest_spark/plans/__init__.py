"""Incremental maintenance: per-partition sketch checkpoints + lineage."""
