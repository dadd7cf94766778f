"""LRU eviction selection (S8) — the reference's media-cache eviction
(/root/reference/src/cache.rs:438-475) as one window expression.

The reference walks rows oldest-accessed-first accumulating freed bytes
until the target is met (cache.rs:449-471). Declaratively: a running
sum over `last_accessed ASC` and a cutoff filter — Catalyst plans one
sort + one window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def eviction_candidates(
    cache_index: DataFrame,
    bytes_to_free: int,
    size_col: str = "size",
    order_col: str = "last_accessed",
) -> DataFrame:
    """Rows to evict: oldest-accessed prefix whose cumulative size first
    reaches ``bytes_to_free`` (inclusive of the crossing row, like the
    reference's loop which frees then checks)."""
    w = (
        Window.orderBy(F.asc(order_col), F.asc(size_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    prev = cum - F.col(size_col)
    return (
        cache_index.withColumn("_cum", cum)
        .withColumn("_prev", prev)
        .where(F.col("_prev") < bytes_to_free)  # include the crossing row
        .drop("_prev")
        .withColumnRenamed("_cum", "cum_freed")
    )


def total_cache_bytes(cache_index: DataFrame, size_col: str = "size") -> int:
    """A4 — SUM(size) (cache.rs:439-443)."""
    row = cache_index.agg(F.sum(size_col).alias("s")).collect()[0]
    return int(row["s"] or 0)
