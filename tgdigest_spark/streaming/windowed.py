"""Event-time windowed aggregation with watermarked late-data handling.

The reference's freshness tiers (SURVEY §2.9) define a mutable window
(7 days) beyond which data is immutable; the Structured Streaming
equivalent is a watermark: rows later than the watermark are dropped,
state for closed windows is evicted. This wrapper builds the canonical
windowed aggregate over a transcript stream — per (event-time window,
role) turn counts and mean text length — plus an approximate distinct
conversations column via Spark's own HLL++ (approx_count_distinct),
cross-checkable against our HLL on the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_turn_stats(
    stream_df: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """stream → watermarked per-window per-role aggregates (append-safe)."""
    # watermarks require TIMESTAMP (NTZ is rejected); rebuild it
    # timezone-safely (see session_turn_stats); integral ts = epoch
    # MICROSECONDS (engine convention), string ts raises
    from ..functions.timeutil import to_instant_of

    stream_df = stream_df.withColumn(ts_col, to_instant_of(stream_df, ts_col))
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.avg(F.length("text")).alias("mean_len"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "mean_len",
            "approx_convs",
        )
    )


def session_turn_stats(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful counterpart of
    the batch ``sessionization`` gate query, built on Spark's native
    ``session_window`` (dynamic-length windows that MERGE while events
    keep arriving within ``gap``; watermark passage closes a session
    and evicts its state, so append mode emits each session exactly
    once with no unbounded state).

    Boundary convention: ``session_window`` starts a NEW session when
    the inter-event gap is >= the gap duration, while the batch
    lag-formulation in driver_queries.sessionization uses strictly >
    — an event landing exactly on the threshold is the one row that
    can differ (pinned in the parity test).

    Scale shape: state is per (key, open session) — bounded by the
    watermark horizon, keys partition the state store, and merging is
    done by the SessionWindowStateStore without any per-row Python.
    """
    # watermarks require TIMESTAMP (NTZ rejected); to_instant rebuilds
    # it timezone-safely (a bare cast relabels wall times through the
    # session timezone and is non-monotone inside DST gaps, which can
    # reorder events across a session boundary); integral ts = epoch
    # MICROSECONDS (engine convention), string ts raises
    from ..functions.timeutil import to_instant_of

    stream_df = stream_df.withColumn(ts_col, to_instant_of(stream_df, ts_col))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key,
            "n_events",
            "first_ts",
            "last_ts",
        )
    )
