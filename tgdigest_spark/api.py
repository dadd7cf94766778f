"""High-level query API — the engine's answers to the north-star queries.

Approximate (sketch) paths with their exact Spark counterparts side by
side; the exact paths double as oracles in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .agg import sketch_by_key, sketch_column, with_quantiles
from .sketches.tdigest import TDigest


def quantiles(
    df: DataFrame,
    value: Column | str,
    qs: list[float],
    where: Column | None = None,
    delta: int = 200,
) -> dict[float, float]:
    """Approximate quantiles of ``value`` via a merging t-digest.

    Reference-exact counterpart: full sort over the same rows
    (/root/reference/src/post.rs:76-80); estimates are within the
    published q(1-q) c/delta rank-error bound of it.
    """
    if where is not None:
        df = df.where(where)
    sk = sketch_column(df, value, lambda: TDigest(delta))
    est = sk.quantile(qs)
    return dict(zip(qs, [float(e) for e in est]))


def grouped_quantiles(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    qs: list[float],
    delta: int = 200,
    method: str = "combine",
) -> DataFrame:
    """Per-group approximate quantiles; one row per group."""
    blobs = sketch_by_key(df, keys, value, lambda: TDigest(delta), method=method)
    return with_quantiles(blobs, lambda: TDigest(delta), qs)


def text_length_quantiles(
    transcripts: DataFrame, qs: list[float] = (0.5, 0.95, 0.99), **kw
) -> dict[float, float]:
    """p50/p95/p99 of turn text length (north-star query #1)."""
    return quantiles(transcripts, F.length("text"), list(qs), **kw)


def interturn_latency_seconds(transcripts: DataFrame) -> DataFrame:
    """Per-turn latency = ts - lag(ts) within a conversation (seconds).

    No reference analog; required by BASELINE.json north_star. Window
    shuffles once on conv_id; at scale the table is written clustered by
    (conv_id, turn_idx) so AQE coalesces cheap partitions.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # unix_micros works for both TIMESTAMP and TIMESTAMP_NTZ (session TZ
    # pinned UTC) and keeps integer arithmetic exact.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(us).over(w)
    return transcripts.select(
        "conv_id",
        "turn_idx",
        ((us - prev).cast("double") / F.lit(1e6)).alias("latency_s"),
    ).where(F.col("latency_s").isNotNull())


def latency_quantiles(
    transcripts: DataFrame, qs: list[float] = (0.5, 0.95, 0.99), delta: int = 200
) -> dict[float, float]:
    """p50/p95/p99 of inter-turn latency (north-star query #2)."""
    lat = interturn_latency_seconds(transcripts)
    return quantiles(lat, "latency_s", list(qs), delta=delta)


def turns_per_conversation_quantiles(
    transcripts: DataFrame, qs: list[float] = (0.5, 0.95, 0.99), delta: int = 200
) -> dict[float, float]:
    """Quantiles of conversation length in turns (north-star query #3)."""
    per_conv = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns")
    )
    return quantiles(per_conv, F.col("n_turns").cast("double"), list(qs), delta=delta)
