"""Streaming exact dedup with watermark-bounded state.

The batch pipeline's exact dedup (operators/text_analysis.exact_dedup)
is a hash groupBy over the whole corpus; its streaming counterpart
cannot hold corpus-sized state. Spark's ``dropDuplicatesWithinWatermark``
is the native answer: per-key state lives only until the watermark
passes the key's event time, so memory is bounded by the (delay x
arrival-rate) window while duplicates inside that horizon — the
overwhelmingly common re-delivery / double-fire case — are dropped
exactly.

Contract, stated precisely: two copies of a key arriving with event
times farther apart than the watermark delay may BOTH survive (state
for the first was evicted). This is the deliberate trade for bounded
state; corpus-age dedup belongs to the batch path or the persisted
signature store (operators/dedup_incremental.py), not to stream state.

Scale shape: state is hash-partitioned by key across executors
(HDFS/RocksDB state store), no per-row Python, and the dedup itself is
one stateful exchange on the key — the same single-shuffle shape as
the batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CONTENT_KEY = "_content_key"


def exact_dedup_stream(
    stream_df: DataFrame,
    keys: list[str] | None = None,
    content_cols: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop duplicate rows by ``keys`` (or by a hash of ``content_cols``)
    arriving within ``watermark`` of each other; first arrival wins.

    Exactly one of ``keys`` / ``content_cols`` must be given. With
    ``content_cols`` the key is a 128-bit md5 (matching the batch
    exact-dedup key width — a bare 64-bit hash would silently merge
    distinct contents at birthday scale) over an INJECTIVE encoding of
    the columns: per column an out-of-band null flag (any in-band
    sentinel can collide with a literal occurrence of the sentinel
    string), a length prefix, and the value — length-prefixing makes
    the concatenation unambiguous even when values contain the field
    separator.
    """
    if (keys is None) == (content_cols is None):
        raise ValueError("pass exactly one of keys= or content_cols=")
    from ..functions.timeutil import to_instant_of

    # tz-safe TIMESTAMP rebuild; integral ts = epoch MICROSECONDS
    # (engine convention), string ts raises — parse upstream
    stream_df = stream_df.withColumn(ts_col, to_instant_of(stream_df, ts_col))
    if content_cols is not None:
        if _CONTENT_KEY in stream_df.columns:
            raise ValueError(
                f"input already has a {_CONTENT_KEY!r} column; rename it "
                "or dedup on keys= instead"
            )
        parts = []
        for c in content_cols:
            vc = F.coalesce(F.col(c).cast("string"), F.lit(""))
            parts.append(F.col(c).isNull().cast("string"))
            parts.append(F.length(vc).cast("string"))
            parts.append(vc)
        stream_df = stream_df.withColumn(
            _CONTENT_KEY, F.md5(F.concat_ws("\x1f", *parts))
        )
        keys = [_CONTENT_KEY]
    out = stream_df.withWatermark(ts_col, watermark)
    out = out.dropDuplicatesWithinWatermark(list(keys))
    if content_cols is not None:
        out = out.drop(_CONTENT_KEY)
    return out
