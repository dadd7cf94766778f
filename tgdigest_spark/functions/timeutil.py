"""Timezone-free epoch arithmetic for temporal columns.

Spark's ``unix_micros(cast(x AS TIMESTAMP))`` idiom interprets a
TIMESTAMP_NTZ / DATE value at *session-local* midnight/wall-time, so
the derived epoch shifts with ``spark.sql.session.timeZone`` — and in
a DST-observing zone the wall→instant mapping is not even monotone
(spring-forward gaps map nonexistent wall times AFTER later ones),
which can reorder an as-of window near a transition. Every operator
and gate query that needs integer time arithmetic goes through these
helpers instead: the epoch is derived purely from the naive calendar
fields (``unix_date`` + hour/minute/fractional-second), which do not
consult the session timezone at all.

Equivalent reference behavior: the reference engine stores naive
UTC-less timestamps and does integer arithmetic on them directly
(digest.rs date handling); DuckDB's ``epoch_us`` on a naive TIMESTAMP
is likewise timezone-free, so these expressions are the Spark-side
mirror of the oracle's semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_US_PER_DAY = 86_400_000_000
_NTZ_EPOCH = "1970-01-01 00:00:00"


def epoch_us(col: str | Column, dtype: str) -> Column:
    """Epoch microseconds for a temporal column, independent of the
    session timezone.

    ``dtype`` is the Spark simple-string dtype of the column
    (``timestamp_ntz`` / ``date`` / ``timestamp`` / integral). NTZ and
    DATE values are treated as naive wall times on the epoch scale
    (exactly DuckDB's ``epoch_us`` on naive TIMESTAMP/DATE); a true
    TIMESTAMP (instant) uses ``unix_micros`` directly, which is
    already timezone-free. Integral columns pass through as micros.
    """
    c = F.col(col) if isinstance(col, str) else col
    if dtype == "date":
        return F.unix_date(c).cast("long") * F.lit(_US_PER_DAY)
    if dtype == "timestamp_ntz":
        day = F.unix_date(c.cast("date")).cast("long") * F.lit(_US_PER_DAY)
        tod = (
            F.hour(c).cast("long") * F.lit(3600)
            + F.minute(c).cast("long") * F.lit(60)
        ) * F.lit(1_000_000)
        # date_part SECOND carries the fractional part (DECIMAL(8,6));
        # *1e6 is exact at micro precision, cast truncates nothing
        frac = (F.date_part(F.lit("SECOND"), c) * F.lit(1_000_000)).cast(
            "long"
        )
        return day + tod + frac
    if dtype == "timestamp":
        return F.unix_micros(c)
    # already numeric: the engine-wide integer-time convention is epoch
    # MICROSECONDS (matching tolerance_us and range_join's contract).
    # NOTE this differs from the pre-round-5 asof behavior, where an
    # integral ts column fell through cast(long AS TIMESTAMP) and was
    # accidentally read as SECONDS — callers with second-scale ints
    # must multiply by 1e6 themselves.
    return c.cast("long")


def epoch_us_of(df: DataFrame, col: str) -> Column:
    """:func:`epoch_us` with the dtype looked up from ``df``."""
    return epoch_us(col, dict(df.dtypes)[col])


def from_epoch_us(expr: Column, dtype: str) -> Column:
    """Inverse of :func:`epoch_us`: reconstruct a temporal value from
    epoch micros in the same type family the micros were derived from.

    TIMESTAMP round-trips through ``timestamp_micros``; NTZ/DATE
    round-trip through a timezone-free ``timestampadd`` onto the NTZ
    epoch (DATE widens to NTZ midnight — the natural supertype for a
    matched-timestamp output column); an integral source round-trips
    to the raw micros long (identity), NOT a fabricated timestamp.
    """
    if dtype == "timestamp":
        return F.timestamp_micros(expr)
    if dtype in ("timestamp_ntz", "date"):
        return F.timestamp_add(
            "MICROSECOND", expr, F.lit(_NTZ_EPOCH).cast("timestamp_ntz")
        )
    return expr.cast("long")


_INSTANT_DTYPES = ("timestamp", "timestamp_ntz", "date",
                   "tinyint", "smallint", "int", "bigint", "long")


def to_instant(col: str | Column, dtype: str) -> Column:
    """Rebuild a temporal column as a true TIMESTAMP (instant) whose
    ``unix_micros`` equals :func:`epoch_us` of the source — the
    timezone-SAFE replacement for ``cast(ntz AS TIMESTAMP)``, which
    relabels wall times through the session timezone and is
    non-monotone inside DST gaps. Streaming operators use this to
    satisfy Spark's watermark TIMESTAMP requirement without inheriting
    session-timezone semantics.

    Integral columns follow the engine-wide integer-time convention:
    epoch MICROSECONDS (see :func:`epoch_us`), not the epoch seconds
    ``cast(long AS TIMESTAMP)`` would read. Unsupported dtypes
    (e.g. string) raise instead of silently producing NULL event
    times — parse strings upstream with ``to_timestamp_ntz``."""
    if dtype not in _INSTANT_DTYPES:
        raise ValueError(
            f"to_instant: unsupported ts dtype {dtype!r}; parse to a "
            "timestamp/timestamp_ntz column upstream"
        )
    if dtype == "timestamp":
        return F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(epoch_us(col, dtype))


def to_instant_of(df: DataFrame, col: str) -> Column:
    """:func:`to_instant` with the dtype looked up from ``df`` (the
    ``*_of`` convention of epoch_us_of/epoch_sec_of)."""
    return to_instant(col, dict(df.dtypes)[col])


def epoch_sec(col: str | Column, dtype: str) -> Column:
    """Whole-second twin of :func:`epoch_us` (fractional seconds
    truncated toward -inf, matching ``epoch // 1e6`` on non-negative
    epochs). Pure integer arithmetic — no double division anywhere."""
    c = F.col(col) if isinstance(col, str) else col
    if dtype == "date":
        return F.unix_date(c).cast("long") * F.lit(86_400)
    if dtype == "timestamp_ntz":
        return (
            F.unix_date(c.cast("date")).cast("long") * F.lit(86_400)
            + F.hour(c).cast("long") * F.lit(3600)
            + F.minute(c).cast("long") * F.lit(60)
            + F.floor(F.date_part(F.lit("SECOND"), c)).cast("long")
        )
    if dtype == "timestamp":
        return F.unix_seconds(c)
    return c.cast("long")


def epoch_sec_of(df: DataFrame, col: str) -> Column:
    """:func:`epoch_sec` with the dtype looked up from ``df`` — use
    this (not a hardcoded dtype string) wherever the frame is in hand,
    so a parquet/session dtype drift fails loudly into the TIMESTAMP
    branch instead of silently computing local-time fields."""
    return epoch_sec(col, dict(df.dtypes)[col])
