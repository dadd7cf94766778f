"""Distributed as-of join — the time-series point-in-time lookup.

For every left row, find the single right row with the same key whose
timestamp is the latest at-or-before (``backward``, the default) or the
earliest at-or-after (``forward``) the left row's timestamp. The
classic uses: enrich an event stream with the most recent prior state
(latest order, last config change, prevailing price), or align two
sensor/metric streams sampled on different clocks.

Spark has no built-in as-of join, so this is the composition the task
calls for: UNION the two sides (right rows carry their payload as ONE
non-null struct, left rows carry null), then a window
``partitionBy(key) orderBy(ts, precedence)`` with
``last(payload, ignorenulls=True)`` carries the most recent right
payload forward onto each left row. Packing the payload in a struct is
load-bearing: carrying columns independently would let a NULL field in
the matched right row "reach through" to an older row's value.

Scale shape: ONE hash shuffle on the key (the union is narrow), then a
codegen window — no UDF, no driver collect. This is the same
sort-within-key the single-node engines (pandas ``merge_asof``, DuckDB
``ASOF JOIN``) do, sharded by key; skewed keys behave exactly like any
window over the same key. Note the shuffle survives even over a
key-bucketed layout (verified): ``Union`` reports unknown partitioning
regardless of its children, so the window must re-exchange — unlike
the single-source bucketed windows in tests/test_bucketed_layout.py.

Determinism: if several right rows share (key, ts), pass
``right_tiebreak`` — the row with the LARGEST tiebreak wins; without
it Spark's sort is free to pick any of the tied rows (same caveat as
DuckDB ASOF JOIN on duplicate timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_TS_US = "__asof_ts_us"
_PREC = "__asof_prec"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: int | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    payload columns (null when no right row qualifies).

    ``on``: equality key column name(s), same name on both sides.
    ``right_ts``: defaults to ``left_ts``.
    ``strict``: exclude right rows with exactly equal timestamps.
    ``tolerance_us``: max |gap| in microseconds for a match to count.
    ``suffix``: appended to right payload columns that collide with a
    left column name.

    Output: all left columns + right payload columns (right side minus
    key/timestamp; the matched right timestamp is exposed as
    ``<right_ts><suffix>``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    left_cols = left.columns
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in payload_cols
    }
    matched_ts_name = right_ts + suffix

    def us(col: str):  # NTZ-safe microsecond epoch for ordering
        return F.unix_micros(F.col(col).cast("timestamp"))

    # SQL equality semantics: NULL keys never match. The window would
    # happily group NULL-key rows into one partition and hand a
    # NULL-key left row a NULL-key right row's payload, so NULL-key
    # RIGHT rows are dropped up front (they can match nothing); a
    # NULL-key LEFT row then sits in a right-free partition and keeps
    # a null payload, exactly like a SQL left join.
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    # Same three-valued-comparison rule for timestamps: a NULL-ts right
    # row satisfies neither ts<=T nor ts>=T, so it can match nothing —
    # left in, the backward scan (nulls-first asc) would carry its
    # payload onto every left row with no real match, fabricating
    # joins whose matched ts is null but whose payload is populated.
    right = right.where(F.col(right_ts).isNotNull())
    # payload struct: matched right ts first (for tolerance + output),
    # then the carried columns — one non-null struct per right row
    r = right.select(
        *keys,
        us(right_ts).alias(_TS_US),
        F.struct(
            us(right_ts).alias("__rts_us"),
            *[F.col(c) for c in payload_cols],
        ).alias(_PAYLOAD),
        (
            F.col(right_tiebreak)
            if right_tiebreak is not None
            else F.lit(0)
        ).alias("__tb"),
    )
    l = left.select(
        *left_cols, us(left_ts).alias(_TS_US), F.lit(None).alias("__tb")
    )

    # precedence at equal timestamps: inclusive → right first (the left
    # row sees it); strict → left first (it doesn't)
    right_prec, left_prec = (0, 1) if not strict else (1, 0)
    u = l.select(
        *[F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD)],
        F.lit(left_prec).alias(_PREC),
        F.lit(1).alias("__is_left"),
        _TS_US,
        "__tb",
        *left_cols,
    ).unionByName(
        r.select(
            _PAYLOAD,
            F.lit(right_prec).alias(_PREC),
            F.lit(0).alias("__is_left"),
            _TS_US,
            "__tb",
            *keys,
            *[
                F.lit(None).cast(dict(zip(left.columns, left.schema))[c].dataType).alias(c)
                for c in left_cols
                if c not in keys
            ],
        )
    )

    # NULL-ts rows at this point are LEFT rows only (NULL-ts right rows
    # were dropped above). They must sort BEFORE every right row in
    # BOTH directions so the carry sees no payload yet — NULL compared
    # to any bound is unknown, so such a row matches nothing. asc's
    # default nulls-first already does that; desc needs it explicit
    # (default nulls-last would hand a NULL-ts left row the minimum-ts
    # right row in forward mode).
    if direction == "backward":
        order = [F.col(_TS_US).asc_nulls_first(), F.col(_PREC).asc(), F.col("__tb").asc_nulls_last()]
    else:
        # forward: scan time DESCENDING so "carry forward" yields the
        # earliest at-or-after row; among equal (ts, prec) right rows
        # last(…) picks the one sorted LAST, so tiebreak stays ASC for
        # largest-tiebreak-wins in both directions
        order = [F.col(_TS_US).desc_nulls_first(), F.col(_PREC).asc(), F.col("__tb").asc_nulls_last()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = (
        u.withColumn(_PAYLOAD, carried)
        .where(F.col("__is_left") == 1)
    )
    if tolerance_us is not None:
        gap = F.abs(F.col(_TS_US) - F.col(_PAYLOAD)["__rts_us"])
        out = out.withColumn(
            _PAYLOAD,
            F.when(gap <= F.lit(int(tolerance_us)), F.col(_PAYLOAD)),
        )
    return out.select(
        *left_cols,
        F.timestamp_micros(F.col(_PAYLOAD)["__rts_us"]).alias(matched_ts_name),
        *[
            F.col(_PAYLOAD)[c].alias(out_names[c])
            for c in payload_cols
        ],
    )


def build_validity_intervals(
    df: DataFrame,
    key: str | list[str],
    ts: str = "ts",
    tiebreak: str | None = None,
    current_flag: str = "is_current",
) -> DataFrame:
    """Turn a change-event stream into SCD-2 validity intervals: each
    row gains ``valid_from`` (its own timestamp) and ``valid_to`` (the
    key's NEXT change, NULL while current) — the half-open
    ``[valid_from, valid_to)`` periods that :func:`asof_join` and
    interval joins consume, and the standard warehouse shape for
    "what was this entity's state at time T".

    One window per key (``lead`` over (ts, tiebreak)); no UDF, no extra
    shuffle beyond the key partitioning — over a key-bucketed layout
    the Exchange drops entirely. Ties on (key, ts) chain through the
    tiebreak, giving zero-length intervals rather than ambiguity (pass
    the change id). NULL change timestamps order LAST (matching SQL's
    default ``ASC NULLS LAST`` — a NULL-ts row becomes the final,
    open-ended version rather than a bogus earliest one). Output
    column COLLISIONS RAISE rather than silently clobbering an
    existing SCD-2 shape. Fully SQL-expressible
    → DuckDB oracle (driver_queries.scd2_order_history).
    """
    keys = [key] if isinstance(key, str) else list(key)
    from_col, to_col = "valid_from", "valid_to"
    clash = [c for c in (from_col, to_col, current_flag) if c in df.columns]
    if clash:
        raise ValueError(
            f"output column(s) {clash} already exist on the input — "
            "rename or drop them first (rebuilding intervals from an "
            "SCD-2 table should not silently overwrite its history)"
        )
    order = [F.col(ts).asc_nulls_last()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc_nulls_last())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(from_col, F.col(ts))
        .withColumn(to_col, F.lead(ts).over(w))
        .withColumn(current_flag, F.col(to_col).isNull())
    )
