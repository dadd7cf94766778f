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

from ..functions.timeutil import epoch_us, from_epoch_us

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

    # timezone-FREE microsecond epochs (functions/timeutil.py): the old
    # cast-to-TIMESTAMP idiom read NTZ/DATE values at session-local
    # time, so a DST-observing session could reorder the scan near a
    # spring-forward gap (nonexistent wall times map AFTER later ones)
    lts_type = dict(left.dtypes)[left_ts]
    rts_type = dict(right.dtypes)[right_ts]

    def us_l(col: str):
        return epoch_us(col, lts_type)

    def us_r(col: str):
        return epoch_us(col, rts_type)

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
        us_r(right_ts).alias(_TS_US),
        F.struct(
            us_r(right_ts).alias("__rts_us"),
            *[F.col(c) for c in payload_cols],
        ).alias(_PAYLOAD),
        (
            F.col(right_tiebreak)
            if right_tiebreak is not None
            else F.lit(0)
        ).alias("__tb"),
    )
    l = left.select(
        *left_cols, us_l(left_ts).alias(_TS_US), F.lit(None).alias("__tb")
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
        from_epoch_us(F.col(_PAYLOAD)["__rts_us"], rts_type).alias(
            matched_ts_name
        ),
        *[
            F.col(_PAYLOAD)[c].alias(out_names[c])
            for c in payload_cols
        ],
    )


def asof_join_intervals(
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
    bin_width: int | None = None,
    long_cap: int = 256,
    spread_bins: bool | str = False,
    hot_key_rows: int = 1_000_000,
) -> DataFrame:
    """As-of join via validity intervals + binned range join — the
    bucketed-layout-friendly formulation of :func:`asof_join`, same
    semantics and output schema.

    ``spread_bins`` (skew control — measured cliff in BENCH.md round
    5): ``False`` (default) keeps the co-located zero-right-shuffle
    plan; ``True`` forces the (key, bin) spread layout everywhere
    (see :func:`range_join`); ``"auto"`` is the HYBRID — one narrow
    count-per-key agg of the left finds keys holding more than
    ``hot_key_rows`` points (provably ≤ n/hot_key_rows of them, so
    the driver-side key list is bounded), routes those keys' rows
    through the spread layout and everything else through the
    co-located path, and unions the two results. Under the round-5
    hot20 stress the hybrid keeps 80% of the data on the
    never-shuffled bucketed path while the hot key's bins spread
    across the cluster.

    Why a second formulation: the union-based :func:`asof_join` always
    re-Exchanges BOTH sides (``Union`` reports unknown partitioning
    regardless of its children — see the module docstring), so over a
    key-bucketed right table the layout buys nothing. Here the right
    side stays a single-source lineage: one ``lead()`` window turns
    each state change into its ``[valid_from, valid_to)`` validity
    interval (over a key-bucketed layout that window plans as
    Sort-without-Exchange), a per-key sentinel interval covers
    "before the first change" (null payload), and the left side's
    points equi-join into the intervals' time bins via the
    :func:`range_join` discipline — a plain shuffled hash join, never
    BNLJ. Per key the intervals partition the timeline, so each point
    matches EXACTLY one interval: no dedup, and left-join semantics
    come from the sentinel plus an anti-join for keys absent from the
    right side entirely.

    ``direction='forward'`` is the same algorithm over negated
    timestamps; ``strict`` shifts interval starts by one microsecond.
    ``bin_width``/``long_cap`` as in :func:`range_join`. Sentinel and
    open-ended current intervals are bounded by the KEY'S OWN first /
    last left point (a per-key min/max agg of the left, joined in on
    the keys), not by global bounds — so a key whose activity is
    concentrated cannot manufacture a timeline-spanning interval that
    overflows ``long_cap`` and rides range_join's broadcast path per
    key (a memory hazard at high key cardinality). Intervals still
    longer than ``long_cap`` bins after that are data-real outliers
    (a key active across the whole timeline with rare state changes)
    and take the broadcast side path by design.

    Scale shape: the big right side is scanned once, windowed without
    an Exchange over buckets, and exploded ~(1 + len/width) per
    interval; only the left side shuffles (by key, matching the
    buckets). The bin join uses a join-key SUBSET for co-partitioning,
    so ``spark.sql.requireAllClusterKeysForCoPartition=false`` (set by
    session.get_spark; Spark 4 defaults it to true) is required for
    the zero-right-shuffle plan — without it results are identical but
    both sides re-Exchange on (key, bin). Parity vs :func:`asof_join`
    is pytest-enforced on identical data (tests/test_asof.py).
    """
    from .range_join import range_join

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)

    if spread_bins == "auto":
        return _asof_intervals_hybrid(
            left,
            right,
            keys,
            hot_key_rows,
            dict(
                left_ts=left_ts,
                right_ts=right_ts,
                direction=direction,
                strict=strict,
                tolerance_us=tolerance_us,
                right_tiebreak=right_tiebreak,
                suffix=suffix,
                bin_width=bin_width,
                long_cap=long_cap,
            ),
        )

    right_ts = right_ts or left_ts
    left_cols = left.columns
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {c: (c + suffix if c in left_cols else c) for c in payload_cols}
    matched_ts_name = right_ts + suffix
    sign = 1 if direction == "backward" else -1

    # timezone-free epochs — see the asof_join comment / timeutil.py
    lts_type = dict(left.dtypes)[left_ts]
    rts_type = dict(right.dtypes)[right_ts]

    def us_l(col: str):
        return epoch_us(col, lts_type)

    def us_r(col: str):
        return epoch_us(col, rts_type)

    # NULL keys / NULL timestamps match nothing (same three-valued
    # semantics as asof_join)
    for k in keys:
        right = right.where(F.col(k).isNotNull())
    right = right.where(F.col(right_ts).isNotNull())

    # right rows → (keys, _t, payload struct); _t is the signed micro
    # timestamp so forward is backward on the mirrored axis, +1 for
    # strict (interval starts one microsecond after the change)
    t_expr = us_r(right_ts) * F.lit(sign) + F.lit(1 if strict else 0)
    r = right.select(
        *keys,
        t_expr.alias("_t"),
        F.struct(
            us_r(right_ts).alias("__rts_us"),
            *[F.col(c) for c in payload_cols],
        ).alias(_PAYLOAD),
        (
            F.col(right_tiebreak)
            if right_tiebreak is not None
            else F.lit(0)
        ).alias("__tb"),
    )
    payload_type = r.schema[_PAYLOAD].dataType

    # per-key bounds of the LEFT points (one narrow agg, shuffled on
    # the same keys the bin join uses). These replace the old GLOBAL
    # [lo, hi] driver collect: the sentinel interval now starts at the
    # key's OWN earliest point and the open-ended current interval
    # caps at the key's OWN newest point, so a key whose activity is
    # concentrated doesn't manufacture a timeline-spanning interval
    # that overflows ``long_cap`` and rides range_join's broadcast
    # path (the per-key-broadcast memory hazard on high-cardinality
    # keys). As a bonus the inner join prunes right keys with no left
    # points at all — their intervals could never match anything.
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    pts = left.select(
        *left_cols, (us_l(left_ts) * F.lit(sign)).alias("_p")
    ).where(F.col("_p").isNotNull() & cond)
    key_bounds = pts.groupBy(*keys).agg(
        F.min("_p").alias("_klo"), F.max("_p").alias("_khi")
    )

    # __tb asc NULLS LAST, matching asof_join's window order exactly:
    # the sorted-LAST row among ties wins there (last() carry) and gets
    # the non-empty interval here — with default nulls-first a NULL
    # tiebreak would win in one formulation and lose in the other
    wiv = Window.partitionBy(*keys).orderBy(
        F.col("_t").asc(), F.col("__tb").asc_nulls_last()
    )
    iv0 = r.select(
        *keys,
        "_t",
        _PAYLOAD,
        F.lead("_t").over(wiv).alias("_vto"),
        F.row_number().over(wiv).alias("_rn"),
    )
    # join the per-key left bounds in AFTER the window, on exactly the
    # keys: over a bucketed right table the windowed side keeps its
    # layout (only the tiny bounds agg exchanges to match), so the
    # zero-right-shuffle plan survives
    ivb = iv0.join(key_bounds, keys, "inner")
    # per-key sentinel interval (key's first left point, first change)
    # with NULL payload, so every left row whose key exists in right
    # matches exactly one interval (left-join semantics without a
    # second pass over the bins). The sentinel is emitted by EXPLODING
    # the key's first row into [sentinel, own] — NOT by a union: Union
    # reports unknown partitioning and would force the bucketed side
    # back through an Exchange, the exact failure mode this
    # formulation exists to avoid. Bounded below by the key's oldest
    # left point (semantics-free truncation: this key has nothing
    # earlier to match).
    own = F.struct(
        F.col("_t").alias("f"), F.col("_vto").alias("t"), F.col(_PAYLOAD).alias("p")
    )
    sent = F.struct(
        F.col("_klo").alias("f"),
        F.col("_t").alias("t"),
        F.lit(None).cast(payload_type).alias("p"),
    )
    pieces = F.when(F.col("_rn") == 1, F.array(sent, own)).otherwise(
        F.array(own)
    )
    # close intervals: half-open [vf, vto) → closed [vf, vto-1] in
    # integer micros; the current (open-ended) interval caps at the
    # key's newest left point — beyond it this key has nothing to match
    closed = (
        ivb.select(*keys, "_klo", "_khi", F.explode(pieces).alias("_e"))
        .select(
            *keys,
            F.col("_e.f").alias("_vf"),
            F.coalesce(F.col("_e.t") - F.lit(1), F.col("_khi")).alias("_ve"),
            F.col("_e.p").alias(_PAYLOAD),
            "_klo",
            "_khi",
        )
        .where(F.col("_ve") >= F.col("_vf"))  # zero-length tie/sentinel out
        .where(F.col("_vf") <= F.col("_khi"))  # starts after key's last point
        .where(F.col("_ve") >= F.col("_klo"))  # ends before key's first point
        .drop("_klo", "_khi")
    )

    matched = range_join(
        pts,
        closed,
        point="_p",
        start="_vf",
        end="_ve",
        on=keys,
        bin_width=bin_width,
        long_cap=long_cap,
        spread_bins=spread_bins,
    )

    # left rows that can match nothing: NULL ts / NULL key / key absent
    # from the right side — null payload, like a SQL left join
    right_keys = right.select(*keys).distinct()
    has_pt = F.col(left_ts).isNotNull() & cond
    unmatched = left.where(~has_pt).unionByName(
        left.where(has_pt).join(right_keys, keys, "left_anti")
    )
    out = matched.select(
        *left_cols, F.col(_PAYLOAD).alias("__pl")
    ).unionByName(
        unmatched.select(
            *left_cols, F.lit(None).cast(payload_type).alias("__pl")
        )
    )
    if tolerance_us is not None:
        gap = F.abs(us_l(left_ts) - F.col("__pl")["__rts_us"])
        out = out.withColumn(
            "__pl",
            F.when(gap <= F.lit(int(tolerance_us)), F.col("__pl")),
        )
    return out.select(
        *left_cols,
        from_epoch_us(F.col("__pl")["__rts_us"], rts_type).alias(
            matched_ts_name
        ),
        *[F.col("__pl")[c].alias(out_names[c]) for c in payload_cols],
    )


def _asof_intervals_hybrid(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    hot_key_rows: int,
    kw: dict,
) -> DataFrame:
    """spread_bins="auto": split the key space by left-point count and
    run the co-located formulation on the cold keys, the (key, bin)
    spread formulation on the hot ones, unioning the results.

    The hot-key list is collected to the driver, which is SAFE by
    construction: at most ``n_left / hot_key_rows`` keys can exceed
    the threshold (≤ 100 keys even at 10^8 rows with the default
    10^6), and the literal IN-list pushes down into both scans. The
    cold-side filters preserve the right table's bucketed
    partitioning, so the zero-right-shuffle plan survives for the
    bulk of the data. NULL-key left rows ride the cold branch (their
    filter must be null-tolerant — ``~isin`` alone would silently
    drop them).
    """
    nn = F.lit(True)
    for k in keys:
        nn = nn & F.col(k).isNotNull()
    # NULL keys never match anything, so they can neither be hot nor
    # benefit from spreading — counting them would produce a NULL
    # equality predicate and a silently-empty spread branch
    cnt = (
        left.where(F.col(kw["left_ts"]).isNotNull() & nn)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= F.lit(int(hot_key_rows)))
        .select(*keys)
        .collect()
    )
    if not cnt:
        return asof_join_intervals(left, right, keys, **kw)
    hot_rows = [tuple(r[k] for k in keys) for r in cnt]

    import functools

    def is_hot(_=None):
        conds = [
            functools.reduce(
                lambda a, b: a & b,
                [F.col(k) == F.lit(v) for k, v in zip(keys, row)],
            )
            for row in hot_rows
        ]
        return functools.reduce(lambda a, b: a | b, conds)

    hot = is_hot()
    cold = asof_join_intervals(
        left.where(~F.coalesce(hot, F.lit(False))),
        right.where(~F.coalesce(is_hot(), F.lit(False))),
        keys,
        spread_bins=False,
        **kw,
    )
    spread = asof_join_intervals(
        left.where(hot),
        right.where(is_hot()),
        keys,
        spread_bins=True,
        **kw,
    )
    return cold.unionByName(spread)


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    **kwargs,
) -> DataFrame:
    """Pick the right as-of formulation automatically.

    The two formulations are result-identical (pytest-enforced parity)
    but have different plan shapes: :func:`asof_join` (union form)
    always re-Exchanges BOTH sides, while :func:`asof_join_intervals`
    keeps a key-partitioned right side in place and shuffles only the
    points. The dispatch rule is therefore keyed on the RIGHT plan's
    physical output partitioning: if it already hash-partitions on (a
    subset of) the join keys — a key-bucketed table scan, or a lineage
    that ends in ``repartition(key)`` — the intervals form preserves
    that layout (its window and bin join plan without a right-side
    Exchange); anything else takes the union form, whose single
    key-shuffle + codegen window is the cheaper generic shape (the
    intervals form pays an interval explosion and a per-key bounds
    join that only earn their keep when they save the big side's
    shuffle).

    ``kwargs`` pass through to the chosen formulation (tolerance,
    direction, strict, tiebreak, suffix; bin_width/long_cap are
    dropped for the union form, which has no bins).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if _hash_partitioned_on_keys(right, keys):
        return asof_join_intervals(left, right, on, **kwargs)
    # the union form has no bins — strip every intervals-only knob so
    # the same call site works regardless of which layout dispatch sees
    for k in ("bin_width", "long_cap", "spread_bins", "hot_key_rows"):
        kwargs.pop(k, None)
    return asof_join(left, right, on, **kwargs)


def _hash_partitioned_on_keys(df: DataFrame, keys: list[str]) -> bool:
    """True iff ``df``'s pre-AQE physical plan reports
    ``hashpartitioning`` whose expressions are a non-empty subset of
    ``keys`` (by column name) — the condition under which a window /
    join clustered on ``keys`` reuses the layout without an Exchange.

    Uses ``sparkPlan()`` (not ``executedPlan()``) so the check sees
    the real scan partitioning rather than the AdaptiveSparkPlan
    wrapper; planning the frame once here is cheap and cached by the
    session's query execution.
    """
    import re

    try:
        part = (
            df._jdf.queryExecution().sparkPlan().outputPartitioning()
        ).toString()
    except Exception:  # non-classic DF / connect — fall back to union
        return False
    m = re.match(r"hashpartitioning\((.+), \d+\)$", part)
    if not m:
        return False
    names = {
        re.sub(r"#\d+L?$", "", e.strip())
        for e in m.group(1).split(", ")
    }
    return bool(names) and names <= set(keys)


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
