"""Distributed range join — point-in-interval matching at scale.

``range_join(points, intervals)`` pairs every point row with every
interval row (same key) whose ``[start, end]`` contains the point.
Classic uses: event-in-session attribution, IP-to-range lookup,
time-validity (SCD-2) joins, genomic interval overlap.

Spark's only native plan for a pure inequality join is
BroadcastNestedLoopJoin / cartesian — O(|L|·|R|) per key and a
scale-killer. The standard distributed shape (what Databricks' range
join hint and interval libraries like bioinformatics' binning schemes
do) is implemented here declaratively:

1. pick a bin width ~ the typical interval length;
2. each point hashes to ONE bin (``p div w``); each interval explodes
   to the bins it spans (``sequence(s div w, e div w)``) — expected
   explosion ≈ 1 + len/width;
3. equi-join on (keys…, bin) — a real shuffled hash join Catalyst can
   plan, AQE-skew-split, and whole-stage-codegen — then post-filter
   ``s <= p <= e``. A (point, interval) pair can only meet in the
   point's unique bin, so no dedup is needed.

Outlier intervals spanning more than ``long_cap`` bins would explode
the fan-out, so they take a side path: assumed FEW (or the caller
picked the wrong width), they broadcast into a pure range join and the
two halves union. This bounds worst-case fan-out at
``long_cap`` rows per short interval + |long intervals| broadcast.

Everything is built-in expressions (sequence/explode/div) — no UDF, no
driver collect except the optional width estimate (a 1-row agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BIN = "__rj_bin"


def estimate_bin_width(
    intervals: DataFrame, start: str, end: str, q: float = 0.75
) -> int:
    """Width ≈ the q-quantile interval length (1-row approx agg): keeps
    the expected per-interval explosion factor ~2 while leaving most
    points' bins selective."""
    row = intervals.agg(
        F.expr(
            f"approx_percentile({end} - {start}, {q})"
        ).alias("w")
    ).collect()[0]
    return max(1, int(row["w"] or 1))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    start: str,
    end: str,
    on: str | list[str] | None = None,
    bin_width: int | None = None,
    long_cap: int = 256,
    spread_bins: bool = False,
) -> DataFrame:
    """Inner join of ``points`` × ``intervals`` on optional equality
    keys ``on`` plus containment ``start <= point <= end``.

    ``point``/``start``/``end`` are integer-valued columns (cast
    timestamps to ``unix_micros`` first — keeps the operator agnostic
    and the bin arithmetic exact). Output: all point columns + all
    interval columns (caller aliases collisions away beforehand; the
    equality keys appear once).

    ``bin_width``: bin size in point units; default = 75th-percentile
    interval length (one tiny extra job). ``long_cap``: intervals
    spanning more bins than this broadcast through the nested-loop side
    path instead of exploding.

    ``spread_bins``: the SKEW escape hatch. By default the equi-join
    lets Catalyst co-partition however is cheapest — over a
    key-bucketed interval side that means partitioning on the KEY
    subset alone (zero interval-side shuffle), which is optimal for
    uniform keys but puts a hot key's ENTIRE bin workload in one task
    (measured: a key holding 20% of both sides at 10^7×10^7 rows
    turns a 1.6 s max-task into a 57 s straggler — BENCH.md round-5
    skew table). ``spread_bins=True`` repartitions the exploded
    intervals on (keys…, bin), forcing both sides to cluster on the
    FULL join key so a hot key's bins spread across the cluster —
    trading the co-located layout (the interval side now shuffles)
    for straggler-free execution. Pick by key histogram: uniform /
    mild Zipf → default; heavy head → spread_bins=True, ideally with
    a ``bin_width`` sized to the hot key's interval density (per-bin
    join work is points/bin × intervals/bin).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if bin_width is None:
        bin_width = estimate_bin_width(intervals, start, end)
    w = int(bin_width)

    # div: integer division on longs (inputs are epoch-like non-negative
    # integers; one consistent operator everywhere)
    p_bin = F.expr(f"cast({point} as long) div {w}")
    s_bin = F.expr(f"cast({start} as long) div {w}")
    e_bin = F.expr(f"cast({end} as long) div {w}")
    span_bins = e_bin - s_bin

    short = intervals.where(span_bins < F.lit(long_cap))
    long_ = intervals.where(span_bins >= F.lit(long_cap))

    exploded = short.withColumn(
        _BIN, F.explode(F.sequence(s_bin, e_bin))
    )
    if spread_bins:
        exploded = exploded.repartition(*(keys + [_BIN]))
    pts = points.withColumn(_BIN, p_bin)
    contained = (F.col(start) <= F.col(point)) & (
        F.col(point) <= F.col(end)
    )
    short_hits = (
        pts.join(exploded, keys + [_BIN])
        .where(contained)
        .drop(_BIN)
    )
    # oversized intervals: few by contract → broadcast range join
    if keys:
        long_hits = points.join(
            F.broadcast(long_), on=keys, how="inner"
        ).where(contained)
    else:
        long_hits = points.join(F.broadcast(long_), contained)
    return short_hits.unionByName(long_hits)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bin_width: int | None = None,
    long_cap: int = 256,
    spread_bins: bool = False,
) -> DataFrame:
    """Interval × interval overlap join (closed intervals:
    ``left_start <= right_end AND right_start <= left_end``), same
    binning discipline as :func:`range_join`.

    Dedup without a distinct: two overlapping intervals both contain
    the overlap's start ``max(left_start, right_start)``, so both
    explode to its bin — the pair is emitted only from that one
    OWNING bin (``bin == greatest(ls, rs) div w``). Exactly-once by
    construction, no shuffle-the-output dedup step.

    Long intervals (> ``long_cap`` bins) on either side skip the
    explode and broadcast instead: long-left × all-right and
    short-left × long-right cover every long-involving pair exactly
    once. Column names must be disjoint across the two inputs apart
    from the equality keys (alias beforehand — keeps the operator
    mechanical, like range_join).

    ``spread_bins``: same skew escape hatch as :func:`range_join` —
    repartition both exploded sides on (keys…, bin) so a hot key's
    bins spread across tasks instead of riding whatever narrower
    co-partitioning Catalyst finds.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    if bin_width is None:
        bin_width = estimate_bin_width(right, right_start, right_end)
    w = int(bin_width)

    def b(col: str):
        return F.expr(f"cast({col} as long) div {w}")

    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    own = F.col(_BIN) == F.expr(
        f"greatest(cast({left_start} as long), cast({right_start} as long))"
        f" div {w}"
    )

    def split(df, s, e):
        span = b(e) - b(s)
        return df.where(span < F.lit(long_cap)), df.where(
            span >= F.lit(long_cap)
        )

    short_l, long_l = split(left, left_start, left_end)
    short_r, long_r = split(right, right_start, right_end)

    def explode_bins(df, s, e):
        out = df.withColumn(_BIN, F.explode(F.sequence(b(s), b(e))))
        return out.repartition(*(keys + [_BIN])) if spread_bins else out

    a = (
        explode_bins(short_l, left_start, left_end)
        .join(explode_bins(short_r, right_start, right_end), keys + [_BIN])
        .where(overlap & own)
        .drop(_BIN)
    )
    if keys:
        b_hits = right.join(F.broadcast(long_l), on=keys).where(overlap)
        c_hits = short_l.join(F.broadcast(long_r), on=keys).where(overlap)
    else:
        b_hits = right.join(F.broadcast(long_l), overlap)
        c_hits = short_l.join(F.broadcast(long_r), overlap)
    return a.unionByName(b_hits).unionByName(c_hits)
