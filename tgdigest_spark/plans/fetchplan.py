"""Incremental-refresh planning — the reference's FetchPlan, re-expressed.

Port of the planning rules in /root/reference/src/cache.rs:200-310
(constants cache.rs:35-45), driving which ranges/partitions a refresh
job must (re)read. In the engine this decides which sketch-checkpoint
partitions to rebuild (plans/checkpoints.refresh) or which partitions an
ingest job re-reads from the upstream source.

Rules (verbatim semantics):
1. HEAD: the newest 200 rows of a queried range are always refreshed,
   debounced to >= 60 s since their oldest fetched_at; an empty cache
   fetches the head with force_limit (or 200).
2. TTL: rows younger than 7 days with fetched_at older than 24 h force a
   refresh of [max(now-7d, from) .. to] unless an existing range covers
   it; rows older than 7 days are permanently fresh.
3. PROGRESSIVE: with force_limit and a non-empty cache, fetch
   [from .. oldest_cached] to walk history backward.
4. EDGES: if the request exceeds the recorded fetch bounds, fetch the
   uncovered edges.
5. FORCE: bypass everything — one range covering [from .. to].

All timestamps are unix seconds UTC (reference stores i64 seconds).
"""

from __future__ import annotations

from dataclasses import dataclass, field

DAY = 86_400
WEEK = 7 * DAY
MAX_FETCH_PER_REQUEST = 30_000  # cache.rs:39
ALWAYS_REFRESH_HEAD = 200  # cache.rs:41-42
DEFAULT_FETCH_CAP = 1_000  # cache.rs:44-45
HEAD_DEBOUNCE_S = 60  # cache.rs:233


@dataclass
class CacheState:
    """What the planner knows about cached rows in the queried range."""

    cached_count: int = 0
    oldest_cached_date: int | None = None
    head_oldest_fetched_at: int | None = None  # min fetched_at of newest 200
    stale_young_rows: bool = False  # any row: age < 7d and fetched_at > 1d old
    fetch_bounds: tuple[int, int] | None = None  # (min_fetched, max_fetched)


@dataclass
class FetchPlan:
    ranges: list[tuple[int, int, int]] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not self.ranges

    @property
    def total_limit(self) -> int:  # cache.rs:64-66
        return sum(r[2] for r in self.ranges)


def build_fetch_plan(
    from_date: int,
    to_date: int,
    now: int,
    state: CacheState,
    force: bool = False,
    force_limit: int | None = None,
) -> FetchPlan:
    if force:  # ST5, cache.rs:164-168
        return FetchPlan([(from_date, to_date, force_limit or MAX_FETCH_PER_REQUEST)])

    ranges: list[tuple[int, int, int]] = []

    # 1. head refresh (cache.rs:225-236, 243-251)
    needs_head = False
    if state.cached_count == 0:
        needs_head = True
    elif state.head_oldest_fetched_at is not None and (
        now - state.head_oldest_fetched_at
    ) >= HEAD_DEBOUNCE_S:
        needs_head = True
    if needs_head:
        head_limit = (
            (force_limit or ALWAYS_REFRESH_HEAD)
            if state.cached_count == 0
            else ALWAYS_REFRESH_HEAD
        )
        ranges.append((from_date, to_date, head_limit))

    # 2. TTL refresh of the mutable week (cache.rs:253-266)
    if state.stale_young_rows:
        weekly_from = max(now - WEEK, from_date)
        already_covered = any(
            f <= weekly_from and t >= to_date for f, t, _ in ranges
        )
        if not already_covered:
            ranges.append((weekly_from, to_date, MAX_FETCH_PER_REQUEST))

    # 3. progressive backfill (cache.rs:268-283)
    if force_limit is not None and state.cached_count > 0:
        if (
            state.oldest_cached_date is not None
            and state.oldest_cached_date > from_date
        ):
            ranges.append((from_date, state.oldest_cached_date, force_limit))

    # 4. uncovered edges (cache.rs:284-301)
    if (not ranges or force_limit is not None) and state.fetch_bounds:
        min_f, max_f = state.fetch_bounds
        edge_limit = force_limit or ALWAYS_REFRESH_HEAD
        if from_date < min_f:
            ranges.append((from_date, min_f, edge_limit))
        if to_date > max_f:
            ranges.append((max_f, to_date, edge_limit))

    return FetchPlan(ranges)


def paginate(limit: int, max_per_request: int = MAX_FETCH_PER_REQUEST) -> list[int]:
    """ST6 — split a large limit into successive request sizes
    (src/main.rs:309-355's loop bound)."""
    out = []
    remaining = limit
    while remaining > 0:
        take = min(remaining, max_per_request)
        out.append(take)
        remaining -= take
    return out
