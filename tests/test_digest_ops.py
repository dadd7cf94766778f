"""Digest-semantics parity: the reference's flagship pipeline vs an
independent DuckDB oracle over the same posts table, plus the
non-standard calendar rules ported from main.rs:361-412.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from tgdigest_spark.functions.calendar import (
    assign_week_of_month,
    base_day,
    month_window,
    week_of_month_cols,
    week_window,
    year_window,
)
from tgdigest_spark.operators.digest import (
    dedup_albums,
    dedup_posts,
    slim_cards,
    top_posts,
)

UTC = timezone.utc

FROM_TS = "2024-03-01 00:00:00"
TO_TS = "2025-03-01 00:00:00"

ORACLE_TOPK = """
WITH dedup AS (
    SELECT * EXCLUDE rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY channel, id) AS rn FROM posts
    ) WHERE rn = 1
), ranged AS (
    SELECT * FROM dedup
    WHERE date BETWEEN TIMESTAMP '{f}' AND TIMESTAMP '{t}'
), albums AS (
    SELECT * EXCLUDE rn2 FROM (
        SELECT *, CASE WHEN grouped_id IS NULL THEN 1 ELSE
            ROW_NUMBER() OVER (PARTITION BY channel, grouped_id ORDER BY date, id)
        END AS rn2 FROM ranged
    ) WHERE rn2 = 1
), unpiv AS (
    SELECT channel, id, date, message, 'replies' AS metric, replies AS count FROM albums
    UNION ALL SELECT channel, id, date, message, 'reactions', reactions FROM albums
    UNION ALL SELECT channel, id, date, message, 'forwards', forwards FROM albums
    UNION ALL SELECT channel, id, date, message, 'views', views FROM albums
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY channel, metric ORDER BY count DESC NULLS LAST, id
    ) AS rank FROM unpiv
)
SELECT channel, metric, rank, id, count FROM ranked WHERE rank <= {k}
"""


def _oracle(posts_path: str, k: int):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW posts AS SELECT * FROM read_parquet('{posts_path}')"
    )
    return con.execute(ORACLE_TOPK.format(f=FROM_TS, t=TO_TS, k=k)).df()


@pytest.mark.parametrize("k", [1, 3, 10])
def test_top_posts_parity(spark, posts, posts_path, k):
    got = (
        top_posts(posts, top_count=k, from_ts=FROM_TS, to_ts=TO_TS)
        .select("channel", "metric", "rank", "id", "count")
        .toPandas()
        .sort_values(["channel", "metric", "rank"])
        .reset_index(drop=True)
    )
    want = (
        _oracle(posts_path, k)
        .sort_values(["channel", "metric", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["id"].tolist() == want["id"].tolist()
    got_counts = got["count"].astype("float64").fillna(-1)
    want_counts = want["count"].astype("float64").fillna(-1)
    assert got_counts.tolist() == want_counts.tolist()


def test_nulls_rank_last(spark, posts):
    top = top_posts(posts, top_count=3, from_ts=FROM_TS, to_ts=TO_TS)
    assert top.where(F.col("count").isNull()).count() == 0 or (
        # nulls can only appear if a (channel,metric) has <3 non-null rows
        top.where(F.col("count").isNotNull()).count() > 0
    )
    # explicit check: every ranked non-null count >= any null-ranked row
    assert (
        top.where(F.col("rank") == 1).where(F.col("count").isNull()).count() == 0
    )


def test_dedup_posts_removes_injected_duplicates(spark, posts):
    total = posts.count()
    deduped = dedup_posts(posts).count()
    distinct = posts.select("channel", "id").distinct().count()
    assert deduped == distinct < total


def test_dedup_albums_keeps_first_only(spark, posts):
    d = dedup_albums(dedup_posts(posts))
    per_group = (
        d.where(F.col("grouped_id").isNotNull())
        .groupBy("channel", "grouped_id")
        .count()
    )
    assert per_group.where(F.col("count") > 1).count() == 0
    # null-grouped rows all pass
    nulls_before = dedup_posts(posts).where(F.col("grouped_id").isNull()).count()
    nulls_after = d.where(F.col("grouped_id").isNull()).count()
    assert nulls_before == nulls_after


def test_slim_cards_nulls_filtered(spark, posts):
    top = top_posts(posts, top_count=10, from_ts=FROM_TS, to_ts=TO_TS)
    slim = slim_cards(top)
    assert slim.where(F.col("count").isNull()).count() == 0
    assert set(slim.columns) == {"channel", "metric", "rank", "id", "count"}


# ---------------------------------------------------------------------------
# calendar (F1-F3)
# ---------------------------------------------------------------------------

def test_year_month_windows():
    assert year_window(2024) == (
        datetime(2024, 1, 1, tzinfo=UTC),
        datetime(2025, 1, 1, tzinfo=UTC),
    )
    assert month_window(2024, 12) == (
        datetime(2024, 12, 1, tzinfo=UTC),
        datetime(2025, 1, 1, tzinfo=UTC),
    )
    with pytest.raises(ValueError):
        month_window(2024, 13)


def test_week_window_reference_formula():
    # Jan 2024 starts Monday → number_from_monday=1 → base_day=2:
    # week 1 runs Jan 2..Jan 9 (the reference's own quirk, preserved)
    start, end = week_window(2024, 1, 1)
    assert start == datetime(2024, 1, 2, tzinfo=UTC)
    assert end - start == timedelta(days=7)
    # Dec 2024 starts Sunday → base_day=8 → week 5 would be day 36 → invalid
    assert base_day(2024, 12) == 8
    with pytest.raises(ValueError):
        week_window(2024, 12, 5)
    with pytest.raises(ValueError):
        week_window(2024, 1, 6)  # reference's day-32 overflow
    # Feb 2024 (29 days, starts Thu → base_day=5): week 4 = day 26, valid;
    # week 5 = day 33 → invalid
    assert week_window(2024, 2, 4)[0].day == 26
    with pytest.raises(ValueError):
        week_window(2024, 2, 5)


def test_week_of_month_cols_vs_python_oracle(spark):
    rng = np.random.default_rng(17)
    epoch = datetime(2023, 1, 1, tzinfo=UTC)
    dates = [epoch + timedelta(days=int(d)) for d in rng.integers(0, 900, 400)]
    df = spark.createDataFrame(
        [(d.replace(tzinfo=None),) for d in dates], "ts timestamp"
    )
    y, m, w = week_of_month_cols(F.col("ts"))
    got = df.select("ts", y, m, w).collect()
    for row in got:
        d = row["ts"].replace(tzinfo=UTC)
        assert (row["wm_year"], row["wm_month"], row["wm_week"]) == (
            assign_week_of_month(d)
        ), d
