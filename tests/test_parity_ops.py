"""Parity operators: upsert sinks (S5-S7/ST8), FetchPlan (D3/ST1-ST5),
formatting scalars (F5/F6/F8/F9/F13), entity rendering (F10/F12).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tgdigest_spark.plans.fetchplan import (
    ALWAYS_REFRESH_HEAD,
    MAX_FETCH_PER_REQUEST,
    CacheState,
    build_fetch_plan,
    paginate,
)

NOW = 1_700_000_000
FROM, TO = NOW - 30 * 86_400, NOW


# ---------------------------------------------------------------------------
# FetchPlan (pure python)
# ---------------------------------------------------------------------------

def test_empty_cache_initial_fetch():
    plan = build_fetch_plan(FROM, TO, NOW, CacheState())
    assert plan.ranges == [(FROM, TO, ALWAYS_REFRESH_HEAD)]
    plan = build_fetch_plan(FROM, TO, NOW, CacheState(), force_limit=5000)
    assert plan.ranges[0] == (FROM, TO, 5000)


def test_head_refresh_debounce():
    fresh = CacheState(cached_count=500, head_oldest_fetched_at=NOW - 30)
    assert build_fetch_plan(FROM, TO, NOW, fresh).is_empty
    stale = CacheState(cached_count=500, head_oldest_fetched_at=NOW - 61)
    plan = build_fetch_plan(FROM, TO, NOW, stale)
    assert plan.ranges == [(FROM, TO, ALWAYS_REFRESH_HEAD)]


def test_ttl_weekly_refresh():
    st = CacheState(
        cached_count=500, head_oldest_fetched_at=NOW - 10, stale_young_rows=True
    )
    plan = build_fetch_plan(FROM, TO, NOW, st)
    assert plan.ranges == [(NOW - 7 * 86_400, TO, MAX_FETCH_PER_REQUEST)]
    # covered by a head range that spans [FROM..TO] → deduped
    st2 = CacheState(
        cached_count=500, head_oldest_fetched_at=NOW - 100, stale_young_rows=True
    )
    plan2 = build_fetch_plan(FROM, TO, NOW, st2)
    assert len(plan2.ranges) == 1  # head range [FROM,TO] dominates weekly


def test_progressive_backfill_and_edges():
    st = CacheState(
        cached_count=500,
        head_oldest_fetched_at=NOW - 10,
        oldest_cached_date=FROM + 5 * 86_400,
        fetch_bounds=(FROM + 5 * 86_400, NOW - 10),
    )
    plan = build_fetch_plan(FROM, TO, NOW, st, force_limit=1000)
    # backfill below oldest cached + uncovered leading edge
    assert (FROM, FROM + 5 * 86_400, 1000) in plan.ranges
    assert plan.total_limit >= 1000


def test_force_bypasses_everything():
    st = CacheState(cached_count=10_000, head_oldest_fetched_at=NOW)
    plan = build_fetch_plan(FROM, TO, NOW, st, force=True)
    assert plan.ranges == [(FROM, TO, MAX_FETCH_PER_REQUEST)]


def test_paginate():
    assert paginate(70_000) == [30_000, 30_000, 10_000]
    assert paginate(100) == [100]
    assert paginate(0) == []


# ---------------------------------------------------------------------------
# upsert sinks
# ---------------------------------------------------------------------------

def test_upsert_parquet_replace_and_idempotent(spark, tmp_path):
    from tgdigest_spark.sources.upsert import upsert_parquet

    target = str(tmp_path / "posts_tbl")
    base = spark.createDataFrame(
        [("c", 1, 10), ("c", 2, 20)], "channel string, id int, views int"
    )
    upsert_parquet(spark, target, base, ["channel", "id"])
    batch = spark.createDataFrame(
        [("c", 2, 99), ("c", 3, 30)], "channel string, id int, views int"
    )
    upsert_parquet(spark, target, batch, ["channel", "id"])
    got = {
        (r["channel"], r["id"]): r["views"]
        for r in spark.read.parquet(target).collect()
    }
    assert got == {("c", 1): 10, ("c", 2): 99, ("c", 3): 30}
    # idempotent re-run (ST8)
    upsert_parquet(spark, target, batch, ["channel", "id"])
    got2 = {
        (r["channel"], r["id"]): r["views"]
        for r in spark.read.parquet(target).collect()
    }
    assert got2 == got


def test_upsert_partitioned_touches_only_batch_partitions(spark, tmp_path):
    import os

    from tgdigest_spark.sources.upsert import upsert_partitioned

    target = str(tmp_path / "part_tbl")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0), (3, "2024-01-03", 3.0)],
        "id int, day string, v double",
    )
    upsert_partitioned(spark, target, base, ["id"], "day")
    mtime_d3 = os.path.getmtime(os.path.join(target, "day=2024-01-03"))
    batch = spark.createDataFrame(
        [(2, "2024-01-02", 2.5)], "id int, day string, v double"
    )
    touched = upsert_partitioned(spark, target, batch, ["id"], "day")
    assert touched == ["2024-01-02"]
    assert os.path.getmtime(os.path.join(target, "day=2024-01-03")) == mtime_d3
    got = spark.read.option("basePath", target).parquet(
        os.path.join(target, "day=2024-01-02")
    )
    assert got.collect()[0]["v"] == 2.5


def test_merge_bounds(spark, tmp_path):
    from tgdigest_spark.sources.upsert import merge_bounds

    path = str(tmp_path / "bounds")
    b1 = spark.createDataFrame(
        [("c", 100, 200)], "channel string, min_ts long, max_ts long"
    )
    merge_bounds(spark, path, "channel", b1)
    b2 = spark.createDataFrame(
        [("c", 50, 150), ("d", 1, 2)], "channel string, min_ts long, max_ts long"
    )
    got = {
        r["channel"]: (r["min_ts"], r["max_ts"])
        for r in merge_bounds(spark, path, "channel", b2).collect()
    }
    assert got == {"c": (50, 200), "d": (1, 2)}


# ---------------------------------------------------------------------------
# formatting scalars
# ---------------------------------------------------------------------------

def test_format_functions(spark):
    from tgdigest_spark.functions.format import (
        emoji_codepoint_url,
        format_date,
        format_number_thin_space,
        html_escape,
    )

    df = spark.createDataFrame(
        [(1234567, "2024-03-05 07:09:00", "😀", '<a&b> "q"')],
        "n long, ts string, emoji string, raw string",
    )
    row = df.select(
        format_number_thin_space(F.col("n")).alias("fmt"),
        format_date(F.col("ts").cast("timestamp")).alias("d"),
        emoji_codepoint_url(F.col("emoji")).alias("u"),
        html_escape(F.col("raw")).alias("esc"),
    ).collect()[0]
    assert row["fmt"] == "1 234 567"
    assert row["d"] == "05/03/2024 07:09"
    assert row["u"] == "emoji_u1f600.svg"
    assert row["esc"] == "&lt;a&amp;b&gt; &quot;q&quot;"


def test_best_photo_size(spark):
    from tgdigest_spark.functions.format import best_photo_size

    df = spark.createDataFrame(
        [([{"kind": "s", "size": 10}, {"kind": "l", "size": 99}, {"kind": "m", "size": 50}],)],
        "sizes array<struct<kind:string,size:long>>",
    )
    row = df.select(best_photo_size(F.col("sizes")).alias("best")).collect()[0]
    assert row["best"]["kind"] == "l"


# ---------------------------------------------------------------------------
# entity rendering (F10) — python port parity + Spark UDF plumbing
# ---------------------------------------------------------------------------

CASES = [
    # (text, entities, expected)
    ("hello world", [{"type": "bold", "offset": 0, "length": 5, "url": None, "language": None}],
     "<b>hello</b> world"),
    ("a < b & c", [], "a &lt; b &amp; c"),
    ("click here now",
     [{"type": "text_url", "offset": 6, "length": 4, "url": "http://x/?a=1&b=2", "language": None}],
     'click <a href="http://x/?a=1&amp;b=2" target="_blank" rel="noopener">here</a> now'),
    ("@user hi", [{"type": "mention", "offset": 0, "length": 5, "url": None, "language": None}],
     '<a href="https://t.me/user" target="_blank" rel="noopener">@user</a> hi'),
    # nested: italic inside bold; close-before-open at same offset
    ("abcdef",
     [{"type": "bold", "offset": 0, "length": 3, "url": None, "language": None},
      {"type": "italic", "offset": 3, "length": 3, "url": None, "language": None}],
     "<b>abc</b><i>def</i>"),
    # char (not byte) offsets with multibyte prefix
    ("😀😀bold",
     [{"type": "bold", "offset": 2, "length": 4, "url": None, "language": None}],
     "😀😀<b>bold</b>"),
    ("x", [{"type": "unknown_kind", "offset": 0, "length": 1, "url": None, "language": None}], "x"),
    ("code",
     [{"type": "pre", "offset": 0, "length": 4, "url": None, "language": "rust"}],
     '<pre><code class="language-rust">code</code></pre>'),
]


@pytest.mark.parametrize("text,entities,expected", CASES)
def test_render_entities_py(text, entities, expected):
    from tgdigest_spark.functions.entities import render_entities_py

    assert render_entities_py(text, entities) == expected


def test_render_entities_spark(spark):
    from tgdigest_spark.functions.entities import ENTITY_SCHEMA, rendered_html

    rows = [(t, e) for t, e, _ in CASES]
    df = spark.createDataFrame(rows, f"text string, entities {ENTITY_SCHEMA}")
    got = [
        r["html"]
        for r in df.select(
            rendered_html(F.col("text"), F.col("entities")).alias("html")
        ).collect()
    ]
    assert got == [exp for _, _, exp in CASES]


# ---------------------------------------------------------------------------
# F11 — mime → extension map (post_data.rs:427-443): all 12 mapped
# entries, the catch-all 'bin' arm, and the Spark-only null case.
# ---------------------------------------------------------------------------

F11_CASES = [
    ("video/mp4", "mp4"),
    ("video/quicktime", "mov"),
    ("video/webm", "webm"),
    ("audio/mpeg", "mp3"),
    ("audio/ogg", "ogg"),
    ("audio/mp4", "m4a"),
    ("image/jpeg", "jpg"),
    ("image/png", "png"),
    ("image/webp", "webp"),
    ("image/gif", "gif"),
    ("application/pdf", "pdf"),
    ("application/zip", "zip"),
    ("application/x-unknown", "bin"),
    (None, "bin"),
]


def test_mime_ext_parity(spark):
    from tgdigest_spark.functions.format import mime_ext

    df = spark.createDataFrame(
        [(i, m) for i, (m, _) in enumerate(F11_CASES)], "i long, mime string"
    )
    got = {
        r["i"]: r["ext"]
        for r in df.select("i", mime_ext(F.col("mime")).alias("ext")).collect()
    }
    assert [got[i] for i in range(len(F11_CASES))] == [e for _, e in F11_CASES]


def test_media_cache_path(spark):
    from tgdigest_spark.operators.post_data import media_cache_path

    df = spark.createDataFrame(
        [(1234, "image/png"), (77, "application/weird")],
        "media_id long, mime string",
    )
    got = [
        r["p"]
        for r in df.select(
            media_cache_path("media_id", "mime").alias("p")
        ).collect()
    ]
    assert got == ["1234.png", "77.bin"]
