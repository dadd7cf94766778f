"""Digest lifecycle parity: Task defaults/validation/JSON, block
ordering + presentation, empty-block dropping, slim payload."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from tgdigest_spark.operators.digest_api import (
    BLOCK_SPEC,
    Task,
    _default_window,
    _icon_url,
    digest_json,
    run_digest,
)


def test_task_defaults_and_json_roundtrip():
    t = Task(channel_name="channel0")
    assert t.top_count == 3  # task.rs:48
    # default window = [today-7d, today midnight) (task.rs:33-53)
    f, to = t.from_date, t.to_date
    assert to - f == 7 * 86_400
    assert to % 86_400 == 0  # midnight UTC
    rt = Task.from_json(t.to_json())
    assert rt == t
    with pytest.raises(ValueError):
        Task(channel_name="x", from_date=-5, to_date=10)  # main.rs:464-466


def test_icon_url():
    assert _icon_url("💬") == "emoji_u1f4ac.svg"  # util.rs:5-10
    assert _icon_url("👁️") == "emoji_u1f441.svg"  # first char only


def test_run_digest_block_structure(spark, posts):
    task = Task(
        channel_name="channel0",
        top_count=3,
        from_date=int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp()),
        to_date=int(datetime(2025, 12, 1, tzinfo=timezone.utc).timestamp()),
    )
    digest = run_digest(posts, task)
    headers = [b["header"] for b in digest["blocks"]]
    expected_order = [h for _, h, _, _ in BLOCK_SPEC]
    # present blocks appear in reference order (digest.rs:62-87)
    assert headers == [h for h in expected_order if h in headers]
    assert len(digest["blocks"]) == 4  # rich range: all metrics present
    for b, (metric, header, emoji, filt) in zip(digest["blocks"], BLOCK_SPEC):
        assert b["header"] == header
        assert b["icon"] == _icon_url(emoji)
        assert b["filter"] == filt
        assert 1 <= len(b["cards"]) <= 3
        for c in b["cards"]:
            assert c["count"] is not None  # null cards filtered (card.rs:40-41)

    slim = digest_json(digest)
    assert slim["status"] == "ready"
    for b in slim["blocks"]:
        for pair in b["cards"]:
            assert len(pair) == 2 and isinstance(pair[0], int)


def test_run_digest_empty_range_drops_all_blocks(spark, posts):
    task = Task(
        channel_name="channel0",
        from_date=int(datetime(1999, 1, 1, tzinfo=timezone.utc).timestamp()),
        to_date=int(datetime(1999, 2, 1, tzinfo=timezone.utc).timestamp()),
    )
    digest = run_digest(posts, task)
    assert digest["blocks"] == []  # digest.rs:88-90


def test_post_json_and_album_expand(spark, posts):
    import json as _json

    from pyspark.sql import functions as F

    from tgdigest_spark.operators.post_data import (
        POST_DATA,
        album_expand,
        post_json,
        to_post_data,
    )

    docs = to_post_data(posts)
    # schema parity: all PostData fields present and typed
    assert {f.name for f in POST_DATA.fields} <= set(docs.columns) | {"channel"}
    s = post_json(posts, "channel0", 5)
    assert s is not None
    doc = _json.loads(s)
    assert doc["id"] == 5 and doc["url"].endswith("/channel0/5")
    assert "edit_date" not in doc  # None fields dropped (serde parity)
    assert "pinned" in doc and doc["pinned"] is False
    assert post_json(posts, "channel0", 10_000_000) is None

    albums = album_expand(posts)
    row = albums.orderBy(F.desc("n_items")).first()
    ids = [it["id"] for it in row["items"]]
    assert ids == sorted(ids)  # tg.rs:227 sort_by_key(msg_id)
    assert row["n_items"] == len(ids) >= 2
