"""Small-file compaction: data preservation, no-op path, stale-attempt
cleanup, and post-compaction behavior of the signature store."""

from __future__ import annotations

import os

import pytest


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t")
    for i in range(12):  # 12 appends → ≥12 files
        spark.createDataFrame(
            [(i * 100 + j, f"v{j}") for j in range(50)], "id long, v string"
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path).collect()
    assert len(_parquet_files(path)) >= 12

    stats = compact_parquet_dir(spark, path, target_records=400)
    assert stats["compacted"] is True and stats["rows"] == 600
    assert stats["files_after"] == 2  # ceil(600/400)
    assert len(_parquet_files(path)) == 2
    after = spark.read.parquet(path).collect()
    assert sorted(before) == sorted(after)
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__compact__")


def test_compact_noop_when_already_small(spark, tmp_path):
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1
    ).write.parquet(path)
    stats = compact_parquet_dir(spark, path, target_records=10)
    assert stats["compacted"] is False
    assert stats["files_before"] == stats["files_after"]


def test_compact_cleans_stale_attempt(spark, tmp_path):
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t3")
    for i in range(4):
        spark.createDataFrame(
            [(i, "x")], "id long, v string"
        ).coalesce(1).write.mode("append").parquet(path)
    os.makedirs(path + ".__compact__")  # crashed prior attempt
    open(path + ".__compact__/garbage", "w").write("junk")
    stats = compact_parquet_dir(spark, path, target_records=100)
    assert stats["compacted"] is True and stats["rows"] == 4
    assert not os.path.exists(path + ".__compact__")


def test_signature_store_works_after_compaction(spark, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )
    from tgdigest_spark.sources.maintenance import compact_signature_store

    store = str(tmp_path / "s")
    init_signature_store(store)
    texts = [
        (i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(25)))
        for i in range(30)
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    for lo in (0, 10, 20):  # three appends → many small files
        s, _ = incremental_near_dedup(mk(texts[lo : lo + 10]), store, threshold=0.9)
        s.release_cache()
    stats = compact_signature_store(spark, store, target_records=10_000)
    assert stats["sigs"]["compacted"] or stats["sigs"]["files_before"] == 1
    # re-delivery after compaction still converges via the id contract
    s2, st2 = incremental_near_dedup(mk(texts[:10]), store, threshold=0.9)
    assert st2["dropped_redelivered"] == 10 and st2["survivors"] == 0
    s2.release_cache()
