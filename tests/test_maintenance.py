"""Small-file compaction: data preservation, no-op path, crash
remnants (stale tmp, leaked backup, mid-swap self-heal), nested-layout
rejection, fresh-store skip, and post-compaction store behavior."""

from __future__ import annotations

import os

import pytest


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def _mk_appended(spark, path, n_appends=12, rows_each=50):
    for i in range(n_appends):
        spark.createDataFrame(
            [(i * 100 + j, f"v{j}") for j in range(rows_each)],
            "id long, v string",
        ).coalesce(1).write.mode("append").parquet(path)


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t")
    _mk_appended(spark, path)
    before = spark.read.parquet(path).collect()
    assert len(_parquet_files(path)) >= 12

    stats = compact_parquet_dir(spark, path, target_records=400)
    assert stats["compacted"] is True and stats["rows"] == 600
    assert stats["files_after"] == 2  # ceil(600/400), repartition exact
    assert len(_parquet_files(path)) == 2
    after = spark.read.parquet(path).collect()
    assert sorted(before) == sorted(after)
    parent = str(tmp_path)
    assert not [e for e in os.listdir(parent) if ".tmp-" in e or ".old-" in e]


def test_compact_noop_when_already_small(spark, tmp_path):
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1
    ).write.parquet(path)
    stats = compact_parquet_dir(spark, path, target_records=10)
    assert stats["compacted"] is False
    assert stats["files_before"] == stats["files_after"]


def test_compact_cleans_stale_tmp_and_leaked_backup(spark, tmp_path):
    """Remnants of crashed runs (a half-written .tmp-* and a backup the
    crash never removed) are swept even on the no-op path."""
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t3")
    spark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1
    ).write.parquet(path)
    os.makedirs(path + ".tmp-deadbeef")
    open(path + ".tmp-deadbeef/garbage", "w").write("junk")
    os.makedirs(path + ".old-cafe0000")
    open(path + ".old-cafe0000/stale", "w").write("old copy")
    stats = compact_parquet_dir(spark, path, target_records=10)
    assert stats["compacted"] is False  # tiny table: no-op...
    assert not os.path.exists(path + ".tmp-deadbeef")  # ...but swept
    assert not os.path.exists(path + ".old-cafe0000")


def test_compact_self_heals_after_mid_swap_crash(spark, tmp_path):
    """Crash between the swap's renames leaves the table absent and the
    data in a .old-* backup: the next run restores it before reading."""
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t4")
    _mk_appended(spark, path, n_appends=4, rows_each=10)
    os.replace(path, path + ".old-12345678")  # simulated mid-swap crash
    assert not os.path.exists(path)
    stats = compact_parquet_dir(spark, path, target_records=1000)
    assert stats["rows"] == 40
    assert spark.read.parquet(path).count() == 40
    assert not os.path.exists(path + ".old-12345678")


def test_compact_rejects_partitioned_layout(spark, tmp_path):
    from tgdigest_spark.sources.maintenance import compact_parquet_dir

    path = str(tmp_path / "t5")
    spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-02", "b")],
        "id long, day string, v string",
    ).write.partitionBy("day").parquet(path)
    with pytest.raises(ValueError, match="partitioned"):
        compact_parquet_dir(spark, path, target_records=10)


def test_signature_store_compaction_and_fresh_store_skip(spark, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )
    from tgdigest_spark.sources.maintenance import compact_signature_store

    store = str(tmp_path / "s")
    init_signature_store(store)
    # fresh store: both tables missing → skipped, not an error
    fresh = compact_signature_store(spark, store)
    assert fresh["sigs"] == {"compacted": False, "missing": True}
    assert fresh["bands"] == {"compacted": False, "missing": True}

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
