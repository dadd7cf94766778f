"""Persisted keyed sketch tables (sources/sketch_table.py): write leaf
blobs once, read back later, roll up by merging — facts never re-read.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tgdigest_spark.agg import merge_blobs_by_key, sketch_by_key
from tgdigest_spark.api import grouped_distinct_count
from tgdigest_spark.sketches import HLL
from tgdigest_spark.sources.sketch_table import (
    read_sketch_table,
    write_sketch_table,
)


def _leaves(spark, sf001_dir):
    ev = spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).withColumn("day", F.to_date("ts"))
    return ev, sketch_by_key(
        ev, ["event_type", "day"], F.col("user_id").cast("string"),
        lambda: HLL(13),
    )


def test_round_trip_rollup_bit_exact(spark, sf001_dir, tmp_path):
    ev, leaves = _leaves(spark, sf001_dir)
    path = str(tmp_path / "tbl")
    meta = write_sketch_table(leaves, path, "hll", {"p": 13})
    assert meta["keys"] == ["event_type", "day"]
    back, meta2 = read_sketch_table(spark, path, expect_kind="hll",
                                    expect_params={"p": 13})
    assert meta2 == meta
    rolled = merge_blobs_by_key(back, ["event_type"], lambda: HLL(13))
    got = {
        r["event_type"]: HLL.deserialize(bytes(r["sketch"])).estimate()
        for r in rolled.collect()
    }
    direct = grouped_distinct_count(
        ev, ["event_type"], F.col("user_id").cast("string"), p=13
    ).collect()
    assert len(direct) == len(got)
    for r in direct:
        assert got[r["event_type"]] == r["distinct_est"]


def test_partitioned_layout_prunes(spark, sf001_dir, tmp_path):
    _, leaves = _leaves(spark, sf001_dir)
    path = str(tmp_path / "part")
    write_sketch_table(leaves, path, "hll", {"p": 13},
                       partition_by=["event_type"])
    back, _ = read_sketch_table(spark, path)
    one = back.where(F.col("event_type") == "click")
    one.collect()  # numFiles is only populated after an action
    plan = one._jdf.queryExecution().executedPlan().toString()
    # hive-partitioned on event_type: the filter must prune partitions,
    # not appear as a post-scan filter over all files
    assert "PartitionFilters: []" not in plan


def test_mismatch_and_partial_write_fail_fast(spark, sf001_dir, tmp_path):
    _, leaves = _leaves(spark, sf001_dir)
    path = str(tmp_path / "tbl2")
    write_sketch_table(leaves, path, "hll", {"p": 13})
    with pytest.raises(ValueError, match="expected"):
        read_sketch_table(spark, path, expect_kind="tdigest")
    with pytest.raises(ValueError, match="params"):
        read_sketch_table(spark, path, expect_params={"p": 12})
    with pytest.raises(ValueError, match="append refused"):
        write_sketch_table(leaves, path, "hll", {"p": 12}, mode="append")
    # a crashed write leaves no manifest -> refused
    os.remove(os.path.join(path, "_sketch_meta.json"))
    with pytest.raises(FileNotFoundError):
        read_sketch_table(spark, path)
    with pytest.raises(ValueError, match="blob column"):
        write_sketch_table(leaves.drop("sketch"), str(tmp_path / "x"),
                           "hll", {"p": 13})


def test_append_same_params_accumulates(spark, sf001_dir, tmp_path):
    ev, leaves = _leaves(spark, sf001_dir)
    path = str(tmp_path / "appnd")
    a = leaves.where(F.col("event_type") < "m")
    b = leaves.where(~(F.col("event_type") < "m"))
    write_sketch_table(a, path, "hll", {"p": 13})
    write_sketch_table(b, path, "hll", {"p": 13}, mode="append")
    back, _ = read_sketch_table(spark, path)
    assert back.count() == leaves.count()


def test_append_key_or_layout_mismatch_refused_table_stays_readable(
    spark, sf001_dir, tmp_path
):
    ev, leaves = _leaves(spark, sf001_dir)
    path = str(tmp_path / "km")
    write_sketch_table(leaves, path, "hll", {"p": 13})
    # key-set mismatch (day dropped): spark.read would null-fill the
    # missing dim and rollups would merge into a spurious null group
    coarser = leaves.groupBy("event_type").agg(
        F.first("sketch").alias("sketch")
    )
    with pytest.raises(ValueError, match="manifest mismatch"):
        write_sketch_table(coarser, path, "hll", {"p": 13}, mode="append")
    # partition-layout mismatch
    with pytest.raises(ValueError, match="manifest mismatch"):
        write_sketch_table(leaves, path, "hll", {"p": 13}, mode="append",
                           partition_by=["event_type"])
    # a REFUSED append must leave the table readable (validation
    # happens before the manifest is removed)
    back, meta = read_sketch_table(spark, path)
    assert back.count() == leaves.count()
    assert meta["partition_by"] == []


def test_build_sketch_leaves_job_resumes(spark, sf001_dir, tmp_path, capsys):
    """jobs/build_sketch_leaves.py: first run builds every day, rerun is
    a no-op, and a table grown day-by-day rolls up bit-exactly to the
    same answer as a direct build."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from jobs.build_sketch_leaves import main

    inp = os.path.join(sf001_dir, "events.parquet")
    table = str(tmp_path / "leaves")
    args = ["--input", inp, "--table", table, "--keys", "event_type",
            "--ts-col", "ts", "--value", "user_id", "--p", "13"]
    assert main(args, spark=spark) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["days_built"] > 0 and out1["resumed"] == 0
    # rerun: nothing to build, everything resumed
    assert main(args, spark=spark) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == {**out2, "days_built": 0, "resumed": out1["days_built"]}
    # rollup from the job-built table == direct build from facts
    back, _ = read_sketch_table(spark, table, expect_kind="hll",
                                expect_params={"p": 13})
    rolled = merge_blobs_by_key(back, ["event_type"], lambda: HLL(13))
    got = {
        r["event_type"]: HLL.deserialize(bytes(r["sketch"])).estimate()
        for r in rolled.collect()
    }
    ev = spark.read.parquet(inp)
    direct = grouped_distinct_count(
        ev, ["event_type"], F.col("user_id").cast("string"), p=13
    ).collect()
    for r in direct:
        assert got[r["event_type"]] == r["distinct_est"]


def test_append_refuses_dtype_mismatch_and_crashed_leftovers(
    spark, sf001_dir, tmp_path
):
    ev, leaves = _leaves(spark, sf001_dir)
    path = str(tmp_path / "dt")
    write_sketch_table(leaves, path, "hll", {"p": 13})  # day is DATE
    stringy = leaves.withColumn("day", F.col("day").cast("string"))
    with pytest.raises(ValueError, match="key_types"):
        write_sketch_table(stringy, path, "hll", {"p": 13}, mode="append")
    # crashed prior write: data present, manifest gone → append refused
    # (retrying on top of partial leftovers would revalidate them)
    os.remove(os.path.join(path, "_sketch_meta.json"))
    with pytest.raises(ValueError, match="crashed prior write"):
        write_sketch_table(leaves, path, "hll", {"p": 13}, mode="append")
    # explicit rebuild is the sanctioned path
    write_sketch_table(leaves, path, "hll", {"p": 13})
    back, _ = read_sketch_table(spark, path)
    assert back.count() == leaves.count()


def test_sliding_windows_from_leaves_bit_exact(spark, sf001_dir, tmp_path):
    """A 6d/2d sliding dashboard served from the persisted day-leaf
    table must be BYTE-identical to the fact-scanning pane path —
    window-for-window, including the window set."""
    from tgdigest_spark.api import (
        sliding_window_sketches,
        sliding_windows_from_leaves,
    )

    ev = spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).withColumn("day", F.to_date("ts"))
    uid = F.col("user_id").cast("string")
    day_leaves = sketch_by_key(ev, ["day"], uid, lambda: HLL(13))
    path = str(tmp_path / "dayleaves")
    write_sketch_table(day_leaves, path, "hll", {"p": 13})
    back, _ = read_sketch_table(spark, path, expect_kind="hll")

    from_leaves = {
        r["window_start"]: bytes(r["sketch"])
        for r in sliding_windows_from_leaves(
            back, "day", lambda: HLL(13), 6, 2
        ).collect()
    }
    from_facts = {
        r["window_start"]: bytes(r["sketch"])
        for r in sliding_window_sketches(
            ev, "ts", uid, lambda: HLL(13), 6, 2
        ).collect()
    }
    assert from_leaves == from_facts and from_leaves


def test_sliding_from_leaves_unaligned_grid(spark, sf001_dir, tmp_path):
    """window_days NOT a multiple of slide_days — impossible on the
    pane path, natural on day-grain leaves: each 5-day window's blob
    must be byte-equal to a direct per-window build over exploded raw
    rows, and a 1d/2d grid (window < slide) must drop the gap days
    instead of exploding a descending sequence."""
    from tgdigest_spark.api import sliding_windows_from_leaves

    ev = spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).withColumn("day", F.to_date("ts"))
    uid = F.col("user_id").cast("string")
    day_leaves = sketch_by_key(ev, ["day"], uid, lambda: HLL(13))

    got = {
        r["window_start"]: bytes(r["sketch"])
        for r in sliding_windows_from_leaves(
            day_leaves, "day", lambda: HLL(13), 5, 2
        ).collect()
    }
    # direct: explode facts by day membership in each 5-day window
    d = F.unix_date(F.col("day"))
    facts_w = ev.select(
        F.explode(
            F.sequence(F.floor((d - 5) / 2) + 1, F.floor(d / 2))
        ).alias("w"),
        uid.alias("u"),
    )
    direct = {
        r["w"]: bytes(r["sketch"])
        for r in sketch_by_key(
            facts_w, ["w"], "u", lambda: HLL(13)
        ).collect()
    }
    assert got and len(got) == len(direct)
    epoch = 719163  # date(1970,1,1).toordinal()
    for ws, blob in got.items():
        assert direct[(ws.toordinal() - epoch) // 2] == blob

    # window < slide: day leaves on odd days belong to no window
    narrow = sliding_windows_from_leaves(
        day_leaves, "day", lambda: HLL(13), 1, 2
    )
    rows = narrow.collect()
    assert rows  # even-day windows still emitted
    for r in rows:
        assert (r["window_start"].toordinal() - epoch) % 2 == 0

    with pytest.raises(ValueError):
        sliding_windows_from_leaves(day_leaves, "day", lambda: HLL(13), 0, 2)


def test_compact_merges_incremental_appends(spark, sf001_dir, tmp_path):
    """Two appended deltas for the SAME days compact to one row per
    key whose blob is BIT-identical to a single-shot build; readers
    (rollup + sliding-from-leaves) return identical results before and
    after compaction; a second compact is a no-op; the manifest
    survives the rewrite."""
    from tgdigest_spark.api import sliding_windows_from_leaves
    from tgdigest_spark.sources.sketch_table import compact_sketch_table

    ev = spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).withColumn("day", F.to_date("ts"))
    uid = F.col("user_id").cast("string")
    half_a = ev.where(F.col("user_id") % 2 == 0)
    half_b = ev.where(F.col("user_id") % 2 == 1)
    path = str(tmp_path / "incr")
    write_sketch_table(
        sketch_by_key(half_a, ["day"], uid, lambda: HLL(13)),
        path, "hll", {"p": 13},
    )
    write_sketch_table(
        sketch_by_key(half_b, ["day"], uid, lambda: HLL(13)),
        path, "hll", {"p": 13}, mode="append",
    )
    back, meta = read_sketch_table(spark, path, expect_kind="hll")
    dup_rows = back.count()
    served_before = {
        r["window_start"]: bytes(r["sketch"])
        for r in sliding_windows_from_leaves(
            back, "day", lambda: HLL(13), 6, 2
        ).collect()
    }

    stats = compact_sketch_table(spark, path, lambda: HLL(13))
    assert stats["compacted"] and stats["rows_before"] == dup_rows
    back2, meta2 = read_sketch_table(spark, path, expect_kind="hll")
    assert meta2 == meta  # manifest survives the rewrite
    assert back2.count() == stats["rows_after"] < dup_rows

    # compacted blobs == single-shot build, byte for byte
    direct = {
        r["day"]: bytes(r["sketch"])
        for r in sketch_by_key(ev, ["day"], uid, lambda: HLL(13)).collect()
    }
    got = {r["day"]: bytes(r["sketch"]) for r in back2.collect()}
    assert got == direct

    served_after = {
        r["window_start"]: bytes(r["sketch"])
        for r in sliding_windows_from_leaves(
            back2, "day", lambda: HLL(13), 6, 2
        ).collect()
    }
    assert served_after == served_before and served_after

    again = compact_sketch_table(spark, path, lambda: HLL(13))
    assert not again["compacted"]
    assert again["rows_after"] == stats["rows_after"]
