"""Streaming leaf-table producer: exactly-once appends, batch parity,
crash-window healing (streaming/leaf_stream.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tgdigest_spark.agg import merge_blobs_by_key, sketch_by_key
from tgdigest_spark.sketches import HLL, TDigest
from tgdigest_spark.sources.sketch_table import read_sketch_table
from tgdigest_spark.streaming.leaf_stream import (
    leaf_epoch_appender,
    stream_sketch_leaves,
)


def test_stream_matches_batch_and_resumes(spark, transcripts, tmp_path):
    """Stream the transcripts in 3 file chunks → leaf table; the
    merged per-day blobs must be BIT-identical to a direct batch build
    (HLL is a register sketch), and a rerun from the same checkpoint
    appends nothing."""
    src = str(tmp_path / "in")
    for i in range(3):
        transcripts.where(F.pmod(F.xxhash64("conv_id"), F.lit(3)) == i) \
            .write.mode("overwrite").parquet(f"{src}/chunk={i}")
    table = str(tmp_path / "leaves")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(transcripts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/chunk=*")
        )
        q = stream_sketch_leaves(
            stream, ckpt,
            table=table, ts="ts", value="conv_id", factory=lambda: HLL(12),
            sketch_kind="hll", params={"p": 12}, run_id="t1",
        )
        q.awaitTermination()

    run()
    files = glob.glob(os.path.join(table, "leaf-t1-e*.parquet"))
    assert len(files) >= 2  # chunked delivery -> multiple epochs
    df, meta = read_sketch_table(spark, table, expect_kind="hll",
                                 expect_params={"p": 12})
    merged = merge_blobs_by_key(df, ["day"], lambda: HLL(12))
    direct = sketch_by_key(
        transcripts.select(F.to_date("ts").alias("day"),
                           F.col("conv_id").alias("_v")),
        ["day"], "_v", lambda: HLL(12),
    )
    got = {r["day"]: bytes(r["sketch"]) for r in merged.collect()}
    want = {r["day"]: bytes(r["sketch"]) for r in direct.collect()}
    assert got == want  # register-sketch bit equality, day for day

    # rerun: Structured Streaming checkpoint says nothing new
    before = sorted(os.listdir(table))
    run()
    assert sorted(os.listdir(table)) == before


def test_replay_exactly_once_for_counting_sketch(spark, transcripts,
                                                 tmp_path):
    """Replaying an epoch (foreachBatch at-least-once) must not
    double-count: t-digest total weight equals the batch build's."""
    table = str(tmp_path / "tleaves")
    fn = leaf_epoch_appender(
        table, "ts", F.length("text"), lambda: TDigest(200),
        "tdigest", {"delta": 200}, run_id="r9",
    )
    batch = transcripts.limit(5000)
    fn(batch, 0)
    fn(batch, 0)  # replay of the SAME epoch: must skip
    assert [s["appended"] for s in fn.stats] == [True, False]
    assert len(glob.glob(os.path.join(table, "leaf-r9-e0.parquet"))) == 1
    df, _ = read_sketch_table(spark, table)
    total = sum(
        TDigest.deserialize(bytes(r["sketch"])).count
        for r in df.collect()
    )
    assert total == batch.count()


def test_crash_after_file_heals_manifest(spark, transcripts, tmp_path):
    """Crash window between the data rename and the first manifest
    write: the reader refuses the table, and the epoch REPLAY restores
    the manifest without re-appending data."""
    table = str(tmp_path / "cleaves")
    fn = leaf_epoch_appender(
        table, "ts", "conv_id", lambda: HLL(12), "hll", {"p": 12}, run_id="c1",
    )
    batch = transcripts.limit(2000)
    fn(batch, 0)
    os.remove(os.path.join(table, "_sketch_meta.json"))  # the crash
    with pytest.raises(FileNotFoundError):
        read_sketch_table(spark, table)
    fn(batch, 0)  # replay heals
    assert fn.stats[-1]["appended"] is False
    df, _ = read_sketch_table(spark, table)
    assert df.count() > 0


def test_manifest_mismatch_refused(spark, transcripts, tmp_path):
    table = str(tmp_path / "mleaves")
    leaf_epoch_appender(
        table, "ts", "conv_id", lambda: HLL(12), "hll", {"p": 12}, run_id="a",
    )(transcripts.limit(100), 0)
    bad = leaf_epoch_appender(
        table, "ts", "conv_id", lambda: HLL(14), "hll", {"p": 14},
        run_id="b",
    )
    before = sorted(os.listdir(table))
    with pytest.raises(ValueError, match="mismatch"):
        bad(transcripts.limit(100), 0)
    # the refused append must leave NOTHING behind: an injected blob
    # file's marker would block a corrected rerun from replacing it
    assert sorted(os.listdir(table)) == before
