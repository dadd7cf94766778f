"""Transcripts table layout: partitioning, in-partition sort, round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tgdigest_spark.sources.transcripts import (
    iceberg_available,
    read_transcripts,
    write_transcripts_table,
)


def test_layout_roundtrip_and_partitioning(spark, transcripts, tmp_path):
    out = str(tmp_path / "transcripts_tbl")
    write_transcripts_table(transcripts, out)
    # partition dirs by day exist
    days = [d for d in os.listdir(out) if d.startswith("ts_day=")]
    assert len(days) > 10
    back = read_transcripts(spark, out)
    assert back.count() == transcripts.count()
    # per-turn text equality under stable order (the input_hint invariant)
    a = [
        r["text"]
        for r in transcripts.orderBy("conv_id", "turn_idx").select("text").collect()
    ]
    b = [
        r["text"]
        for r in back.orderBy("conv_id", "turn_idx").select("text").collect()
    ]
    assert a == b


def _scan_num_files(df) -> int:
    """numFiles metric of the (single) file scan leaf — populated when
    the scan resolves its partition listing AFTER pruning, so it counts
    only surviving files. Execute first so the metric is set."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        m = node.metrics()
        if m.contains("numFiles"):
            return m.apply("numFiles").value()
    raise AssertionError("no file scan leaf with numFiles metric")


def test_partition_pruning_on_layout(spark, transcripts, tmp_path):
    out = str(tmp_path / "pruned_tbl")
    write_transcripts_table(transcripts, out)
    back = spark.read.parquet(out)
    one_day = back.where(F.col("ts_day") == "2024-01-15")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ts_day" in plan
    assert "PartitionFilters: []" not in plan  # non-empty, really pruning
    # pruned scan reads only that day's files, not the whole table
    total_files = _scan_num_files(back)
    pruned_files = _scan_num_files(one_day)
    n_days = len([d for d in os.listdir(out) if d.startswith("ts_day=")])
    assert pruned_files <= total_files / n_days * 2
    assert pruned_files >= 1


def test_range_scan_prunes_partitions(spark, transcripts, tmp_path):
    """A ts-range query through range_scan derives the ts_day predicate
    (what Iceberg hidden partitioning would do) and prunes the listing;
    a bare ts predicate on the parquet fallback layout cannot prune."""
    from tgdigest_spark.sources.transcripts import range_scan

    out = str(tmp_path / "range_tbl")
    write_transcripts_table(transcripts, out)
    # through the library's own reader: ts_day must survive so pruning
    # composes (a dropped partition col silently disables it)
    back = read_transcripts(spark, out)
    assert "ts_day" in back.columns
    start, end = "2024-01-10 00:00:00", "2024-01-12 23:59:59"

    pruned = range_scan(back, start, end)
    bare = back.where(F.col("ts").between(start, end))
    # identical answer...
    assert pruned.count() == bare.count() > 0
    # ...but the derived-predicate scan lists only the 3 matching days
    total_files = _scan_num_files(back)
    assert _scan_num_files(bare) == total_files
    assert _scan_num_files(pruned) <= total_files / 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "PartitionFilters: []" not in plan


def test_iceberg_gated(spark):
    # jars absent in this image — the writer must report that honestly
    assert iceberg_available(spark) in (True, False)
