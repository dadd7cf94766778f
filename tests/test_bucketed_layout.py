"""Bucketed-by-conv_id layout: the shuffle-free per-conversation path.

The rehearsal profile (BENCH.md) shows the only raw-row shuffles left
are conv_id co-location (lag-latency window 2.76 GB, per-conv digest
blobs 2.4 GB at 10^8 rows). Bucketing the fact table by conv_id pays
that shuffle once at write time; these tests pin the three guarantees:

1. the lag-latency window plans with NO Exchange over the bucketed
   table (and DOES exchange over the plain layout — the contrast keeps
   the assertion honest);
2. results over both layouts are identical;
3. ``sketch_by_key(method='clustered')`` over the bucketed read equals
   the shuffled ``combine`` topology, with a shuffle-free plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_transcripts(spark, transcripts, tmp_path_factory):
    from tgdigest_spark.sources.transcripts import (
        read_transcripts_bucketed,
        write_transcripts_bucketed,
    )

    path = str(tmp_path_factory.mktemp("bucketed") / "transcripts_b8")
    write_transcripts_bucketed(
        transcripts, "transcripts_b8", n_buckets=8, path=path
    )
    df = read_transcripts_bucketed(spark, "transcripts_b8")
    yield df
    spark.sql("DROP TABLE IF EXISTS transcripts_b8")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_latency_window_no_exchange_over_bucketed(
    spark, transcripts, bucketed_transcripts
):
    from tgdigest_spark.api import interturn_latency_seconds

    bucketed_plan = _plan(interturn_latency_seconds(bucketed_transcripts))
    plain_plan = _plan(interturn_latency_seconds(transcripts))
    assert "Exchange" not in bucketed_plan
    assert "Bucketed: true" in bucketed_plan
    # contrast: the plain layout must co-locate conversations first
    assert "Exchange hashpartitioning(conv_id" in plain_plan


def test_latency_rows_identical_across_layouts(
    spark, transcripts, bucketed_transcripts
):
    from tgdigest_spark.api import interturn_latency_seconds

    key = ["conv_id", "turn_idx"]
    a = sorted(
        interturn_latency_seconds(transcripts).collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    b = sorted(
        interturn_latency_seconds(bucketed_transcripts).collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    assert a == b


def test_clustered_sketch_no_shuffle_and_matches_combine(
    spark, transcripts, bucketed_transcripts
):
    """method='clustered' over the bucketed read: one map pass, no
    Exchange, same per-group results as the shuffled combine topology.

    t-digests are merge-tree-dependent above delta/2 unit weights, so
    equality is asserted on KLL (deterministic for a fixed value
    multiset: both paths feed each group's full sorted values in one
    update) and on exact group counts for the t-digest flavor.
    """
    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.api import grouped_quantiles_kll
    from tgdigest_spark.sketches.kll import KLL

    val = F.length("text").cast("double")

    clustered = grouped_quantiles_kll(
        bucketed_transcripts, ["conv_id"], val, [0.5, 0.95], method="clustered"
    )
    assert "Exchange" not in _plan(clustered)

    combined = grouped_quantiles_kll(
        transcripts, ["conv_id"], val, [0.5, 0.95], method="combine"
    )
    rows_c = {r.conv_id: (r.p50, r.p95) for r in clustered.collect()}
    rows_m = {r.conv_id: (r.p50, r.p95) for r in combined.collect()}
    assert rows_c == rows_m

    # one blob per key even though several buckets share a scan task
    blobs = sketch_by_key(
        bucketed_transcripts,
        ["conv_id"],
        val,
        lambda: KLL(200),
        method="clustered",
    )
    n_keys = transcripts.select("conv_id").distinct().count()
    assert blobs.count() == n_keys


def test_clustered_contract_violated_on_plain_read_yields_partials(
    spark, transcripts
):
    """Documented failure mode: clustered over NON-co-located input
    returns one row per (key, partition touched), not per key — the
    test pins the contract so the trap stays visible."""
    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.sketches.kll import KLL

    scattered = transcripts.repartition(8)  # round-robin: keys span tasks
    blobs = sketch_by_key(
        scattered,
        ["conv_id"],
        F.length("text").cast("double"),
        lambda: KLL(200),
        method="clustered",
    )
    n_keys = transcripts.select("conv_id").distinct().count()
    assert blobs.count() > n_keys


def test_register_bucketed_table_roundtrip(
    spark, transcripts, tmp_path_factory
):
    """A fresh-catalog re-register over the same directory restores the
    bucket spec (DESCRIBE shows the clustering) and the no-Exchange
    window plan."""
    from tgdigest_spark.api import interturn_latency_seconds
    from tgdigest_spark.sources.transcripts import (
        register_bucketed_table,
        write_transcripts_bucketed,
    )

    path = str(tmp_path_factory.mktemp("bucketed_rt") / "t_rt")
    write_transcripts_bucketed(transcripts, "t_rt", n_buckets=4, path=path)
    spark.sql("DROP TABLE t_rt")  # external: files survive the drop
    register_bucketed_table(spark, "t_rt", path, n_buckets=4)
    try:
        df = spark.table("t_rt")
        assert df.count() == transcripts.count()
        assert "Exchange" not in _plan(interturn_latency_seconds(df))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_rt")
