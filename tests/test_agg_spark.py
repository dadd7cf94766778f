"""Spark-side sketch aggregation: global + per-key topologies vs exact.

Also covers the north_rule invariants: shuffled-partition permutations
land within bound, and per-turn text equality under stable
(conv_id, turn_idx) ordering survives the pipelines.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tgdigest_spark.agg import sketch_by_key, sketch_column, with_quantiles
from tgdigest_spark.api import (
    latency_quantiles,
    text_length_quantiles,
    turns_per_conversation_quantiles,
)
from tgdigest_spark.sketches.tdigest import TDigest

QS = [0.5, 0.95, 0.99]
DELTA = 200


def _exact_quantiles(df, col_expr, qs):
    row = df.select(
        F.expr(f"percentile({col_expr}, array({','.join(map(str, qs))}))").alias("p")
    ).collect()[0]
    return dict(zip(qs, row["p"]))


def _assert_within_rank_bound(df, col_expr, est: dict, qs):
    vals = np.sort(
        np.array([r[0] for r in df.select(F.expr(col_expr)).collect()], dtype=float)
    )
    n = len(vals)
    for q in qs:
        e = est[q]
        lo = np.searchsorted(vals, e, "left") / n
        hi = np.searchsorted(vals, e, "right") / n
        err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
        assert err <= max(8.0 * q * (1 - q) / DELTA, 2e-3), (q, e, err)


def test_global_text_length_quantiles(spark, transcripts):
    est = text_length_quantiles(transcripts, QS, delta=DELTA)
    _assert_within_rank_bound(transcripts, "length(text)", est, QS)


def test_latency_quantiles(spark, transcripts):
    est = latency_quantiles(transcripts, QS, delta=DELTA)
    from tgdigest_spark.api import interturn_latency_seconds

    lat = interturn_latency_seconds(transcripts)
    _assert_within_rank_bound(lat, "latency_s", est, QS)


def test_turns_per_conversation(spark, transcripts):
    est = turns_per_conversation_quantiles(transcripts, QS, delta=DELTA)
    per_conv = transcripts.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    _assert_within_rank_bound(per_conv, "cast(n as double)", est, QS)


def test_partition_permutation_invariance(spark, transcripts):
    """north_rule: same data, different partitioning → within-bound estimates."""
    base = text_length_quantiles(transcripts, QS, delta=DELTA)
    exact = _exact_quantiles(transcripts, "length(text)", QS)
    for reshuffle in (
        transcripts.repartition(3),
        transcripts.repartition(17, "conv_id"),
        transcripts.orderBy(F.desc("ts")),
    ):
        est = text_length_quantiles(reshuffle, QS, delta=DELTA)
        for q in QS:
            # both runs within bound of exact → within 2x bound of each other
            span = max(abs(exact[q]) * 0.05, 1.0)
            assert abs(est[q] - base[q]) <= span, (q, est[q], base[q])


@pytest.mark.parametrize("method", ["combine", "salted"])
def test_grouped_by_role(spark, transcripts, method):
    blobs = sketch_by_key(
        transcripts,
        ["role"],
        F.length("text").cast("double"),
        lambda: TDigest(DELTA),
        method=method,
    )
    out = with_quantiles(blobs, lambda: TDigest(DELTA), [0.5]).collect()
    assert len(out) == 4  # user/assistant/system/tool
    exact = {
        r["role"]: r["m"]
        for r in transcripts.groupBy("role")
        .agg(F.expr("percentile(length(text), 0.5)").alias("m"))
        .collect()
    }
    for r in out:
        assert abs(r["p50"] - exact[r["role"]]) / max(exact[r["role"]], 1) < 0.05


def test_grouped_methods_agree(spark, transcripts):
    a = {
        r["role"]: r["p50"]
        for r in with_quantiles(
            sketch_by_key(
                transcripts, ["role"], F.length("text").cast("double"),
                lambda: TDigest(DELTA), method="combine",
            ),
            lambda: TDigest(DELTA),
            [0.5],
        ).collect()
    }
    b = {
        r["role"]: r["p50"]
        for r in with_quantiles(
            sketch_by_key(
                transcripts, ["role"], F.length("text").cast("double"),
                lambda: TDigest(DELTA), method="salted",
            ),
            lambda: TDigest(DELTA),
            [0.5],
        ).collect()
    }
    for k in a:
        assert abs(a[k] - b[k]) / max(abs(a[k]), 1) < 0.05


def test_text_equality_invariant(spark, transcripts):
    """BASELINE.json input_hint: per-turn text byte-equality under stable
    (conv_id, turn_idx) order after a repartition+shuffle round-trip."""
    before = transcripts.orderBy("conv_id", "turn_idx").select("text").collect()
    after = (
        transcripts.repartition(13, "role")
        .orderBy("conv_id", "turn_idx")
        .select("text")
        .collect()
    )
    assert [r["text"] for r in before] == [r["text"] for r in after]


def test_sketch_column_empty(spark):
    df = spark.range(0).select(F.col("id").cast("double").alias("v"))
    sk = sketch_column(df, "v", lambda: TDigest(100))
    assert sk.count == 0
