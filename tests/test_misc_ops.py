"""Sparse HLL, KLL bulk hook, eviction selection, grouped KLL/HLL via agg."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tgdigest_spark.operators.eviction import eviction_candidates, total_cache_bytes
from tgdigest_spark.sketches.hll import HLL
from tgdigest_spark.sketches.kll import KLL


def test_sparse_hll_blob_sizes_and_accuracy():
    small = HLL(14).update(np.array([f"c{i}" for i in range(100)]))
    assert small.is_sparse
    assert len(small.serialize()) < 2000  # vs 16400 dense
    assert abs(small.estimate() - 100) < 3
    big = HLL(14).update(np.array([f"d{i}" for i in range(100_000)]))
    assert not big.is_sparse
    # mixed merge order-insensitive
    ab = HLL.deserialize(small.serialize()).merge(big).estimate()
    ba = HLL.deserialize(big.serialize()).merge(small).estimate()
    assert ab == ba
    assert abs(ab - 100_100) / 100_100 < 0.04


def test_kll_from_sorted_like():
    proto = KLL(128)
    tiny = proto.from_sorted_like(np.array([1.0, 2.0, 3.0]))
    assert tiny.n == 3 and tiny.quantile(0.5) == 2.0
    big = proto.from_sorted_like(np.sort(np.random.default_rng(0).uniform(0, 1, 10_000)))
    assert big.n == 10_000
    assert abs(big.quantile(0.5) - 0.5) < 0.05


def test_grouped_hll_sparse_through_spark(spark, transcripts):
    from tgdigest_spark.api import grouped_distinct_count

    out = {
        r["role"]: r["distinct_est"]
        for r in grouped_distinct_count(
            transcripts, ["role"], "conv_id", p=14
        ).collect()
    }
    exact = {
        r["role"]: r["d"]
        for r in transcripts.groupBy("role")
        .agg(F.countDistinct("conv_id").alias("d"))
        .collect()
    }
    for role, d in exact.items():
        assert abs(out[role] - d) / max(d, 1) <= 0.05, (role, out[role], d)


def test_grouped_kll_through_spark(spark, transcripts):
    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.sketches.kll import KLL

    fact = lambda: KLL(200)  # noqa: E731
    blobs = sketch_by_key(
        transcripts, ["role"], F.length("text").cast("double"), fact
    ).collect()
    exact = {
        r["role"]: r["m"]
        for r in transcripts.groupBy("role")
        .agg(F.expr("percentile(length(text), 0.5)").alias("m"))
        .collect()
    }
    for r in blobs:
        est = KLL.deserialize(r["sketch"]).quantile(0.5)
        assert abs(est - exact[r["role"]]) / exact[r["role"]] < 0.06


def test_eviction_selection(spark):
    rows = [(i, 100, 1000 + i) for i in range(10)]  # size 100 each
    idx = spark.createDataFrame(rows, "media_id int, size long, last_accessed long")
    out = eviction_candidates(idx, bytes_to_free=250).collect()
    # needs 3 rows (100+100+100 >= 250), oldest-accessed first
    assert [r["media_id"] for r in out] == [0, 1, 2]
    assert out[-1]["cum_freed"] == 300
    assert total_cache_bytes(idx) == 1000
    # freeing 0 bytes evicts nothing; freeing everything evicts all
    assert eviction_candidates(idx, 0).count() == 0
    assert eviction_candidates(idx, 10_000).count() == 10


def test_grouped_latency_quantiles(spark, transcripts):
    from tgdigest_spark.api import grouped_latency_quantiles

    out = grouped_latency_quantiles(transcripts, [0.5]).limit(2000).collect()
    assert len(out) > 100
    # spot-check a few conversations against exact percentile
    sample_ids = [r["conv_id"] for r in out[:5]]
    from tgdigest_spark.api import interturn_latency_seconds
    from pyspark.sql import functions as F

    exact = {
        r["conv_id"]: r["m"]
        for r in interturn_latency_seconds(transcripts)
        .where(F.col("conv_id").isin(sample_ids))
        .groupBy("conv_id")
        .agg(F.expr("percentile(latency_s, 0.5)").alias("m"))
        .collect()
    }
    got = {r["conv_id"]: r["p50"] for r in out[:5]}
    for cid, m in exact.items():
        assert abs(got[cid] - m) <= max(0.05 * abs(m), 1e-9), (cid, got[cid], m)


def test_result_cache(spark, transcripts, tmp_path):
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.plans.result_cache import ResultCache, plan_fingerprint

    cache = ResultCache(str(tmp_path / "rc"))
    q = transcripts.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
    # identical plans → identical fingerprints, different plans differ
    q2 = transcripts.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
    q3 = transcripts.groupBy("tool").agg(F.count(F.lit(1)).alias("n"))
    assert plan_fingerprint(q) == plan_fingerprint(q2)
    assert plan_fingerprint(q) != plan_fingerprint(q3)

    assert not cache.contains(q)
    first = {r["role"]: r["n"] for r in cache.get_or_compute(q).collect()}
    assert cache.contains(q)
    data_path = os.path.join(str(tmp_path / "rc"))
    files_before = {
        f: os.path.getmtime(os.path.join(data_path, f))
        for f in os.listdir(data_path)
    }
    # hit: no recompute, artifact untouched, same values
    second = {r["role"]: r["n"] for r in cache.get_or_compute(q2).collect()}
    assert second == first
    for f, t in files_before.items():
        assert os.path.getmtime(os.path.join(data_path, f)) == t
    # snapshot-versioned key busts the cache
    assert not cache.contains(q, key_extra="snapshot-2")
