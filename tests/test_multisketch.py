"""MultiSketch composition + one-scan key_profile."""

from __future__ import annotations

import collections
import functools

import numpy as np
import pandas as pd
import pytest

from tgdigest_spark.sketches import (
    HLL,
    CountSketch,
    FrequentItems,
    MultiSketch,
)


def _mk():
    return MultiSketch([HLL(12), CountSketch(5, 2048), FrequentItems(64)])


def _zipf(seed, n=60_000):
    rng = np.random.default_rng(seed)
    return pd.Series([f"u{v}" for v in np.minimum(rng.zipf(1.4, n), 1500)])


def test_children_match_standalone_builds():
    data = _zipf(3)
    ms = _mk()
    for c in np.array_split(data, 7):
        ms.update(pd.Series(c))
    hll = HLL(12)
    cs = CountSketch(5, 2048)
    mg = FrequentItems(64)
    for c in np.array_split(data, 7):
        hll.update(pd.Series(c))
        cs.update(pd.Series(c))
        mg.update(pd.Series(c))
    assert ms.children[0].estimate() == hll.estimate()
    assert (ms.children[1].table == cs.table).all()
    assert ms.children[2].counts == mg.counts
    assert ms.n == len(data)


def test_merge_matches_single_and_counts_nulls_once():
    data = _zipf(5)
    whole = _mk().update(data)
    parts = [_mk().update(pd.Series(c)) for c in np.array_split(data, 6)]
    merged = functools.reduce(lambda a, b: a.merge(b), parts)
    assert merged.children[0].estimate() == whole.children[0].estimate()
    assert (merged.children[1].table == whole.children[1].table).all()
    assert merged.n == whole.n
    ms = _mk().update(pd.Series(["a", None, "b"]))
    assert ms.n == 2


def test_serialization_round_trip_magic_dispatch():
    ms = _mk().update(_zipf(7, 20_000))
    rt = MultiSketch.deserialize(ms.serialize())
    assert [type(c).__name__ for c in rt.children] == [
        "HLL", "CountSketch", "FrequentItems",
    ]
    assert rt.n == ms.n
    assert rt.children[0].estimate() == ms.children[0].estimate()
    assert (rt.children[1].table == ms.children[1].table).all()
    assert rt.children[2].counts == ms.children[2].counts


def test_mismatched_merge_raises():
    with pytest.raises(ValueError):
        _mk().merge(MultiSketch([HLL(12)]))
    with pytest.raises(ValueError):
        MultiSketch([HLL(12)]).merge(MultiSketch([CountSketch(5, 2048)]))
    with pytest.raises(ValueError):
        MultiSketch([])


# ---------------------------------------------------------------------------
# Spark: one-scan key profile
# ---------------------------------------------------------------------------


def test_key_profile_against_exact(spark, sf001_dir):
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.api import key_profile

    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    prof = key_profile(ev, "user_id", p=14, width=4096, mg_k=64)
    nn = ev.where(F.col("user_id").isNotNull())
    n = nn.count()
    distinct = nn.select("user_id").distinct().count()
    cnts = nn.groupBy("user_id").count()
    f2 = cnts.agg(F.sum(F.col("count") * F.col("count")).alias("f")).collect()[
        0
    ]["f"]
    mx = cnts.agg(F.max("count").alias("m")).collect()[0]["m"]
    assert prof["n_rows"] == n
    assert abs(prof["distinct_est"] - distinct) <= 0.062 * distinct  # 6 sigma
    assert abs(prof["selfjoin_size_est"] - f2) <= 4 * f2 * np.sqrt(2 / 4096)
    # MG sandwich: est <= true max <= est + err for the top key
    top_key, top_est, top_ub = prof["top_keys"][0]
    true_top = cnts.where(F.col("user_id").cast("string") == top_key).collect()[
        0
    ]["count"]
    assert top_est <= true_top <= top_ub
    assert prof["hot_share_ub"] >= mx / n  # upper bound really bounds
    assert prof["skew_ratio"] > 0


def test_key_profile_uniform_keys_ub_still_bounds(spark):
    """Near-uniform keys leave Misra-Gries with ZERO tracked items
    (every counter decremented away), but the one-sided guarantee
    true <= est + err still holds with est=0 — so hot_share_ub must
    fall back to err/n, never 0 (r6 review finding)."""
    from tgdigest_spark.api import key_profile

    df = spark.range(4000).selectExpr("concat('k', id) AS k")
    prof = key_profile(df, "k", p=12, width=1024, mg_k=256)
    # every key appears exactly once -> true hottest share is 1/4000
    assert prof["hot_share_ub"] >= 1 / 4000
    assert prof["mg_err"] >= 1
    if not prof["top_keys"]:
        assert prof["hot_share_ub"] == prof["mg_err"] / prof["n_rows"]
