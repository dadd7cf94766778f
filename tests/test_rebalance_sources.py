"""rebalance_sources: temperature flattening, target-weight mixing,
determinism/layout independence, downsample-only invariant, and
validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # skewed sources: 800 web, 150 books, 50 code
    rows = (
        [(i, "web") for i in range(800)]
        + [(1000 + i, "books") for i in range(150)]
        + [(2000 + i, "code") for i in range(50)]
    )
    return spark.createDataFrame(rows, "doc_id long, src string")


def _counts(df):
    return {
        r["src"]: r["n"]
        for r in df.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_temperature_flattens_distribution(spark, corpus):
    from tgdigest_spark.operators.sampling import rebalance_sources

    kept = rebalance_sources(
        corpus, source="src", key="doc_id", temperature=2.0, seed="t"
    )
    c = _counts(kept)
    # weights ∝ sqrt(n): 28.3 / 12.2 / 7.1 — the smallest source (code,
    # highest n/w ratio is web) ... scale pins the source with MIN n/w:
    # web 800/28.3=28.3, books 150/12.2=12.2, code 50/7.1=7.1 → code
    # kept whole, others downsampled to w_s * 7.07
    assert c["code"] == 50
    # expectations: web ≈ 28.28*7.07 ≈ 200, books ≈ 86.6; binomial
    # noise at these n is ~±3σ ≈ ±40 and ±27
    assert 140 <= c["web"] <= 260, c
    assert 55 <= c["books"] <= 120, c
    # flattened: web/code ratio drops from 16x to ~4x
    assert c["web"] / c["code"] < 8


def test_target_weights_and_drop(spark, corpus):
    from tgdigest_spark.operators.sampling import rebalance_sources

    kept = rebalance_sources(
        corpus,
        source="src",
        key="doc_id",
        target_weights={"web": 1.0, "books": 1.0},  # code dropped
        seed="t2",
    )
    c = _counts(kept)
    assert "code" not in c
    # books (150/1.0) pins the scale → kept whole; web downsampled to ~150
    assert c["books"] == 150
    assert 100 <= c["web"] <= 210, c


def test_deterministic_and_layout_independent(spark, corpus):
    from tgdigest_spark.operators.sampling import rebalance_sources

    a = sorted(
        r["doc_id"]
        for r in rebalance_sources(
            corpus, "src", "doc_id", temperature=3.0, seed="s"
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in rebalance_sources(
            corpus.repartition(13), "src", "doc_id", temperature=3.0, seed="s"
        ).collect()
    )
    assert a == b and a
    c = sorted(
        r["doc_id"]
        for r in rebalance_sources(
            corpus, "src", "doc_id", temperature=3.0, seed="DIFFERENT"
        ).collect()
    )
    assert a != c


def test_downsample_only_and_null_sources_dropped(spark, corpus):
    from tgdigest_spark.operators.sampling import rebalance_sources

    with_null = corpus.union(
        spark.createDataFrame([(9999, None)], "doc_id long, src string")
    )
    kept = rebalance_sources(
        with_null, "src", "doc_id", temperature=1.0, seed="x"
    )
    # T=1 keeps the natural distribution → every source kept whole
    assert _counts(kept) == _counts(corpus)
    assert kept.where(F.col("doc_id") == 9999).count() == 0


def test_shuffle_for_training_order_and_determinism(spark, corpus):
    """Epoch shuffle: physical within-partition order follows the
    content-hash uniform, the order is layout-independent, every row
    appears exactly once, and a new seed permutes."""
    from tgdigest_spark.operators.sampling import (
        hash_uniform,
        shuffle_for_training,
    )

    def run(df, seed):
        out = shuffle_for_training(df, key="doc_id", seed=seed, n_shards=8)
        rows = out.select(
            "shard",
            "doc_id",
            hash_uniform(F.col("doc_id"), seed + "|order").alias("u"),
            F.spark_partition_id().alias("pid"),
        ).collect()
        by_pid = {}
        for r in rows:
            by_pid.setdefault(r["pid"], []).append(r)
        return rows, by_pid

    rows, by_pid = run(corpus, "e1")
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in corpus.collect()
    )  # exactly once
    for rs in by_pid.values():  # physically sorted within partitions
        keys = [(r["shard"], r["u"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)
    assert len({r["shard"] for r in rows}) == 8  # all shards populated

    # layout independence: identical (shard, order) under a repartition
    def order_map(rows):
        per = {}
        for r in sorted(rows, key=lambda r: (r["shard"], r["u"], r["doc_id"])):
            per.setdefault(r["shard"], []).append(r["doc_id"])
        return per

    rows2, _ = run(corpus.repartition(13), "e1")
    assert order_map(rows) == order_map(rows2)
    # a new seed gives a different permutation
    rows3, _ = run(corpus, "e2")
    assert order_map(rows) != order_map(rows3)

    with pytest.raises(ValueError):
        shuffle_for_training(corpus, key="doc_id", n_shards=0)


def test_validation(spark, corpus):
    from tgdigest_spark.operators.sampling import rebalance_sources

    with pytest.raises(ValueError, match="exactly one"):
        rebalance_sources(corpus, "src", "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        rebalance_sources(
            corpus, "src", "doc_id", temperature=2.0, target_weights={"web": 1}
        )
    with pytest.raises(ValueError, match="positive"):
        rebalance_sources(corpus, "src", "doc_id", temperature=0.0)
