"""Sketch query APIs on Spark vs exact answers, at published bounds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tgdigest_spark.api import (
    build_membership,
    distinct_count,
    grouped_distinct_count,
    heavy_hitters,
    membership_prune,
    quantiles_kll,
)


def test_distinct_count_vs_exact(spark, transcripts):
    est = distinct_count(transcripts, "conv_id", p=14)
    exact = transcripts.select("conv_id").distinct().count()
    assert abs(est - exact) / exact <= 4 * 1.04 / np.sqrt(1 << 14) + 0.01


def test_distinct_tools_vs_exact(spark, transcripts):
    est = distinct_count(
        transcripts, "tool", p=14, where=F.col("tool").isNotNull()
    )
    exact = (
        transcripts.where(F.col("tool").isNotNull())
        .select("tool")
        .distinct()
        .count()
    )
    assert abs(est - exact) <= max(2, 0.05 * exact)


def test_grouped_distinct(spark, transcripts):
    out = {
        r["role"]: r["distinct_est"]
        for r in grouped_distinct_count(
            transcripts, ["role"], "conv_id", p=12
        ).collect()
    }
    exact = {
        r["role"]: r["d"]
        for r in transcripts.groupBy("role")
        .agg(F.countDistinct("conv_id").alias("d"))
        .collect()
    }
    for role, d in exact.items():
        assert abs(out[role] - d) / max(d, 1) <= 0.1, (role, out[role], d)


def test_heavy_hitters_vs_exact(spark, transcripts):
    tools = transcripts.where(F.col("tool").isNotNull())
    hh = heavy_hitters(tools, "tool", k=5, eps=0.001, delta=0.01)
    got = {r["item"]: r["est_count"] for r in hh.collect()}
    exact = {
        r["tool"]: r["cnt"]
        for r in tools.groupBy("tool")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(5)
        .collect()
    }
    n = tools.count()
    # CM one-sided bound: est >= true, est - true <= eps*N
    for item, est in got.items():
        true = (
            tools.where(F.col("tool") == item).count()
        )
        assert est >= true and est - true <= 0.001 * n + 1
    # top sets agree on the heaviest items (Zipf separation)
    assert set(list(got)[:3]) & set(exact) != set()


def test_membership_prune(spark, transcripts):
    sample_ids = [r["conv_id"] for r in transcripts.select("conv_id").distinct().limit(50).collect()]
    members = transcripts.where(F.col("conv_id").isin(sample_ids))
    bloom = build_membership(members, "conv_id", capacity=1000, fpr=0.01)
    pruned = membership_prune(transcripts, "conv_id", bloom)
    kept_ids = {r["conv_id"] for r in pruned.select("conv_id").distinct().collect()}
    # no false negatives
    assert set(sample_ids) <= kept_ids
    # few false positives
    total_ids = transcripts.select("conv_id").distinct().count()
    assert len(kept_ids) - len(sample_ids) <= 0.05 * total_ids + 2


def test_kll_on_spark_vs_exact(spark, transcripts):
    est = quantiles_kll(transcripts, F.length("text").cast("double"), [0.5, 0.95], k=200)
    exact = transcripts.select(
        F.expr("percentile(length(text), array(0.5, 0.95))").alias("p")
    ).collect()[0]["p"]
    vals = np.sort(
        np.array([r[0] for r in transcripts.select(F.length("text")).collect()])
    )
    n = len(vals)
    for q, e in est.items():
        qhat = np.searchsorted(vals, e, "right") / n
        assert abs(qhat - q) <= 0.035, (q, e, qhat)


def test_grouped_quantiles_kll(spark, sf001_dir):
    """Per-group KLL quantiles (vectorized mass extraction) land within
    the additive rank-error bound of the exact per-group percentiles."""
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_quantiles_kll

    ev = spark.read.parquet(f"{sf001_dir}/events.parquet")
    got = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in grouped_quantiles_kll(
            ev, ["event_type"], "value", [0.5, 0.95], k=200
        ).collect()
    }
    # rank-based check (the bound KLL actually guarantees): the
    # fraction of group values <= estimate must be near q, with 1/n
    # slack for the inclusive-rank discretization at any group size
    pdf = ev.select("event_type", "value").toPandas()
    assert set(got) == set(pdf["event_type"].unique())
    for et, (p50, p95) in got.items():
        vals = pdf.loc[pdf["event_type"] == et, "value"].to_numpy()
        n = len(vals)
        for est, q in ((p50, 0.5), (p95, 0.95)):
            rank = (vals <= est).mean()
            assert abs(rank - q) <= 0.05 + 1.0 / n, (et, q, est, rank)


def test_cdf_and_rank_vs_exact(spark, transcripts):
    """TDigest.cdf / KLL.rank on Spark vs exact tie-robust rank
    intervals, at the tight published bounds (the driver gate row
    sketch_cdf_rank asserts the same with a generous tol)."""
    from tgdigest_spark.api import cdf, ranks_kll

    vals = np.array(
        [r[0] for r in transcripts.select(F.length("text")).collect()],
        dtype=np.float64,
    )
    n = len(vals)
    probes = [float(np.percentile(vals, p)) for p in (25.0, 50.0, 90.0)]
    est_td = cdf(transcripts, F.length("text").cast("double"), probes, delta=200)
    est_kll = ranks_kll(
        transcripts, F.length("text").cast("double"), probes, k=200
    )
    for x in probes:
        lo = np.sum(vals < x) / n
        hi = np.sum(vals <= x) / n
        # t-digest: q(1-q)/delta-class rank error; 0.02 is ~4x the
        # mid-range bound at delta=200
        assert lo - 0.02 <= est_td[x] <= hi + 0.02, ("td", x, est_td[x], lo, hi)
        # KLL k=200: eps ~ 0.013; 0.035 mirrors the quantile test slack
        assert lo - 0.035 <= est_kll[x] <= hi + 0.035, (
            "kll", x, est_kll[x], lo, hi,
        )


def test_cdf_rank_monotone_and_edges(spark, transcripts):
    """CDF estimates are monotone in x and exact at/beyond the extremes
    (below min -> 0.0, at/above max -> 1.0) — the interpolation
    endpoints TDigest carries exactly; KLL's inclusive rank likewise."""
    from tgdigest_spark.api import cdf, ranks_kll

    vals = np.array(
        [r[0] for r in transcripts.select(F.length("text")).collect()],
        dtype=np.float64,
    )
    lo, hi = float(vals.min()), float(vals.max())
    probes = [lo - 1.0, lo, (lo + hi) / 2, hi, hi + 1.0]
    for est in (
        cdf(transcripts, F.length("text").cast("double"), probes),
        ranks_kll(transcripts, F.length("text").cast("double"), probes),
    ):
        seq = [est[x] for x in probes]
        assert seq == sorted(seq), seq
        assert seq[0] == 0.0
        assert seq[-1] == 1.0


def test_cdf_rank_accept_iterator_probes(spark, transcripts):
    """cdf/ranks_kll materialize their probe iterable once — a
    generator input must produce a fully-populated result dict."""
    from tgdigest_spark.api import cdf, ranks_kll

    col = F.length("text").cast("double")
    got = cdf(transcripts, col, (x for x in (10.0, 50.0)))
    assert set(got) == {10.0, 50.0} and all(0 <= v <= 1 for v in got.values())
    got = ranks_kll(transcripts, col, iter([10.0, 50.0]))
    assert set(got) == {10.0, 50.0}
