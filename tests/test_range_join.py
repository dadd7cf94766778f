"""range_join vs brute-force inequality join, on both the binned and
broadcast-long paths, plus the no-BNLJ plan guarantee for the short
path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _mk(seed: int, n_pts=500, n_iv=200, n_keys=6, max_len=5000):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_pts),
            "p": rng.integers(0, 100_000, n_pts),
            "pid": np.arange(n_pts),
        }
    )
    s = rng.integers(0, 100_000, n_iv)
    iv = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_iv),
            "s": s,
            "e": s + rng.integers(0, max_len, n_iv),
            "iid": np.arange(n_iv),
        }
    )
    return pts, iv


def _brute(pts: pd.DataFrame, iv: pd.DataFrame, keyed=True) -> set:
    m = pts.merge(iv, on="k" if keyed else None, how="cross" if not keyed else "inner")
    m = m[(m["s"] <= m["p"]) & (m["p"] <= m["e"])]
    return set(zip(m["pid"], m["iid"]))


def _got(df) -> set:
    rows = df.select("pid", "iid").collect()
    return set((r["pid"], r["iid"]) for r in rows)


@pytest.mark.parametrize("bin_width", [None, 100, 50_000])
def test_range_join_matches_brute_force(spark, bin_width):
    from tgdigest_spark.operators.range_join import range_join

    pts, iv = _mk(seed=11)
    out = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point="p",
        start="s",
        end="e",
        on="k",
        bin_width=bin_width,
    )
    got = _got(out)
    assert got == _brute(pts, iv)
    # exactly-once: no duplicate (point, interval) pairs from the explode
    assert out.count() == len(got)


def test_range_join_long_path_and_mixture(spark):
    """long_cap=2 forces most intervals through the broadcast side
    path; the union of both paths must still equal brute force with no
    duplicates."""
    from tgdigest_spark.operators.range_join import range_join

    pts, iv = _mk(seed=5, max_len=20_000)
    out = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point="p",
        start="s",
        end="e",
        on="k",
        bin_width=1000,
        long_cap=2,
    )
    got = _got(out)
    assert got == _brute(pts, iv)
    assert out.count() == len(got)


def test_range_join_keyless(spark):
    from tgdigest_spark.operators.range_join import range_join

    pts, iv = _mk(seed=9, n_pts=120, n_iv=40)
    pts = pts.drop(columns=["k"])
    iv = iv.drop(columns=["k"])
    out = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point="p",
        start="s",
        end="e",
        bin_width=500,
    )
    m = pts.merge(iv, how="cross")
    m = m[(m["s"] <= m["p"]) & (m["p"] <= m["e"])]
    assert _got(out) == set(zip(m["pid"], m["iid"]))


def test_short_path_plans_hash_join_not_bnlj(spark):
    """The whole point: the binned path must plan as an equi hash/merge
    join, with the nested-loop join confined to the (empty here)
    long-interval side."""
    from tgdigest_spark.operators.range_join import range_join

    pts, iv = _mk(seed=3, max_len=2000)
    out = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point="p",
        start="s",
        end="e",
        on="k",
        bin_width=1000,
        long_cap=1_000_000,  # everything short
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # short path: a real equi join on (k, bin)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    out.count()  # also execute once for sanity


def test_estimate_bin_width(spark):
    from tgdigest_spark.operators.range_join import estimate_bin_width

    iv = spark.createDataFrame(
        [(0, 0 + ln) for ln in (10, 20, 30, 40)], "s long, e long"
    )
    w = estimate_bin_width(iv, "s", "e")
    assert 10 <= w <= 40


# ---------------------------------------------------------------------------
# interval × interval overlap join
# ---------------------------------------------------------------------------

def _mk_iv(seed: int, n=150, n_keys=5, max_len=5000, prefix="a"):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 100_000, n)
    return pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n),
            f"{prefix}s": s,
            f"{prefix}e": s + rng.integers(0, max_len, n),
            f"{prefix}id": np.arange(n),
        }
    )


def _brute_overlap(l: pd.DataFrame, r: pd.DataFrame, keyed=True) -> set:
    m = l.merge(r, on="k") if keyed else l.merge(r, how="cross")
    m = m[(m["as"] <= m["be"]) & (m["bs"] <= m["ae"])]
    return set(zip(m["aid"], m["bid"]))


@pytest.mark.parametrize("long_cap,bin_width", [(10**6, 1000), (2, 1000), (10**6, None)])
def test_interval_overlap_matches_brute_force(spark, long_cap, bin_width):
    from tgdigest_spark.operators.range_join import interval_overlap_join

    l = _mk_iv(seed=21, prefix="a")
    r = _mk_iv(seed=22, prefix="b", max_len=12_000)
    out = interval_overlap_join(
        spark.createDataFrame(l),
        spark.createDataFrame(r),
        "as", "ae", "bs", "be",
        on="k",
        bin_width=bin_width,
        long_cap=long_cap,
    )
    rows = out.select("aid", "bid").collect()
    got = set((x["aid"], x["bid"]) for x in rows)
    assert got == _brute_overlap(l, r)
    assert len(rows) == len(got)  # exactly-once per pair


def test_interval_overlap_keyless(spark):
    from tgdigest_spark.operators.range_join import interval_overlap_join

    l = _mk_iv(seed=31, n=40, prefix="a").drop(columns=["k"])
    r = _mk_iv(seed=32, n=30, prefix="b").drop(columns=["k"])
    out = interval_overlap_join(
        spark.createDataFrame(l),
        spark.createDataFrame(r),
        "as", "ae", "bs", "be",
        bin_width=2000,
    )
    m = l.merge(r, how="cross")
    m = m[(m["as"] <= m["be"]) & (m["bs"] <= m["ae"])]
    rows = out.select("aid", "bid").collect()
    got = set((x["aid"], x["bid"]) for x in rows)
    assert got == set(zip(m["aid"], m["bid"]))
    assert len(rows) == len(got)
