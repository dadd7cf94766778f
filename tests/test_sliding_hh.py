"""Sliding-window heavy hitters: pane-merged Misra-Gries candidates +
exact verify (api.sliding_frequent_items /
api.sliding_guaranteed_heavy_hitters)."""

import datetime as dt
import math
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from tgdigest_spark.api import (
    sliding_frequent_items,
    sliding_guaranteed_heavy_hitters,
    sliding_guaranteed_heavy_hitters_scope,
)


def _mk_events(spark):
    """20 days of item events with per-window regime changes: 'hot_a'
    dominates days 0-9, 'hot_b' days 10-19, plus a uniform long tail —
    so the phi-heavy set genuinely differs across sliding windows."""
    rows = []
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    for day in range(20):
        ts = base + dt.timedelta(days=day)
        hot = "hot_a" if day < 10 else "hot_b"
        rows += [(ts, hot)] * 40
        rows += [(ts, "warm")] * 12
        rows += [(ts, f"tail_{day}_{i}") for i in range(48)]
    return spark.createDataFrame(rows, "ts timestamp, item string")


def _naive_exact_hh(df, window_days, slide_days, phi_frac):
    """The naive per-window exact heavy hitters: explode fact rows to
    every containing window, full GROUP BY, exact rational cutoff."""
    k = window_days // slide_days
    pidx = F.floor(F.unix_date(F.to_date("ts")) / slide_days)
    facts = df.select(
        F.explode(F.sequence(pidx - (k - 1), pidx)).alias("w"), "item"
    )
    counts = (
        facts.groupBy("w", "item").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n_w = {}
    for r in counts:
        n_w[r["w"]] = n_w.get(r["w"], 0) + r["c"]
    out = set()
    for r in counts:
        cutoff = math.floor(phi_frac * n_w[r["w"]]) + 1
        if r["c"] >= cutoff:
            epoch = dt.date(1970, 1, 1)
            ws = epoch + dt.timedelta(days=int(r["w"]) * slide_days)
            out.add((ws, r["item"], r["c"], n_w[r["w"]]))
    return out


def test_sliding_guaranteed_hh_exact_parity(spark):
    df = _mk_events(spark)
    phi = 0.2
    with sliding_guaranteed_heavy_hitters_scope(
        df, "ts", "item", 6, 2, phi=phi
    ) as res:
        got = {
            (r["window_start"], r["item"], r["exact_count"], r["window_n"])
            for r in res.collect()
        }
    expect = _naive_exact_hh(df, 6, 2, Fraction(phi).limit_denominator(10**9))
    assert got == expect  # no false negatives AND no false positives
    assert any(it == "hot_a" for _, it, _, _ in got)
    assert any(it == "hot_b" for _, it, _, _ in got)
    # regime change: hot_a must NOT be heavy in windows fully past day 9
    late = {it for ws, it, _, _ in got if ws >= dt.date(2024, 3, 11)}
    assert "hot_a" not in late and "hot_b" in late


def test_sliding_guaranteed_hh_layout_independent(spark):
    df = _mk_events(spark)
    a = sliding_guaranteed_heavy_hitters(df, "ts", "item", 6, 3, phi=0.25)
    rows_a = {tuple(r) for r in a.collect()}
    a.release_cache()
    b = sliding_guaranteed_heavy_hitters(
        df.repartition(17, F.xxhash64("item")), "ts", "item", 6, 3, phi=0.25
    )
    rows_b = {tuple(r) for r in b.collect()}
    b.release_cache()
    assert rows_a == rows_b and rows_a


def test_sliding_frequent_items_sandwich_and_exact_n(spark):
    df = _mk_events(spark)
    est = {
        (r["window_start"], r["item"]): (
            r["est_count"], r["max_undercount"], r["window_n"]
        )
        for r in sliding_frequent_items(df, "ts", "item", 4, 2, k=8)
        .collect()
    }
    # exact per-window truth via the naive explode
    pidx = F.floor(F.unix_date(F.to_date("ts")) / 2)
    facts = df.select(
        F.explode(F.sequence(pidx - 1, pidx)).alias("w"), "item"
    )
    true = {
        (r["w"], r["item"]): r["c"]
        for r in facts.groupBy("w", "item")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_true = {}
    for (w, _), c in true.items():
        n_true[w] = n_true.get(w, 0) + c
    assert est
    for (ws, item), (e, err, n) in est.items():
        w = (ws.toordinal() - 719163) // 2  # 719163 = 1970-01-01
        t = true[(w, item)]
        assert e <= t <= e + err, (ws, item, e, err, t)
        assert n == n_true[w]


def test_sliding_hh_bad_args(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "a")], "ts timestamp, item string"
    )
    with pytest.raises(ValueError):
        sliding_guaranteed_heavy_hitters(df, "ts", "item", 6, 2, phi=1.5)
    with pytest.raises(ValueError):
        sliding_guaranteed_heavy_hitters(df, "ts", "item", 6, 2, phi=0.1, k=5)
    with pytest.raises(ValueError):
        sliding_guaranteed_heavy_hitters(df, "ts", "item", 5, 2, phi=0.1)


def test_sliding_hh_scope_releases_cache(spark):
    df = _mk_events(spark)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with sliding_guaranteed_heavy_hitters_scope(
        df, "ts", "item", 6, 2, phi=0.2
    ) as res:
        res.collect()
        assert jsc.getPersistentRDDs().size() > before
    assert jsc.getPersistentRDDs().size() == before
