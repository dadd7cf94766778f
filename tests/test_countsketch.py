"""CountSketch: unbiased point frequencies, AMS F2 bound, exact-linear
merge, serialization round trip."""

from __future__ import annotations

import collections
import functools

import numpy as np
import pytest

from tgdigest_spark.sketches import CountSketch


def _zipf_items(seed: int, n: int = 100_000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    z = np.minimum(rng.zipf(1.3, n), 2000)
    return np.array([f"u{v}" for v in z])


def test_f2_within_published_bound():
    # Var(per-row F2) <= 2*F2^2/width  ->  sd <= F2*sqrt(2/width);
    # median over depth=5 rows: assert 4 sigma (one-run flake budget
    # far below the median's actual concentration).
    items = _zipf_items(7)
    cs = CountSketch(depth=5, width=4096)
    for c in np.array_split(items, 11):
        cs.update(c)
    true = collections.Counter(items.tolist())
    f2 = sum(v * v for v in true.values())
    tol = 4.0 * f2 * np.sqrt(2.0 / cs.width)
    assert abs(cs.f2_estimate() - f2) <= tol
    # each row is independently inside a (looser) per-row band
    rows = cs.f2_rows()
    assert (np.abs(rows - f2) <= 6.0 * f2 * np.sqrt(2.0 / cs.width)).all()


def test_point_estimates_two_sided_bound():
    # |est(x) - f(x)| <= 3*sqrt(F2/width) per row whp; median over
    # depth rows -> assert with the 3-sigma constant for every key.
    items = _zipf_items(11)
    cs = CountSketch(depth=7, width=8192)
    cs.update(items)
    true = collections.Counter(items.tolist())
    keys = np.array(list(true))
    est = cs.estimate(keys)
    truth = np.array([true[k] for k in keys])
    f2 = float((truth.astype(np.float64) ** 2).sum())
    band = 3.0 * np.sqrt(f2 / cs.width)
    assert (np.abs(est - truth) <= band).all()
    # unlike count-min the estimator is two-sided: on a zipf stream some
    # estimate should actually fall below truth (unbiasedness smoke)
    assert (est < truth).any() and (est > truth).any()


def test_merge_is_exactly_linear():
    items = _zipf_items(13, 50_000)
    whole = CountSketch(4, 1024).update(items)
    parts = [CountSketch(4, 1024).update(c) for c in np.array_split(items, 8)]
    merged = functools.reduce(lambda a, b: a.merge(b), parts)
    assert (merged.table == whole.table).all()
    assert merged.n == whole.n
    # and under a different merge tree
    mid1 = parts[0]
    for p in parts[1:4]:
        mid1 = CountSketch(4, 1024).merge(mid1).merge(p)
    # (rebuild since merge mutates) — just re-derive from fresh parts
    parts = [CountSketch(4, 1024).update(c) for c in np.array_split(items, 8)]
    left = functools.reduce(lambda a, b: a.merge(b), parts[:3])
    right = functools.reduce(lambda a, b: a.merge(b), parts[3:])
    assert (left.merge(right).table == whole.table).all()


def test_weighted_update_and_negative_weight_raises():
    cs = CountSketch(3, 256)
    cs.update(np.array(["a", "b"]), counts=np.array([10, 3]))
    assert cs.n == 13
    est = cs.estimate(np.array(["a", "b"]))
    assert est[0] == 10 and est[1] == 3  # no collisions at this load
    with pytest.raises(ValueError):
        cs.update(np.array(["c"]), counts=np.array([-1]))


def test_inner_product_join_size_within_bound():
    # two zipf streams over overlapping key domains; exact join size =
    # sum over shared keys of fA * fB; AGMS bound: per-row sd <=
    # sqrt(2*F2a*F2b/width), median over depth rows -> 4 sigma.
    a_items = _zipf_items(19)
    rng = np.random.default_rng(23)
    z = np.minimum(rng.zipf(1.4, 80_000), 3000)
    b_items = np.array([f"u{v}" for v in z])
    depth, width = 5, 8192
    ca = CountSketch(depth, width)
    for c in np.array_split(a_items, 7):
        ca.update(c)
    cb = CountSketch(depth, width)
    for c in np.array_split(b_items, 5):
        cb.update(c)
    fa = collections.Counter(a_items.tolist())
    fb = collections.Counter(b_items.tolist())
    ip = sum(c * fb[k] for k, c in fa.items() if k in fb)
    f2a = sum(v * v for v in fa.values())
    f2b = sum(v * v for v in fb.values())
    tol = 4.0 * np.sqrt(2.0 * f2a * f2b / width)
    assert abs(ca.inner_product(cb) - ip) <= tol
    # self inner product is the F2 estimator family (same table)
    assert ca.inner_product(ca) == int(np.median(ca.f2_rows()))
    with pytest.raises(ValueError):
        ca.inner_product(CountSketch(depth, width // 2))


def test_serialization_round_trip_and_mismatch():
    cs = CountSketch(5, 2048).update(_zipf_items(17, 20_000))
    rt = CountSketch.deserialize(cs.serialize())
    assert (rt.table == cs.table).all()
    assert (rt.depth, rt.width, rt.n) == (cs.depth, cs.width, cs.n)
    assert rt.f2_estimate() == cs.f2_estimate()
    with pytest.raises(ValueError):
        CountSketch(5, 1024).merge(cs)


# ---------------------------------------------------------------------------
# Spark API paths
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    import os

    return spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))


def test_count_sketch_matches_single_process(spark, events):
    """Distributed build == single-process build bit-for-bit (the
    counters are LINEAR in the input, so any merge tree is exact)."""
    from tgdigest_spark.api import count_sketch

    sk = count_sketch(events, "user_id", depth=4, width=1024)
    pdf = events.select("user_id").toPandas()
    ref = CountSketch(4, 1024).update(pdf["user_id"].astype(str))
    assert (sk.table == ref.table).all()
    assert sk.n == ref.n


def test_selfjoin_size_within_bound(spark, events):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import selfjoin_size

    est = selfjoin_size(events, "user_id", depth=5, width=4096)
    exact = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
        .collect()[0]["f2"]
    )
    assert abs(est - exact) <= 4.0 * exact * np.sqrt(2.0 / 4096)


def test_grouped_selfjoin_size_within_bound(spark, events):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_selfjoin_size

    got = {
        r["event_type"]: r["f2_est"]
        for r in grouped_selfjoin_size(
            events, ["event_type"], "user_id", depth=5, width=4096
        ).collect()
    }
    exact = {
        r["event_type"]: r["f2"]
        for r in (
            events.where(F.col("user_id").isNotNull())
            .groupBy("event_type", "user_id")
            .count()
            .groupBy("event_type")
            .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for et, f2 in exact.items():
        assert abs(got[et] - f2) <= 4.0 * f2 * np.sqrt(2.0 / 4096)


def test_join_size_estimate_within_bound(spark, sf001_dir):
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.api import join_size_estimate

    od = spark.read.parquet(os.path.join(sf001_dir, "orders.parquet"))
    a = od.where(F.year("o_orderdate") <= 1996)
    b = od.where(F.year("o_orderdate") >= 1997)
    width = 8192
    est = join_size_estimate(a, "o_custkey", b, "o_custkey", width=width)
    exact = a.join(b, "o_custkey").count()

    def f2(df):
        return (
            df.groupBy("o_custkey")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
            .collect()[0]["f2"]
        )

    tol = 4.0 * np.sqrt(2.0 * f2(a) * f2(b) / width)
    assert abs(est - exact) <= tol


def test_nulls_dropped_and_empty_noop():
    import pandas as pd

    cs = CountSketch(3, 128)
    cs.update(pd.Series(["a", None, "a", None]))
    assert cs.n == 2
    before = cs.table.copy()
    cs.update(pd.Series([None, None]))
    assert (cs.table == before).all() and cs.n == 2
    with pytest.raises(ValueError):
        cs.estimate(pd.Series(["a", None]))
