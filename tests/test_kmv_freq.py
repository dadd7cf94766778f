"""KMV bottom-k distinct sketch + Misra-Gries frequent items: published
bounds, merge algebra under shuffled-partition permutations,
serialization round-trips, and the Spark-side API paths (kmv set
algebra, guaranteed heavy hitters, grouped variants).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pytest

from tgdigest_spark.sketches.freq import FrequentItems
from tgdigest_spark.sketches.kmv import (
    KMV,
    kmv_difference_estimate,
    kmv_intersection_estimate,
    kmv_jaccard_estimate,
    kmv_union,
)

# ---------------------------------------------------------------------------
# KMV core
# ---------------------------------------------------------------------------


def _items(prefix: str, lo: int, hi: int) -> pd.Series:
    return pd.Series([f"{prefix}{i}" for i in range(lo, hi)])


def test_kmv_exact_below_k():
    sk = KMV(256).update(_items("t", 0, 200))
    assert not sk.saturated
    assert sk.estimate() == 200.0
    # duplicates never change a distinct sketch
    sk.update(_items("t", 0, 200))
    assert sk.estimate() == 200.0


def test_kmv_estimator_error_above_k():
    # rel std err ~ 1/sqrt(k-2) = 3.1% at k=1024; assert 4 sigma
    true = 200_000
    sk = KMV(1024)
    for c in np.array_split(_items("x", 0, true), 13):
        sk.update(c)
    assert sk.saturated
    rel = abs(sk.estimate() - true) / true
    assert rel < 4.0 / np.sqrt(1024 - 2)


def test_kmv_merge_bit_exact_order_insensitive():
    """The sketch is a pure function of the input SET: any partition
    permutation and merge tree gives identical hashes (unlike t-digest's
    bound-level agreement)."""
    data = _items("v", 0, 50_000)
    ref = KMV(512).update(data)
    chunks = np.array_split(data.sample(frac=1.0, random_state=9), 16)
    for seed in range(4):
        perm = np.random.default_rng(seed).permutation(16)
        parts = [KMV(512).update(chunks[i]) for i in perm]
        merged = functools.reduce(lambda a, b: a.merge(b), parts)
        assert np.array_equal(merged.hashes, ref.hashes)


def test_kmv_set_ops_exact_regime():
    a = KMV(512).update(_items("s", 0, 300))
    b = KMV(512).update(_items("s", 200, 500))
    assert kmv_intersection_estimate(a, b) == 100.0
    assert kmv_difference_estimate(a, b) == 200.0
    assert kmv_union(a, b).estimate() == 500.0
    assert kmv_jaccard_estimate(a, b) == pytest.approx(100 / 500)


def test_kmv_set_ops_saturated_bounds():
    # overlapping 200k-sets; theta-framework estimates within loose
    # multiples of the k=1024 std err (intersection is noisier by 1/J)
    a, b = KMV(1024), KMV(1024)
    for c in np.array_split(_items("x", 0, 200_000), 11):
        a.update(c)
    for c in np.array_split(_items("x", 100_000, 300_000), 11):
        b.update(c)
    se = 1.0 / np.sqrt(1024 - 2)
    assert abs(kmv_union(a, b).estimate() - 300_000) / 300_000 < 4 * se
    assert abs(kmv_intersection_estimate(a, b) - 100_000) / 100_000 < 10 * se
    assert abs(kmv_difference_estimate(a, b) - 100_000) / 100_000 < 10 * se
    assert kmv_jaccard_estimate(a, b) == pytest.approx(1 / 3, abs=0.05)


def test_kmv_algebra_identical_saturated_sketches():
    """Estimator-consistency invariant (review repro): for two sketches
    of the SAME set, intersection == union == the cardinality estimate,
    difference == 0 and jaccard == 1. The previous inclusive-cut
    convention over-counted intersections by k/(k-1), letting reported
    |A∩B| exceed |A∪B|."""
    data = _items("q", 0, 100_000)
    a = KMV(1024).update(data)
    b = KMV(1024).update(data)
    est = a.estimate()
    assert kmv_intersection_estimate(a, b) == est
    assert kmv_union(a, b).estimate() == est
    assert kmv_difference_estimate(a, b) == 0.0
    assert kmv_jaccard_estimate(a, b) == 1.0


def test_kmv_serialization_roundtrip():
    for sk in (KMV(64), KMV(64).update(_items("r", 0, 1000))):
        back = KMV.deserialize(sk.serialize())
        assert back.k == sk.k
        assert np.array_equal(back.hashes, sk.hashes)
        assert back.estimate() == sk.estimate()


def test_kmv_nulls_dropped():
    sk = KMV(64).update(pd.Series(["a", None, "b", None]))
    assert sk.estimate() == 2.0


# ---------------------------------------------------------------------------
# Misra-Gries core
# ---------------------------------------------------------------------------


def _zipf_series(n: int, seed: int, clip: int = 400) -> pd.Series:
    rng = np.random.default_rng(seed)
    return pd.Series([f"i{min(int(x), clip)}" for x in rng.zipf(1.3, n)])


def test_mg_sandwich_bound_stream():
    data = _zipf_series(100_000, 3)
    vc = data.value_counts()
    mg = FrequentItems(32)
    for c in np.array_split(data, 17):
        mg.update(c)
    assert mg.n == len(data)
    assert mg.err <= mg.n / (mg.k + 1)
    for item in vc.index:
        true = int(vc[item])
        est = mg.estimate(item)
        assert est <= true <= est + mg.err, item


def test_mg_guaranteed_capture():
    """Every item with true count > n/(k+1) must survive in the map."""
    data = _zipf_series(80_000, 5)
    vc = data.value_counts()
    mg = FrequentItems(16)
    for c in np.array_split(data, 9):
        mg.update(c)
    thr = mg.n / (mg.k + 1)
    heavy = [i for i in vc.index if vc[i] > thr]
    assert heavy, "test data must contain heavy items"
    for item in heavy:
        assert mg.estimate(item) > 0, item


def test_mg_merge_bound_under_permutations():
    """Mergeable-summaries Thm: the bound survives ARBITRARY merge
    trees; counter values may differ by tree, the sandwich may not."""
    data = _zipf_series(60_000, 7)
    vc = data.value_counts()
    chunks = np.array_split(data.sample(frac=1.0, random_state=2), 12)
    for seed in range(4):
        perm = np.random.default_rng(seed).permutation(12)
        parts = [FrequentItems(24).update(chunks[i]) for i in perm]
        merged = functools.reduce(lambda a, b: a.merge(b), parts)
        assert merged.n == len(data)
        assert merged.err <= merged.n / (merged.k + 1)
        for item in vc.index[:60]:
            true = int(vc[item])
            est = merged.estimate(item)
            assert est <= true <= est + merged.err, (seed, item)


def test_mg_weighted_update():
    mg = FrequentItems(8).update(
        pd.Series(["a", "b", "a", None]), counts=[5, 2, 3, 9]
    )
    assert mg.estimate("a") == 8
    assert mg.estimate("b") == 2
    assert mg.n == 10  # null row's weight never ingested


def test_mg_serialization_roundtrip():
    mg = FrequentItems(8).update(
        pd.Series(["日本語ツール", "ü", "日本語ツール", "plain"] * 3)
    )
    mg.update(_zipf_series(5_000, 11))
    back = FrequentItems.deserialize(mg.serialize())
    assert back.k == mg.k and back.n == mg.n and back.err == mg.err
    assert back.counts == mg.counts
    empty = FrequentItems.deserialize(FrequentItems(4).serialize())
    assert empty.counts == {} and empty.n == 0 and empty.err == 0


def test_mg_items_ordering_stable():
    mg = FrequentItems(8).update(pd.Series(["b", "a", "b", "a", "c"]))
    assert mg.items() == [("a", 2), ("b", 2), ("c", 1)]


def test_mg_shrink_keeps_at_most_k():
    data = _zipf_series(30_000, 13, clip=2000)
    mg = FrequentItems(10)
    for c in np.array_split(data, 7):
        mg.update(c)
        assert len(mg.counts) <= 10


# ---------------------------------------------------------------------------
# Spark API paths
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    import os

    return spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))


def test_kmv_sketch_matches_single_process(spark, events):
    """Distributed build == single-process build bit-for-bit (set
    semantics make the whole pipeline order-insensitive)."""
    from tgdigest_spark.api import kmv_sketch

    sk = kmv_sketch(events, "user_id", k=512)
    pdf = events.select("user_id").toPandas()
    ref = KMV(512).update(pdf["user_id"].astype(str))
    assert np.array_equal(sk.hashes, ref.hashes)
    exact = events.select("user_id").distinct().count()
    assert sk.estimate() == float(exact)


def test_distinct_overlap_exact_regime(spark, sf001_dir):
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.api import distinct_overlap

    od = spark.read.parquet(os.path.join(sf001_dir, "orders.parquet"))
    a = od.where(F.year("o_orderdate") <= 1996)
    b = od.where(F.year("o_orderdate") >= 1997)
    ov = distinct_overlap(a, b, "o_custkey", k=4096)
    ex_a = a.select("o_custkey").distinct().count()
    ex_b = b.select("o_custkey").distinct().count()
    ex_u = a.select("o_custkey").union(b.select("o_custkey")).distinct().count()
    ex_i = ex_a + ex_b - ex_u
    assert ov["distinct_a"] == float(ex_a)
    assert ov["distinct_b"] == float(ex_b)
    assert ov["union"] == float(ex_u)
    assert ov["intersection"] == float(ex_i)
    assert ov["difference_a_not_b"] == float(ex_a - ex_i)
    assert ov["jaccard"] == pytest.approx(ex_i / ex_u)


def test_guaranteed_heavy_hitters_exact(spark, events):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import guaranteed_heavy_hitters

    n = events.count()
    got = guaranteed_heavy_hitters(
        events, F.col("user_id").cast("string"), phi=1.0 / 128.0, k=256
    ).collect()
    exact = {
        str(r["user_id"]): r["c"]
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
        if r["c"] > n / 128.0
    }
    assert {r["item"]: r["exact_count"] for r in got} == exact
    # rows ordered exact desc, item asc
    keys = [(-r["exact_count"], r["item"]) for r in got]
    assert keys == sorted(keys)


def test_guaranteed_heavy_hitters_broadcast_path_same_result(spark, events):
    """Forcing the large-candidate broadcast-semi-join branch (isin_limit
    below the candidate count) must give the identical result set."""
    from pyspark.sql import functions as F

    from tgdigest_spark.api import guaranteed_heavy_hitters

    user = F.col("user_id").cast("string")
    via_isin = guaranteed_heavy_hitters(
        events, user, phi=1.0 / 128.0, k=256
    ).collect()
    via_join = guaranteed_heavy_hitters(
        events, user, phi=1.0 / 128.0, k=256, isin_limit=3
    ).collect()
    assert [tuple(r) for r in via_isin] == [tuple(r) for r in via_join]


def test_guaranteed_heavy_hitters_no_boundary_false_positive(spark):
    """Exact-threshold arithmetic (review repro): with phi=1/49 and
    N=49, float(1/49)*49 < 1.0 would admit a count-1 item; the
    rationalized integer cutoff must not."""
    from tgdigest_spark.api import guaranteed_heavy_hitters

    df = spark.createDataFrame([("a",)] + [("b",)] * 48, "v string")
    out = guaranteed_heavy_hitters(df, "v", phi=1.0 / 49.0).collect()
    assert [(r["item"], r["exact_count"]) for r in out] == [("b", 48)]


def test_grouped_nullable_numeric_dtype_stability(spark, tmp_path):
    """Arrow batches of a nullable long column arrive as int64
    (null-free file) or float64 (null-bearing file); the grouped
    builders normalize via cast('string') so the same logical value is
    ONE item (review repro: distinct_est was 3 with kmv_exact=True
    while countDistinct was 2, and MG split counters '5'/'5.0')."""
    from tgdigest_spark.api import (
        grouped_distinct_kmv,
        grouped_frequent_items,
    )

    a = pd.DataFrame(
        {"g": ["x"] * 10, "v": pd.array([5, 6] * 5, dtype="Int64")}
    )
    b = pd.DataFrame(
        {"g": ["x"] * 10, "v": pd.array([5, None] * 5, dtype="Int64")}
    )
    a.to_parquet(tmp_path / "a.parquet")
    b.to_parquet(tmp_path / "b.parquet")
    df = spark.read.parquet(str(tmp_path))
    kmv = grouped_distinct_kmv(df, ["g"], "v", k=64).collect()
    assert len(kmv) == 1
    assert kmv[0]["distinct_est"] == 2.0 and kmv[0]["kmv_exact"]
    items = {
        r["item"]
        for r in grouped_frequent_items(df, ["g"], "v", k=8).collect()
    }
    assert items == {"5", "6"}


def test_grouped_kmv_overlap_exact_matrix(spark, events):
    """Exact regime: the pairwise overlap matrix equals the distinct
    self-join ground truth for every unordered event_type pair."""
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_kmv_overlap

    got = {
        (r["group_a"], r["group_b"]): r
        for r in grouped_kmv_overlap(
            events, "event_type", "user_id", k=32768
        ).collect()
    }
    sets: dict[str, set] = {}
    for r in (
        events.select("event_type", "user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
        .collect()
    ):
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    types = sorted(sets)
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        sa, sb = sets[a], sets[b]
        assert r["kmv_exact"]
        assert r["distinct_a"] == float(len(sa))
        assert r["distinct_b"] == float(len(sb))
        assert r["intersection_est"] == float(len(sa & sb))
        assert r["union_est"] == float(len(sa | sb))
        assert r["jaccard_est"] == len(sa & sb) / len(sa | sb)


def test_grouped_kmv_overlap_union_saturation_flag(spark):
    """Two sub-k groups whose MERGED union exceeds k must drop the
    kmv_exact flag (union_est becomes an estimate) even though each
    input sketch is individually exact."""
    from tgdigest_spark.api import grouped_kmv_overlap

    rows = [("a", f"x{i}") for i in range(60)] + [
        ("b", f"y{i}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    out = grouped_kmv_overlap(df, "g", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert not r["kmv_exact"]
    # the intersection is still exact (both inputs sub-k → complete sets)
    assert r["intersection_est"] == 0.0
    assert r["jaccard_est"] == 0.0


def test_grouped_kmv_overlap_all_null_group_omitted(spark):
    """A group whose value column is NULL in every row must not appear
    in the matrix at all (matching the relational oracle, whose groups
    derive from non-null (group, value) pairs)."""
    from tgdigest_spark.api import grouped_kmv_overlap

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("dead", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = grouped_kmv_overlap(df, "g", "v", k=64).collect()
    assert [(r["group_a"], r["group_b"]) for r in out] == [("a", "b")]
    assert out[0]["intersection_est"] == 1.0


def test_grouped_kmv_overlap_distributed_parity(spark, events):
    """The block-pair executor-side formulation must emit the
    bit-identical matrix to the driver-loop formulation — forced onto
    a genuinely multi-block grid (block_size=2 → diagonal AND
    cross-block cells) so the grid enumeration itself is exercised."""
    import pandas as pd

    from tgdigest_spark.api import (
        grouped_kmv_overlap,
        grouped_kmv_overlap_distributed,
    )

    a = (
        grouped_kmv_overlap(events, "event_type", "user_id", k=8)
        .orderBy("group_a", "group_b")
        .toPandas()
    )
    dist = grouped_kmv_overlap_distributed(
        events, "event_type", "user_id", k=8, block_size=2
    )
    release = dist.release_cache  # capture before transforming
    try:
        b = dist.orderBy("group_a", "group_b").toPandas()
    finally:
        release()
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # k=8 < the 15 distinct users per type → every pair left the exact
    # regime, so the parity above covers the estimator path too
    assert not a["kmv_exact"].any()


def test_grouped_kmv_overlap_distributed_rejects_bad_block_size(spark):
    from tgdigest_spark.api import grouped_kmv_overlap_distributed

    df = spark.createDataFrame([("a", "x")], "g string, v string")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="block_size"):
            grouped_kmv_overlap_distributed(df, "g", "v", block_size=bad)


def test_grouped_kmv_overlap_distributed_degenerate(spark):
    """<2 groups → empty matrix with the full schema, no job blow-up."""
    from tgdigest_spark.api import grouped_kmv_overlap_distributed

    df = spark.createDataFrame(
        [("only", "x"), ("only", "y"), ("dead", None)], "g string, v string"
    )
    out = grouped_kmv_overlap_distributed(df, "g", "v", k=64)
    assert out.count() == 0
    assert out.columns == [
        "group_a", "group_b", "distinct_a", "distinct_b",
        "intersection_est", "union_est", "jaccard_est", "kmv_exact",
    ]


def test_kmv_overlap_stats_matches_individual_estimators():
    """The one-pass pair helper must agree exactly with the separate
    estimators in both the exact and the saturated regime."""
    from tgdigest_spark.sketches.kmv import (
        KMV,
        kmv_intersection_estimate,
        kmv_jaccard_estimate,
        kmv_overlap_stats,
    )

    for k, na, nb in [(64, 30, 40), (64, 500, 700), (1024, 2000, 100)]:
        a = KMV(k).update([f"v{i}" for i in range(na)])
        b = KMV(k).update([f"v{i}" for i in range(na // 2, na // 2 + nb)])
        inter, jac = kmv_overlap_stats(a, b)
        assert inter == kmv_intersection_estimate(a, b)
        assert jac == kmv_jaccard_estimate(a, b)


def test_guaranteed_heavy_hitters_rejects_small_mg(spark, events):
    from tgdigest_spark.api import frequent_items, guaranteed_heavy_hitters

    mg = frequent_items(events, "event_type", k=8)
    with pytest.raises(ValueError, match="too small"):
        guaranteed_heavy_hitters(
            events, "event_type", phi=1.0 / 64.0, mg=mg
        )


def test_grouped_distinct_kmv(spark, events):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_distinct_kmv

    got = {
        r["event_type"]: (r["distinct_est"], r["kmv_exact"])
        for r in grouped_distinct_kmv(
            events, ["event_type"], "user_id", k=1024
        ).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for et, (est, is_exact) in got.items():
        assert is_exact  # sub-k cardinalities at sf0.001
        assert est == float(exact[et])


def test_grouped_frequent_items_bounds(spark, events):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_frequent_items

    got = grouped_frequent_items(
        events, ["event_type"], F.col("user_id").cast("string"), k=16, top=5
    ).collect()
    exact = {
        (r["event_type"], str(r["user_id"])): r["c"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got
    for r in got:
        true = exact.get((r["event_type"], r["item"]), 0)
        assert r["est_count"] <= true <= r["est_count"] + r["max_undercount"]


def test_grouped_kmv_overlap_auto_dispatch_and_parity(spark, events):
    """grouped_kmv_overlap_auto must pick the driver loop when the
    (narrow-agg-counted) group cardinality fits max_groups and the
    block-pair grid otherwise — with bit-identical matrices from both
    dispatch outcomes (the asof_join_auto contract)."""
    import pandas as pd

    from tgdigest_spark.api import grouped_kmv_overlap_auto

    small = grouped_kmv_overlap_auto(events, "event_type", "user_id", k=8)
    assert small.dispatch_path == "driver"
    small.release_cache()  # uniform no-op handle on the driver path
    a = small.orderBy("group_a", "group_b").toPandas()

    big = grouped_kmv_overlap_auto(
        events, "event_type", "user_id", k=8, max_groups=2, block_size=2
    )
    assert big.dispatch_path == "grid"
    release = big.release_cache  # capture before transforming
    try:
        b = big.orderBy("group_a", "group_b").toPandas()
    finally:
        release()
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_grouped_kmv_overlap_scope_releases_cache(spark, events):
    """The context-manager form must unpersist the grid path's two
    cached frames on exit even when the caller transforms the yielded
    frame without capturing release_cache (the r5 advice leak)."""
    import time

    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_kmv_overlap_scope

    def n_cached() -> int:
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    before = n_cached()
    with grouped_kmv_overlap_scope(
        events, "event_type", "user_id", k=8, max_groups=1, block_size=2
    ) as pairs:
        assert pairs.dispatch_path == "grid"
        # transform WITHOUT capturing release_cache — the scope already
        # holds the handle
        n = pairs.agg(F.count("jaccard_est").alias("n")).collect()[0]["n"]
        assert n > 0
        assert n_cached() >= before + 1  # blobs materialized+cached
    deadline = time.time() + 10  # unpersist is async at the RDD layer
    while n_cached() > before and time.time() < deadline:
        time.sleep(0.2)
    assert n_cached() == before
