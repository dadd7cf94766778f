"""Re-aggregatable sketch cube: scan facts once, derive every rollup
level by merging leaf blobs (api.sketch_cube / agg.merge_blobs_by_key).

The load-bearing contracts:
- merge-of-leaves == direct-from-facts for register-style sketches
  (HLL): bit-exact, because register max is associative and lossless;
- partition-layout independence (north rule): shuffled input produces
  identical rollup estimates;
- NULL-as-value vs NULL-as-rollup stay distinguishable via grouping_id;
- t-digest cubes (merge-tree-dependent sketches) roll up within the
  published quantile bound rather than bit-exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tgdigest_spark.agg import merge_blobs_by_key, sketch_by_key
from tgdigest_spark.api import (
    cube_distinct_counts,
    grouped_distinct_count,
    sketch_cube,
    sketch_cube_scope,
)
from tgdigest_spark.sketches import HLL, TDigest


def _events(spark, sf001_dir):
    return spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).withColumn("day", F.to_date("ts"))


def test_rollup_bit_exact_vs_direct_and_layout_independent(spark, sf001_dir):
    ev = _events(spark, sf001_dir)
    gs = [("event_type", "day"), ("event_type",), ("day",), ()]
    cube = cube_distinct_counts(ev, ["event_type", "day"], "user_id", p=13,
                                grouping_sets=gs)
    rows = cube.collect()
    cube.release_cache()
    got = {
        (r["grouping_id"], r["event_type"], r["day"]): r["distinct_est"]
        for r in rows
    }
    # direct per-type build from raw rows must be BIT-EXACT equal
    direct = grouped_distinct_count(
        ev, ["event_type"], F.col("user_id").cast("string"), p=13
    ).collect()
    for r in direct:
        assert got[(1, r["event_type"], None)] == r["distinct_est"]
    # shuffled-partition permutation: identical estimates at every level
    cube2 = cube_distinct_counts(
        ev.repartition(17, F.pmod(F.xxhash64("user_id", "ts"), F.lit(17))),
        ["event_type", "day"], "user_id", p=13, grouping_sets=gs,
    )
    rows2 = cube2.collect()
    cube2.release_cache()
    got2 = {
        (r["grouping_id"], r["event_type"], r["day"]): r["distinct_est"]
        for r in rows2
    }
    assert got == got2
    # grouping_id partitions the output: leaves = |type|x|day| groups
    n_types = ev.select("event_type").distinct().count()
    n_days = ev.select("day").distinct().count()
    by_gid = {}
    for (gid, _, _) in got:
        by_gid[gid] = by_gid.get(gid, 0) + 1
    assert by_gid == {
        0: ev.select("event_type", "day").distinct().count(),
        1: n_types,
        2: n_days,
        3: 1,
    }


def test_null_dim_value_distinct_from_rollup(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", None, 2), (None, "x", 3), ("b", "y", 4)],
        "g string, h string, v int",
    )
    with sketch_cube_scope(
        df, ["g", "h"], F.col("v").cast("string"), lambda: HLL(12),
        grouping_sets=[("g", "h"), ("g",), ()],
    ) as cube:
        rows = cube.collect()
    # NULL g as a VALUE appears at grouping_id 0 and 1; NULL g as a
    # ROLLUP only at grouping_id 2 (here the () set -> gid 3)
    leaf_null_g = [r for r in rows if r["grouping_id"] == 0 and r["g"] is None]
    assert len(leaf_null_g) == 1 and leaf_null_g[0]["h"] == "x"
    lvl_g = {r["g"]: r for r in rows if r["grouping_id"] == 1}
    assert set(lvl_g) == {"a", "b", None}
    est_all = [r for r in rows if r["grouping_id"] == 3]
    assert len(est_all) == 1
    assert HLL.deserialize(bytes(est_all[0]["sketch"])).estimate() == \
        pytest.approx(4, abs=0.5)


def test_merge_blobs_by_key_multi_key(spark, sf001_dir):
    ev = _events(spark, sf001_dir).withColumn(
        "wk", F.weekofyear("ts").cast("int")
    )
    leaves = sketch_by_key(
        ev, ["event_type", "wk", "day"],
        F.col("user_id").cast("string"), lambda: HLL(12),
    )
    rolled = merge_blobs_by_key(leaves, ["event_type", "wk"], lambda: HLL(12))
    got = {
        (r["event_type"], r["wk"]): HLL.deserialize(bytes(r["sketch"])).estimate()
        for r in rolled.collect()
    }
    direct = grouped_distinct_count(
        ev, ["event_type", "wk"], F.col("user_id").cast("string"), p=12
    ).collect()
    assert len(direct) == len(got)
    for r in direct:
        assert got[(r["event_type"], r["wk"])] == r["distinct_est"]


def test_tdigest_cube_within_bound(spark, sf001_dir):
    ev = _events(spark, sf001_dir)
    cube = sketch_cube(ev, ["event_type"], "value", lambda: TDigest(200),
                       grouping_sets=[("event_type",), ()])
    rows = cube.collect()
    cube.release_cache()
    glob = [r for r in rows if r["grouping_id"] == 1]
    assert len(glob) == 1
    td = TDigest.deserialize(bytes(glob[0]["sketch"]))
    exact = ev.selectExpr("percentile(value, 0.5) AS m").collect()[0]["m"]
    n = ev.where(F.col("value").isNotNull()).count()
    # rank-interval check: the estimate's rank must sit within
    # 0.5*n +- tol*n (tol = conservative multiple of q(1-q)/delta)
    est = td.quantile(0.5)
    lo = ev.where(F.col("value") < est).count()
    hi = ev.where(F.col("value") <= est).count()
    tol = 0.05 * n
    assert lo <= 0.5 * n + tol and hi >= 0.5 * n - tol
    assert abs(est - exact) / max(abs(exact), 1e-9) < 0.5


def test_bad_grouping_set_raises(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError):
        sketch_cube(df, ["g"], "v", lambda: HLL(12),
                    grouping_sets=[("nope",)])
    with pytest.raises(ValueError):
        sketch_cube(df, [], "v", lambda: HLL(12))


# ---------------------------------------------------------------------------
# Bloom-pruned join (api.bloom_prune_join) — exactness + how validation
# ---------------------------------------------------------------------------


def test_bloom_prune_join_exact_and_rejects_outer(spark, sf001_dir):
    from tgdigest_spark.api import bloom_prune_join

    orders = spark.read.parquet(os.path.join(sf001_dir, "orders.parquet"))
    cust = spark.read.parquet(
        os.path.join(sf001_dir, "customer.parquet")
    ).where(F.col("c_mktsegment") == "MACHINERY")
    got = (
        bloom_prune_join(orders, cust, "o_custkey", "c_custkey")
        .select("o_orderkey", "c_custkey")
        .sort("o_orderkey")
        .collect()
    )
    exact = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select("o_orderkey", "c_custkey")
        .sort("o_orderkey")
        .collect()
    )
    assert got == exact and len(exact) > 0
    # left_semi keeps only fact columns, exact vs plain semi
    from tgdigest_spark.api import bloom_prune_join as bpj

    semi = bpj(orders, cust, "o_custkey", "c_custkey", how="left_semi")
    plain = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "left_semi"
    )
    assert sorted(r["o_orderkey"] for r in semi.collect()) == sorted(
        r["o_orderkey"] for r in plain.collect()
    )
    with pytest.raises(ValueError):
        bpj(orders, cust, "o_custkey", "c_custkey", how="left")


# ---------------------------------------------------------------------------
# Pane-merged sliding windows (api.sliding_window_sketches)
# ---------------------------------------------------------------------------


def test_sliding_windows_pane_merge_bit_exact(spark, sf001_dir):
    from tgdigest_spark.api import sliding_distinct_counts

    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    got = {
        r["window_start"]: r["distinct_est"]
        for r in sliding_distinct_counts(ev, "ts", "user_id", 6, 2, p=13)
        .collect()
    }
    # window set contract: exactly the windows containing >=1 pane
    pidx = F.floor(F.unix_date(F.to_date("ts")) / 2)
    panes = {r["p"] for r in ev.select(pidx.alias("p")).distinct().collect()}
    expect_widx = {p - g for p in panes for g in range(3)}
    got_widx = {(ws.toordinal() - 719163) // 2 for ws in got}  # 719163 = 1970-01-01
    assert got_widx == expect_widx
    # bit-exact vs a direct per-window build from exploded raw rows
    from tgdigest_spark.api import grouped_distinct_count

    facts_w = ev.select(
        F.explode(F.sequence(pidx - 2, pidx)).alias("w"),
        F.col("user_id").cast("string").alias("u"),
    )
    direct = {
        r["w"]: r["distinct_est"]
        for r in grouped_distinct_count(facts_w, ["w"], "u", p=13).collect()
    }
    for ws, est in got.items():
        assert direct[(ws.toordinal() - 719163) // 2] == est
    # layout independence: shuffled input, identical estimates
    got2 = {
        r["window_start"]: r["distinct_est"]
        for r in sliding_distinct_counts(
            ev.repartition(13, F.xxhash64("ts", "user_id")),
            "ts", "user_id", 6, 2, p=13,
        ).collect()
    }
    assert got == got2


def test_sliding_windows_bad_args(spark):
    from tgdigest_spark.api import sliding_window_sketches

    df = spark.createDataFrame([("2024-01-01", "a")], "ts string, v string")
    for w, s in ((5, 2), (0, 1), (4, 0)):
        with pytest.raises(ValueError):
            sliding_window_sketches(
                df, F.to_timestamp("ts"), "v", lambda: HLL(12), w, s
            )


def test_sliding_windows_grouped_by_key(spark, sf001_dir):
    from tgdigest_spark.api import sliding_window_sketches

    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    sk = sliding_window_sketches(
        ev, "ts", F.col("user_id").cast("string"), lambda: HLL(13),
        6, 2, keys=["event_type"],
    )
    got = {
        (r["event_type"], r["window_start"]):
            HLL.deserialize(bytes(r["sketch"])).estimate()
        for r in sk.collect()
    }
    # spot-check three (type, window) cells against exact range counts
    import itertools
    for (t, ws) in itertools.islice(sorted(got), 0, 9, 4):
        import datetime
        w1 = ws + datetime.timedelta(days=6)
        ex = (
            ev.where(
                (F.col("event_type") == t)
                & (F.to_date("ts") >= F.lit(ws))
                & (F.to_date("ts") < F.lit(w1))
            )
            .select(F.countDistinct(F.col("user_id").cast("string")).alias("d"))
            .collect()[0]["d"]
        )
        assert abs(got[(t, ws)] - ex) <= 0.05 * max(ex, 1)
    with pytest.raises(ValueError, match="reserved"):
        sliding_window_sketches(
            ev, "ts", "user_id", lambda: HLL(12), 6, 2, keys=["_widx"]
        )


# ---------------------------------------------------------------------------
# HLL bulk tiny-group hooks — bit-exact vs the per-group object path
# ---------------------------------------------------------------------------


def test_hll_bulk_hooks_bit_exact_vs_object_path():
    import numpy as np
    import pandas as pd

    from tgdigest_spark.sketches.hashing import base_hash_full

    rng = np.random.default_rng(11)
    vals = pd.Series([f"u{v}" for v in rng.integers(0, 3000, 30000)])
    codes = rng.integers(0, 500, 30000)
    want = {}
    for g in range(500):
        h = HLL(12)
        h.update(vals[codes == g])
        want[g] = h
    h_all, mask = base_hash_full(vals)
    assert mask.all()
    order = np.argsort(codes, kind="stable")
    c_s, h_s = codes[order], h_all[order]
    starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
    ends = np.r_[starts[1:], c_s.size]
    blobs = HLL(12).serialize_hashed_groups_like(h_s, starts, ends)
    for i, g in enumerate(c_s[starts]):
        got = HLL.deserialize(blobs[i])
        w = want[g]
        got._densify()
        w._densify()
        assert (got.registers == w.registers).all()
    # merge hook vs sequential folds, incl. an empty run and a dense blob
    dense = HLL(12, sparse=False).update(vals[:5000])
    bl = np.array(blobs[:20] + [dense.serialize()], dtype=object)
    st = np.array([0, 8, 8])
    en = np.array([8, 8, 21])
    merged = HLL(12).merge_blob_groups_like(bl, st, en)
    for (s, e), mb in zip(zip(st, en), merged):
        acc = HLL(12)
        for b in bl[s:e]:
            acc.merge(HLL.deserialize(bytes(b)))
        got = HLL.deserialize(mb)
        got._densify()
        acc._densify()
        assert (got.registers == acc.registers).all()


def test_hll_bulk_path_used_by_sketch_by_key_multikey(spark, sf001_dir):
    """Multi-key grouped HLL goes through the hashed-bulk partition path
    (any key count) — results must match per-group exact counts at the
    sparse-regime cardinalities where HLL is exact."""
    ev = _events(spark, sf001_dir)
    leaves = sketch_by_key(
        ev, ["event_type", "day"], F.col("user_id").cast("string"),
        lambda: HLL(14),
    )
    got = {
        (r["event_type"], r["day"]):
            HLL.deserialize(bytes(r["sketch"])).estimate()
        for r in leaves.collect()
    }
    exact = ev.groupBy("event_type", "day").agg(
        F.countDistinct(F.col("user_id").cast("string")).alias("n")
    ).collect()
    assert len(exact) == len(got)
    for r in exact:
        est = got[(r["event_type"], r["day"])]
        assert abs(est - r["n"]) <= 0.05 * max(r["n"], 1)


def test_sliding_quantiles_rank_bound(spark, sf001_dir):
    from tgdigest_spark.api import sliding_quantiles

    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    rows = sliding_quantiles(ev, "ts", "value", [0.5, 0.95], 6, 2,
                             delta=200).collect()
    assert rows and {"window_start", "p50", "p95"} <= set(rows[0].asDict())
    # rank-interval check on three windows: estimate's rank within
    # q*n +- tol*n over the window's raw rows
    import datetime
    for r in rows[:3]:
        w0, w1 = r["window_start"], r["window_start"] + datetime.timedelta(days=6)
        win = ev.where(
            (F.to_date("ts") >= F.lit(w0)) & (F.to_date("ts") < F.lit(w1))
        ).where(F.col("value").isNotNull())
        n = win.count()
        for q, est in ((0.5, r["p50"]), (0.95, r["p95"])):
            lo = win.where(F.col("value") < est).count()
            hi = win.where(F.col("value") <= est).count()
            tol = 0.05 * n
            assert lo <= q * n + tol and hi >= q * n - tol, (w0, q, est)


def test_hll_build_hook_empty_segments_stay_aligned():
    import numpy as np

    h = np.arange(9, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    starts = np.array([0, 5, 5])
    ends = np.array([5, 5, 9])
    blobs = HLL(12).serialize_hashed_groups_like(h, starts, ends)
    assert len(blobs) == 3
    assert HLL.deserialize(blobs[1]).estimate() == 0.0  # the empty group
    # group 2's data must not shift into position 1
    direct = HLL(12)
    idx, rank = direct._idx_rank(h[5:9])
    direct._sparse_absorb(idx, rank)
    got = HLL.deserialize(blobs[2])
    got._densify()
    direct._densify()
    assert (got.registers == direct.registers).all()


def test_cube_reserved_dim_names_and_no_leak_on_bad_sets(spark):
    df = spark.createDataFrame([("a", 1)], "sketch string, v int")
    with pytest.raises(ValueError, match="reserved"):
        sketch_cube(df, ["sketch"], "v", lambda: HLL(12))
    # bad grouping sets raise BEFORE the leaf frame is persisted —
    # compare the persisted-RDD count as a DELTA (other tests in the
    # shared session legitimately hold caches)
    df2 = spark.createDataFrame([("a", 1)], "g string, v int")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with pytest.raises(ValueError):
        sketch_cube(df2, ["g"], "v", lambda: HLL(12),
                    grouping_sets=[("nope",)])
    assert jsc.getPersistentRDDs().size() == before, "leaked cached frame"


def test_kmv_bulk_hooks_bit_exact_vs_object_path():
    import numpy as np
    import pandas as pd

    from tgdigest_spark.sketches import KMV
    from tgdigest_spark.sketches.hashing import base_hash_full

    rng = np.random.default_rng(3)
    vals = pd.Series([f"x{v}" for v in rng.integers(0, 2000, 40000)])
    codes = rng.integers(0, 300, 40000)
    want = {}
    for g in range(300):
        k = KMV(16)
        k.update(vals[codes == g])
        want[g] = k
    h_all, mask = base_hash_full(vals)
    assert mask.all()
    order = np.argsort(codes, kind="stable")
    c_s, h_s = codes[order], h_all[order]
    starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
    ends = np.r_[starts[1:], c_s.size]
    blobs = KMV(16).serialize_hashed_groups_like(h_s, starts, ends)
    for i, g in enumerate(c_s[starts]):
        assert (KMV.deserialize(blobs[i]).hashes == want[g].hashes).all()
    # empty-segment alignment
    b2 = KMV(16).serialize_hashed_groups_like(
        h_s[:10], np.array([0, 5, 5]), np.array([5, 5, 10])
    )
    assert len(b2) == 3 and KMV.deserialize(b2[1]).hashes.size == 0
    # merge hook vs sequential folds, incl. an empty run
    bl = np.array(blobs[:25], dtype=object)
    st, en = np.array([0, 9, 9]), np.array([9, 9, 25])
    for (s, e), mb in zip(
        zip(st, en), KMV(16).merge_blob_groups_like(bl, st, en)
    ):
        acc = KMV(16)
        for b in bl[s:e]:
            acc.merge(KMV.deserialize(bytes(b)))
        assert (KMV.deserialize(mb).hashes == acc.hashes).all()
    with pytest.raises(ValueError):
        KMV(32).merge_blob_groups_like(bl, np.array([0]), np.array([1]))
