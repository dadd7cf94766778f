"""Round-3 regression tests: ADVICE.md findings (streaming cross-run
blob-name collision, checkpoint write-path legacy fallback) and
VERDICT.md depth items."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


from tgdigest_spark.sketches.tdigest import TDigest

# lambda (pickled by value): executors can't import the test module
_factory = lambda: TDigest(100)  # noqa: E731


# ---------------------------------------------------------------------------
# ADVICE high: cross-run epoch-number reuse must not GC the live blob
# ---------------------------------------------------------------------------

def test_streaming_cross_run_epoch_collision_keeps_live_blob(spark, tmp_path):
    """Run B restarts epochs at 0 against a store whose bucket file came
    from run A's epoch 0. Before the fix new_name == basename(old_path):
    the live blob landed on gc_pending while the manifest pointed at it,
    and the next dirty commit unlinked it — the bucket silently vanished
    from completed_partitions()."""
    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        merged_sketch,
    )
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    store = SketchCheckpointStore(str(tmp_path / "xrun"))
    batch = spark.createDataFrame(
        [("a", float(i)) for i in range(10)], "role string, v double"
    )
    merge_batch_into_store(
        batch, 0, F.col("role"), F.col("v"), _factory, store, run_id="runA"
    )
    # run B, epoch restarts at 0, SAME epoch number as the live file's
    merge_batch_into_store(
        batch, 0, F.col("role"), F.col("v"), _factory, store, run_id="runB"
    )
    m = store.manifest()
    live = m["partitions"]["a"]["file"]
    assert live not in m.get("gc_pending", []), "live blob queued for GC"
    assert os.path.exists(os.path.join(store.parts_dir, live))
    assert store.completed_partitions() == {"a"}
    assert merged_sketch(store, _factory).count == 20

    # a further dirty commit executes the deferred GC — the bucket must
    # survive it (this is the step that destroyed it before the fix)
    merge_batch_into_store(
        batch, 1, F.col("role"), F.col("v"), _factory, store, run_id="runB"
    )
    m2 = store.manifest()
    live2 = m2["partitions"]["a"]["file"]
    assert os.path.exists(os.path.join(store.parts_dir, live2))
    assert store.completed_partitions() == {"a"}
    assert merged_sketch(store, _factory).count == 30


def test_streaming_blob_names_are_run_unique(spark, tmp_path):
    """Two runs' epoch-0 commits for the same bucket must produce
    distinct filenames (the prior-manifest-reader guarantee: run B never
    modifies run A's file in place)."""
    from tgdigest_spark.plans.checkpoints import SketchCheckpointStore
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    store = SketchCheckpointStore(str(tmp_path / "uniq"))
    batch = spark.createDataFrame([("a", 1.0)], "role string, v double")
    merge_batch_into_store(
        batch, 0, F.col("role"), F.col("v"), _factory, store, run_id="runA"
    )
    file_a = store.manifest()["partitions"]["a"]["file"]
    merge_batch_into_store(
        batch, 0, F.col("role"), F.col("v"), _factory, store, run_id="runB"
    )
    file_b = store.manifest()["partitions"]["a"]["file"]
    assert file_a != file_b


# ---------------------------------------------------------------------------
# ADVICE medium: writes must target the injective path, never the
# legacy fallback
# ---------------------------------------------------------------------------

def test_rebuild_on_migrated_store_does_not_clobber_colliding_key(
    spark, tmp_path
):
    """Migrated legacy store holds key 'a_b' at legacy 'a_b.bin'.
    Building key 'a/b' (whose sanitized form is also 'a_b') must write
    the injective path and leave 'a_b''s blob intact — before the fix
    the write resolved through the legacy fallback and clobbered it."""
    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        build_checkpointed,
    )
    from tgdigest_spark.sketches.tdigest import TDigest

    store = SketchCheckpointStore(str(tmp_path / "mig"))
    legacy_sk = TDigest(100)
    legacy_sk.update(np.arange(20.0))
    legacy = store._legacy_blob_path("a_b")
    with open(legacy, "wb") as f:
        f.write(legacy_sk.serialize())
    m = store.manifest()
    m["partitions"]["a_b"] = {"status": "done", "rows": 20}
    store._write_manifest(m)

    df = spark.createDataFrame(
        [("a/b", float(i)) for i in range(5)], "part string, v double"
    )
    build_checkpointed(df, F.col("part"), F.col("v"), (lambda: TDigest(100)), store)

    # 'a/b' landed injectively; 'a_b''s legacy blob is untouched
    assert os.path.exists(store._blob_write_path("a/b"))
    with open(legacy, "rb") as f:
        assert TDigest.deserialize(f.read()).count == 20
    blobs = store.blobs()
    assert TDigest.deserialize(blobs["a/b"]).count == 5
    assert TDigest.deserialize(blobs["a_b"]).count == 20


def test_refresh_of_legacy_key_converges_to_injective_path(spark, tmp_path):
    """Refreshing a key stored under its legacy name writes the
    injective file; subsequent reads prefer it over the stale legacy."""
    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        build_checkpointed,
    )
    from tgdigest_spark.sketches.tdigest import TDigest

    store = SketchCheckpointStore(str(tmp_path / "conv"))
    old = TDigest(100)
    old.update(np.arange(7.0))
    with open(store._legacy_blob_path("2024-01-01"), "wb") as f:
        f.write(old.serialize())
    m = store.manifest()
    m["partitions"]["2024-01-01"] = {"status": "done", "rows": 7}
    store._write_manifest(m)

    df = spark.createDataFrame(
        [("2024-01-01", float(i)) for i in range(3)], "part string, v double"
    )
    build_checkpointed(
        df,
        F.col("part"),
        F.col("v"),
        (lambda: TDigest(100)),
        store,
        refresh={"2024-01-01"},
    )
    assert store._blob_path("2024-01-01") == store._blob_write_path(
        "2024-01-01"
    )
    assert TDigest.deserialize(store.blobs()["2024-01-01"]).count == 3


# ---------------------------------------------------------------------------
# tiny-groups fast path: bulk serializers must be bit-identical to the
# per-object path, and grouped results stable under batch composition
# ---------------------------------------------------------------------------

def test_bulk_serializers_bit_exact_vs_per_object():
    from tgdigest_spark.sketches.kll import KLL

    rng = np.random.default_rng(11)
    vals = np.sort(rng.normal(0, 1, 8000))
    starts, ends, i = [], [], 0
    while i < vals.size:
        n = int(rng.integers(1, 500))  # spans the small/large cutover
        starts.append(i)
        ends.append(min(i + n, vals.size))
        i += n
    starts, ends = np.asarray(starts), np.asarray(ends)
    for proto in (TDigest(200), TDigest(50), KLL(200), KLL(64)):
        got = proto.serialize_sorted_groups_like(vals, starts, ends)
        ref = [
            proto.from_sorted_like(vals[s:e]).serialize()
            for s, e in zip(starts, ends)
        ]
        assert all(a == b for a, b in zip(got, ref)), type(proto).__name__


def test_merge_blob_groups_parity():
    """Reducer bulk merge: tiny merged groups must be EXACTLY the
    co-located build (bit-identical blob); large/weighted groups must
    agree with the sequential merge within the digest bound."""
    from tgdigest_spark.sketches.kll import KLL

    rng = np.random.default_rng(5)
    for proto in (TDigest(200), KLL(200)):
        blobs, starts, ends, refs = [], [], [], []
        cursor = 0
        for gsize, nparts in [(1, 2), (7, 3), (40, 2), (300, 4), (0, 2)]:
            vals = np.sort(rng.normal(0, 50, gsize))
            # split the group's values across nparts partials
            cuts = np.sort(rng.integers(0, gsize + 1, nparts - 1))
            parts = np.split(vals, cuts)
            pblobs = [
                proto.from_sorted_like(np.sort(p)) .serialize()
                for p in parts
            ]
            blobs.extend(pblobs)
            starts.append(cursor)
            cursor += len(pblobs)
            ends.append(cursor)
            refs.append((vals, proto.from_sorted_like(vals).serialize()))
        got = proto.merge_blob_groups_like(
            np.array(blobs, dtype=object),
            np.array(starts),
            np.array(ends),
        )
        deser = type(proto).deserialize
        for (vals, colocated), blob in zip(refs, got):
            small = (
                vals.size <= proto.delta // 2
                if isinstance(proto, TDigest)
                else vals.size <= proto.k
            )
            if small:
                assert blob == colocated  # exact, split-independent
            else:
                est = deser(blob).quantile([0.5])[0]
                exact = float(np.quantile(vals, 0.5))
                spread = vals.max() - vals.min()
                assert abs(est - exact) < 0.05 * spread


def test_merge_blob_groups_weighted_fallback():
    """A group containing a reclustered (non-unit-weight) partial must
    take the sequential path and still answer within bound."""
    rng = np.random.default_rng(9)
    proto = TDigest(100)
    big = np.sort(rng.normal(0, 10, 2000))  # reclusters → weighted
    small = np.sort(rng.normal(0, 10, 20))
    blobs = np.array(
        [proto.from_sorted_like(big).serialize(),
         proto.from_sorted_like(small).serialize()],
        dtype=object,
    )
    (blob,) = proto.merge_blob_groups_like(
        blobs, np.array([0]), np.array([2])
    )
    allv = np.concatenate([big, small])
    est = TDigest.deserialize(blob).quantile([0.5])[0]
    assert abs(est - float(np.quantile(allv, 0.5))) < 2.0


def test_grouped_sketch_batch_composition_within_bound(spark):
    """The concat-first combine must keep grouped quantiles within the
    digest's bound under ANY physical layout (a t-digest's exact value
    is legitimately merge-tree-dependent for groups above the
    unit-weight budget, so the assertion is bound-level agreement plus
    identical group sets, not bit equality)."""
    from tgdigest_spark.api import grouped_quantiles

    rows = [(f"g{i % 97}", float((i * 31) % 1000)) for i in range(20000)]
    df = spark.createDataFrame(rows, "k string, v double")
    a = {
        r["k"]: (r["p50"], r["p95"])
        for r in grouped_quantiles(df, ["k"], F.col("v"), [0.5, 0.95]).collect()
    }
    b = {
        r["k"]: (r["p50"], r["p95"])
        for r in grouped_quantiles(
            df.repartition(23), ["k"], F.col("v"), [0.5, 0.95]
        ).collect()
    }
    assert set(a) == set(b) and len(a) == 97
    for k in a:
        # values span ~[0, 1000); delta=200 rank error ≪ 3% → both
        # layouts must agree within a few % of the value range
        assert abs(a[k][0] - b[k][0]) < 30, (k, a[k], b[k])
        assert abs(a[k][1] - b[k][1]) < 30, (k, a[k], b[k])

    # tiny groups (n <= delta/2, stored exactly) ARE layout-exact
    small = spark.createDataFrame(
        [(f"s{i % 500}", float(i)) for i in range(5000)], "k string, v double"
    )
    ex1 = {
        r["k"]: r["p50"]
        for r in grouped_quantiles(small, ["k"], F.col("v"), [0.5]).collect()
    }
    ex2 = {
        r["k"]: r["p50"]
        for r in grouped_quantiles(
            small.repartition(13), ["k"], F.col("v"), [0.5]
        ).collect()
    }
    assert ex1 == ex2


# ---------------------------------------------------------------------------
# VERDICT #6: target_file_rows is wired to maxRecordsPerFile
# ---------------------------------------------------------------------------

def test_write_transcripts_target_file_rows_bounds_files(spark, tmp_path):
    import glob

    from tgdigest_spark.sources.transcripts import write_transcripts_table

    df = spark.createDataFrame(
        [
            (f"c{i % 5}", i, "user", f"t{i}", None, "2024-01-01 10:00:00")
            for i in range(1000)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    big = str(tmp_path / "big")
    write_transcripts_table(df, big, use_iceberg=False)  # default: 1 file
    small = str(tmp_path / "small")
    write_transcripts_table(df, small, use_iceberg=False, target_file_rows=100)

    n_big = len(glob.glob(f"{big}/ts_day=*/*.parquet"))
    n_small = len(glob.glob(f"{small}/ts_day=*/*.parquet"))
    assert n_big == 1
    assert n_small >= 10  # 1000 rows / 100-row cap
    # the conf is restored after the write
    assert (
        spark.conf.get("spark.sql.files.maxRecordsPerFile", None) in (None, "0")
    )


# ---------------------------------------------------------------------------
# VERDICT #4: fixed-size per-stratum sampling + sequence packing
# ---------------------------------------------------------------------------

def test_stratified_sample_exact_n_and_layout_independent(spark):
    from tgdigest_spark.operators.sampling import stratified_sample

    rows = [(i, f"s{i % 4}") for i in range(1000)] + [(9999, "tiny")]
    df = spark.createDataFrame(rows, "id long, stratum string")
    key = F.md5(F.col("id").cast("string"))
    got = stratified_sample(df, "stratum", 10, key, tiebreak="id").collect()
    by_stratum: dict = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], set()).add(r["id"])
    assert {s: len(v) for s, v in by_stratum.items()} == {
        "s0": 10, "s1": 10, "s2": 10, "s3": 10, "tiny": 1
    }
    got2 = stratified_sample(
        df.repartition(7), "stratum", 10, key, tiebreak="id"
    ).collect()
    assert {(r["stratum"], r["id"]) for r in got2} == {
        (r["stratum"], r["id"]) for r in got
    }


def test_pack_sequences_capacity_and_exactly_once(spark):
    from tgdigest_spark.operators.sampling import pack_sequences

    rows = [(i, 1 + (i * 37) % 200) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, token_cnt long")
    packed = pack_sequences(df, budget=256, n_groups=4).collect()
    # every doc exactly once
    assert sorted(r["doc_id"] for r in packed) == list(range(800))
    assert not any(r["oversized"] for r in packed)
    # no bin exceeds the budget
    totals: dict = {}
    for r in packed:
        totals[r["bin"]] = totals.get(r["bin"], 0) + r["token_cnt"]
    assert max(totals.values()) <= 256
    # deterministic under a different physical layout
    packed2 = pack_sequences(df.repartition(11), budget=256, n_groups=4).collect()
    assert {(r["doc_id"], r["bin"]) for r in packed2} == {
        (r["doc_id"], r["bin"]) for r in packed
    }


def test_pack_sequences_oversize_modes(spark):
    from tgdigest_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 999), (3, 50)], "doc_id long, token_cnt long"
    )
    with pytest.raises(Exception, match="exceeds budget"):
        pack_sequences(df, budget=256, n_groups=1).collect()
    got = pack_sequences(
        df, budget=256, n_groups=1, oversize="singleton"
    ).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[2]["oversized"] and not by_id[1]["oversized"]
    # the oversized doc sits alone in its bin
    assert sum(1 for r in got if r["bin"] == by_id[2]["bin"]) == 1


def test_pack_sequences_explicit_group_bins_do_not_cross(spark):
    from tgdigest_spark.operators.sampling import pack_sequences

    rows = [(i, 60, "a" if i < 50 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, token_cnt long, split string")
    got = pack_sequences(df, budget=256, group_col="split").collect()
    for r in got:
        assert r["bin"].startswith(f"{r['split']}_")


# ---------------------------------------------------------------------------
# VERDICT #3: grouped-CM probe estimates (one-sided, layout-independent)
# ---------------------------------------------------------------------------

def test_grouped_cm_counts_one_sided_and_layout_independent(spark):
    from tgdigest_spark.api import grouped_cm_counts

    rows = [(f"g{i % 3}", f"u{i % 17}") for i in range(3000)]
    df = spark.createDataFrame(rows, "grp string, v string")
    probes = ["u0", "u5", "u16", "absent"]
    est = {
        (r["grp"], r["item"]): r["est_count"]
        for r in grouped_cm_counts(df, ["grp"], "v", probes).collect()
    }
    exact = {
        (r["grp"], r["v"]): r["c"]
        for r in df.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert len(est) == 3 * 4
    for (g, item), e in est.items():
        true = exact.get((g, item), 0)
        assert e >= true  # CM one-sided guarantee
        assert e <= true + 0.001 * 1000 + 1  # eps*group_n slack
    # layout independence: same estimates under a different partitioning
    est2 = {
        (r["grp"], r["item"]): r["est_count"]
        for r in grouped_cm_counts(
            df.repartition(13), ["grp"], "v", probes
        ).collect()
    }
    assert est == est2


# ---------------------------------------------------------------------------
# VERDICT #2: heavy_hitters reduction is width-scaled and multi-round
# ---------------------------------------------------------------------------

def test_heavy_hitters_multiround_width_scaled(spark, monkeypatch, tmp_path):
    """With a small fanout the reduction must run log-depth rounds whose
    widths shrink by ~fanout each round (every reducer merges ~fanout
    blobs), ending at the fixed driver-facing tier — and the top-k must
    equal the exact answer."""
    # Spark 4: the concrete class overrides pyspark.sql.DataFrame —
    # patching the base would miss the dispatch
    from pyspark.sql.classic.dataframe import DataFrame

    from tgdigest_spark import api

    rows = [(f"k{i % 11}",) for i in range(4000)]
    # a 64-file parquet input: the Connect-safe width estimate reads
    # inputFiles (in-memory frames are invisible to it)
    path = str(tmp_path / "hh64")
    spark.createDataFrame(rows, "v string").repartition(64).write.parquet(path)
    df = spark.read.parquet(path)

    widths: list[int] = []
    orig_rep = DataFrame.repartition

    def spy(self, *args, **kw):
        if args and isinstance(args[0], int):
            widths.append(args[0])
        return orig_rep(self, *args, **kw)

    monkeypatch.setattr(DataFrame, "repartition", spy)
    fanout, tier = 2, 2  # tier = max(2, fanout // 8)
    got = api.heavy_hitters(df, "v", k=5, fanout=fanout)
    exact = (
        df.groupBy("v").count().orderBy(F.desc("count"), "v").limit(5).collect()
    )
    assert [r["item"] for r in got.collect()] == [r["v"] for r in exact]

    # multiple rounds ran, widths shrink by ~fanout per round, final
    # round is the fixed tier
    assert len(widths) >= 3, widths
    assert widths[-1] == tier
    import math

    prev = None
    for w in widths[:-1]:
        if prev is not None:
            # per-round reducer input ≈ prev/width <= fanout
            assert math.ceil(prev / w) <= fanout, widths
        prev = w
    # last scaled round's output fits the final tier's fanout*tier bound
    assert widths[-2] <= fanout * tier, widths


def test_heavy_hitters_degenerate_fanout_terminates(spark):
    """fanout=1 can never shrink the round width (ceil(n/1) == n): the
    loop must bail to the fixed final tier instead of spinning forever
    (review finding; mirrors agg._tree_merge's break guard)."""
    df = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(500)], "v string"
    )
    from tgdigest_spark import api

    got = api.heavy_hitters(df, "v", k=3, fanout=1)
    exact = (
        df.groupBy("v").count().orderBy(F.desc("count"), "v").limit(3).collect()
    )
    assert [r["item"] for r in got.collect()] == [r["v"] for r in exact]


# ---------------------------------------------------------------------------
# VERDICT #1: large-star/small-star connected components — adversarial
# long-chain graphs must converge in O(log n) rounds (min-label
# propagation needed O(diameter) and aborted past 20)
# ---------------------------------------------------------------------------

def test_connected_components_10k_path_converges_log_rounds(spark):
    import math

    from tgdigest_spark.operators.dedup_cluster import connected_components

    n = 10_000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels = connected_components(pairs)
    rounds = labels.cc_rounds
    rows = labels.collect()
    # alternating large-star/small-star: ~log2(n) rounds on a path
    assert rounds <= math.ceil(math.log2(n)) + 3, rounds
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


def test_connected_components_mixed_shapes_and_self_pairs(spark):
    """Clique + path + isolated self-pair in one edge list; labels must
    cover every node that appears in pairs, component = min reachable."""
    from tgdigest_spark.operators.dedup_cluster import connected_components

    edges = (
        # 4-clique {0,1,2,3}
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        # path 10-11-12-13-14
        + [(i, i + 1) for i in range(10, 14)]
        # duplicate + reversed edges (must not double-label)
        + [(11, 10), (1, 0)]
        # self-pair: isolated node labels itself
        + [(99, 99)]
    )
    labels = connected_components(
        spark.createDataFrame(edges, "id_a long, id_b long")
    )
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {
        0: 0, 1: 0, 2: 0, 3: 0,
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        99: 99,
    }
