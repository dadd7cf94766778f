"""Round-2 fixes: signature batch-independence (advisor), simhash bucket
cap, ngram max_df production switch, distributed heavy hitters, bloom
capacity sizing, Connect-safe tree merge (judge items 1,2,4,6,7)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# advisor medium: reduceat offset clip made signatures depend on batch
# composition whenever a batch ENDED with empty docs (the clipped offset
# folded the final shingle/token out of the last non-empty doc).
# ---------------------------------------------------------------------------

def test_minhash_signature_independent_of_trailing_empty_docs(spark):
    from tgdigest_spark.operators.dedup_text import minhash_signatures

    text = "alpha beta gamma delta epsilon zeta"
    alone = spark.createDataFrame([(0, text)], "doc_id long, text string")
    with_trailing = spark.createDataFrame(
        [(0, text), (1, ""), (2, "   ")], "doc_id long, text string"
    ).coalesce(1)

    sig_alone = minhash_signatures(alone).collect()[0]["sig"]
    sig_batch = {
        r["doc_id"]: r["sig"] for r in minhash_signatures(with_trailing).collect()
    }
    assert sig_batch[0] == sig_alone
    assert sig_batch[1] == [] and sig_batch[2] == []


def test_simhash_independent_of_trailing_empty_docs(spark):
    from tgdigest_spark.operators.dedup_text import simhash_signatures

    text = "alpha beta gamma delta epsilon zeta"
    alone = spark.createDataFrame([(0, text)], "doc_id long, text string")
    with_trailing = spark.createDataFrame(
        [(0, text), (1, "")], "doc_id long, text string"
    ).coalesce(1)

    sh_alone = simhash_signatures(alone).collect()[0]["simhash"]
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(with_trailing).collect()
    }
    assert got[0] == sh_alone
    assert got[1] is None


def test_minhash_final_shingle_counted(spark):
    """Numpy oracle for the exact failure mode: last non-empty doc's
    LAST shingle must contribute to the signature (the old clip dropped
    it, so two docs differing only in their final shingle could collide)."""
    from tgdigest_spark.operators.dedup_text import minhash_signatures

    # Same first 3 tokens, different last token => different final shingle.
    a = "w1 w2 w3 w4"
    b = "w1 w2 w3 DIFFERENT"
    df = spark.createDataFrame(
        [(0, a), (1, ""), (2, b), (3, "")], "doc_id long, text string"
    ).coalesce(1)
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(df).collect()}
    # doc 0 in a batch ending with an empty doc vs doc 2 likewise: their
    # signatures must differ because their final shingles differ.
    assert sigs[0] != sigs[2]


# ---------------------------------------------------------------------------
# judge #2: simhash bucket cap — adversarial near-identical corpus
# ---------------------------------------------------------------------------

def test_simhash_bucket_cap_bounds_adversarial_corpus(spark):
    from tgdigest_spark.operators.dedup_text import simhash_near_pairs

    n = 10_000
    rows = [(i, "the same adversarial document body repeated") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    pairs = simhash_near_pairs(df, max_hamming=8, max_bucket=500)
    cnt = pairs.count()
    # every bucket holds all 10k docs -> over the cap -> SAMPLED down to
    # 500 members; an uncapped join would have generated ~50M pairs,
    # the sampled bucket at most C(500,2) per band (identical sample
    # across bands here, so the distinct union stays <= C(500,2)).
    assert 0 < cnt <= 500 * 499 // 2
    pairs.release_cache()


def test_simhash_cap_keeps_small_cluster_pairs(spark):
    from tgdigest_spark.operators.dedup_text import simhash_near_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different text about distributed sketching engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_near_pairs(df, max_hamming=4).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {(1, 2, 0)}


# ---------------------------------------------------------------------------
# judge #4: ngram max_df cap
# ---------------------------------------------------------------------------

def test_ngram_max_df_drops_hot_shingle_pairs(spark):
    from tgdigest_spark.operators.dedup_text import ngram_jaccard_pairs

    # 40 docs all sharing one hot shingle ("common token here"), each with
    # a unique tail so they are not real near-dups.
    rows = [(i, f"common token here unique{i} tail{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df).count()
    assert uncapped == 40 * 39 / 2  # hot shingle pairs everything
    capped = ngram_jaccard_pairs(df, max_df=10).count()
    assert capped == 0  # only the hot shingle was shared


def test_ngram_max_df_off_is_bitwise_unchanged(spark):
    from tgdigest_spark.operators.dedup_text import ngram_jaccard_pairs

    rng = np.random.default_rng(23)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        (i, " ".join(np.array(vocab)[rng.integers(0, len(vocab), 30)]))
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in ngram_jaccard_pairs(corpus).collect()
    }
    with_huge_cap = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in ngram_jaccard_pairs(corpus, max_df=10**9).collect()
    }
    assert base == with_huge_cap


# ---------------------------------------------------------------------------
# judge #1: heavy hitters fully distributed (no O(partitions) collect)
# ---------------------------------------------------------------------------

def test_heavy_hitters_512_partitions_matches_exact(spark):
    from tgdigest_spark.api import heavy_hitters

    # Zipf-ish: item i appears (50 - i) * 20 times.
    rows = [(f"item{i:02d}",) for i in range(40) for _ in range((50 - i) * 5)]
    df = spark.createDataFrame(rows, "v string").repartition(512)
    got = heavy_hitters(df, "v", k=5, eps=0.001, delta=0.01).collect()
    exact = (
        df.groupBy("v")
        .count()
        .orderBy(F.desc("count"), "v")
        .limit(5)
        .collect()
    )
    assert [r["item"] for r in got] == [r["v"] for r in exact]
    # CM estimates are one-sided: est >= true count.
    truth = {r["v"]: r["count"] for r in exact}
    for r in got:
        assert r["est_count"] >= truth[r["item"]]


def test_heavy_hitters_driver_inbox_is_partition_independent(spark):
    """The driver must collect at most cand_cap + fanout rows no matter
    how many input partitions there are (was: partitions x 65 rows)."""
    from tgdigest_spark import api

    rows = [(f"k{i % 7}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "v string").repartition(64)

    collected_sizes = []
    from pyspark.sql import DataFrame

    orig_collect = DataFrame.collect

    def counting_collect(self):
        out = orig_collect(self)
        collected_sizes.append(len(out))
        return out

    try:
        DataFrame.collect = counting_collect
        got = api.heavy_hitters(df, "v", k=5, candidates_per_partition=64)
        got_rows = orig_collect(got)
    finally:
        DataFrame.collect = orig_collect
    assert len(got_rows) == 5
    # every intermediate collect is bounded well below the 64-partition
    # worst case of 64*65 = 4160 rows
    assert all(s <= 512 for s in collected_sizes), collected_sizes


# ---------------------------------------------------------------------------
# judge #6: bloom capacity sizing without an exact distinct pass
# ---------------------------------------------------------------------------

def test_build_membership_sizes_without_distinct_shuffle(spark):
    from tgdigest_spark.api import build_membership, membership_prune

    keys = spark.range(0, 5000).select(
        F.concat(F.lit("user"), F.col("id")).alias("v")
    )
    bloom = build_membership(keys, "v", fpr=0.01)
    # no false negatives
    kept = membership_prune(keys, "v", bloom).count()
    assert kept == 5000
    # FPR bound on disjoint probes (3x slack on 1%)
    probes = spark.range(100000, 110000).select(
        F.concat(F.lit("other"), F.col("id")).alias("v")
    )
    fp = membership_prune(probes, "v", bloom).count()
    assert fp <= 10000 * 0.03


def test_build_membership_capacity_plan_has_no_distinct(spark):
    from tgdigest_spark.api import _approx_capacity

    df = spark.range(0, 100).select(F.col("id").cast("string").alias("v"))
    cap_df = _approx_capacity(df, F.col("v"))
    plan = cap_df._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_count_distinct" in plan
    # the old sizing ran df.select(v).distinct().count(): a full
    # hash-partition shuffle of the raw keys
    assert "Deduplicate" not in plan


# ---------------------------------------------------------------------------
# judge #7: Connect-safe tree merge (no .rdd probe)
# ---------------------------------------------------------------------------

def test_tree_merge_never_touches_rdd(spark, monkeypatch):
    from pyspark.sql import DataFrame

    from tgdigest_spark.agg import sketch_column
    from tgdigest_spark.sketches.hll import HLL

    def boom(self):  # pragma: no cover - must not be called
        raise AssertionError(".rdd accessed: breaks Spark Connect")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    df = spark.range(0, 20000).select(F.col("id").cast("string").alias("v"))
    est = sketch_column(df, "v", lambda: HLL(12)).estimate()
    assert abs(est - 20000) / 20000 < 0.05


def test_tree_merge_mocked_wide_plan_runs_spark_side_round(spark, monkeypatch):
    """With a 10k-partition estimate the merge must insert Spark-side
    rounds so the driver collects <= fanout blobs."""
    import tgdigest_spark.agg as agg
    from tgdigest_spark.sketches.hll import HLL

    monkeypatch.setattr(agg, "_estimated_partitions", lambda df: 10_000)
    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    est = agg.sketch_column(df, "v", lambda: HLL(12), fanout=64).estimate()
    assert abs(est - 5000) / 5000 < 0.05


# ---------------------------------------------------------------------------
# judge #8: reliable checkpoint option for connected components
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_dir", [False, True])
def test_connected_components_both_checkpoint_modes(spark, tmp_path, use_dir):
    from tgdigest_spark.operators.dedup_cluster import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    kw = {"checkpoint_dir": str(tmp_path / "ckpt")} if use_dir else {}
    comp = {
        r["id"]: r["component"]
        for r in connected_components(pairs, **kw).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


# ---------------------------------------------------------------------------
# advisor low items: blob-path injectivity, plan-id normalization,
# zip build race-safety
# ---------------------------------------------------------------------------

def test_blob_path_injective_for_colliding_keys(tmp_path):
    from tgdigest_spark.plans.checkpoints import SketchCheckpointStore

    store = SketchCheckpointStore(str(tmp_path / "ck"))
    p1 = store._blob_path("a/b")
    p2 = store._blob_path("a_b")
    assert p1 != p2
    # stable across instances (resume must find the same file)
    store2 = SketchCheckpointStore(str(tmp_path / "ck"))
    assert store2._blob_path("a/b") == p1


def test_plan_normalization_is_order_preserving():
    from tgdigest_spark.plans.result_cache import _normalize_plan

    # same shape, shifted ids -> identical normalized form
    assert _normalize_plan("Join (a#5 = b#9) Project a#5") == _normalize_plan(
        "Join (a#1 = b#2) Project a#1"
    )
    # different wiring (which side repeats) -> distinct normalized form;
    # the old collapse-to-'#' made these identical
    assert _normalize_plan("Join (a#1 = b#2) Project a#1") != _normalize_plan(
        "Join (a#1 = b#2) Project b#2"
    )


def test_build_zip_unique_tmp_and_importable(tmp_path):
    import zipfile

    from tgdigest_spark.pyfiles import build_zip

    out = str(tmp_path / "pkg.zip")
    path = build_zip(out)
    assert path == out
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    assert "tgdigest_spark/pyfiles.py" in names
    # no stale fixed-name .tmp left behind
    assert not [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]


# ---------------------------------------------------------------------------
# round-2 code-review findings
# ---------------------------------------------------------------------------

def test_estimated_partitions_sees_shuffle_width(spark):
    """A post-shuffle plan's width comes from spark.sql.shuffle.partitions;
    the estimate must be >= it so _tree_merge inserts its round."""
    from tgdigest_spark.agg import _estimated_partitions

    df = spark.range(100).groupBy((F.col("id") % 10).alias("k")).count()
    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert _estimated_partitions(df) >= conf


def test_tree_merge_fanout_one_terminates(spark):
    from tgdigest_spark.agg import sketch_column
    from tgdigest_spark.sketches.hll import HLL

    df = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    est = sketch_column(df, "v", lambda: HLL(12), fanout=1).estimate()
    assert abs(est - 3000) / 3000 < 0.1


def test_range_scan_composes_with_read_transcripts(spark, transcripts, tmp_path):
    from tgdigest_spark.sources.transcripts import (
        range_scan,
        read_transcripts,
        write_transcripts_table,
    )

    out = str(tmp_path / "tbl")
    write_transcripts_table(transcripts, out)
    back = read_transcripts(spark, out)
    q = range_scan(back, "2024-01-10 00:00:00", "2024-01-12 23:59:59")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: []" not in plan
    # opt-out path still available for schema-clean reads
    clean = read_transcripts(spark, out, keep_partition_col=False)
    assert "ts_day" not in clean.columns


def test_simhash_duplicate_doc_ids_no_self_pairs(spark):
    from tgdigest_spark.operators.dedup_text import simhash_near_pairs

    rows = [
        (1, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),  # double-ingested id
        (2, "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_near_pairs(df, max_hamming=4).collect()
    assert all(r["id_a"] < r["id_b"] for r in got)
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


def test_checkpoint_legacy_blob_path_still_resumes(tmp_path):
    """Stores written before the sha1 suffix ('{safe}.bin') must still
    read + resume; new writes go to the injective path."""
    import os

    from tgdigest_spark.plans.checkpoints import SketchCheckpointStore
    from tgdigest_spark.sketches.tdigest import TDigest

    store = SketchCheckpointStore(str(tmp_path / "ck"))
    sk = TDigest(100)
    import numpy as np

    sk.update(np.arange(100.0))
    legacy = os.path.join(store.parts_dir, "2024-01-01.bin")
    with open(legacy, "wb") as f:
        f.write(sk.serialize())
    m = store.manifest()
    m["partitions"]["2024-01-01"] = {"status": "done", "rows": 100}
    store._write_manifest(m)
    assert store.completed_partitions() == {"2024-01-01"}
    assert store._blob_path("2024-01-01") == legacy
    blobs = store.blobs()
    assert TDigest.deserialize(blobs["2024-01-01"]).count == 100


# ---------------------------------------------------------------------------
# second code-review batch
# ---------------------------------------------------------------------------

def test_streaming_crash_before_manifest_commit_does_not_double_count(
    spark, tmp_path
):
    """Two-phase commit: blobs written but manifest NOT committed (crash
    window) must leave the store answering from pre-epoch state, and the
    epoch replay must produce the exact single-merge result."""
    from pyspark.sql import functions as F

    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        merged_sketch,
    )
    from tgdigest_spark.sketches.tdigest import TDigest
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    FACTORY = lambda: TDigest(100)  # noqa: E731
    store = SketchCheckpointStore(str(tmp_path / "tp_ckpt"))
    batch0 = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "role string, v double"
    )
    merge_batch_into_store(batch0, 0, F.col("role"), F.col("v"), FACTORY, store)

    # epoch 1 crashes AT the commit point: all epoch-1 blob files are on
    # disk but the manifest write (and the GC of superseded files that
    # follows it) never happens
    batch1 = spark.createDataFrame(
        [("a", float(i)) for i in range(50)], "role string, v double"
    )
    orig_write = store._write_manifest
    store._write_manifest = lambda m: (_ for _ in ()).throw(
        RuntimeError("crash at commit")
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        merge_batch_into_store(
            batch1, 1, F.col("role"), F.col("v"), FACTORY, store
        )
    store._write_manifest = orig_write
    assert merged_sketch(store, FACTORY).count == 100  # pre-epoch state

    # replay of epoch 1 → exactly one merge
    merge_batch_into_store(batch1, 1, F.col("role"), F.col("v"), FACTORY, store)
    assert merged_sketch(store, FACTORY).count == 150
    # second replay (post-commit) is a no-op
    merge_batch_into_store(batch1, 1, F.col("role"), F.col("v"), FACTORY, store)
    assert merged_sketch(store, FACTORY).count == 150


def test_assign_splits_survives_repartition(spark):
    from pyspark.sql import functions as F

    from tgdigest_spark.operators.sampling import assign_splits

    df = spark.range(5000).select(F.col("id"))
    w = {"train": 0.8, "val": 0.2}
    a = {
        r["id"]: r["split"]
        for r in assign_splits(df, w, key="id", seed=3).collect()
    }
    b = {
        r["id"]: r["split"]
        for r in assign_splits(df.repartition(17), w, key="id", seed=3).collect()
    }
    assert a == b  # content hash: layout-independent freeze


def test_repetition_filter_keeps_empty_docs_when_allowed(spark):
    from tgdigest_spark.operators.text_analysis import repetition_filter

    df = spark.createDataFrame(
        [(1, ""), (2, "a b c d e")], "doc_id long, text string"
    )
    kept0 = {
        r["doc_id"] for r in repetition_filter(df, min_tokens=0).collect()
    }
    assert kept0 == {1, 2}
    kept1 = {
        r["doc_id"] for r in repetition_filter(df, min_tokens=1).collect()
    }
    assert kept1 == {2}


# ---------------------------------------------------------------------------
# third code-review batch
# ---------------------------------------------------------------------------

def test_streaming_new_run_with_restarted_epochs_still_merges(spark, tmp_path):
    """Epoch ids restart at 0 per checkpointLocation; a second run
    (different run_id) against the same store must merge, while a
    same-run replay still dedups."""
    from pyspark.sql import functions as F

    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        merged_sketch,
    )
    from tgdigest_spark.sketches.tdigest import TDigest
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    FACTORY = lambda: TDigest(100)  # noqa: E731
    store = SketchCheckpointStore(str(tmp_path / "runs"))
    batch = spark.createDataFrame(
        [("a", float(i)) for i in range(10)], "role string, v double"
    )
    merge_batch_into_store(
        batch, 0, F.col("role"), F.col("v"), FACTORY, store, run_id="runA"
    )
    merge_batch_into_store(  # same run, replayed epoch 0 → skip
        batch, 0, F.col("role"), F.col("v"), FACTORY, store, run_id="runA"
    )
    assert merged_sketch(store, FACTORY).count == 10
    merge_batch_into_store(  # NEW run, epoch restarts at 0 → must merge
        batch, 0, F.col("role"), F.col("v"), FACTORY, store, run_id="runB"
    )
    assert merged_sketch(store, FACTORY).count == 20


def test_streaming_colliding_keys_get_distinct_epoch_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        merged_sketch,
    )
    from tgdigest_spark.sketches.tdigest import TDigest
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    FACTORY = lambda: TDigest(100)  # noqa: E731
    store = SketchCheckpointStore(str(tmp_path / "collide"))
    batch = spark.createDataFrame(
        [("a/b", 1.0), ("a_b", 2.0)], "k string, v double"
    )
    merge_batch_into_store(batch, 0, F.col("k"), F.col("v"), FACTORY, store)
    m = store.manifest()["partitions"]
    assert m["a/b"]["file"] != m["a_b"]["file"]
    assert merged_sketch(store, FACTORY).count == 2


def test_assign_splits_null_key_raises(spark):
    from pyspark.sql import functions as F

    from tgdigest_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(1,), (None,)], "id long")
    out = assign_splits(df, {"a": 0.5, "b": 0.5}, key="id")
    import pytest as _pytest

    with _pytest.raises(Exception, match="null split key"):
        out.collect()
