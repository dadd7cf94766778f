"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bulk_combine_all_null_batch(spark):
    """agg finding: a batch whose value column is entirely null must not
    crash the bulk per-key builder — keys still get empty sketches."""
    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.sketches.tdigest import TDigest

    df = spark.createDataFrame(
        [("a", None), ("b", None), ("a", None)], "k string, v double"
    ).repartition(2)
    out = sketch_by_key(df, ["k"], "v", lambda: TDigest(100)).collect()
    assert {r["k"] for r in out} == {"a", "b"}
    for r in out:
        assert TDigest.deserialize(r["sketch"]).count == 0
    # mixed: nulls skipped, values counted
    df2 = spark.createDataFrame(
        [("a", None), ("a", 5.0), ("b", None)], "k string, v double"
    )
    out2 = {
        r["k"]: TDigest.deserialize(r["sketch"]).count
        for r in sketch_by_key(df2, ["k"], "v", lambda: TDigest(100)).collect()
    }
    assert out2 == {"a": 1.0, "b": 0.0}


def test_short_doc_shingles_batch_independent(spark):
    """dedup finding: identical short docs (< k tokens) must get
    identical minhash signatures regardless of their batch neighbors."""
    from tgdigest_spark.operators.dedup_text import minhash_signatures

    df1 = spark.createDataFrame(
        [(0, "hello world"), (1, "xxxxx yyyyy zzzzz aaa bbb")],
        "doc_id long, text string",
    ).coalesce(1)
    df2 = spark.createDataFrame(
        [(0, "hello world"), (1, "totally different neighbor text here")],
        "doc_id long, text string",
    ).coalesce(1)
    sig1 = minhash_signatures(df1).where(F.col("doc_id") == 0).collect()[0]["sig"]
    sig2 = minhash_signatures(df2).where(F.col("doc_id") == 0).collect()[0]["sig"]
    assert sig1 == sig2
    # and identical short docs pair with est_jaccard 1.0
    from tgdigest_spark.operators.dedup_text import lsh_candidate_pairs

    dup = spark.createDataFrame(
        [(0, "hello world"), (1, "hello world"), (2, "other thing entirely")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in lsh_candidate_pairs(dup).collect()
    }
    assert pairs.get((0, 1)) == 1.0


def test_simhash_empty_docs_dont_pair(spark):
    """dedup finding: token-less docs must not flood one LSH bucket."""
    from tgdigest_spark.operators.dedup_text import (
        simhash_near_pairs,
        simhash_signatures,
    )

    rows = [(i, "") for i in range(50)] + [(100, "real text here"), (101, "real text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_signatures(df).collect()
    assert all(r["simhash"] is None for r in sigs if r["doc_id"] < 50)
    pairs = simhash_near_pairs(df, max_hamming=8).collect()
    ids_in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids_in_pairs <= {100, 101}  # no empty-doc pairs at all
    assert (100, 101) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_checkpoint_null_partition(spark, tmp_path):
    """checkpoints finding: null partition values get their own bucket
    and resume stays a no-op."""
    import os

    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        build_checkpointed,
        merged_sketch,
    )
    from tgdigest_spark.sketches.tdigest import TDigest

    df = spark.createDataFrame(
        [("2024-01-01", 1.0), (None, 2.0), (None, 3.0), ("2024-01-02", 4.0)],
        "day string, v double",
    )
    store = SketchCheckpointStore(str(tmp_path / "nullck"))
    fact = lambda: TDigest(100)  # noqa: E731
    build_checkpointed(df, F.col("day"), F.col("v"), fact, store)
    assert store.completed_partitions() == {"2024-01-01", "2024-01-02", "__NULL__"}
    assert merged_sketch(store, fact).count == 4
    mtimes = {
        k: os.path.getmtime(store._blob_path(k))
        for k in store.completed_partitions()
    }
    build_checkpointed(df, F.col("day"), F.col("v"), fact, store)  # resume
    for k, t in mtimes.items():
        assert os.path.getmtime(store._blob_path(k)) == t


def test_quality_score_null_text(spark):
    """text-analysis finding: NULL text must score 0-ish, not 0.15+ from
    a skipped-null least() and a negative stopword ratio."""
    from tgdigest_spark.operators.text_analysis import annotate

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "the cat and the dog is nice to see")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in annotate(df).collect()}
    for i in (0, 1):
        assert out[i]["quality"] == 0.0, out[i]["quality"]
        assert out[i]["token_cnt"] == 0
        assert out[i]["alpha_ratio"] == 0.0
    assert out[2]["quality"] > 0.3


def test_stateful_stream_accepts_kll():
    """streaming finding: the stateful operator's protocol surface
    (count + quantile) must exist on KLL too."""
    from tgdigest_spark.sketches.kll import KLL

    k = KLL(64).update(np.arange(100.0))
    assert k.count == 100.0
    assert k.quantile(0.5) == pytest.approx(49.0, abs=3)


def test_result_cache_recovers_from_stale_artifact(spark, transcripts, tmp_path):
    """result-cache finding: a data dir without meta (crash between
    write and commit) must be overwritten, not brick the key."""
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.plans.result_cache import ResultCache, plan_fingerprint

    cache = ResultCache(str(tmp_path / "rc2"))
    q = transcripts.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
    key = plan_fingerprint(q)
    stale = os.path.join(str(tmp_path / "rc2"), f"{key}.parquet")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("stale")
    out = cache.get_or_compute(q)
    assert out.count() == 4
    assert cache.contains(q)


def test_simhash_bit_exact_vs_numpy_oracle(spark, sf001_dir):
    """Regression for the pd.NA float-upcast bug: Spark simhash values
    must match a single-process numpy recomputation bit for bit."""
    import duckdb

    from tgdigest_spark.operators.dedup_text import (
        _token_hashes,
        simhash_signatures,
    )

    pdf = duckdb.sql(
        f"select doc_id, text from read_parquet('{sf001_dir}/documents.parquet')"
        " order by doc_id"
    ).df()
    h, off, cnt = _token_hashes(pdf["text"])
    bits = (
        (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int32)
    signs = 2 * bits - 1
    sums = np.add.reduceat(signs, np.minimum(off, max(h.size - 1, 0)), axis=0)
    sums[cnt == 0] = 0
    fp = (sums > 0).astype(np.uint64)
    packed = np.zeros(len(pdf), dtype=np.uint64)
    for b in range(64):
        packed |= fp[:, b] << np.uint64(b)
    expect = packed.astype(np.int64)

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    mismatches = [i for i in range(len(expect)) if got[i] != expect[i]]
    assert mismatches == []
