"""Incremental near-dedup: store lifecycle, cross-batch drops,
re-delivery convergence, and parameter pinning."""

from __future__ import annotations

import pytest

WORDS = [f"tok{i}" for i in range(80)]


def _doc(rng, n=30):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture()
def corpus_batches(spark):
    import numpy as np

    rng = np.random.default_rng(99)
    b1 = [(i, _doc(rng)) for i in range(20)]
    # batch 2: 5 near-copies of batch-1 docs (1 token changed), 5 fresh,
    # plus an internal dup pair (ids 205/206 identical)
    near = []
    for j in range(5):
        toks = b1[j][1].split()
        toks[3] = "CHANGED"
        near.append((200 + j, " ".join(toks)))
    fresh = [(210 + j, _doc(rng)) for j in range(5)]
    dup_text = _doc(rng)
    b2 = near + fresh + [(205, dup_text), (206, dup_text)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(b1), mk(b2)


def test_incremental_dedup_lifecycle(spark, corpus_batches, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )

    store = str(tmp_path / "sigstore")
    init_signature_store(store)
    b1, b2 = corpus_batches

    s1, st1 = incremental_near_dedup(b1, store, threshold=0.7)
    assert st1["store_existed"] is False
    assert st1["survivors"] == 20 and s1.count() == 20  # clean first batch
    s1.release_cache()

    s2, st2 = incremental_near_dedup(b2, store, threshold=0.7)
    ids = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    s2.release_cache()
    assert st2["store_existed"] is True
    assert st2["dropped_vs_store"] == 5  # the 5 near-copies of batch 1
    assert st2["dropped_internal_only"] == 1  # 206 loses to 205
    assert 205 in ids and 206 not in ids
    assert all(i not in ids for i in range(200, 205))
    assert st2["survivors"] == len(ids) == 6

    # store consistency: every stored signature has its band rows (the
    # recache-on-path-write hazard broke exactly this — sigs appended,
    # bands appended empty)
    sig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{store}/sigs").select("doc_id").collect()
    }
    band_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{store}/bands").select("doc_id").collect()
    }
    assert band_ids == sig_ids
    assert sig_ids == set(range(20)) | set(ids)

    # re-delivery of batch 2: every survivor is dropped by the id
    # contract or matches its stored copy — converges to zero
    s2b, st2b = incremental_near_dedup(b2, store, threshold=0.7)
    assert st2b["survivors"] == 0 and s2b.count() == 0
    assert st2b["dropped_redelivered"] == 6
    s2b.release_cache()


def test_crash_between_appends_recovers_on_redelivery(spark, tmp_path, monkeypatch):
    """Bands land strictly before sigs, so a crash between the two
    appends leaves a bands-without-sigs state that reads as 'not in
    store': re-delivering the batch recovers every doc (the old
    sigs-first ordering permanently orphaned the crashed batch — its
    ids were dropped as re-deliveries while their band rows never
    landed)."""
    from pyspark.sql.readwriter import DataFrameWriter

    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )

    store = str(tmp_path / "s_crash")
    init_signature_store(store)
    b1 = spark.createDataFrame(
        [(i, f"stable corpus document {i} with several words") for i in range(4)],
        "doc_id long, text string",
    )
    incremental_near_dedup(b1, store, threshold=0.9)[0].release_cache()

    b2 = spark.createDataFrame(
        [(100 + i, f"second delivery text {i} more tokens here") for i in range(3)],
        "doc_id long, text string",
    )
    real_parquet = DataFrameWriter.parquet

    def crash_on_sigs(self, path, *a, **kw):
        if path.rstrip("/").endswith("sigs"):
            raise RuntimeError("injected crash before sigs append")
        return real_parquet(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crash_on_sigs)
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_near_dedup(b2, store, threshold=0.9)
    monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)

    # bands hold dangling rows for the crashed batch; sigs do not
    sig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{store}/sigs").select("doc_id").collect()
    }
    assert sig_ids == set(range(4))

    # re-delivery recovers: nothing dropped as 'redelivered', all land
    s2, st2 = incremental_near_dedup(b2, store, threshold=0.9)
    assert st2["dropped_redelivered"] == 0
    assert st2["survivors"] == 3
    s2.release_cache()
    sig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{store}/sigs").select("doc_id").collect()
    }
    band_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{store}/bands").select("doc_id").collect()
    }
    assert sig_ids == set(range(4)) | {100, 101, 102}
    assert band_ids == sig_ids  # duplicates tolerated, ids complete

    # and the recovered docs are genuinely matchable: a near-copy of a
    # crashed-batch doc is dropped vs the store
    b3 = spark.createDataFrame(
        [(200, "second delivery text 0 more tokens here")],
        "doc_id long, text string",
    )
    s3, st3 = incremental_near_dedup(b3, store, threshold=0.9)
    assert st3["dropped_vs_store"] == 1 and st3["survivors"] == 0
    s3.release_cache()


def test_sigs_without_bands_store_rejected(spark, tmp_path):
    """External damage (sigs committed, bands missing) is detected up
    front instead of silently never matching stored docs."""
    import os

    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )

    store = str(tmp_path / "s_damaged")
    init_signature_store(store)
    b1 = spark.createDataFrame(
        [(1, "a document with words in it")], "doc_id long, text string"
    )
    incremental_near_dedup(b1, store, threshold=0.9)[0].release_cache()
    os.remove(f"{store}/bands/_SUCCESS")
    with pytest.raises(ValueError, match="inconsistent"):
        incremental_near_dedup(b1, store, threshold=0.9)


def test_store_parameter_pinning(tmp_path):
    from tgdigest_spark.operators.dedup_incremental import init_signature_store

    store = str(tmp_path / "s2")
    init_signature_store(store, num_perm=128)
    init_signature_store(store, num_perm=128)  # idempotent
    with pytest.raises(ValueError, match="not comparable"):
        init_signature_store(store, num_perm=64)


def test_empty_doc_converges_via_id_contract(spark, tmp_path):
    """Docs too short to produce LSH bands (empty text → empty
    signature) can never signature-match; the enforced id-uniqueness
    contract still makes their re-delivery converge to zero instead of
    duplicate-appending store rows forever."""
    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )

    store = str(tmp_path / "s3")
    init_signature_store(store)
    batch = spark.createDataFrame(
        [(300, ""), (301, "one"), (302, "regular text with tokens here")],
        "doc_id long, text string",
    )
    s, st = incremental_near_dedup(batch, store, threshold=0.7)
    assert st["survivors"] == 3
    s.release_cache()
    s2, st2 = incremental_near_dedup(batch, store, threshold=0.7)
    assert st2["dropped_redelivered"] == 3 and st2["survivors"] == 0
    s2.release_cache()


def test_on_survivors_runs_before_store_append(spark, tmp_path):
    """The downstream-sink hook must see the survivors BEFORE their ids
    land in the store — the ordering that makes a crash re-deliverable
    (at-least-once) instead of silently lost (at-most-once)."""
    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )

    store = str(tmp_path / "s4")
    init_signature_store(store)
    batch = spark.createDataFrame(
        [(i, f"doc text number {i} with several words") for i in range(5)],
        "doc_id long, text string",
    )
    seen = {}

    def hook(survivors):
        import os

        seen["ids"] = {r["doc_id"] for r in survivors.select("doc_id").collect()}
        seen["store_has_sigs"] = os.path.exists(f"{store}/sigs/_SUCCESS")

    _, st = incremental_near_dedup(batch, store, threshold=0.9, on_survivors=hook)
    assert seen["ids"] == set(range(5))
    assert seen["store_has_sigs"] is False  # store append strictly after
    # and the append did happen afterwards
    assert spark.read.parquet(f"{store}/sigs").count() == 5
