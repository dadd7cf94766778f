"""Incremental near-dedup against a persisted signature store.

Production corpora grow in batches; recomputing MinHash signatures for
petabytes of already-ingested documents on every delivery is the
classic accidental-quadratic of naive dedup pipelines. This module
keeps the accepted corpus's LSH state ON DISK and dedups each new
batch with work proportional to the BATCH, not the corpus:

  store/
    _meta.json        LSH parameters (must match across batches)
    sigs/   parquet   (doc_id, sig array<long>)   one row per survivor
    bands/  parquet   (doc_id, band, band_hash)   survivor band keys

Per batch: compute signatures + bands for the new docs only; candidate
cross-matches come from ONE equi-join of new bands against stored
bands (band, band_hash) — the stored side is a pruned columnar scan,
never re-hashed — verified by minhash agreement against the stored
signatures. New-vs-new duplicates reuse the in-batch LSH path. The
surviving docs' signatures and bands are appended to the store, so a
re-delivered batch finds its own prior copies and drops itself
(self-converging re-ingest; the append is the one side effect and
happens after the survivor set is materialized).

Scale: the bands join is shuffle ~ |batch bands| + matching store
buckets (partition-prunable by band); signature verification joins
only candidate ids. Nothing rescans or recomputes the old corpus.
The same layout is what a production deployment would keep as an
Iceberg table (MERGE INTO appends) — plain parquet here, same plan
shapes (cf. sources/transcripts.py's catalog notes).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from .dedup_text import (
    lsh_bands,
    lsh_candidate_pairs,
    minhash_agreement_expr,
    minhash_signatures,
)

_META = "_meta.json"


def _meta_path(store: str) -> str:
    return os.path.join(store, _META)


def init_signature_store(
    store: str,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    shingle_k: int = 3,
) -> dict:
    """Create an empty store directory with pinned LSH parameters.
    Idempotent if the existing parameters match; raises otherwise."""
    params = {
        "num_perm": num_perm,
        "bands": bands,
        "rows": rows,
        "shingle_k": shingle_k,
    }
    os.makedirs(store, exist_ok=True)
    if os.path.exists(_meta_path(store)):
        existing = json.load(open(_meta_path(store)))
        if existing != params:
            raise ValueError(
                f"signature store {store} has parameters {existing}, "
                f"asked for {params}: signatures are not comparable "
                "across parameter changes — use a new store"
            )
        return params
    with open(_meta_path(store), "w") as f:
        json.dump(params, f)
    return params


def incremental_near_dedup(
    new_docs: DataFrame,
    store: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket: int = 1000,
    on_survivors=None,
) -> tuple[DataFrame, dict]:
    """Dedup ``new_docs`` against the store AND within the batch, then
    append the survivors' LSH state to the store.

    Returns ``(survivors, stats)`` — survivors is the new-docs subset
    that is not a near-duplicate (minhash-estimated Jaccard >=
    ``threshold``) of any stored doc or of a smaller-id batch peer;
    stats carries the batch accounting. The survivors DataFrame is
    MATERIALIZED (the store append is the side effect that must happen
    exactly once, after the survivor set is final), so stats are exact
    for this batch.

    Doc ids must be unique across the corpus lifetime (they key the
    store), and the contract is ENFORCED: incoming doc ids already
    present in the store are dropped up front as re-deliveries
    (``dropped_redelivered``). That — not signature matching — is what
    makes re-ingest converge for every doc, including ones too short
    to produce LSH bands; content near-dups under fresh ids are then
    caught by the signature tiers as usual.

    ``on_survivors``: optional callable invoked with the materialized
    survivors frame BEFORE the store appends. A downstream sink (the
    ingest job's corpus append) must run here, not after this function
    returns: once the store append lands, a crash-then-redeliver drops
    these ids as re-deliveries and a post-return sink would never see
    them (silent loss — at-most-once). With the hook the pipeline is
    at-least-once: a crash between the sink and the store append can
    re-deliver survivors INTO THE SINK twice, which is recoverable
    downstream by id (the ids are unique by contract), never lost.

    Crash semantics of the store itself: the two appends are not
    atomic, so the ORDER is load-bearing — bands are appended BEFORE
    signatures. Store presence (``have_store``) and the re-delivery
    filter both key on ``sigs``, so a crash between the appends leaves
    band rows without signatures, which reads as "doc not in store"
    everywhere: re-delivery is not filtered out, matching needs both a
    band candidate AND a stored signature (the dangling band rows
    verify against nothing), and recovery is simply re-delivering the
    batch. The duplicate band rows recovery creates are tolerated by
    the ``distinct()`` on candidate ids. The reverse order would
    permanently orphan the crashed batch: its ids would be dropped up
    front as re-deliveries while their band rows never land, making
    the docs invisible to all future store matching. A production
    deployment would make sink + store appends a single Iceberg
    transaction instead.
    """
    meta = json.load(open(_meta_path(store)))
    spark = new_docs.sparkSession
    n_delivered = new_docs.count()
    sig_dir = os.path.join(store, "sigs")
    band_dir = os.path.join(store, "bands")
    have_store = os.path.exists(os.path.join(sig_dir, "_SUCCESS"))
    if have_store and not os.path.exists(os.path.join(band_dir, "_SUCCESS")):
        # cannot arise from this code's crash ordering (bands land
        # strictly before sigs); a sigs-without-bands store means
        # external damage — its docs would be invisible to matching
        raise ValueError(
            f"signature store {store} is inconsistent: sigs/ committed "
            "without bands/ — stored docs would silently never match; "
            "rebuild the store from the corpus"
        )

    # id-contract enforcement: ids already in the store are
    # re-deliveries — drop them before any hashing (this, not LSH
    # matching, is what makes re-ingest converge even for docs too
    # short to band). Shuffle discipline: the store side must never
    # shuffle (it is the CORPUS — O(corpus) motion per delivery would
    # defeat the module's purpose), so the batch's ids broadcast INTO
    # a semi probe over the store scan (map-side, parquet-stat
    # prunable) and only the batch-sized result joins back.
    dropped_redelivered = 0
    if have_store:
        batch_ids = new_docs.select(id_col).distinct()
        redelivered = (
            spark.read.parquet(sig_dir)
            .select(id_col)
            .join(F.broadcast(batch_ids), id_col, "left_semi")
            .distinct()
        )
        new_docs = new_docs.join(
            F.broadcast(redelivered), id_col, "left_anti"
        ).persist()
        n_new = new_docs.count()
        dropped_redelivered = n_delivered - n_new
    else:
        n_new = n_delivered

    # localCheckpoint, not persist: through the re-delivery filter the
    # signature plan READS the store's sigs path, and the append below
    # WRITES it — CacheManager's recache-on-path-write would silently
    # recompute sigs against the grown store between the two appends
    # (the bands append would then write an empty survivor set, leaving
    # sigs and bands inconsistent). Same hazard as `survivors` below.
    sigs = minhash_signatures(
        new_docs, id_col, text_col, meta["num_perm"], meta["shingle_k"]
    ).localCheckpoint(eager=True)
    bands_new = lsh_bands(sigs, id_col, meta["bands"], meta["rows"])

    est = minhash_agreement_expr()

    dropped_vs_store = 0
    hit_store = None
    if have_store:
        # same shuffle discipline as the id filter: every store-side
        # frame is a columnar scan probed by a BROADCAST of batch-sized
        # data — the corpus never shuffles per delivery.
        old_bands = spark.read.parquet(band_dir).select(
            F.col(id_col).alias("old_id"), "band", "band_hash"
        )
        probe_keys = bands_new.select("band", "band_hash").distinct()
        # full store buckets whose key appears in the batch (semi keeps
        # every member, so the cap below counts TRUE bucket sizes)
        touched = old_bands.join(
            F.broadcast(probe_keys), ["band", "band_hash"], "left_semi"
        ).localCheckpoint(eager=True)  # small; also pins vs the append
        # hot-bucket cap, same discipline as lsh_candidate_pairs: a
        # (band, band_hash) key accumulating sub-threshold templated
        # docs batch after batch would otherwise fan every matching new
        # doc out against the whole bucket (quadratic in corpus age)
        eligible = (
            touched.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_bucket)
            .select("band", "band_hash")
        )
        cand = (
            touched.join(F.broadcast(eligible), ["band", "band_hash"])
            .join(F.broadcast(bands_new), ["band", "band_hash"])
            .select(F.col(id_col).alias("new_id"), "old_id")
            .distinct()
        )
        new_sigs = sigs.select(
            F.col(id_col).alias("new_id"), F.col("sig").alias("sig_a")
        )
        enriched = cand.join(new_sigs, "new_id")
        old_sigs = spark.read.parquet(sig_dir).select(
            F.col(id_col).alias("old_id"), F.col("sig").alias("sig_b")
        )
        hit_store = (
            old_sigs.join(F.broadcast(enriched), "old_id")
            .where(est >= F.lit(threshold))
            .select(F.col("new_id").alias(id_col))
            .distinct()
            .persist()
        )
        dropped_vs_store = hit_store.count()

    # new-vs-new: keep the smallest id of each near-dup pair —
    # reusing the signatures already computed above (precomputed_sigs
    # skips the second hashing pass)
    pairs = lsh_candidate_pairs(
        new_docs,
        id_col,
        text_col,
        meta["num_perm"],
        meta["bands"],
        meta["rows"],
        meta["shingle_k"],
        max_bucket,
        precomputed_sigs=sigs,
    )
    release_pairs = pairs.release_cache
    internal_losers = (
        pairs.where(F.col("est_jaccard") >= F.lit(threshold))
        .select(F.greatest("id_a", "id_b").alias(id_col))
        .distinct()
    )

    drop = internal_losers
    if hit_store is not None:
        drop = drop.union(hit_store).distinct()
    # localCheckpoint, not persist: the survivor plan READS the store
    # parquet, and the append below writes to that same path — Spark's
    # CacheManager auto-recaches cache entries whose plans reference a
    # written path, so a merely-persisted survivors frame would be
    # silently recomputed against the grown store (dropping everything
    # as a dup of itself). Truncating the lineage pins the result.
    survivors = new_docs.join(drop, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    n_surv = survivors.count()

    if on_survivors is not None:
        # downstream sink BEFORE the store append — see docstring
        on_survivors(survivors)

    # append the survivors' LSH state — after the survivor set is
    # final, and BANDS strictly BEFORE SIGS: store presence and the
    # re-delivery filter key on sigs, so a crash between the two
    # appends reads as "not in store" and re-delivery recovers (see
    # docstring crash semantics)
    surv_ids = survivors.select(id_col)
    bands_new.join(surv_ids, id_col).write.mode("append").parquet(band_dir)
    sigs.join(surv_ids, id_col).write.mode("append").parquet(sig_dir)

    stats = {
        "batch_docs": int(n_delivered),
        "dropped_redelivered": int(dropped_redelivered),
        "dropped_vs_store": int(dropped_vs_store),
        # docs dropped only by the in-batch pass (a doc matching both a
        # stored copy and a batch peer counts under dropped_vs_store)
        "dropped_internal_only": int(n_new - n_surv - dropped_vs_store),
        "survivors": int(n_surv),
        "store_existed": bool(have_store),
    }
    release_pairs()
    if have_store:
        new_docs.unpersist()  # the re-delivery-filtered frame
    sigs.unpersist()
    if hit_store is not None:
        hit_store.unpersist()
    # localCheckpoint blocks are freed by the context cleaner on GC;
    # the handle keeps the call-site convention uniform
    survivors.release_cache = survivors.unpersist
    return survivors, stats
