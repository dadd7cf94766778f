"""Structured Streaming ingestion into the deduped corpus.

The streaming counterpart of jobs/ingest_batch.py: a file-source
stream watches a landing directory, and each micro-batch runs the SAME
pipeline as a batch delivery — quality filter → incremental near-dedup
against the persisted signature store → corpus append (before the
store append) — inside ``foreachBatch``.

Delivery semantics, stated precisely: Structured Streaming's file
source + checkpointed offsets give AT-LEAST-ONCE micro-batches (a
crash after processing but before the offset commit replays the
batch). The store's doc-id contract absorbs the replay — re-delivered
ids are dropped up front and the corpus append is keyed by unique doc
ids — so the END-TO-END effect on store and corpus is exactly-once,
the same argument as the batch job's crash matrix (operators/
dedup_incremental.py docstring; crash ordering pinned in
tests/test_dedup_incremental.py). Downstream corpus readers dedup by
doc_id if they must tolerate the replay window.

Scale shape: identical to the batch path — per micro-batch the work is
O(batch) (only new docs are hashed; the corpus-sized store is scanned
columnar + broadcast-probed, never shuffled), so stream throughput is
governed by delivery rate, not corpus age. ``availableNow`` triggers
turn the same code into a catch-up/backfill run.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F


def dedup_ingest_stream(
    spark,
    landing_dir: str,
    schema: str,
    store: str,
    corpus_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    min_quality: float = 0.5,
    metrics_dir: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Build (not start) the streaming query: returns a
    ``DataStreamWriter`` so the caller picks the trigger
    (``.trigger(availableNow=True)`` for catch-up, processingTime for
    steady state) and calls ``.start()``.

    ``schema``: DDL string for the landing parquet files (streaming
    file sources require an explicit schema). ``metrics_dir``: when
    set, one JSON lineage line is appended per micro-batch — the same
    record the batch job prints.
    """
    from ..operators.dedup_incremental import incremental_near_dedup
    from ..operators.text_analysis import quality_score

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(landing_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        n_in = batch_df.count()
        if n_in == 0:
            return
        good = batch_df.where(
            quality_score(F.col("text")) >= min_quality
        ).persist()

        def append_to_corpus(survivors: DataFrame) -> None:
            # BEFORE the store append — at-least-once, never silent
            # loss (see incremental_near_dedup's on_survivors contract)
            if survivors.limit(1).count() > 0:
                survivors.write.mode("append").parquet(corpus_dir)

        survivors, stats = incremental_near_dedup(
            good, store, threshold=threshold, on_survivors=append_to_corpus
        )
        survivors.release_cache()
        good.unpersist()
        if metrics_dir is not None:
            os.makedirs(metrics_dir, exist_ok=True)
            rec = {
                **stats,
                "batch_docs": int(n_in),
                "failed_quality": int(n_in - stats["batch_docs"]),
                "epoch_id": int(epoch_id),
            }
            with open(os.path.join(metrics_dir, "ingest_metrics.jsonl"), "a") as f:
                f.write(json.dumps(rec, sort_keys=True) + "\n")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
