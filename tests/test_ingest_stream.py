"""Streaming ingestion: file-source deliveries through the incremental
dedup store with checkpointed offsets — catch-up processing, replay
convergence via the id contract, and incremental pickup of new files."""

from __future__ import annotations

import json
import os
import shutil


def _write_delivery(spark, landing, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(landing)


def _run_available_now(writer):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_ingest_end_to_end(spark, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import init_signature_store
    from tgdigest_spark.streaming.ingest_stream import dedup_ingest_stream

    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics")
    init_signature_store(store)

    # include one junk doc that the quality filter drops (no alpha
    # chars, out-of-range word length → score ~0.01) and one near-dup
    # pair
    base = (
        "the quick brown fox jumps over the lazy dog and runs to the "
        "hills where the other animals of the forest meet"
    )
    _write_delivery(
        spark,
        landing,
        [
            (1, base),
            (2, base.replace("quick", "swift")),  # near-dup of 1
            (3, "0 1 0 1 0 1 0 1"),  # junk (no alpha, 1-char tokens) → quality filter
            (4, "completely different words about cooking pasta with "
                "tomatoes and basil in the italian style of the south"),
        ],
    )

    def writer():
        return dedup_ingest_stream(
            spark,
            landing,
            "doc_id long, text string",
            store,
            corpus,
            ckpt,
            threshold=0.5,
            min_quality=0.4,
            metrics_dir=metrics,
        )

    _run_available_now(writer())
    got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert 1 in got and 4 in got
    assert 2 not in got  # near-dup of 1 dropped
    assert 3 not in got  # failed quality

    # restart from the same checkpoint with no new files: nothing
    # reprocessed, corpus unchanged
    n_before = spark.read.parquet(corpus).count()
    _run_available_now(writer())
    assert spark.read.parquet(corpus).count() == n_before

    # a second delivery: only the new file is processed; a re-delivered
    # doc (id 4) converges via the id contract, a cross-delivery
    # near-dup (of doc 1) is dropped against the STORE
    _write_delivery(
        spark,
        landing,
        [
            (4, "completely different words about cooking pasta with "
                "tomatoes and basil in the italian style of the south"),
            (5, base.replace("lazy", "sleepy")),  # near-dup of stored 1
            (6, "fresh unrelated text where sailors navigate the wide "
                "ocean by the stars and the wind every single night"),
        ],
    )
    _run_available_now(writer())
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == got | {6}

    # lineage metrics: one line per non-empty micro-batch, counts close
    lines = [
        json.loads(l)
        for l in open(os.path.join(metrics, "ingest_metrics.jsonl"))
    ]
    assert len(lines) == 2
    assert lines[1]["dropped_redelivered"] == 1  # doc 4 replay
    assert lines[1]["dropped_vs_store"] == 1  # doc 5 vs stored doc 1
    assert lines[1]["survivors"] == 1  # doc 6


def test_stream_ingest_empty_landing_noop(spark, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import init_signature_store
    from tgdigest_spark.streaming.ingest_stream import dedup_ingest_stream

    landing = str(tmp_path / "landing2")
    os.makedirs(landing)
    store = str(tmp_path / "store2")
    init_signature_store(store)
    w = dedup_ingest_stream(
        spark,
        landing,
        "doc_id long, text string",
        store,
        str(tmp_path / "corpus2"),
        str(tmp_path / "ckpt2"),
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(60)
    assert not os.path.exists(str(tmp_path / "corpus2") + "/_SUCCESS")
