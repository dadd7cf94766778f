"""spark-submit job: incremental batch ingestion into a growing corpus.

The steady-state counterpart to jobs/prep_corpus.py (which preps one
frozen snapshot): each delivery of new documents is quality-filtered,
near-deduped against everything already ACCEPTED (the persisted
signature store — nothing old is rescanned or re-hashed), appended to
the corpus, and the store compacted when appends have fragmented it.
Re-running a crashed or re-delivered batch converges instead of
double-inserting (the store's doc-id contract).

    quality filter → incremental near-dedup vs store
                   → corpus append (BEFORE the store append: at-least-
                     once, never silent loss — see incremental_near_dedup)
                   → store compaction (when fragmented) → metrics

Usage:
    spark-submit --py-files tgdigest_spark.zip jobs/ingest_batch.py \
        --batch /path/batch.parquet --store /path/sigstore \
        --corpus /path/corpus [--threshold 0.8] [--min-quality 0.5]

Prints ONE JSON line of batch metrics (the lineage record a production
scheduler ships per delivery).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", required=True, help="parquet of new docs (doc_id, text, ...)")
    ap.add_argument("--store", required=True, help="signature store directory")
    ap.add_argument("--corpus", required=True, help="accepted-corpus parquet directory")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument(
        "--compact-over-files",
        type=int,
        default=64,
        help="compact store tables once they exceed this many files",
    )
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--shingle-k", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("tgdigest-ingest-batch").getOrCreate()
    from tgdigest_spark.pyfiles import ensure_shipped

    ensure_shipped(spark)

    import os

    from tgdigest_spark.operators.dedup_incremental import (
        incremental_near_dedup,
        init_signature_store,
    )
    from pyspark.sql import functions as F

    from tgdigest_spark.operators.text_analysis import quality_score
    from tgdigest_spark.sources.maintenance import compact_signature_store

    # idempotent when the pinned store params match; raises with a
    # clear message on a parameter mismatch (signatures would not be
    # comparable)
    init_signature_store(
        args.store,
        num_perm=args.num_perm,
        bands=args.bands,
        rows=args.rows,
        shingle_k=args.shingle_k,
    )

    batch = spark.read.parquet(args.batch)
    n_in = batch.count()
    # persisted: the scoring expressions feed the dedup counts, the
    # signature build, and the survivor anti-join (same reason
    # prep_corpus persists its scored frame)
    good = batch.where(
        quality_score(F.col("text")) >= args.min_quality
    ).persist()

    def append_to_corpus(survivors):
        # runs BEFORE the store append (at-least-once: a crash between
        # this write and the store append re-delivers into the corpus,
        # recoverable by doc_id; appending after the store would
        # silently LOSE the batch on that same crash)
        if survivors.limit(1).count() > 0:
            survivors.write.mode("append").parquet(args.corpus)

    survivors, stats = incremental_near_dedup(
        good, args.store, threshold=args.threshold,
        on_survivors=append_to_corpus,
    )
    survivors.release_cache()
    good.unpersist()

    frag = 0
    for t in ("sigs", "bands"):
        p = os.path.join(args.store, t)
        if os.path.isdir(p):
            frag = max(
                frag,
                len([f for f in os.listdir(p) if f.endswith(".parquet")]),
            )
    compaction = None
    if frag > args.compact_over_files:
        compaction = compact_signature_store(spark, args.store)

    metrics = {
        **stats,  # spread FIRST: its batch_docs is the post-filter count
        "batch_docs": int(n_in),
        "failed_quality": int(n_in - stats["batch_docs"]),
        "appended_to_corpus": int(stats["survivors"]),
        "store_compacted": bool(
            compaction
            and any(v.get("compacted") for v in compaction.values())
        ),
    }
    print(json.dumps(metrics, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
