#!/usr/bin/env python
"""spark-submit job: build/resume per-partition sketch checkpoints.

    spark-submit --py-files tgdigest_spark.zip jobs/build_checkpoints.py \
        --input /path/to/transcripts --ckpt /path/to/ckpt \
        --value "length(text)" --partition "date_format(ts,'yyyy-MM-dd')" \
        [--sketch tdigest|kll|hll] [--delta 200] [--force] [--refresh P1,P2]

Resumable: a rerun computes only missing partitions (plans/checkpoints);
per-partition lineage + throughput appended to <ckpt>/lineage.jsonl.
Exit code 0 and a one-line JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running the file directly (not via --py-files): make the repo importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--value", default="length(text)")
    ap.add_argument("--partition", default="date_format(ts,'yyyy-MM-dd')")
    ap.add_argument("--sketch", default="tdigest", choices=["tdigest", "kll", "hll"])
    ap.add_argument("--delta", type=int, default=200)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--refresh", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("tgdigest-build-checkpoints").getOrCreate()
    try:
        from tgdigest_spark.pyfiles import ensure_shipped

        ensure_shipped(spark)
    except Exception:
        pass  # under spark-submit --py-files the zip is already shipped

    from tgdigest_spark.plans.checkpoints import (
        SketchCheckpointStore,
        build_checkpointed,
    )
    from tgdigest_spark.sketches import HLL, KLL, TDigest

    factory = {
        "tdigest": lambda: TDigest(args.delta),
        "kll": lambda: KLL(args.delta),
        "hll": lambda: HLL(14),
    }[args.sketch]

    df = spark.read.parquet(args.input)
    store = SketchCheckpointStore(args.ckpt)
    before = store.completed_partitions()
    manifest = build_checkpointed(
        df,
        F.expr(args.partition),
        F.expr(args.value).cast("double"),
        factory,
        store,
        force=args.force,
        refresh=set(filter(None, args.refresh.split(","))) or None,
    )
    after = store.completed_partitions()
    print(
        json.dumps(
            {
                "partitions_total": len(manifest["partitions"]),
                "partitions_built": len(after) - len(before & after),
                "resumed": len(before & after),
                "ckpt": args.ckpt,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
