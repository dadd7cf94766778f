#!/usr/bin/env python
"""spark-submit job: answer quantile queries from checkpointed sketches
(or directly from the table when no checkpoint dir is given).

    spark-submit --py-files tgdigest_spark.zip jobs/query_quantiles.py \
        --ckpt /path/to/ckpt [--qs 0.5,0.95,0.99]
    spark-submit ... jobs/query_quantiles.py \
        --input /path/to/transcripts --value "length(text)" [--qs ...]

Checkpoint mode needs NO cluster time at all for the read path — blobs
merge driver-side in milliseconds (the /data/ partial-results analog:
merge whatever partitions exist and report coverage).
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
    ap.add_argument("--ckpt")
    ap.add_argument("--input")
    ap.add_argument("--value", default="length(text)")
    ap.add_argument("--qs", default="0.5,0.95,0.99")
    ap.add_argument("--delta", type=int, default=200)
    ap.add_argument("--from-key", dest="from_key", default=None)
    ap.add_argument("--to-key", dest="to_key", default=None)
    args = ap.parse_args()
    qs = [float(q) for q in args.qs.split(",")]

    from tgdigest_spark.sketches import TDigest

    factory = lambda: TDigest(args.delta)  # noqa: E731

    if args.ckpt:
        from tgdigest_spark.plans.checkpoints import (
            SketchCheckpointStore,
            merged_sketch,
        )

        store = SketchCheckpointStore(args.ckpt)
        keys = None
        if args.from_key or args.to_key:
            lo, hi = args.from_key, args.to_key
            # one-sided bounds need no "max string" sentinel (a sentinel
            # like U+FFFF silently excludes astral-plane keys)
            keys = lambda k: (lo is None or k >= lo) and (  # noqa: E731
                hi is None or k <= hi
            )
        sk = merged_sketch(store, factory, keys=keys)
        est = sk.quantile(qs)
        print(
            json.dumps(
                {
                    "source": "checkpoints",
                    "partitions": len(store.completed_partitions()),
                    "window": [args.from_key, args.to_key],
                    "rows": sk.count,
                    "quantiles": dict(zip(map(str, qs), map(float, est))),
                }
            )
        )
        return 0

    if not args.input:
        print("need --ckpt or --input", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("tgdigest-query-quantiles").getOrCreate()
    try:
        from tgdigest_spark.pyfiles import ensure_shipped

        ensure_shipped(spark)
    except Exception:
        pass

    from tgdigest_spark.api import quantiles

    df = spark.read.parquet(args.input)
    est = quantiles(df, F.expr(args.value).cast("double"), qs, delta=args.delta)
    print(
        json.dumps(
            {
                "source": "table",
                "quantiles": {str(q): v for q, v in est.items()},
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
