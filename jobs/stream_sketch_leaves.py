#!/usr/bin/env python
"""spark-submit job: maintain a sketch-leaf table FROM A STREAM.

    spark-submit --py-files tgdigest_spark.zip jobs/stream_sketch_leaves.py \
        --input-dir /path/to/arrivals --table /path/to/leaf_table \
        --checkpoint /path/to/ckpt [--keys event_type] [--ts-col ts] \
        [--value user_id] [--p 14] [--run-id r1] [--compact]

The streaming half of the leaf-table lifecycle
(streaming/leaf_stream.py): new parquet files landing in --input-dir
are micro-batched (availableNow — catch up, then exit), each epoch's
rows are sketched to (keys..., day) HLL leaves map-side and appended
as ONE atomically-renamed file. EXACTLY-ONCE across crashes and
reruns: the Structured Streaming checkpoint dedups source files, the
deterministic leaf-<run>-e<epoch> marker name dedups epoch replays.
Rerunning with nothing new appended prints appended_epochs=0.

--compact folds duplicate-key rows accumulated by incremental appends
(sources/sketch_table.compact_sketch_table) after the stream drains —
the scheduled-maintenance half of the append-often/compact-rarely
contract.

One JSON line on stdout; exit 0.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--keys", default="event_type",
                    help="comma-separated key columns (may be empty)")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--value", default="user_id")
    ap.add_argument("--p", type=int, default=14)
    ap.add_argument("--run-id", default="r1")
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName(
            "tgdigest-stream-sketch-leaves"
        ).getOrCreate()
    try:
        from tgdigest_spark.pyfiles import ensure_shipped
        from tgdigest_spark.sketches import HLL
        from tgdigest_spark.sources.sketch_table import (
            compact_sketch_table,
            read_sketch_table,
        )
        from tgdigest_spark.streaming.leaf_stream import (
            leaf_epoch_appender,
        )

        ensure_shipped(spark)
        keys = [k for k in args.keys.split(",") if k]
        p = int(args.p)

        # the stream needs a schema: infer it from the already-landed
        # files (a file-source stream over parquet requires one). An
        # empty/absent arrivals dir is a NORMAL state for a scheduled
        # catch-up job — report nothing-new instead of crashing
        try:
            schema = spark.read.parquet(args.input_dir).schema
        except Exception:
            print(json.dumps({
                "epochs_seen": 0, "appended_epochs": 0,
                "replayed_epochs": 0, "table": args.table,
                "note": f"no readable input at {args.input_dir}",
            }))
            return 0
        fn = leaf_epoch_appender(
            args.table, args.ts_col, args.value,
            lambda: HLL(p), "hll", {"p": p},
            keys=keys, run_id=args.run_id,
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(args.input_dir)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", args.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        appended = sum(1 for s in fn.stats if s["appended"])
        out = {
            "epochs_seen": len(fn.stats),
            "appended_epochs": appended,
            "replayed_epochs": len(fn.stats) - appended,
            "table": args.table,
        }
        if os.path.exists(args.table):
            df, meta = read_sketch_table(spark, args.table)
            out["leaf_rows"] = df.count()
            if args.compact:
                out["compaction"] = compact_sketch_table(
                    spark, args.table, lambda: HLL(p)
                )
        print(json.dumps(out))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
