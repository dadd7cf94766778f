#!/usr/bin/env python
"""spark-submit job: build/resume a per-day KEYED sketch-leaf table.

    spark-submit --py-files tgdigest_spark.zip jobs/build_sketch_leaves.py \
        --input /path/to/events.parquet --table /path/to/leaf_table \
        [--keys event_type] [--ts-col ts] [--value user_id] [--p 14]

The nightly half of the re-aggregation story (sources/sketch_table.py):
scan the fact table once, write HLL leaf sketches at (keys..., day)
grain into a day-partitioned sketch table. RESUMABLE per day: a rerun
lists the table's existing day partitions, builds only the missing
days' facts, and appends — rerunning after success is a no-op
(days_built=0, resumed=N). Later rollups (month / global / per-key
dashboards) read kilobyte blobs via merge_blobs_by_key and never touch
the fact table again.

Crash semantics (inherited from write_sketch_table): a crash mid-append
removes the manifest, so the table reads as invalid and the operator
rebuilds — fail-fast, never silently partial. Exit code 0 and a
one-line JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--keys", default="event_type",
                    help="comma-separated key columns (may be empty)")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--value", default="user_id")
    ap.add_argument("--p", type=int, default=14)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName(
            "tgdigest-build-sketch-leaves"
        ).getOrCreate()
    try:
        from tgdigest_spark.agg import sketch_by_key
        from tgdigest_spark.pyfiles import ensure_shipped
        from tgdigest_spark.sketches import HLL
        from tgdigest_spark.sources.sketch_table import (
            _META_NAME,
            read_sketch_table,
            write_sketch_table,
        )

        ensure_shipped(spark)
        keys = [k for k in args.keys.split(",") if k]
        p = args.p
        facts = spark.read.parquet(args.input).withColumn(
            "day", F.to_date(F.col(args.ts_col)).cast("string")
        )
        existing: set[str] = set()
        meta_ok = os.path.exists(os.path.join(args.table, _META_NAME))
        if meta_ok:
            back, _meta = read_sketch_table(
                spark, args.table, expect_kind="hll", expect_params={"p": p}
            )
            # day is the hive partition column: this listing is
            # directory metadata, not a data scan
            existing = {
                r["day"] for r in back.select("day").distinct().collect()
            }
        todo = facts.where(F.col("day").isNotNull())
        if existing:
            todo = todo.where(~F.col("day").isin(*existing))
        # ONE pass over the fact rows: build the (tiny) leaf frame,
        # persist it, and derive the built-day list from the LEAVES —
        # a pre-scan distinct over facts would double the nightly I/O
        # and open a TOCTOU window against files landing in --input
        leaves = sketch_by_key(
            todo, keys + ["day"], F.col(args.value).cast("string"),
            lambda: HLL(p),
        ).persist()
        try:
            days = sorted(
                r["day"] for r in leaves.select("day").distinct().collect()
            )
            if days:
                write_sketch_table(
                    leaves,
                    args.table,
                    "hll",
                    {"p": p},
                    mode="append" if meta_ok else "overwrite",
                    partition_by=["day"],
                )
        finally:
            leaves.unpersist()
        print(
            json.dumps(
                {
                    "days_built": len(days),
                    "resumed": len(existing),
                    "table": args.table,
                    "keys": keys + ["day"],
                }
            )
        )
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
