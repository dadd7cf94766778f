"""Table maintenance: small-file compaction for append-heavy layouts.

Every `mode("append")` parquet write adds task-count files; layouts
that accumulate appends (the incremental-dedup signature store, any
micro-batched sink) degrade toward thousands of KB-sized files whose
open/footer overhead dominates scans. Compaction rewrites a directory
to ~``target_records`` rows per file and swaps it in with directory
renames:

    1. read `path`, repartition to ceil(rows / target_records)
    2. write to `path.__compact__`
    3. rename `path` -> `path.__old__`, `path.__compact__` -> `path`
    4. remove `path.__old__`

Crash windows: before step 3 the original is untouched (re-run);
between the two renames of step 3 the directory is briefly absent —
single-maintainer assumption, same as any filesystem table without a
transactional catalog (an Iceberg `rewrite_data_files` is the
production equivalent, cf. sources/transcripts.py catalog notes). The
rewrite is one shuffle-free repartition (coalesce when shrinking) over
a columnar scan.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet_dir(
    spark: SparkSession, path: str, target_records: int = 1_000_000
) -> dict:
    """Rewrite ``path`` to ~``target_records`` rows per file.

    Returns {files_before, files_after, rows}. No-op (no rewrite, no
    swap) when the directory already has at most the target file count
    — calling it on every batch is cheap.
    """
    if target_records <= 0:
        raise ValueError("target_records must be positive")
    df = spark.read.parquet(path)
    rows = df.count()
    files_before = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    want = max(1, math.ceil(rows / target_records))
    if files_before <= want:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": int(rows),
            "compacted": False,
        }
    tmp = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(tmp, ignore_errors=True)  # stale failed attempt
    shutil.rmtree(old, ignore_errors=True)
    # coalesce, not repartition: shrinking file counts needs no shuffle
    df.coalesce(want).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    files_after = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": int(rows),
        "compacted": True,
    }


def compact_signature_store(
    spark: SparkSession, store: str, target_records: int = 1_000_000
) -> dict:
    """Compact both tables of an incremental-dedup signature store
    (operators/dedup_incremental.py) — run between batch ingests."""
    return {
        "sigs": compact_parquet_dir(
            spark, os.path.join(store, "sigs"), target_records
        ),
        "bands": compact_parquet_dir(
            spark, os.path.join(store, "bands"), target_records
        ),
    }
