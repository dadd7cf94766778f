"""Table maintenance: small-file compaction for append-heavy layouts.

Every `mode("append")` parquet write adds task-count files; layouts
that accumulate appends (the incremental-dedup signature store, any
micro-batched sink) degrade toward thousands of KB-sized files whose
open/footer overhead dominates scans. Compaction rewrites a directory
to ~``target_records`` rows per file and swaps it in atomically via
the same rename discipline as the upsert sinks
(:func:`tgdigest_spark.sources.upsert._atomic_swap`).

Crash story, explicitly:

* before the swap — original untouched; stale ``.tmp-*`` attempts are
  removed at the start of the NEXT run (including its no-op path);
* inside the swap — the directory can be briefly absent; the next run
  SELF-HEALS by restoring the newest ``.old-*`` backup before reading;
* after the swap — a leaked ``.old-*`` backup is likewise removed at
  the start of the next run.

Single-maintainer assumption, like any filesystem table without a
transactional catalog — Iceberg's ``rewrite_data_files`` is the
production equivalent (cf. sources/transcripts.py catalog notes).

The rewrite is one ``repartition(want)`` — a shuffle, paid knowingly:
``coalesce`` cannot GROW partition counts, and the scan packs small
files into few read partitions (``maxPartitionBytes`` /
``openCostInBytes``), so a coalesce-based rewrite could emit one
oversized file on a low-core session instead of the promised
~``target_records`` rows per file.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

from .upsert import _atomic_swap


def _sweep_remnants(path: str) -> None:
    """Remove stale ``.tmp-*`` attempts, remove leaked ``.old-*``
    backups when the table exists, and restore the newest backup when
    a crash mid-swap left the table absent."""
    parent, name = os.path.split(path.rstrip("/"))
    parent = parent or "."
    if not os.path.isdir(parent):
        return
    tmps = [e for e in os.listdir(parent) if e.startswith(name + ".tmp-")]
    olds = [e for e in os.listdir(parent) if e.startswith(name + ".old-")]
    for e in tmps:
        shutil.rmtree(os.path.join(parent, e), ignore_errors=True)
    if not os.path.exists(path) and olds:
        # crashed between the swap's renames: the newest backup IS the
        # pre-compaction table — put it back
        newest = max(olds, key=lambda e: os.path.getmtime(os.path.join(parent, e)))
        os.replace(os.path.join(parent, newest), path)
        olds.remove(newest)
    if os.path.exists(path):
        for e in olds:
            shutil.rmtree(os.path.join(parent, e), ignore_errors=True)


def compact_parquet_dir(
    spark: SparkSession, path: str, target_records: int = 1_000_000
) -> dict:
    """Rewrite the FLAT parquet directory ``path`` to ~``target_records``
    rows per file.

    Returns {files_before, files_after, rows, compacted}. No-op (no
    rewrite, no swap) when the directory already has at most the
    target file count — calling it on every batch is cheap; remnant
    cleanup/self-heal still runs first. Hive-partitioned (nested)
    layouts are rejected — compact each partition directory, or use a
    table format's rewrite action.
    """
    if target_records <= 0:
        raise ValueError("target_records must be positive")
    _sweep_remnants(path)
    entries = os.listdir(path)
    nested = [
        e
        for e in entries
        if os.path.isdir(os.path.join(path, e)) and not e.startswith((".", "_"))
    ]
    if nested:
        raise ValueError(
            f"{path} is a partitioned/nested layout ({nested[:3]}…): "
            "compact each partition directory individually — a "
            "top-level rewrite would silently miscount its files"
        )
    df = spark.read.parquet(path)
    rows = df.count()
    files_before = len([f for f in entries if f.endswith(".parquet")])
    want = max(1, math.ceil(rows / target_records))
    if files_before <= want:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": int(rows),
            "compacted": False,
        }
    import uuid

    tmp = path.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    # repartition, not coalesce: see module docstring (small files pack
    # into few read partitions; coalesce can only shrink)
    df.repartition(want).write.mode("overwrite").parquet(tmp)
    _atomic_swap(tmp, path)
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
    (operators/dedup_incremental.py) — run between batch ingests.
    Tables that don't exist yet (fresh store, or a crash left only one
    half written) are skipped, not errors."""
    out = {}
    for name in ("sigs", "bands"):
        p = os.path.join(store, name)
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            out[name] = compact_parquet_dir(spark, p, target_records)
        else:
            out[name] = {"compacted": False, "missing": True}
    return out
