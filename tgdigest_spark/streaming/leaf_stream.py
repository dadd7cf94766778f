"""Streaming producer for persisted sketch-leaf tables — EXACTLY-ONCE
day-grain blob appends from a Structured Streaming source.

This closes the lifecycle loop around ``sources/sketch_table.py``: the
batch job (``jobs/build_sketch_leaves.py``) builds the leaf table
nightly; this module lets a STREAM maintain the same table
continuously — each micro-batch's rows are sketched to day-grain leaf
blobs map-side and appended as ONE parquet file per epoch, so the
serving side (:func:`tgdigest_spark.api.sliding_windows_from_leaves`,
``merge_blobs_by_key`` rollups, ``compact_sketch_table``) never knows
or cares whether a leaf row came from the nightly batch or the stream.

Exactly-once without a transaction log
--------------------------------------
Structured Streaming's ``foreachBatch`` replays an epoch after a crash
(at-least-once). For idempotent-union sketches (HLL / Bloom / KMV) a
replayed append is harmless, but for COUNTING sketches (CM / t-digest /
KLL / DD / MG) it double-counts the epoch's rows inside later merges —
silent corruption. The fix here is one atomic rename:

1. the epoch's leaf rows are written to a staging dir, coalesced to a
   single part file;
2. that file is ``os.replace``d to a DETERMINISTIC name inside the
   table — ``leaf-<run_id>-e<epoch>.parquet``. POSIX rename is atomic:
   the file either fully exists or not at all;
3. the file's existence IS the dedup marker: a replayed epoch sees it
   and skips. Crash before the rename → replay rebuilds staging and
   renames (once); crash after → replay skips (once).

The manifest is ensured AFTER the data file on every delivery (not
only on non-skipped ones): the crash window between first-file and
first-manifest otherwise leaves a table the reader refuses and a
marker that stops the replay from ever healing it.

Duplicate (key, day) rows across epochs are the NORMAL state of this
table — every reader merges by key, and ``compact_sketch_table`` folds
them on whatever cadence the operator schedules. One writer per table
(batch OR stream), same as any parquet append path.

Run-id discipline mirrors ``stream_agg.merge_batch_into_store``:
Structured Streaming restarts epoch ids at 0 per checkpointLocation,
so the marker name is scoped by ``run_id`` — reusing a run_id with a
FRESH checkpoint dir would silently skip epochs that were already
delivered under the same ids; pass a new run_id when you reset the
checkpoint.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import Column, DataFrame, functions as F

from ..agg import sketch_by_key
from ..sources.sketch_table import _META_NAME, FORMAT_VERSION


def _meta_dict(
    sketch_kind: str, params: dict, keys: list[str], key_types: dict,
    blob_col: str,
) -> dict:
    return {
        "format_version": FORMAT_VERSION,
        "sketch_kind": str(sketch_kind),
        "params": dict(params),
        "keys": list(keys),
        "key_types": dict(key_types),
        "blob_col": blob_col,
        "partition_by": [],
    }


def _check_manifest(table: str, meta: dict) -> bool:
    """True when a manifest exists and matches; raises on mismatch.
    Called BEFORE any data lands — a mismatched appender must never
    get a blob file (and its skip-forever marker) into the table."""
    meta_path = os.path.join(table, _META_NAME)
    if not os.path.exists(meta_path):
        return False
    with open(meta_path) as fh:
        existing = json.load(fh)
    mismatched = {
        k: (existing.get(k), meta[k])
        for k in meta
        if k in existing and existing[k] != meta[k]
    }
    if mismatched:
        raise ValueError(
            f"leaf stream refused: manifest mismatch {mismatched}"
        )
    return True


def _ensure_manifest(table: str, meta: dict) -> None:
    if not _check_manifest(table, meta):
        with open(os.path.join(table, _META_NAME), "w") as fh:
            json.dump(meta, fh, indent=1)


def leaf_epoch_appender(
    table: str,
    ts: Column | str,
    value: Column | str,
    factory,
    sketch_kind: str,
    params: dict,
    keys: list[str] | None = None,
    run_id: str = "r0",
    day_col: str = "day",
    blob_col: str = "sketch",
):
    """Build the ``foreachBatch(batch_df, epoch_id)`` callable that
    appends one epoch's day-grain leaf blobs to ``table`` exactly once
    (see module docstring for the atomic-rename protocol).

    ``keys`` are extra grouping columns next to the derived day; the
    leaf grain is (keys..., day). Returns per-epoch stats dicts via
    the attached ``appender.stats`` list (driver-side, test/metrics
    hook)."""
    keys = list(keys or [])
    if day_col in keys or blob_col in keys:
        raise ValueError(f"{day_col!r}/{blob_col!r} are derived columns")

    stats: list[dict] = []

    def append_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        final = os.path.join(
            table, f"leaf-{run_id}-e{int(epoch_id)}.parquet"
        )
        tcol = F.col(ts) if isinstance(ts, str) else ts
        vcol = F.col(value) if isinstance(value, str) else value
        leaves = sketch_by_key(
            batch_df.select(
                *keys,
                F.to_date(tcol).alias(day_col),
                vcol.alias("_v"),
            ),
            keys + [day_col],
            "_v",
            factory,
            out_col=blob_col,
        )
        key_types = {
            k: leaves.schema[k].dataType.simpleString()
            for k in keys + [day_col]
        }
        meta = _meta_dict(sketch_kind, params, keys + [day_col],
                          key_types, blob_col)
        # validate compatibility BEFORE any data can land: a mismatched
        # appender must not inject an incompatible blob file whose
        # marker then blocks a corrected rerun from replacing it
        _check_manifest(table, meta)
        staging = os.path.join(
            os.path.dirname(table.rstrip("/")) or ".",
            f".leafstage-{os.path.basename(table.rstrip('/'))}"
            f"-{run_id}-e{int(epoch_id)}",
        )
        if os.path.exists(final):
            # replayed epoch after a successful rename: skip the data,
            # heal a missing manifest (crash-after-file window) and a
            # stale staging dir (crash-after-rename-before-rmtree)
            shutil.rmtree(staging, ignore_errors=True)
            _ensure_manifest(table, meta)
            stats.append({"epoch": int(epoch_id), "appended": False})
            return
        leaves.coalesce(1).write.mode("overwrite").parquet(staging)
        parts = glob.glob(os.path.join(staging, "part-*.parquet"))
        if len(parts) != 1:  # coalesce(1) guarantees one part
            raise RuntimeError(f"expected one part file, got {parts}")
        os.makedirs(table, exist_ok=True)
        os.replace(parts[0], final)  # atomic: THE exactly-once point
        shutil.rmtree(staging, ignore_errors=True)
        _ensure_manifest(table, meta)
        stats.append({"epoch": int(epoch_id), "appended": True})

    append_epoch.stats = stats
    return append_epoch


def stream_sketch_leaves(
    stream: DataFrame,
    checkpoint_dir: str,
    **appender_kwargs,
):
    """Wire a streaming DataFrame to the leaf-table appender. Returns
    the started ``StreamingQuery`` (availableNow trigger — catch up on
    everything delivered, then stop; rerunning resumes from the
    Structured Streaming checkpoint AND the marker files, so nothing
    is double-appended across restarts)."""
    fn = leaf_epoch_appender(**appender_kwargs)
    return (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
