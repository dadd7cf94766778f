"""Streaming sketch maintenance via Structured Streaming + foreachBatch.

The reference is poll-based incremental batch (SURVEY.md §2.9): a hot
tail re-fetched on a debounce, a TTL'd mutable window, immutable
history. The streaming analog: a file/kafka stream feeds micro-batches;
``foreachBatch`` builds a batch sketch map-side and MERGES it into the
checkpoint store keyed by event-time bucket — idempotent per partition
key, exactly-once-ish when paired with the stream's own checkpointing
(the sink merge is associative, so at-least-once delivery only inflates
counts for resent rows — same guarantee class as the reference's
re-fetch-then-upsert).

``foreachBatch`` is chosen over ``applyInPandasWithState`` because
sketch state must outlive the query (queryable mid-stream — the
reference's /data/ partial-results endpoint, main.rs:736-777) and merge
across restarts; arbitrary stateful ops keep state inside the stream's
private store.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from ..agg import sketch_by_key
from ..plans.checkpoints import SketchCheckpointStore


def merge_batch_into_store(
    batch_df: DataFrame,
    epoch_id: int,
    bucket: Column,
    value: Column,
    factory: Callable,
    store: SketchCheckpointStore,
    run_id: str | None = None,
) -> None:
    """Merge one micro-batch's per-bucket sketches into the store.

    Exactly-once per epoch via a two-phase commit:

    1. every touched bucket's MERGED blob is written to a NEW
       epoch-versioned file (``<bucket>.e<epoch>.bin``) — the previous
       blob file is never modified;
    2. ONE atomic manifest write flips all the bucket pointers
       (``file`` + ``last_epoch``) together.

    A crash anywhere before step 2 leaves the manifest pointing at the
    pre-epoch blobs, so foreachBatch's replay of the epoch re-merges
    from clean state; a replay after step 2 sees the dedup marker and
    skips. (Merging in place and committing the manifest afterwards
    would double-count any bucket whose blob was replaced before the
    crash.)

    ``run_id`` scopes BOTH the dedup marker AND the blob filename:
    Structured Streaming restarts epoch ids at 0 per checkpointLocation,
    so two runs writing to one store would otherwise (a) silently skip
    each other's batches via the marker and (b) collide on the
    epoch-versioned filename — run B's epoch-0 file would equal the
    basename of run A's epoch-0 file, putting the LIVE blob on the GC
    list while the manifest still points at it (and replacing it
    in-place, breaking the prior-manifest-reader guarantee).
    (``sketch_stream_to_store`` passes its checkpoint location
    automatically.)

    GC is DEFERRED one commit: files superseded by THIS commit are only
    recorded; files recorded by the PREVIOUS commit are deleted now.
    A reader that snapshotted the previous manifest can therefore still
    open the files it points at throughout the next whole epoch.
    """
    rows = (
        sketch_by_key(
            batch_df.select(
                bucket.cast("string").alias("bucket"), value.alias("v")
            ),
            ["bucket"],
            "v",
            factory,
        )
    ).collect()
    import hashlib

    manifest = store.manifest()
    deser = type(factory()).deserialize
    marker = f"{run_id or ''}#{int(epoch_id)}"
    run_tag = hashlib.sha1((run_id or "").encode()).hexdigest()[:8]
    obsolete: list[str] = []
    dirty = False
    for r in rows:
        key = r["bucket"]
        entry = manifest["partitions"].setdefault(
            key, {"status": "done", "batches": 0}
        )
        if entry.get("last_commit") == marker:
            continue  # replayed epoch (same run): already committed
        old_path = store.blob_file(key, entry)
        # injective stem (NOT _blob_path, whose legacy fallback would
        # let sanitization-colliding keys share one epoch file); the
        # run tag keeps cross-run epoch-number reuse from colliding on
        # the filename of the still-live blob
        new_name = f"{store._safe_name(key)}.{run_tag}.e{int(epoch_id)}.bin"
        blob = bytes(r["sketch"])
        if os.path.exists(old_path):
            with open(old_path, "rb") as f:
                merged = deser(f.read()).merge(deser(blob))
            blob = merged.serialize()
            if os.path.basename(old_path) != new_name:
                obsolete.append(os.path.basename(old_path))
        new_path = os.path.join(store.parts_dir, new_name)
        tmp = new_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, new_path)
        entry["status"] = "done"
        entry["batches"] = int(entry.get("batches", entry.get("rows", 0))) + 1
        entry["last_commit"] = marker
        entry["file"] = new_name
        dirty = True
    if dirty:
        gc_now = manifest.get("gc_pending", [])
        manifest["gc_pending"] = obsolete
        store._write_manifest(manifest)  # the atomic commit point
        for name in gc_now:  # deferred GC: previous commit's files
            try:
                os.unlink(os.path.join(store.parts_dir, name))
            except OSError:  # pragma: no cover — best-effort GC
                pass


def sketch_stream_to_store(
    stream_df: DataFrame,
    bucket: Column,
    value: Column,
    factory: Callable,
    store: SketchCheckpointStore,
    checkpoint_location: str,
    query_name: str = "sketch_stream",
):
    """Start a streaming query maintaining per-bucket sketches.

    Returns the StreamingQuery; caller triggers/awaits it. Estimates at
    any moment = merged_sketch(store, factory) — partial results over
    whatever has arrived, the /data/ endpoint analog.
    """

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # the checkpoint location scopes epoch ids: a NEW location
        # restarts epochs at 0, and without the run scope a second run
        # against the same store would dedup-skip the new batches
        merge_batch_into_store(
            batch_df,
            epoch_id,
            bucket,
            value,
            factory,
            store,
            run_id=checkpoint_location,
        )

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_location)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
