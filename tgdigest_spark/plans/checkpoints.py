"""Per-partition sketch checkpoints with lineage + throughput metrics.

The Spark-native generalization of the reference's incremental cache
(/root/reference/src/cache.rs): its FetchPlan computes only *uncovered /
stale* ranges (cache.rs:240-301), its fetched batches upsert
idempotently (cache.rs:322-354), and rows past the mutable window are
"permanently fresh" (cache.rs:24-27). Here:

* a **partition** is any expression over the fact table (typically
  ``to_date(ts)`` — the write-layout partition);
* each partition's sketch is a checkpoint file
  ``{dir}/parts/{partition}.bin`` plus a manifest entry with lineage
  (rows, wall seconds, rows/sec, sketch params, input fingerprint);
* a (re)run computes ONLY missing partitions — the FetchPlan analog —
  in ONE Spark job filtered to them (partition pruning does the rest);
* ``refresh`` re-runs a chosen set (the ST1/ST2 hot-tail analog);
* ``merged()`` tree-merges all partition blobs into the global sketch.

Re-running a finished job is a no-op (ST8's exactly-once-ish upsert):
the resume test asserts checkpoint files' mtimes don't move.

Scale notes: one job per (re)build, never per partition; the per-
partition combine is the same map-side topology as agg.sketch_by_key;
blob files are KBs. Lineage is appended as JSONL — one record per
partition per build — which is what a 1000-executor run ships to its
metrics sink.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..agg import _merge_blobs


class SketchCheckpointStore:
    """Directory layout: manifest.json + parts/<key>.bin + lineage.jsonl"""

    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        self.parts_dir = os.path.join(ckpt_dir, "parts")
        self.manifest_path = os.path.join(ckpt_dir, "manifest.json")
        self.lineage_path = os.path.join(ckpt_dir, "lineage.jsonl")
        os.makedirs(self.parts_dir, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"partitions": {}}

    def _write_manifest(self, m: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def _safe_name(self, key: str) -> str:
        """Injective filename stem: sanitized key + short hash of the
        RAW key — 'a/b' and 'a_b' must never share a file (a collision
        silently overwrites one sketch while completed_partitions()
        marks both done)."""
        import hashlib

        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        digest = hashlib.sha1(key.encode()).hexdigest()[:8]
        return f"{safe}-{digest}"

    def _blob_path(self, key: str) -> str:
        """READ-side resolution. Migration: stores written before the
        hash suffix used '{safe}.bin'; read those if present so old
        checkpoints still resume as no-ops. Writes must NOT go through
        this fallback (on a migrated store, rebuilding key 'a/b' would
        land in non-injective 'a_b.bin' and clobber key 'a_b') — they
        use :meth:`_blob_write_path`."""
        path = self._blob_write_path(key)
        legacy = self._legacy_blob_path(key)
        if not os.path.exists(path) and os.path.exists(legacy):
            return legacy
        return path

    def _blob_write_path(self, key: str) -> str:
        """WRITE-side resolution: always the injective hashed stem."""
        return os.path.join(self.parts_dir, f"{self._safe_name(key)}.bin")

    def _legacy_blob_path(self, key: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        return os.path.join(self.parts_dir, f"{safe}.bin")

    def blob_file(self, key: str, entry: dict | None = None) -> str:
        """Resolved blob path: a manifest entry may carry an explicit
        ``file`` pointer (the streaming sink's two-phase commit writes
        epoch-versioned files and flips the pointer atomically with the
        manifest); otherwise the conventional path."""
        if entry is None:
            entry = self.manifest()["partitions"].get(key, {})
        f = entry.get("file")
        return os.path.join(self.parts_dir, f) if f else self._blob_path(key)

    def completed_partitions(self) -> set[str]:
        m = self.manifest()
        return {
            k
            for k, v in m["partitions"].items()
            if v.get("status") == "done" and os.path.exists(self.blob_file(k, v))
        }

    def blobs(self) -> dict[str, bytes]:
        # ONE manifest snapshot drives both the completed set and the
        # file paths (re-reading it per key could tear across a
        # concurrent streaming commit). If a commit + deferred GC still
        # races us between the existence check and the open, re-snapshot
        # once — the new manifest points at the committed files.
        for attempt in (0, 1):
            m = self.manifest()["partitions"]
            out: dict[str, bytes] = {}
            try:
                for k in sorted(m):
                    v = m[k]
                    if v.get("status") != "done":
                        continue
                    path = self.blob_file(k, v)
                    if os.path.exists(path):
                        with open(path, "rb") as f:
                            out[k] = f.read()
                return out
            except FileNotFoundError:  # pragma: no cover — commit race
                if attempt:
                    raise
        return out  # pragma: no cover

    def _append_lineage(self, records: list[dict]) -> None:
        with open(self.lineage_path, "a") as f:
            for r in records:
                f.write(json.dumps(r, sort_keys=True) + "\n")


def _partial_schema() -> StructType:
    return StructType(
        [
            StructField("part", StringType(), False),
            StructField("sketch", BinaryType(), False),
            StructField("rows", LongType(), False),
        ]
    )


def _build_partition_blobs(
    df: DataFrame, partition: Column, value: Column, factory
) -> list:
    """One Spark job: per-partition (blob, row count) via map-side
    combine + single blob-only shuffle (same topology as sketch_by_key)."""
    proj = df.select(
        F.coalesce(partition.cast("string"), F.lit("__NULL__")).alias("part"),
        value.alias("v"),
    )

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, tuple] = {}
        for pdf in batches:
            for key, grp in pdf.groupby("part", sort=False):
                cur = acc.get(key)
                if cur is None:
                    acc[key] = [factory().update(grp["v"]), len(grp)]
                else:
                    cur[0].update(grp["v"])
                    cur[1] += len(grp)
        if acc:
            yield pd.DataFrame(
                {
                    "part": list(acc),
                    "sketch": [v[0].serialize() for v in acc.values()],
                    "rows": [v[1] for v in acc.values()],
                }
            )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = _merge_blobs(factory, list(pdf["sketch"]))
        return pd.DataFrame(
            {
                "part": [pdf["part"].iloc[0]],
                "sketch": [merged.serialize()],
                "rows": [int(pdf["rows"].sum())],
            }
        )

    partials = proj.mapInPandas(combine, schema=_partial_schema())
    return (
        partials.groupBy("part").applyInPandas(merge, schema=_partial_schema())
    ).collect()


def build_checkpointed(
    df: DataFrame,
    partition: Column,
    value: Column,
    factory,
    store: SketchCheckpointStore,
    force: bool = False,
    refresh: set[str] | None = None,
) -> dict:
    """Build/refresh per-partition sketches; returns the manifest.

    Computes ONLY partitions that are missing (resume), listed in
    ``refresh`` (hot tail), or all when ``force`` (ST5 analog).

    Rows whose partition expression is NULL are bucketed under
    "__NULL__" (otherwise pandas groupby would silently drop them and
    the never-built null partition would defeat resume's no-op
    invariant).
    """
    proj_part = F.coalesce(partition.cast("string"), F.lit("__NULL__"))
    all_parts = {
        r["p"] for r in df.select(proj_part.alias("p")).distinct().collect()
    }
    done = set() if force else store.completed_partitions()
    todo = (all_parts - done) | (set(refresh or ()) & all_parts)
    manifest = store.manifest()
    if not todo:
        return manifest

    t0 = time.time()
    scoped = df.where(proj_part.isin(*todo)) if todo != all_parts else df
    rows = _build_partition_blobs(scoped, partition, value, factory)
    elapsed = max(time.time() - t0, 1e-9)
    total_rows = sum(r["rows"] for r in rows)

    lineage = []
    for r in rows:
        path = store._blob_write_path(r["part"])
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(r["sketch"]))
        os.replace(tmp, path)
        # NOTE: a stale legacy-named file is deliberately left in place —
        # legacy names are non-injective, so "a/b"'s legacy file may be
        # some other key's ("a_b") only copy; reads prefer the injective
        # path once it exists, so the leftover is inert for this key.
        frac = r["rows"] / total_rows if total_rows else 0.0
        entry = {
            "status": "done",
            "rows": int(r["rows"]),
            "seconds_est": elapsed * frac,
            "rows_per_sec_job": total_rows / elapsed,
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        manifest["partitions"][r["part"]] = entry
        lineage.append({"partition": r["part"], **entry})
    store._write_manifest(manifest)
    store._append_lineage(lineage)
    return manifest


def merged_sketch(store: SketchCheckpointStore, factory, keys=None):
    """Tree-merge completed partition blobs (deterministic order).

    ``keys``: optional iterable/predicate restricting which partitions
    merge — the reference's date-windowed digest (a digest for
    [from, to] merges only those days' blobs; post.rs builds each
    window from scratch, here it is a driver-side KB-blob merge)."""
    from ..agg import merge_blob_tree

    blobs = store.blobs()
    if keys is not None:
        selected = set(keys) if not callable(keys) else None
        blobs = {
            k: v
            for k, v in blobs.items()
            if (keys(k) if callable(keys) else k in selected)
        }
    if not blobs:
        return factory()
    return merge_blob_tree(list(blobs.values()), factory)


def window_quantiles(
    store: SketchCheckpointStore,
    factory,
    qs: list[float],
    from_key: str,
    to_key: str,
) -> list[float]:
    """Quantiles for the closed partition-key window [from_key, to_key]
    (keys are the partition expression's string form, e.g. ISO days, so
    lexicographic == chronological). The digest-per-window answer the
    reference recomputes from raw rows per request (post.rs:76-90)
    becomes a millisecond merge of the window's checkpoint blobs."""
    sk = merged_sketch(store, factory, keys=lambda k: from_key <= k <= to_key)
    return [float(v) for v in sk.quantile(list(qs))]
