"""Persisted KEYED sketch tables: parquet of [keys..., sketch binary]
rows plus a manifest pinning the sketch kind and parameters.

This is the storage half of the re-aggregation story
(:func:`tgdigest_spark.agg.merge_blobs_by_key`,
:func:`tgdigest_spark.api.sketch_cube`): a nightly job scans the fact
table ONCE and writes leaf sketches at the finest useful grain
(e.g. conv_id-bucket × day); every later rollup — month, segment,
global, any ad-hoc slice — reads kilobyte blobs and merges, never
touching facts again. Parquet keeps the layer cluster-native (predicate
pushdown and partition pruning on the key columns select which blobs a
rollup even reads), unlike the per-partition blob files of
``plans/checkpoints.py``, which serve the single-global-sketch resume
path.

The manifest exists because blobs are only mergeable between sketches
of IDENTICAL kind and shape (HLL p, CM depth×width, t-digest delta…):
merging mismatched blobs is a silent-corruption class the MAGIC headers
catch only per pair at executor time. ``read_sketch_table`` fails fast,
driver-side, before any work is scheduled.

Reference anchor: the reference persists per-chat caches keyed by
message id ranges (/root/reference/src/cache.rs) and re-reads them per
digest; a sketch table is that cache generalized to mergeable
aggregates with explicit compatibility metadata.

The manifest is written with driver-local file IO (same convention as
the checkpoint store's manifest/lineage files): the table path must be
on a driver-visible filesystem. On object storage, carry the same
metadata as Iceberg table properties instead — the parquet layout is
unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META_NAME = "_sketch_meta.json"
FORMAT_VERSION = 1


def write_sketch_table(
    blobs: DataFrame,
    path: str,
    sketch_kind: str,
    params: dict,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    blob_col: str = "sketch",
) -> dict:
    """Write a keyed blob frame as a sketch table; returns the manifest.

    ``params`` must pin every parameter that affects mergeability
    (e.g. ``{"p": 14}`` for HLL). ``partition_by`` hive-partitions the
    parquet by key columns so later rollups that filter on them prune
    whole directories. Appending (``mode='append'``) to an existing
    table requires an identical kind+params manifest — refused
    otherwise.
    """
    if blob_col not in blobs.columns:
        raise ValueError(f"blob column {blob_col!r} not in {blobs.columns}")
    keys = [c for c in blobs.columns if c != blob_col]
    meta = {
        "format_version": FORMAT_VERSION,
        "sketch_kind": str(sketch_kind),
        "params": dict(params),
        "keys": keys,
        # key dtypes participate in mergeability too: a same-named key
        # appended with a different type (date vs string 'day') leaves
        # a parquet directory spark.read can't schema-merge
        "key_types": {
            k: blobs.schema[k].dataType.simpleString() for k in keys
        },
        "blob_col": blob_col,
        "partition_by": list(partition_by or []),
    }
    meta_path = os.path.join(path, _META_NAME)
    if mode == "append":
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                existing = json.load(fh)
            # EVERY manifest field participates in mergeability/layout:
            # a key-set mismatch makes spark.read null-fill the missing
            # dim so rollups merge appended blobs into a spurious null
            # group; a partition_by mismatch mixes hive and flat layouts
            mismatched = {
                k: (existing.get(k), meta[k])
                for k in ("sketch_kind", "params", "keys", "key_types",
                          "blob_col", "partition_by")
                if k in existing and existing[k] != meta[k]
            }
            if mismatched:
                raise ValueError(
                    f"append refused: manifest mismatch {mismatched}"
                )
            # remove the manifest BEFORE appending: a crash mid-append
            # then leaves a manifest-less (refused) table instead of a
            # readable silently-partial one — same fail-fast contract
            # as first write. Cost: a crashed append requires a
            # rebuild; this layer is a derived cache of the fact table,
            # so rebuild is always legal.
            os.remove(meta_path)
        elif os.path.isdir(path) and any(
            not e.startswith((".", "_")) for e in os.listdir(path)
        ):
            # data but no manifest = a crashed prior write. The natural
            # operator retry must NOT stack new blobs on the partial
            # leftovers and then re-validate the mix with a fresh
            # manifest — refuse; rebuild with mode='overwrite'.
            raise ValueError(
                f"append refused: {path} holds data but no {_META_NAME} "
                "(crashed prior write?) — rebuild with mode='overwrite'"
            )
    writer = blobs.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # manifest AFTER the data write: a crash mid-write leaves a
    # manifest-less directory that read_sketch_table refuses, instead
    # of a valid-looking table with partial data
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def read_sketch_table(
    spark: SparkSession,
    path: str,
    expect_kind: str | None = None,
    expect_params: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Read a sketch table → (blobs DataFrame, manifest).

    Fails fast driver-side when the manifest is missing (partial write)
    or the caller's expected kind/params don't match — the conditions
    under which a blob merge would corrupt silently.
    """
    meta_path = os.path.join(path, _META_NAME)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"{path} has no {_META_NAME} — not a sketch table, or a "
            "crashed write; rebuild it"
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"sketch table format {meta.get('format_version')} != "
            f"{FORMAT_VERSION}"
        )
    if expect_kind is not None and meta["sketch_kind"] != expect_kind:
        raise ValueError(
            f"sketch table holds {meta['sketch_kind']!r}, caller expected "
            f"{expect_kind!r} — merging mismatched sketches corrupts"
        )
    if expect_params is not None and meta["params"] != expect_params:
        raise ValueError(
            f"sketch table params {meta['params']} != expected "
            f"{expect_params}"
        )
    return spark.read.parquet(path), meta


def compact_sketch_table(spark: SparkSession, path: str, factory) -> dict:
    """Merge duplicate-key blob rows and rewrite the table atomically.

    Incremental producers (a streaming ``foreachBatch``, an hourly
    delta job) APPEND one leaf row per key per delivery; readers stay
    correct because every rollup path merges by key anyway
    (:func:`tgdigest_spark.agg.merge_blobs_by_key`,
    :func:`tgdigest_spark.api.sliding_windows_from_leaves`) — but each
    append adds files and duplicate rows that every refresh re-merges.
    Compaction folds them once: one row per key tuple, blob = merge of
    the key's blobs. For register sketches (HLL/CM/Bloom/KMV/DDSketch)
    the folded blob is BIT-identical to any other merge order; rank
    sketches (t-digest/KLL) change bytes within their published bound —
    the same contract as any merge topology.

    ``factory`` must construct the manifest's kind/params (validated
    per blob pair by the MAGIC headers at merge time; pass the same
    factory the rollups use). No-op when every key tuple is already
    unique. Crash contract: data is swapped in atomically, the manifest
    is rewritten after the swap — a crash between the two leaves a
    manifest-less directory that :func:`read_sketch_table` refuses
    (rebuild is always legal; the table is a derived cache).

    Returns {rows_before, rows_after, compacted}.
    """
    from ..agg import merge_blobs_by_key

    df, meta = read_sketch_table(spark, path)
    keys, blob_col = meta["keys"], meta["blob_col"]
    # one pass for both the row count and the key cardinality — the
    # common already-compact case pays a single scan, not two
    stats = df.agg(
        F.count(F.lit(1)).alias("rows"),
        # struct-wrapped so a null key still counts as a group, same as
        # the groupBy in merge_blobs_by_key
        F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias("keys"),
    ).collect()[0]
    rows_before, n_keys = int(stats["rows"]), int(stats["keys"])
    if n_keys == rows_before:
        return {
            "rows_before": int(rows_before),
            "rows_after": int(rows_before),
            "compacted": False,
        }
    merged = merge_blobs_by_key(df, keys, factory, blob_col=blob_col)
    import uuid

    from .upsert import _atomic_swap

    tmp = path.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    writer = merged.write.mode("overwrite")
    if meta["partition_by"]:
        writer = writer.partitionBy(*meta["partition_by"])
    writer.parquet(tmp)
    _atomic_swap(tmp, path)
    with open(os.path.join(path, _META_NAME), "w") as fh:
        json.dump(meta, fh, indent=1)
    return {
        "rows_before": int(rows_before),
        "rows_after": int(n_keys),
        "compacted": True,
    }
