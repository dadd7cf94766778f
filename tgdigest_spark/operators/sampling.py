"""Dataset splitting / sampling for training-data pipelines.

Two tiers, both shuffle-free over the fact rows:

* ``assign_splits`` — thresholds over a per-row CONTENT hash
  (``xxhash64(key, seed)``): O(1) per row, no window, the 100-TB
  default. Proportions are exact only in expectation. A content hash —
  not ``rand(seed)`` — because Spark seeds rand per PARTITION and
  consumes it in row order, so a rand-based split silently reshuffles
  whenever the physical layout changes (compaction, AQE, cluster size):
  the opposite of an auditable freeze.
* ``assign_splits_exact`` — deterministic stratified split with EXACT
  per-stratum proportions: rows are ordered inside each stratum by a
  content hash (md5 of the id — a seedless, engine-portable shuffle)
  and cut at cumulative weight boundaries via one window. Costs one
  hash-partition shuffle on the stratum key; fully SQL-expressible, so
  the driver oracle hash-verifies it (driver_queries
  train_val_split_counts).

Reproducibility contract: both assignments are pure functions of
(row key, ``seed``) — re-running on the same table, under any physical
layout, yields the same split, which is what makes a training-data
freeze auditable. NULL keys are rejected (xxhash64 ignores NULL inputs,
so every null-key row would silently land in one split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _boundaries(weights: dict[str, float]) -> list[tuple[str, float]]:
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    acc = 0.0
    out = []
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {name!r}")
        # round the running boundary: fp accumulation makes
        # 0.9 + 0.05 = 0.9500000000000001, which would pull the row
        # sitting exactly on the 0.95 cut into the wrong split (and
        # diverge from any SQL mirror written with literal 0.95)
        acc = round(acc + w / total, 12)
        out.append((name, acc))
    out[-1] = (out[-1][0], 1.0 + 1e-9)  # fp-safe last boundary
    return out


def _case(frac: Column, bounds: list[tuple[str, float]]) -> Column:
    out = None
    for name, b in bounds:
        cond = frac < F.lit(b)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    return out.otherwise(F.lit(bounds[-1][0])).alias("split")


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    key: str | Column = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Hash split: adds ``split_col`` from thresholds over
    ``xxhash64(key, seed)`` — a pure function of the row's ``key``, so
    the assignment survives repartitioning, compaction, and re-runs."""
    bounds = _boundaries(weights)
    key_col = F.col(key) if isinstance(key, str) else key
    denom = 1 << 20
    frac = (
        F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(denom)).cast("double")
        / F.lit(float(denom))
    )
    # xxhash64 IGNORES null inputs (hash degenerates to hash(seed)):
    # every null-key row would land in one split — fail loudly instead.
    frac = F.when(
        key_col.isNull(),
        F.raise_error(
            F.lit("assign_splits: null split key (fill or filter first)")
        ).cast("double"),
    ).otherwise(frac)
    return df.withColumn(split_col, _case(frac, bounds).alias(split_col))


def assign_splits_exact(
    df: DataFrame,
    weights: dict[str, float],
    by: str | Column,
    shuffle_key: Column,
    split_col: str = "split",
) -> DataFrame:
    """Exact stratified split.

    Within each ``by`` stratum, rows are ordered by ``shuffle_key`` (use
    a content hash, e.g. ``F.md5(id.cast('string'))``, so the order is a
    deterministic pseudo-shuffle) and assigned by cumulative position
    ``(row_number - 1) / stratum_count`` against the weight boundaries —
    every stratum lands within 1 row of its exact proportion.
    """
    bounds = _boundaries(weights)
    by_col = F.col(by) if isinstance(by, str) else by
    w = Window.partitionBy(by_col).orderBy(shuffle_key)
    frac = (
        (F.row_number().over(w) - F.lit(1)).cast("double")
        / F.count(F.lit(1)).over(Window.partitionBy(by_col)).cast("double")
    )
    return df.withColumn(split_col, _case(frac, bounds).alias(split_col))
