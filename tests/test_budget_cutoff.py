"""select_until_budget vs the naive global-window cumsum (identical
semantics, distributed plan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window, functions as F


@pytest.fixture(scope="module")
def rows_df(spark):
    rng = np.random.default_rng(23)
    vals = rng.integers(1, 500, 800)
    # duplicate order keys on purpose: ties must share bins
    key = rng.integers(0, 200, 800)
    return spark.createDataFrame(
        [(int(i), int(k), int(v)) for i, (k, v) in enumerate(zip(key, vals))],
        "id long, quality long, tokens long",
    )


def _naive(df, budget, descending=True):
    o = F.col("quality").desc() if descending else F.col("quality").asc()
    w = Window.orderBy(o, "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(F.col("tokens").cast("decimal(30,6)")).over(w)
    out = (
        df.withColumn("cum", cum)
        .where(F.col("cum") <= budget)
        .select("id", F.col("cum").cast("double").alias("cum"))
    )
    return {r["id"]: r["cum"] for r in out.collect()}


@pytest.mark.parametrize("budget", [1000, 37_500, 10**9])
@pytest.mark.parametrize("descending", [True, False])
def test_budget_cutoff_matches_naive(spark, rows_df, budget, descending):
    from tgdigest_spark.operators.sampling import select_until_budget

    got = select_until_budget(
        rows_df,
        "quality",
        "tokens",
        budget,
        descending=descending,
        tiebreak="id",
        n_bins=16,
    )
    got_map = {r["id"]: r["cum_amount"] for r in got.select("id", "cum_amount").collect()}
    assert got_map == _naive(rows_df, budget, descending)


def test_budget_cutoff_layout_independent(spark, rows_df):
    from tgdigest_spark.operators.sampling import select_until_budget

    a = select_until_budget(
        rows_df, "quality", "tokens", 20_000, tiebreak="id", n_bins=8
    )
    b = select_until_budget(
        rows_df.repartition(13), "quality", "tokens", 20_000, tiebreak="id", n_bins=64
    )
    ka = sorted(r["id"] for r in a.select("id").collect())
    kb = sorted(r["id"] for r in b.select("id").collect())
    assert ka == kb and ka


def test_budget_cutoff_no_single_partition_window(spark, rows_df):
    """The point of the operator: the cumsum window partitions by bin —
    no Exchange SinglePartition anywhere in the plan."""
    from tgdigest_spark.operators.sampling import select_until_budget

    plan = (
        select_until_budget(
            rows_df, "quality", "tokens", 20_000, tiebreak="id"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "Exchange hashpartitioning(_bin" in plan


def test_budget_cutoff_rejects_negative_amounts(spark):
    """Bin pruning assumes a monotone running sum; negative amounts
    would silently diverge from the naive window, so they must raise."""
    from tgdigest_spark.operators.sampling import select_until_budget

    df = spark.createDataFrame(
        [(1, 10, 60), (2, 5, -20), (3, 1, 30)], "id long, quality long, tokens long"
    )
    with pytest.raises(ValueError, match="non-negative"):
        select_until_budget(df, "quality", "tokens", 50, tiebreak="id").collect()
