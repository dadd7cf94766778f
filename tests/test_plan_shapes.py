"""Plan-shape regression guards: the physical properties the engine's
scale story depends on must survive refactors (PLANS.md rationale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf01_dir):
    ev = spark.read.parquet(f"{sf01_dir}/events.parquet")
    q = ev.where(F.col("ts") > "2024-02-01").select("event_id", "value")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts," in plan
    # column pruning: only 3 of 6 columns in ReadSchema
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "event_id" in read_schema and "value" in read_schema
    assert "props" not in read_schema and "event_type" not in read_schema


def test_topk_uses_window_group_limit(spark, sf01_dir):
    from tgdigest_spark.driver_queries import REGISTRY

    plan = _plan(REGISTRY["topk_per_metric"][0](spark, sf01_dir))
    # partial (map-side) + final group limits around the exchange
    assert plan.count("WindowGroupLimit") == 2
    assert "Partial" in plan and "Final" in plan


def test_star_join_broadcasts(spark, sf01_dir):
    from tgdigest_spark.driver_queries import REGISTRY

    plan = _plan(REGISTRY["join_enrich_topn"][0](spark, sf01_dir))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_pricing_summary_partial_agg(spark, sf01_dir):
    from tgdigest_spark.driver_queries import REGISTRY

    plan = _plan(REGISTRY["pricing_summary"][0](spark, sf01_dir))
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_global_sketch_has_no_row_shuffle(spark, transcripts):
    from tgdigest_spark.agg import _BLOB_SCHEMA  # noqa: F401
    from pyspark.sql.types import BinaryType, StructField, StructType
    import pandas as pd
    from tgdigest_spark.sketches.tdigest import TDigest

    vals = transcripts.select(F.length("text").cast("double").alias("v"))

    def build(batches):
        sk = TDigest(100)
        for pdf in batches:
            sk.update(pdf["v"])
        yield pd.DataFrame({"sketch": [sk.serialize()]})

    partials = vals.mapInPandas(
        build, schema=StructType([StructField("sketch", BinaryType())])
    )
    plan = _plan(partials)
    assert "Exchange" not in plan  # partials are strictly map-side


# ---------------------------------------------------------------------------
# extreme skew + multi-key grouped sketches
# ---------------------------------------------------------------------------

def test_grouped_sketch_extreme_skew(spark):
    """One key holds 100k rows, 2000 keys hold 3 rows each — both the
    map-side-combine and salted topologies must stay correct."""
    from tgdigest_spark.agg import sketch_by_key, with_quantiles
    from tgdigest_spark.sketches.tdigest import TDigest

    rng = np.random.default_rng(4)
    hot = [("hot", float(v)) for v in rng.normal(100, 10, 100_000)]
    cold = [
        (f"cold{i}", float(v))
        for i in range(2000)
        for v in rng.normal(i, 1, 3)
    ]
    df = spark.createDataFrame(hot + cold, "k string, v double").repartition(16)
    fact = lambda: TDigest(200)  # noqa: E731
    for method in ("combine", "salted"):
        out = with_quantiles(
            sketch_by_key(df, ["k"], "v", fact, method=method),
            fact,
            [0.5],
        )
        rows = {r["k"]: r["p50"] for r in out.collect()}
        assert len(rows) == 2001
        assert abs(rows["hot"] - 100) < 1.0
        assert abs(rows["cold1500"] - 1500) < 3.0


def test_grouped_sketch_multi_key(spark, transcripts):
    from tgdigest_spark.agg import sketch_by_key, with_quantiles
    from tgdigest_spark.sketches.tdigest import TDigest

    fact = lambda: TDigest(200)  # noqa: E731
    has_tool = transcripts.where(F.col("tool").isNotNull())
    out = with_quantiles(
        sketch_by_key(
            has_tool, ["role", "tool"], F.length("text").cast("double"), fact
        ),
        fact,
        [0.5],
    ).collect()
    assert len(out) > 5
    exact = {
        (r["role"], r["tool"]): r["m"]
        for r in has_tool.groupBy("role", "tool")
        .agg(F.expr("percentile(length(text), 0.5)").alias("m"))
        .collect()
    }
    for r in out[:10]:
        m = exact[(r["role"], r["tool"])]
        assert abs(r["p50"] - m) <= max(0.06 * m, 1.0)
