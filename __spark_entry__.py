"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` / ``oracle_sql()`` — operator registry; implementations
live in tgdigest_spark/driver_queries.py (Spark) with matching DuckDB
oracle SQL strings.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-event-type t-digest quantiles of events.value next to
    the exact percentiles — the engine's sketch path and its oracle in
    one result frame."""
    from pyspark.sql import functions as F

    from tgdigest_spark.agg import sketch_by_key, with_quantiles
    from tgdigest_spark.pyfiles import ensure_shipped
    from tgdigest_spark.sketches.tdigest import TDigest

    ensure_shipped(spark)

    events = spark.read.parquet(f"{SF0001}/events.parquet")
    factory = lambda: TDigest(200)  # noqa: E731
    blobs = sketch_by_key(events, ["event_type"], "value", factory)
    approx = with_quantiles(blobs, factory, [0.5, 0.95, 0.99])
    exact = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
        F.count(F.lit(1)).alias("n"),
    )
    return approx.join(exact, "event_type").orderBy("event_type")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tgdigest_spark.driver_queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from tgdigest_spark.driver_queries import oracle_sql as _o

    return _o()
