"""SparkSession factory with the engine's standard configuration.

Design notes (scale): every setting here is chosen so the same code
runs unchanged on a real multi-executor cluster — local[N] is only the
test harness. AQE handles runtime re-planning (skew joins, partition
coalescing); Arrow powers all pandas-UDF traffic; session timezone is
pinned to UTC so results are comparable with the DuckDB oracle and the
reference (which stores unix seconds UTC, see
/root/reference/src/post.rs:9).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tgdigest-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the engine.

    ``cores``: int N → master local[N]; "*" → local[*]; None → env
    ``SPARK_GRAFT_CPUS`` or all cores. On a real cluster, pass
    master via spark-submit and leave ``cores`` None — an existing
    session is reused untouched.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        ncores = (os.cpu_count() or 8) if str(cores) == "*" else int(cores)
        shuffle_partitions = max(8, int(ncores))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Sketch partials are tiny (KBs); keep auto-broadcast on for dims.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Allow subset-of-join-keys co-partitioning (Spark 4 defaults
        # this to true = require ALL keys): a side already hash-
        # partitioned on a join-key subset — a key-bucketed table
        # joined on (key, bin), e.g. asof_join_intervals — is reused
        # as-is and only the other side shuffles to match. Plan-shape
        # only; results are identical either way.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
