"""Transcript table layout: how the fact table is written at scale.

Layout contract (FIXTURES.md §1, SURVEY.md §1.3):
* partitioned by ``days(ts)`` — replaces the reference's
  (channel, date, id) index (cache.rs:107-108) with partition pruning;
* sorted within partitions by (conv_id, turn_idx) — per-conversation
  operators (lag latency, grouped sketches, album-style windows) read
  co-located, pre-sorted runs; parquet min/max zone maps give the
  early-termination effect of the reference's sorted-scan break
  (post.rs:35-37).

Iceberg is the intended catalog (MERGE INTO, snapshots, hidden
partitioning); its jars aren't in this image, so the writer falls back
to plain partitioned parquet with the identical physical layout. The
checkpoint layer (plans/) supplies the snapshot/incremental semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_transcripts_table(
    df: DataFrame,
    path_or_table: str,
    use_iceberg: bool | None = None,
    target_file_rows: int = 1_000_000,
) -> None:
    """Write the transcripts fact table in the engine's layout.

    ``target_file_rows`` bounds rows per output file via
    ``spark.sql.files.maxRecordsPerFile`` (set for the duration of the
    write, then restored): the repartition("ts_day") above funnels each
    day into one task, so without the cap a hot day would produce one
    giant file no executor can split on read.
    """
    spark = df.sparkSession
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark)
    staged = (
        df.withColumn("ts_day", F.to_date("ts"))
        .repartition("ts_day")
        .sortWithinPartitions("ts_day", "conv_id", "turn_idx")
    )
    conf_key = "spark.sql.files.maxRecordsPerFile"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, str(int(target_file_rows)))
    try:
        if use_iceberg:  # exercised by tests/test_iceberg_path.py when
            # the Iceberg runtime jar is on the classpath (recipe in
            # .claude/skills/verify/SKILL.md)
            (
                staged.drop("ts_day")
                .writeTo(path_or_table)
                .partitionedBy(F.days(F.col("ts")))
                .createOrReplace()
            )
        else:
            staged.write.mode("overwrite").partitionBy("ts_day").parquet(
                path_or_table
            )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def read_transcripts(
    spark, path_or_table: str, keep_partition_col: bool = True
) -> DataFrame:
    """Read the layout. ``ts_day`` stays by default: it is the pruning
    key ``range_scan`` needs — dropping it up front silently disables
    partition pruning for every downstream range query (the projection
    removes the column the predicate must bind to). Pass
    ``keep_partition_col=False`` for a schema-clean frame when no
    range queries will follow."""
    df = spark.read.parquet(path_or_table)
    if not keep_partition_col and "ts_day" in df.columns:
        df = df.drop("ts_day")
    return df


def range_scan(
    df: DataFrame, start: str, end: str, ts_col: str = "ts"
) -> DataFrame:
    """Closed-interval timestamp range over the layout, WITH pruning.

    Iceberg's hidden ``days(ts)`` partitioning derives the partition
    predicate from the ``ts`` range automatically; on the plain-parquet
    fallback layout the ``ts_day`` predicate must be written explicitly
    or the scan lists EVERY partition (empty PartitionFilters) and
    relies on row-group stats alone — at 100 TB that is the difference
    between listing 3 directories and listing ~36,500."""
    out = df.where(F.col(ts_col).between(start, end))
    if "ts_day" in df.columns:
        out = out.where(
            F.col("ts_day").between(
                F.to_date(F.lit(start)), F.to_date(F.lit(end))
            )
        )
    return out
