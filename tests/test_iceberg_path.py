"""Iceberg catalog path: executable whenever the Iceberg Spark runtime
is on the classpath (skipped otherwise — jars are absent in the default
image; see .claude/skills/verify/SKILL.md for the one-line recipe that
adds them)."""

import pytest
from pyspark.sql import functions as F


def _available(spark) -> bool:
    from tgdigest_spark.sources.transcripts import iceberg_available

    return iceberg_available(spark)


@pytest.fixture()
def iceberg_spark(spark, tmp_path):
    if not _available(spark):
        pytest.skip(
            "Iceberg runtime not on the classpath "
            "(spark-submit --packages org.apache.iceberg:"
            "iceberg-spark-runtime-4.0_2.13:<ver>, or drop the jar into "
            "$SPARK_HOME/jars — see the verify skill)"
        )
    # Iceberg catalogs resolve lazily, so a runtime conf is enough
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    return spark


def _transcripts(spark, n=200):
    return spark.createDataFrame(
        [
            (f"c{i % 5}", i, "user", f"turn {i}", None,
             f"2024-01-{1 + i % 3:02d} 10:00:00")
            for i in range(n)
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_iceberg_write_days_partitioning(iceberg_spark):
    from tgdigest_spark.sources.transcripts import write_transcripts_table

    spark = iceberg_spark
    df = _transcripts(spark)
    write_transcripts_table(df, "it.db.transcripts", use_iceberg=True)
    out = spark.table("it.db.transcripts")
    assert out.count() == 200
    # hidden days(ts) partitioning: the ts range predicate alone must
    # prune to one partition's files
    one_day = out.where(
        F.col("ts").between("2024-01-01 00:00:00", "2024-01-01 23:59:59")
    )
    assert one_day.count() == df.where(F.dayofmonth("ts") == 1).count()
    files = spark.sql(
        "SELECT partition FROM it.db.transcripts.files"
    ).collect()
    assert len({str(r["partition"]) for r in files}) == 3  # 3 days


def test_iceberg_merge_into_idempotent(iceberg_spark):
    from tgdigest_spark.sources.transcripts import write_transcripts_table
    from tgdigest_spark.sources.upsert import merge_into_iceberg

    spark = iceberg_spark
    write_transcripts_table(
        _transcripts(spark), "it.db.t_merge", use_iceberg=True
    )
    batch = spark.createDataFrame(
        [
            ("c0", 0, "user", "UPDATED", None, "2024-01-01 10:00:00"),
            ("c9", 999, "user", "NEW", None, "2024-01-02 10:00:00"),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    merge_into_iceberg(spark, "it.db.t_merge", batch, ["conv_id", "turn_idx"])
    t = spark.table("it.db.t_merge")
    assert t.count() == 201  # one update, one insert
    assert (
        t.where((F.col("conv_id") == "c0") & (F.col("turn_idx") == 0))
        .collect()[0]["text"]
        == "UPDATED"
    )
    # ST8: re-merging the same batch is a content no-op
    merge_into_iceberg(spark, "it.db.t_merge", batch, ["conv_id", "turn_idx"])
    assert spark.table("it.db.t_merge").count() == 201
