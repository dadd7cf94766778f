"""SQL surface (sqlfns.register_sketch_sql): the sketches reachable
from plain spark.sql, pinned against the DataFrame API and local
single-process folds."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tgdigest_spark.sketches import HLL, KLL, Bloom, TDigest
from tgdigest_spark.sqlfns import register_sketch_sql, sketch_from_blob


@pytest.fixture(scope="module")
def sql_events(spark, sf001_dir):
    register_sketch_sql(spark)
    spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).createOrReplaceTempView("sqlfns_events")
    return "sqlfns_events"


def _local_groups(spark, view):
    rows = spark.sql(
        f"SELECT event_type, CAST(user_id AS STRING) AS u, value "
        f"FROM {view}"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["event_type"], ([], []))
        groups[r["event_type"]][0].append(r["u"])
        groups[r["event_type"]][1].append(r["value"])
    return groups


def test_hll_estimate_matches_dataframe_path(spark, sql_events, sf001_dir):
    """tg_hll_estimate == api.grouped_distinct_count per group — the
    SQL build sees the whole group at once, the DataFrame path builds
    per-partition partials and merges; register max is lossless, so
    the two estimates must be EQUAL, not just close."""
    from tgdigest_spark.api import grouped_distinct_count

    got = {
        r["event_type"]: r["est"]
        for r in spark.sql(
            f"SELECT event_type, tg_hll_estimate(CAST(user_id AS STRING)) "
            f"AS est FROM {sql_events} GROUP BY event_type"
        ).collect()
    }
    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    want = {
        r["event_type"]: r["distinct_est"]
        for r in grouped_distinct_count(
            ev, ["event_type"], F.col("user_id").cast("string"), p=14
        ).collect()
    }
    assert got == want and got


def test_merge_agg_bitexact_vs_direct_group_blob(spark, sql_events):
    """Leaf blobs per (type, day) re-aggregated with tg_merge must be
    BYTE-identical to a one-shot tg_hll_sketch over the whole group,
    and to a local single-process fold — the SQL form of the
    merge_equals_direct associativity contract."""
    merged = {
        r["event_type"]: bytes(r["s"])
        for r in spark.sql(
            f"""
            WITH leaves AS (
                SELECT event_type, CAST(ts AS DATE) AS d,
                       tg_hll_sketch(CAST(user_id AS STRING)) AS sketch
                FROM {sql_events} GROUP BY event_type, CAST(ts AS DATE)
            )
            SELECT event_type, tg_merge(sketch) AS s
            FROM leaves GROUP BY event_type
            """
        ).collect()
    }
    direct = {
        r["event_type"]: bytes(r["s"])
        for r in spark.sql(
            f"SELECT event_type, tg_hll_sketch(CAST(user_id AS STRING)) "
            f"AS s FROM {sql_events} GROUP BY event_type"
        ).collect()
    }
    local = {
        t: HLL(14).update(np.array(us, dtype=object)).serialize()
        for t, (us, _vs) in _local_groups(spark, sql_events).items()
    }
    assert merged == direct == local and merged


def test_quantile_aggs_match_local_folds(spark, sql_events):
    """tg_quantile / tg_kll_quantile per group equal the same sketch
    built locally from the group's values (single build each side —
    no merge-tree ambiguity, so equality is exact)."""
    got = {
        r["event_type"]: (r["td"], r["kll"])
        for r in spark.sql(
            f"""
            SELECT event_type, tg_quantile(value, 0.95) AS td,
                   tg_kll_quantile(value, 0.95) AS kll
            FROM {sql_events} GROUP BY event_type
            """
        ).collect()
    }
    for t, (_us, vs) in _local_groups(spark, sql_events).items():
        arr = np.array([v for v in vs if v is not None], dtype=np.float64)
        td = float(TDigest(200).update(arr).quantile(0.95))
        kll = float(KLL(200).update(arr).quantile(0.95))
        assert got[t] == (td, kll)


def test_blob_scalars_roundtrip(spark, sql_events):
    """tg_blob_distinct / tg_blob_quantile on blobs built in SQL equal
    local deserialization; tg_bloom_contains finds every member and
    rejects fresh non-members (FPR-bounded)."""
    row = spark.sql(
        f"""
        WITH b AS (
            SELECT tg_hll_sketch(CAST(user_id AS STRING)) AS h,
                   tg_tdigest_sketch(value) AS t,
                   tg_bloom_sketch(CAST(user_id AS STRING)) AS bl
            FROM {sql_events}
        )
        SELECT tg_blob_distinct(h) AS d, tg_blob_quantile(t, 0.5) AS q,
               h, t, bl
        FROM b
        """
    ).collect()[0]
    assert row["d"] == sketch_from_blob(bytes(row["h"])).estimate()
    assert row["q"] == float(
        sketch_from_blob(bytes(row["t"])).quantile(0.5)
    )
    bloom = Bloom.deserialize(bytes(row["bl"]))
    spark.sql(
        f"SELECT DISTINCT CAST(user_id AS STRING) AS u FROM {sql_events}"
    ).createOrReplaceTempView("sqlfns_members")
    spark.createDataFrame(
        [(f"absent-{i}",) for i in range(2000)], "u string"
    ).createOrReplaceTempView("sqlfns_absent")
    spark.createDataFrame(
        [(bytes(row["bl"]),)], "s binary"
    ).createOrReplaceTempView("sqlfns_bloomblob")
    hits = spark.sql(
        """
        SELECT SUM(CASE WHEN tg_bloom_contains(b.s, m.u) THEN 1 ELSE 0 END)
                   AS member_hits
        FROM sqlfns_members m CROSS JOIN sqlfns_bloomblob b
        """
    ).collect()[0]["member_hits"]
    n_members = spark.table("sqlfns_members").count()
    assert hits == n_members  # no false negatives, ever
    fp = spark.sql(
        """
        SELECT SUM(CASE WHEN tg_bloom_contains(b.s, a.u) THEN 1 ELSE 0 END)
                   AS fp
        FROM sqlfns_absent a CROSS JOIN sqlfns_bloomblob b
        """
    ).collect()[0]["fp"]
    # n=15 keys in 2^20 bits, k=7 → fpr ~ (7*15/2^20)^7 ≈ 0: allow slack
    assert fp <= 2
    # local parity on a sample of members
    some = [r["u"] for r in spark.table("sqlfns_members").collect()[:5]]
    assert bool(np.all(bloom.contains(np.array(some, dtype=object))))


def test_null_values_dropped(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)],
        "k string, v string",
    )
    df.createOrReplaceTempView("sqlfns_nulls")
    got = {
        r["k"]: r["est"]
        for r in spark.sql(
            "SELECT k, tg_hll_estimate(v) AS est FROM sqlfns_nulls GROUP BY k"
        ).collect()
    }
    assert got["a"] == HLL(14).update(np.array(["x", "y"], dtype=object)).estimate()
    assert got["b"] == 0.0  # all-null group = empty sketch


def test_non_literal_q_raises(spark, sql_events):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        spark.sql(
            f"SELECT event_type, tg_quantile(value, value / 1000.0) AS q "
            f"FROM {sql_events} GROUP BY event_type"
        ).collect()


def test_unknown_magic_raises():
    with pytest.raises(ValueError, match="unknown sketch magic"):
        sketch_from_blob(b"ZZZZ" + b"\x00" * 16)
