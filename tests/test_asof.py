"""asof_join vs pandas merge_asof (the single-node reference semantics)
plus the struct-carry and plan-shape guarantees."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _mk_frames(seed: int, n_left=400, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_left), "s"),
            "lval": rng.normal(size=n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_right), "s"),
            "rval": rng.normal(size=n_right).round(3),
            "tag": rng.integers(0, 1000, n_right),
        }
    )
    # unique (k, ts) on the right: merge_asof and the window carry are
    # only both deterministic without right-side timestamp ties
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    return left, right


def _spark_asof(spark, left, right, **kw):
    from tgdigest_spark.operators.asof import asof_join

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="ts",
        **kw,
    )
    pdf = out.toPandas().sort_values(["k", "ts", "lval"]).reset_index(drop=True)
    return pdf


def _pandas_asof(left, right, direction="backward", strict=False, tol=None):
    kw = {}
    if tol is not None:
        kw["tolerance"] = pd.Timedelta(microseconds=tol)
    m = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        by="k",
        direction=direction,
        allow_exact_matches=not strict,
        **kw,
    )
    return m.sort_values(["k", "ts", "lval"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_pandas(spark, direction, strict):
    left, right = _mk_frames(seed=42)
    got = _spark_asof(spark, left, right, direction=direction, strict=strict)
    want = _pandas_asof(left, right, direction=direction, strict=strict)
    for col in ("rval", "tag"):
        pd.testing.assert_series_equal(
            got[col], want[col], check_names=False, check_dtype=False
        )
    pd.testing.assert_series_equal(
        got["ts_r"], want["ts_r"], check_names=False, check_dtype=False
    )


def test_asof_tolerance(spark):
    left, right = _mk_frames(seed=7)
    tol = 3600 * 10**6  # 1 hour in µs
    got = _spark_asof(spark, left, right, tolerance_us=tol)
    want = _pandas_asof(left, right, tol=tol)
    pd.testing.assert_series_equal(
        got["rval"], want["rval"], check_names=False, check_dtype=False
    )


def test_asof_null_field_does_not_reach_through(spark):
    """The matched right row's NULL field must stay NULL — carrying
    columns independently (instead of one struct) would pull the value
    from an older right row."""
    left = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-10")], "lval": [0.0]}
    )
    rdf = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 111.0, "old"),
            (1, "2024-01-05 00:00:00", None, "new"),
        ],
        "k long, ts string, rval double, tag string",
    ).withColumn("ts", F.to_timestamp("ts"))
    from tgdigest_spark.operators.asof import asof_join

    row = asof_join(
        spark.createDataFrame(left), rdf, on="k", left_ts="ts"
    ).collect()[0]
    assert row["tag"] == "new"
    assert row["rval"] is None  # NOT 111.0


def test_asof_right_tiebreak_largest_wins(spark):
    left = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-10")], "lval": [0.0]}
    )
    from tgdigest_spark.operators.asof import asof_join

    # tied right rows on the qualifying side of the left ts for each
    # direction: before it for backward, after it for forward
    for direction, rts in (
        ("backward", "2024-01-05 00:00:00"),
        ("forward", "2024-01-15 00:00:00"),
    ):
        rows = [(1, rts, float(t), t) for t in (3, 9, 1)]
        rdf = spark.createDataFrame(
            rows, "k long, ts string, rval double, tag long"
        ).withColumn("ts", F.to_timestamp("ts"))
        row = asof_join(
            spark.createDataFrame(left),
            rdf,
            on="k",
            left_ts="ts",
            direction=direction,
            right_tiebreak="tag",
        ).collect()[0]
        assert row["tag"] == 9, direction


def test_asof_no_match_and_empty_right(spark):
    left = pd.DataFrame(
        {"k": [5], "ts": [pd.Timestamp("2024-01-01")], "lval": [1.0]}
    )
    _, right = _mk_frames(seed=3)
    right = right[right["k"] != 5]
    got = _spark_asof(spark, left, right)
    assert got["rval"].isna().all() and got["ts_r"].isna().all()
    # empty right side (schema must be explicit: pandas inference can't
    # see types in a 0-row frame)
    from tgdigest_spark.operators.asof import asof_join

    empty_r = spark.createDataFrame(right).where(F.lit(False))
    got2 = asof_join(
        spark.createDataFrame(left), empty_r, on="k", left_ts="ts"
    ).toPandas()
    assert got2["rval"].isna().all()


def _spark_asof_intervals(spark, left, right, **kw):
    from tgdigest_spark.operators.asof import asof_join_intervals

    out = asof_join_intervals(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="ts",
        **kw,
    )
    return out.toPandas().sort_values(["k", "ts", "lval"]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_intervals_matches_pandas(spark, direction, strict):
    left, right = _mk_frames(seed=42)
    got = _spark_asof_intervals(
        spark, left, right, direction=direction, strict=strict
    )
    want = _pandas_asof(left, right, direction=direction, strict=strict)
    for col in ("rval", "tag"):
        pd.testing.assert_series_equal(
            got[col], want[col], check_names=False, check_dtype=False
        )
    pd.testing.assert_series_equal(
        got["ts_r"], want["ts_r"], check_names=False, check_dtype=False
    )


def test_asof_intervals_tolerance_and_tiebreak(spark):
    left, right = _mk_frames(seed=7)
    tol = 3600 * 10**6
    got = _spark_asof_intervals(spark, left, right, tolerance_us=tol)
    want = _pandas_asof(left, right, tol=tol)
    pd.testing.assert_series_equal(
        got["rval"], want["rval"], check_names=False, check_dtype=False
    )
    # tied right timestamps: largest tiebreak wins, both directions
    from tgdigest_spark.operators.asof import asof_join_intervals

    lone = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-01-10")], "lval": [0.0]}
    )
    for direction, rts in (
        ("backward", "2024-01-05 00:00:00"),
        ("forward", "2024-01-15 00:00:00"),
    ):
        rdf = spark.createDataFrame(
            [(1, rts, float(t), t) for t in (3, 9, 1)],
            "k long, ts string, rval double, tag long",
        ).withColumn("ts", F.to_timestamp("ts"))
        row = asof_join_intervals(
            spark.createDataFrame(lone),
            rdf,
            on="k",
            left_ts="ts",
            direction=direction,
            right_tiebreak="tag",
        ).collect()[0]
        assert row["tag"] == 9, direction

    # NULL tiebreak among the ties: both formulations must agree (the
    # NULL row wins — sorted last under asc_nulls_last, same as
    # asof_join's carry order)
    from tgdigest_spark.operators.asof import asof_join

    rdf = spark.createDataFrame(
        [
            (1, "2024-01-05 00:00:00", 1.0, 3),
            (1, "2024-01-05 00:00:00", 2.0, None),
        ],
        "k long, ts string, rval double, tag long",
    ).withColumn("ts", F.to_timestamp("ts"))
    args = dict(on="k", left_ts="ts", right_tiebreak="tag")
    ldf = spark.createDataFrame(lone)
    a = asof_join(ldf, rdf, **args).collect()[0]
    b = asof_join_intervals(ldf, rdf, **args).collect()[0]
    assert (a["rval"], a["tag"]) == (b["rval"], b["tag"])


def test_asof_intervals_null_semantics_and_no_match(spark):
    """Same three-valued NULL rules as asof_join, plus left-join
    semantics for keys absent from the right side."""
    from tgdigest_spark.operators.asof import asof_join_intervals

    left = spark.createDataFrame(
        [
            (None, "2024-01-10 00:00:00", 1.0),  # NULL key
            (1, None, 2.0),  # NULL ts
            (1, "2024-01-10 00:00:00", 3.0),  # real match
            (1, "2024-01-02 00:00:00", 4.0),  # before first change
            (9, "2024-01-10 00:00:00", 5.0),  # key absent from right
        ],
        "k long, ts string, lval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (None, "2024-01-05 00:00:00", 99.0),
            (1, None, 98.0),
            (1, "2024-01-05 00:00:00", 7.0),
        ],
        "k long, ts string, rval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        r["lval"]: r["rval"]
        for r in asof_join_intervals(left, right, on="k").collect()
    }
    assert rows == {1.0: None, 2.0: None, 3.0: 7.0, 4.0: None, 5.0: None}


def test_asof_intervals_bucketed_right_never_exchanges(spark, tmp_path):
    """The point of the formulation: over a key-bucketed right table,
    the right lineage plans scan → window-sort → explode → join with
    NO Exchange; only the left side shuffles (by key, matching the
    buckets). The union-based asof_join re-exchanges both sides even
    when bucketed — this plan must show exactly the two left-side key
    exchanges (bin join + absent-key anti join) and no BNLJ."""
    import re

    from tgdigest_spark.operators.asof import asof_join_intervals

    left, right = _mk_frames(seed=11)
    table = "asof_bucketed_right_gate"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        (
            spark.createDataFrame(right)
            .repartition(8, "k")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / "t"))
            .saveAsTable(table)
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = asof_join_intervals(
            spark.createDataFrame(left), spark.table(table), on="k", left_ts="ts"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        ex = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        # 4 exchanges, ALL on the narrow left/bounds side: pts→(k) for
        # the bin join, the per-key bounds agg (once per range_join
        # branch — short + long-cap lineages), and anti-left→(k).
        # The bucketed right lineage itself must never exchange —
        # asserted structurally below, not by counting.
        assert len(ex) == 4, ex
        assert "BroadcastNestedLoop" not in plan
        # no Exchange may sit ABOVE any bucketed scan: walk each scan's
        # ancestor chain via the tree indentation
        lines = plan.splitlines()

        def indent(s: str) -> int:
            m = re.search(r"[+:]-", s)
            return m.start() if m else -1

        for i, line in enumerate(lines):
            if "FileScan parquet" not in line or "Bucketed: true" not in line:
                continue
            depth = indent(line)
            for j in range(i - 1, -1, -1):
                d = indent(lines[j])
                if d < depth and d >= 0:
                    assert "Exchange hashpartitioning" not in lines[j], (
                        f"bucketed scan at line {i} has Exchange ancestor: "
                        f"{lines[j]}"
                    )
                    depth = d
                if d == -1:  # root
                    break
        # and the result is still the as-of answer
        got = (
            out.toPandas().sort_values(["k", "ts", "lval"]).reset_index(drop=True)
        )
        want = _pandas_asof(left, right)
        pd.testing.assert_series_equal(
            got["rval"], want["rval"], check_names=False, check_dtype=False
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_asof_formulations_agree_on_random_frames(spark):
    """Property check: the union and intervals formulations must agree
    row-for-row on randomized frames — including NULL keys, NULL
    timestamps, and right-side (key, ts) ties with tiebreaks, the
    cases pandas merge_asof cannot express."""
    import numpy as np

    from tgdigest_spark.operators.asof import asof_join, asof_join_intervals

    for seed in (3, 17, 91):
        rng = np.random.default_rng(seed)
        base = pd.Timestamp("2024-01-01")

        def ts_col(n):
            t = base + pd.to_timedelta(rng.integers(0, 10**5, n), "s")
            return pd.Series(t).mask(rng.random(n) < 0.05, None)

        left = pd.DataFrame(
            {
                "k": pd.Series(rng.integers(0, 5, 120)).mask(
                    rng.random(120) < 0.05, None
                ),
                "ts": ts_col(120),
                "lval": np.arange(120, dtype=np.float64),
            }
        )
        right = pd.DataFrame(
            {
                "k": pd.Series(rng.integers(0, 5, 60)).mask(
                    rng.random(60) < 0.05, None
                ),
                "ts": ts_col(60),
                "rval": rng.normal(size=60).round(3),
                "tb": rng.integers(0, 8, 60),  # deliberate tie collisions
            }
        )
        ldf = spark.createDataFrame(left)
        rdf = spark.createDataFrame(right)
        for direction in ("backward", "forward"):
            for strict in (False, True):
                kw = dict(
                    on="k",
                    left_ts="ts",
                    direction=direction,
                    strict=strict,
                    right_tiebreak="tb",
                )
                a = (
                    asof_join(ldf, rdf, **kw)
                    .toPandas()
                    .sort_values("lval")
                    .reset_index(drop=True)
                )
                b = (
                    asof_join_intervals(ldf, rdf, **kw)
                    .toPandas()
                    .sort_values("lval")
                    .reset_index(drop=True)
                )
                for col in ("ts_r", "rval", "tb"):
                    pd.testing.assert_series_equal(
                        a[col], b[col], check_names=False, check_dtype=False
                    ), (seed, direction, strict)


def test_asof_plan_is_single_exchange_no_udf(spark):
    """Scale shape: one hash Exchange on the key, window codegen, no
    Python evaluation anywhere."""
    left, right = _mk_frames(seed=1)
    from tgdigest_spark.operators.asof import asof_join

    plan = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_ts="ts",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "BatchEval" not in plan


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: NULL keys match nothing — a NULL-key
    left row keeps a null payload even when NULL-key right rows exist."""
    from tgdigest_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, "2024-01-10 00:00:00", 1.0), (1, "2024-01-10 00:00:00", 2.0)],
        "k long, ts string, lval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(None, "2024-01-05 00:00:00", 99.0), (1, "2024-01-05 00:00:00", 7.0)],
        "k long, ts string, rval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {r["lval"]: r["rval"] for r in asof_join(left, right, on="k").collect()}
    assert rows == {1.0: None, 2.0: 7.0}


def test_asof_null_timestamps_never_match(spark):
    """Three-valued comparison for timestamps, mirroring the NULL-key
    rule: a NULL-ts RIGHT row matches no left row (backward would
    otherwise carry its payload onto every match-less left row), and a
    NULL-ts LEFT row matches nothing in either direction (forward's
    desc scan would otherwise hand it the minimum-ts right row)."""
    from tgdigest_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00", 1.0), (1, None, 2.0)],
        "k long, ts string, lval double",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, "2024-01-20 00:00:00", 7.0)],
        "k long, ts string, rval double",
    ).withColumn("ts", F.to_timestamp("ts"))

    # backward: left@Jan10 has no at-or-before right row (the NULL-ts
    # right row must NOT fabricate a match); NULL-ts left matches nothing
    back = {r["lval"]: r["rval"] for r in asof_join(left, right, on="k").collect()}
    assert back == {1.0: None, 2.0: None}

    # forward: left@Jan10 → Jan20 right row; NULL-ts left still nothing
    fwd = {
        r["lval"]: r["rval"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert fwd == {1.0: 7.0, 2.0: None}


def test_build_validity_intervals_chain_and_current(spark):
    """Per key: versions chain (valid_to == next valid_from), exactly
    one current version, ties chain through the tiebreak."""
    from tgdigest_spark.operators.asof import build_validity_intervals

    rows = [
        (1, "2024-01-01 00:00:00", 10),
        (1, "2024-01-05 00:00:00", 11),
        (1, "2024-01-05 00:00:00", 12),  # tie on ts → tiebreak chains
        (2, "2024-02-01 00:00:00", 20),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts string, change_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    v = build_validity_intervals(df, key="k", ts="ts", tiebreak="change_id")
    got = {
        r["change_id"]: (r["valid_from"], r["valid_to"], r["is_current"])
        for r in v.collect()
    }
    assert got[10][1] == got[11][0] and not got[10][2]
    # tied versions: 11's interval is zero-length ending at 12's start
    assert got[11][1] == got[12][0] and got[11][0] == got[11][1]
    assert got[12][1] is None and got[12][2]
    assert got[20][1] is None and got[20][2]
    # exactly one current per key
    cur = v.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur) and len(cur) == 2
