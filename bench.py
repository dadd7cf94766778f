#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with headline timings.

Default mode (driver contract):
    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default 32)
    python bench.py
    → {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling mode (north_rule evidence — same job at two parallelism levels):
    python bench.py --scaling
    → runs the sketch-build jobs at local[4] and local[16] in fresh,
      interleaved subprocesses (see run_scaling for why not 8/32 on a
      32-core host), reports throughput at both + efficiency.

Timing policy: each query runs once as warmup (JIT, Arrow init, file
listing) and twice timed (min taken). Spark session startup is excluded.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DATA_DIR = os.path.join(REPO, "data")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        raise ValueError(
            f"SPARK_GRAFT_SF_DIR basename {base!r} is not sf<float>; "
            "refusing to mislabel results / collide bench caches"
        ) from None


SF = _sf_from_dir(SF_DIR)


def _transcripts_path() -> str:
    from tgdigest_spark.datagen import write_transcripts

    return write_transcripts(DATA_DIR, sf=SF)


def _staged(spark, table: str) -> str:
    """Stage a driver table as multi-row-group parquet (once, untimed).

    The driver-provided files are single-row-group → every scan becomes
    one task; restaging restores the parallel-scan shape a real table
    has (a 100 TB table is thousands of files). Data is byte-identical.
    """
    dst = os.path.join(DATA_DIR, "bench_cache", f"sf{SF}", table)
    # _SUCCESS marker guards against a half-written cache from an
    # interrupted first run poisoning every later benchmark
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        (
            spark.read.parquet(f"{SF_DIR}/{table}.parquet")
            .repartition(max(CPUS, 16))
            .write.mode("overwrite")
            .parquet(dst)
        )
    return dst


def _queries(spark, transcripts):
    """name → zero-arg callable executing one headline query to completion."""
    import numpy as np
    from pyspark.sql import functions as F

    from tgdigest_spark.api import (
        distinct_count,
        grouped_quantiles,
        heavy_hitters,
        latency_quantiles,
        text_length_quantiles,
    )
    from tgdigest_spark.operators.dedup_text import lsh_candidate_pairs
    from tgdigest_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(_staged(spark, "embeddings"))
    docs = spark.read.parquet(_staged(spark, "documents"))
    lineitem = spark.read.parquet(_staged(spark, "lineitem"))

    def q_sketch_build():
        return text_length_quantiles(transcripts, [0.5, 0.95, 0.99])

    def q_grouped_sketch():
        return grouped_quantiles(
            transcripts, ["role"], F.length("text").cast("double"), [0.5, 0.95]
        ).collect()

    def q_grouped_conv():
        # per-conversation digests: the tiny-groups north-star workload
        return grouped_quantiles(
            transcripts, ["conv_id"], F.length("text").cast("double"), [0.5]
        ).count()

    def q_latency_sketch():
        return latency_quantiles(transcripts, [0.5, 0.95, 0.99])

    def q_hll_distinct():
        return distinct_count(transcripts, "conv_id", p=14)

    def q_heavy_hitters():
        return heavy_hitters(
            transcripts.where(F.col("tool").isNotNull()), "tool", k=10
        ).collect()

    def q_topk_per_metric():
        unpiv = lineitem.selectExpr(
            "l_orderkey",
            "l_linenumber",
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) as (metric, value)",
        )
        from pyspark.sql import Window

        w = Window.partitionBy("metric").orderBy(
            F.desc_nulls_last("value"), "l_orderkey", "l_linenumber"
        )
        return (
            unpiv.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .collect()
        )

    def q_pricing_summary():
        return (
            lineitem.where(F.col("l_shipdate") <= "2024-09-02 00:00:00")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_qty"),
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                )
                .cast("double")
                .alias("sum_disc_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .collect()
        )

    def q_minhash_lsh():
        return (
            lsh_candidate_pairs(docs, num_perm=128)
            .orderBy(F.desc("est_jaccard"))
            .limit(20)
            .collect()
        )

    def q_ann_cosine():
        pdf = emb.where(F.col("vec_id") < 8).toPandas().sort_values("vec_id")
        queries = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        return cosine_topk(emb, queries, pdf["vec_id"].to_numpy(), k=10).collect()

    return {
        "q_sketch_build": q_sketch_build,
        "q_grouped_sketch": q_grouped_sketch,
        "q_grouped_conv": q_grouped_conv,
        "q_latency_sketch": q_latency_sketch,
        "q_hll_distinct": q_hll_distinct,
        "q_heavy_hitters": q_heavy_hitters,
        "q_topk_per_metric": q_topk_per_metric,
        "q_pricing_summary": q_pricing_summary,
        "q_minhash_lsh": q_minhash_lsh,
        "q_ann_cosine": q_ann_cosine,
    }


def _shuffle_totals(spark):
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    stages, via the Spark UI REST API. None when the UI is off or the
    endpoint is unreachable — callers degrade to timings-only."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    url = getattr(sc, "uiWebUrl", None)
    if not url:
        return None
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{sc.applicationId}/stages", timeout=10
        ) as r:
            stages = _json.load(r)
    except Exception:
        return None
    rd = sum(int(s.get("shuffleReadBytes", 0) or 0) for s in stages)
    wr = sum(int(s.get("shuffleWriteBytes", 0) or 0) for s in stages)
    return rd, wr


def _time_queries(spark, qs: dict) -> tuple[dict, dict]:
    """warmup + 2 timed runs per query (min); shuffle read/write MB is
    the REST-metric delta around the second timed run — the measured
    per-query shuffle profile ('is this the plan you'd want at 100x')."""
    timings: dict[str, float] = {}
    shuffle_mb: dict[str, dict] = {}
    for name, fn in qs.items():
        fn()  # warmup
        t0 = time.perf_counter()
        fn()
        best = time.perf_counter() - t0
        s0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        s1 = _shuffle_totals(spark)
        timings[name] = round(best, 4)
        if s0 is not None and s1 is not None:
            shuffle_mb[name] = {
                "read_mb": round((s1[0] - s0[0]) / 1e6, 2),
                "write_mb": round((s1[1] - s0[1]) / 1e6, 2),
            }
    return timings, shuffle_mb


_BENCH_CONF = {
    # shuffle-byte deltas come from the UI REST API; keep enough stage
    # history that cumulative sums never regress mid-bench
    "spark.ui.enabled": "true",
    "spark.ui.retainedStages": "20000",
    "spark.ui.retainedJobs": "20000",
}


def run_bench() -> dict:
    from tgdigest_spark.session import get_spark

    tpath = _transcripts_path()
    spark = get_spark(
        "tgdigest-bench",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    transcripts = spark.read.parquet(tpath)
    n_turns = transcripts.count()  # also warms the file scan

    qs = _queries(spark, transcripts)
    timings, shuffle_mb = _time_queries(spark, qs)

    total = round(sum(timings.values()), 4)
    turns_per_sec = round(n_turns / timings["q_sketch_build"], 1)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "shuffle_mb": shuffle_mb,
        "sf": SF,
        "extra": {
            "n_turns": n_turns,
            "sketch_build_turns_per_sec": turns_per_sec,
            "cpus": CPUS,
        },
    }
    spark.stop()
    return result


# ---------------------------------------------------------------------------
# quantile-error mode — the BASELINE metric ("p99 quantile error") head on
# ---------------------------------------------------------------------------

def run_qerror() -> dict:
    """Measured p50..p999 error of all three quantile sketches against
    exact full-sort quantiles on the two north-star columns (turn text
    length, inter-turn latency seconds). Sketch builds run distributed
    (sketch_column); the EXACT side collects the raw column once —
    that's the measurement harness, not the engine (n at sf0.1 is
    ~370k doubles ≈ 3 MB; error measurement needs true ranks).

    Reported per (column, sketch, q):
      est            — the sketch's estimate
      rank_err       — tie-robust distance of est's rank interval from
                       q*n, normalized by n (0.0 when the interval
                       covers q*n); the t-digest/KLL contract
      rel_err        — |est - x_q| / |x_q| with x_q the item at rank
                       ceil(q*n); the DDSketch contract
      within_bound   — the sketch's own contract holds, at the SAME
                       calibration the unit tests pin:
                       t-digest delta=200: rank_err <=
                       max(8*q(1-q)/delta, 1e-3) (test_tdigest.bound)
                       KLL k=200: rank_err <= 0.013 (Karnin et al.)
                       DDSketch alpha=.01: rel_err <= alpha*1.01
    """
    import numpy as np

    from tgdigest_spark.agg import sketch_column
    from tgdigest_spark.session import get_spark
    from tgdigest_spark.sketches import KLL, DDSketch, TDigest

    from pyspark.sql import functions as F

    qs = [0.5, 0.9, 0.95, 0.99, 0.999]
    spark = get_spark(
        "tgdigest-qerror", cores=CPUS, shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    tpath = _transcripts_path()
    transcripts = spark.read.parquet(tpath)

    from tgdigest_spark.api import interturn_latency_seconds

    columns = {
        "text_length": transcripts.select(
            F.length("text").cast("double").alias("v")
        ),
        "interturn_latency_s": interturn_latency_seconds(transcripts)
        .select(F.col("latency_s").alias("v"))
        .where(F.col("v").isNotNull()),
    }
    sketches = {
        "tdigest_d200": (lambda: TDigest(200), "rank"),
        "kll_k200": (lambda: KLL(200), "rank"),
        "ddsketch_a01": (lambda: DDSketch(0.01), "rel"),
    }
    out: dict = {}
    for cname, cdf in columns.items():
        vals = np.sort(
            cdf.toPandas()["v"].to_numpy(dtype=np.float64)
        )
        n = vals.size
        col_res: dict = {"n": int(n)}
        # context row: Spark's own approx_percentile (Greenwald-Khanna,
        # accuracy=10000 → rank err <= 1e-4 claimed) — the built-in this
        # library's sketches replace; same error accounting, no bound
        # flag of ours to assert
        t0 = time.time()
        ap = cdf.agg(
            F.expr(
                f"approx_percentile(v, array({','.join(str(q) for q in qs)}),"
                " 10000)"
            ).alias("e")
        ).collect()[0]["e"]
        ap_s = round(time.time() - t0, 3)
        ap_rows = {}
        for q, est in zip(qs, [float(x) for x in ap]):
            lt = int(np.searchsorted(vals, est, side="left"))
            le = int(np.searchsorted(vals, est, side="right"))
            target = q * n
            rank_err = (
                0.0 if lt <= target <= le
                else min(abs(target - lt), abs(target - le)) / n
            )
            x_q = float(vals[max(int(np.ceil(q * n)), 1) - 1])
            ap_rows[f"p{q * 100:g}".replace(".", "")] = {
                "est": round(est, 4),
                "rank_err": round(rank_err, 6),
                "rel_err": round(
                    abs(est - x_q) / abs(x_q) if x_q else abs(est - x_q), 6
                ),
            }
        col_res["spark_approx_percentile_10k"] = {
            "build_s": ap_s, "quantiles": ap_rows,
        }
        for sname, (factory, contract) in sketches.items():
            t0 = time.time()
            sk = sketch_column(cdf, "v", factory)
            build_s = round(time.time() - t0, 3)
            ests = np.atleast_1d(sk.quantile(qs))
            rows = {}
            worst_rank = worst_rel = 0.0
            for q, est in zip(qs, ests):
                est = float(est)
                lt = int(np.searchsorted(vals, est, side="left"))
                le = int(np.searchsorted(vals, est, side="right"))
                target = q * n
                rank_err = (
                    0.0
                    if lt <= target <= le
                    else min(abs(target - lt), abs(target - le)) / n
                )
                x_q = float(vals[max(int(np.ceil(q * n)), 1) - 1])
                rel_err = abs(est - x_q) / abs(x_q) if x_q else abs(est - x_q)
                if contract == "rank":
                    if sname.startswith("tdigest"):
                        bound = max(8.0 * q * (1 - q) / 200.0, 1e-3)
                    else:
                        bound = 0.013
                    ok = rank_err <= bound
                else:
                    ok = rel_err <= 0.01 * 1.01
                worst_rank = max(worst_rank, rank_err)
                worst_rel = max(worst_rel, rel_err)
                rows[f"p{q * 100:g}".replace(".", "")] = {
                    "est": round(est, 4),
                    "rank_err": round(rank_err, 6),
                    "rel_err": round(rel_err, 6),
                    "within_bound": bool(ok),
                }
            col_res[sname] = {
                "build_s": build_s,
                "blob_bytes": len(sk.serialize()),
                "worst_rank_err": round(worst_rank, 6),
                "worst_rel_err": round(worst_rel, 6),
                "quantiles": rows,
            }
        out[cname] = col_res
    spark.stop()
    return {
        "metric": "quantile_error_vs_exact",
        "value": max(
            c["ddsketch_a01"]["quantiles"]["p99"]["rel_err"]
            for c in out.values()
        ),
        "unit": "p99_rel_err_ddsketch",
        "sf": SF,
        "columns": out,
    }


# ---------------------------------------------------------------------------
# 100x rehearsal mode
# ---------------------------------------------------------------------------

def _bucketed_rehearsal_queries(spark, big_path: str) -> dict:
    """The bucketed-layout legs: the same two conv_id-clustered queries
    whose shuffle the plain layout pays per pass (latency window 2.76 GB,
    per-conv blobs 2.4 GB at 10^8 rows — BENCH.md), over a
    bucketBy(conv_id) copy. The co-location shuffle is paid ONCE at
    write time (cached on disk like the replicated table); the queries
    should then measure ~zero shuffle."""
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_quantiles, latency_quantiles
    from tgdigest_spark.sources.transcripts import (
        read_transcripts_bucketed,
        register_bucketed_table,
        write_transcripts_bucketed,
    )

    n_buckets = max(CPUS * 2, 16)
    table = "rehearse_bucketed"
    bpath = big_path + f"_bucketed{n_buckets}"
    if not os.path.exists(os.path.join(bpath, "_SUCCESS")):
        base = spark.read.parquet(big_path)
        # align rows to their bucket before the write: one file per
        # bucket instead of (write tasks x buckets) shards — this
        # repartition IS the once-paid co-location shuffle
        write_transcripts_bucketed(
            base.repartition(n_buckets, F.col("conv_id")),
            table,
            n_buckets=n_buckets,
            path=bpath,
        )
    register_bucketed_table(spark, table, bpath, n_buckets)
    bucketed = read_transcripts_bucketed(spark, table)

    def q_latency_bucketed():
        return latency_quantiles(bucketed, [0.5, 0.95, 0.99])

    def q_grouped_conv_bucketed():
        return grouped_quantiles(
            bucketed,
            ["conv_id"],
            F.length("text").cast("double"),
            [0.5],
            method="clustered",
        ).count()

    return {
        "q_latency_bucketed": q_latency_bucketed,
        "q_grouped_conv_bucketed": q_grouped_conv_bucketed,
    }


def _temporal_rehearsal_queries(spark, target_rows: int = 10_000_000) -> dict:
    """Temporal-operator rehearsal legs at ~10^7 rows per side: orders
    replicated into a per-customer state-change stream (written
    bucketBy(custkey) ONCE, like the other rehearsal caches) plus a
    same-sized point stream. The shuffle-bytes columns are the
    evidence the round-3 verdict asked for: the union-based as-of
    shuffles points+states every run; the intervals formulation over
    the bucketed states shuffles ONLY the points; the binned
    range/overlap joins shuffle ~inputs+matches, never a per-key cross
    product. Orders' 1995-2001 dates are re-based into one synthetic
    month (the driver testdata has no temporal overlap across tables —
    BENCH.md round-3 notes)."""
    from pyspark.sql import functions as F

    from tgdigest_spark.operators.asof import (
        asof_join,
        asof_join_intervals,
        build_validity_intervals,
    )
    from tgdigest_spark.operators.range_join import (
        interval_overlap_join,
        range_join,
    )

    base_us = 1_704_067_200 * 10**6  # 2024-01-01
    span_s = 30 * 86400
    orders = spark.read.parquet(_staged(spark, "orders"))
    n_orders = orders.count()
    rep = max(1, target_rows // n_orders)
    reps = spark.range(rep).withColumnRenamed("id", "rep")
    n_buckets = max(CPUS * 2, 16)

    def synth(mult_a: int, mult_b: int):
        off_s = (
            F.col("o_orderkey") * F.lit(mult_a) + F.col("rep") * F.lit(mult_b)
        ) % F.lit(span_s)
        return (
            orders.select("o_orderkey", "o_custkey", "o_totalprice")
            .crossJoin(reps)
            .select(
                F.col("o_custkey").alias("k"),
                F.timestamp_micros(
                    F.lit(base_us) + off_s * F.lit(10**6)
                ).alias("ts"),
                (F.col("o_totalprice") + F.col("rep")).alias("v"),
            )
        )

    table = "rehearse_states_bucketed"
    spath = os.path.join(
        DATA_DIR, "bench_cache", f"rehearse_states_sf{SF}_x{rep}_b{n_buckets}"
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if not os.path.exists(os.path.join(spath, "_SUCCESS")):
        (
            synth(7919, 104729)
            .repartition(n_buckets, F.col("k"))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, "k")
            .sortBy("k", "ts")
            .option("path", spath)
            .saveAsTable(table)
        )
    else:
        spark.sql(
            f"CREATE TABLE {table} (k bigint, ts timestamp, v double) "
            f"USING parquet CLUSTERED BY (k) SORTED BY (k, ts) "
            f"INTO {n_buckets} BUCKETS LOCATION '{spath}'"
        )
    states = spark.table(table)

    ppath = os.path.join(
        DATA_DIR, "bench_cache", f"rehearse_points_sf{SF}_x{rep}"
    )
    if not os.path.exists(os.path.join(ppath, "_SUCCESS")):
        (
            synth(104729, 7919)
            .withColumnRenamed("v", "pv")
            .repartition(CPUS * 2)
            .write.mode("overwrite")
            .parquet(ppath)
        )
    points = spark.read.parquet(ppath)

    def _consume(df):
        # count() alone lets Catalyst prune the unused carry/payload
        # and delete the whole window — aggregate the PAYLOAD so the
        # measured work is the real as-of join
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.count("v").alias("n_matched")
        ).collect()

    def q_asof_union():
        # baseline formulation: cannot exploit the bucketed layout
        # (Union loses partitioning) — shuffles BOTH sides by key
        return _consume(asof_join(points, states, on="k", left_ts="ts"))

    def q_asof_intervals_bucketed():
        # bucketed formulation: states stay in place, only points move
        return _consume(asof_join_intervals(points, states, on="k", left_ts="ts"))

    def q_range_join_validity():
        iv = build_validity_intervals(states, "k", "ts")
        closed = iv.select(
            "k",
            F.unix_micros("valid_from").alias("s"),
            (
                F.coalesce(
                    F.unix_micros("valid_to") - 1,
                    F.lit(base_us + span_s * 10**6),
                )
            ).alias("e"),
            "v",
        )
        pts = points.select("k", F.unix_micros("ts").alias("p"), "pv")
        return range_join(pts, closed, point="p", start="s", end="e", on="k").count()

    def q_interval_overlap():
        # 10-minute activity windows on both sides: output ~ true
        # overlaps (sparse), shuffle ~ inputs — never |A|x|B| per key
        win = 600 * 10**6
        a = states.select(
            "k",
            F.unix_micros("ts").alias("a_s"),
            (F.unix_micros("ts") + F.lit(win)).alias("a_e"),
        )
        b = points.select(
            "k",
            F.unix_micros("ts").alias("b_s"),
            (F.unix_micros("ts") + F.lit(win)).alias("b_e"),
        )
        return interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", on="k", bin_width=win
        ).count()

    return {
        "q_asof_union": q_asof_union,
        "q_asof_intervals_bucketed": q_asof_intervals_bucketed,
        "q_range_join_validity": q_range_join_validity,
        "q_interval_overlap": q_interval_overlap,
    }


def _completed_stage_ids(spark) -> set:
    """(stageId, attemptId) of all completed stages, via UI REST."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    url = getattr(sc, "uiWebUrl", None)
    if not url:
        return set()
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{sc.applicationId}/stages"
            "?status=complete",
            timeout=10,
        ) as r:
            stages = _json.load(r)
    except Exception:
        return set()
    return {(s["stageId"], s["attemptId"]) for s in stages}


def _max_task_ms(spark, stage_ids: set) -> float | None:
    """Max single-task duration (ms) across the given stages — the
    straggler metric for skew legs. None when the UI is unreachable."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    url = getattr(sc, "uiWebUrl", None)
    if not url or not stage_ids:
        return None
    worst = 0.0
    for sid, att in stage_ids:
        try:
            with urllib.request.urlopen(
                f"{url}/api/v1/applications/{sc.applicationId}/stages/"
                f"{sid}/{att}/taskSummary?quantiles=1.0",
                timeout=10,
            ) as r:
                summ = _json.load(r)
            worst = max(worst, float(summ.get("duration", [0.0])[0]))
        except Exception:
            continue  # skipped / evicted stage
    return round(worst, 1) if worst else None


def run_skewstress(target_rows: int = 10_000_000) -> dict:
    """Zipf-hot-key stress for the temporal joins (round-4 verdict #6):
    ONE key holds ~20% of BOTH sides of a 10^7 x 10^7 as-of / range
    join. Reports wall + shuffle bytes + max single-task ms for the
    union as-of, the intervals-over-bucketed as-of, and the binned
    range join, next to a uniform-key baseline of identical size.

    What the numbers demonstrate (BENCH.md carries the discussion):
    the BINNED joins are structurally skew-resistant — their join key
    is (k, time_bin), so the hot key's rows spread across ~span/width
    bins instead of landing in one join partition; the per-key WINDOW
    legs (union as-of carry, intervals' lead()) are where a hot key
    serializes, and the mitigation is the intervals formulation whose
    window runs over the pre-bucketed narrow state stream, not the
    union of both sides.
    """
    from pyspark.sql import functions as F

    from tgdigest_spark.operators.asof import asof_join, asof_join_intervals
    from tgdigest_spark.operators.range_join import range_join
    from tgdigest_spark.session import get_spark

    spark = get_spark(
        "tgdigest-skewstress",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    base_us = 1_704_067_200 * 10**6
    span_s = 30 * 86400
    orders = spark.read.parquet(_staged(spark, "orders"))
    n_orders = orders.count()
    rep = max(1, target_rows // n_orders)
    reps = spark.range(rep).withColumnRenamed("id", "rep")
    n_buckets = max(CPUS * 2, 16)

    def synth(mult_a: int, mult_b: int, skew: bool):
        off_s = (
            F.col("o_orderkey") * F.lit(mult_a) + F.col("rep") * F.lit(mult_b)
        ) % F.lit(span_s)
        # hot key: ~20% of rows (o_orderkey % 5 == 0) collapse onto
        # key -1 on BOTH sides — a worst-practical Zipf head
        key = (
            F.when(F.col("o_orderkey") % 5 == 0, F.lit(-1)).otherwise(
                F.col("o_custkey")
            )
            if skew
            else F.col("o_custkey")
        )
        return (
            orders.select("o_orderkey", "o_custkey", "o_totalprice")
            .crossJoin(reps)
            .select(
                key.alias("k"),
                F.timestamp_micros(
                    F.lit(base_us) + off_s * F.lit(10**6)
                ).alias("ts"),
                (F.col("o_totalprice") + F.col("rep")).alias("v"),
            )
        )

    def build_side(tag: str, skew: bool):
        table = f"skew_states_{tag}"
        spath = os.path.join(
            DATA_DIR,
            "bench_cache",
            f"skew_states_{tag}_sf{SF}_x{rep}_b{n_buckets}",
        )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if not os.path.exists(os.path.join(spath, "_SUCCESS")):
            (
                synth(7919, 104729, skew)
                .repartition(n_buckets, F.col("k"))
                .write.mode("overwrite")
                .format("parquet")
                .bucketBy(n_buckets, "k")
                .sortBy("k", "ts")
                .option("path", spath)
                .saveAsTable(table)
            )
        else:
            spark.sql(
                f"CREATE TABLE {table} (k bigint, ts timestamp, v double) "
                f"USING parquet CLUSTERED BY (k) SORTED BY (k, ts) "
                f"INTO {n_buckets} BUCKETS LOCATION '{spath}'"
            )
        ppath = os.path.join(
            DATA_DIR, "bench_cache", f"skew_points_{tag}_sf{SF}_x{rep}"
        )
        if not os.path.exists(os.path.join(ppath, "_SUCCESS")):
            (
                synth(104729, 7919, skew)
                .withColumnRenamed("v", "pv")
                .repartition(CPUS * 2)
                .write.mode("overwrite")
                .parquet(ppath)
            )
        return spark.table(table), spark.read.parquet(ppath)

    def consume(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.count("v").alias("n_matched")
        ).collect()

    legs: dict[str, dict] = {}
    for tag, skew in (("uniform", False), ("hot20", True)):
        states, points = build_side(tag, skew)

        def q_union():
            return consume(asof_join(points, states, on="k", left_ts="ts"))

        def q_intervals():
            return consume(
                asof_join_intervals(points, states, on="k", left_ts="ts")
            )

        def q_range():
            from tgdigest_spark.operators.asof import build_validity_intervals

            iv = build_validity_intervals(states, "k", "ts")
            closed = iv.select(
                "k",
                F.unix_micros("valid_from").alias("s"),
                F.coalesce(
                    F.unix_micros("valid_to") - 1,
                    F.lit(base_us + span_s * 10**6),
                ).alias("e"),
                "v",
            )
            pts = points.select("k", F.unix_micros("ts").alias("p"), "pv")
            return range_join(
                pts, closed, point="p", start="s", end="e", on="k"
            ).count()

        def q_intervals_spread():
            # mitigation: forfeit the co-located layout, spread each
            # key's bins across the cluster
            return consume(
                asof_join_intervals(
                    points, states, on="k", left_ts="ts", spread_bins=True
                )
            )

        def q_range_spread():
            from tgdigest_spark.operators.asof import build_validity_intervals

            iv = build_validity_intervals(states, "k", "ts")
            closed = iv.select(
                "k",
                F.unix_micros("valid_from").alias("s"),
                F.coalesce(
                    F.unix_micros("valid_to") - 1,
                    F.lit(base_us + span_s * 10**6),
                ).alias("e"),
                "v",
            )
            pts = points.select("k", F.unix_micros("ts").alias("p"), "pv")
            return range_join(
                pts,
                closed,
                point="p",
                start="s",
                end="e",
                on="k",
                spread_bins=True,
            ).count()

        leg_fns = [
            ("asof_union", q_union),
            ("asof_intervals_bucketed", q_intervals),
            ("range_join_validity", q_range),
        ]
        def q_intervals_auto():
            # hybrid: cold keys keep the co-located bucketed path,
            # only the hot key's rows take the spread layout
            return consume(
                asof_join_intervals(
                    points,
                    states,
                    on="k",
                    left_ts="ts",
                    spread_bins="auto",
                    hot_key_rows=500_000,
                )
            )

        if skew:  # mitigation legs only matter under the hot key
            leg_fns += [
                ("asof_intervals_spread", q_intervals_spread),
                ("range_join_spread", q_range_spread),
                ("asof_intervals_auto", q_intervals_auto),
            ]
        for name, fn in leg_fns:
            fn()  # warmup
            pre_stages = _completed_stage_ids(spark)
            s0 = _shuffle_totals(spark)
            t0 = time.perf_counter()
            fn()
            wall = time.perf_counter() - t0
            s1 = _shuffle_totals(spark)
            # an empty PRE snapshot means the REST probe failed (the
            # warmup already completed stages) — diffing against it
            # would absorb every earlier leg's stragglers
            new_stages = (
                _completed_stage_ids(spark) - pre_stages
                if pre_stages
                else set()
            )
            legs[f"{name}@{tag}"] = {
                "wall_s": round(wall, 3),
                "shuffle_read_mb": round((s1[0] - s0[0]) / 1e6, 2)
                if s0 and s1
                else None,
                "max_task_ms": _max_task_ms(spark, new_stages),
            }
            print(f"{name}@{tag}: {legs[f'{name}@{tag}']}", flush=True)

    out = {
        "metric": "skewstress_temporal",
        "value": round(sum(l["wall_s"] for l in legs.values()), 3),
        "unit": "sec",
        "queries": {k: v["wall_s"] for k, v in legs.items()},
        "legs": legs,
        "sf": SF,
        "extra": {"rows_per_side": n_orders * rep, "hot_share": 0.2},
    }
    spark.stop()
    return out


def run_joinstress(target_rows: int = 40_000_000, n_dim: int = 20_000_000) -> dict:
    """Skewed EQUI-join stress for smart_equijoin (round 6): one key
    holds ~20% of a 4*10^7-row fact joined to a 20M-row dim — big
    enough that Spark genuinely cannot auto-broadcast it (a first cut
    with a 2M-row dim compressed under the 10 MB threshold: every leg
    ran as BroadcastHashJoin, 0.0 MB shuffled, nothing stressed).
    Legs:

    - ``plain@...``           df.join, AQE on (incl. its skew-join
                              splitter — the honest competitor)
    - ``plain_noskewfix@...`` df.join, AQE's skewJoin disabled — what
                              the unmitigated shuffle costs
    - ``smart@...``           plan_equijoin decision + salted hot/cold
                              execution (plan time reported separately
                              as ``plan_s`` — two map-side profile
                              scans)

    A uniform-key baseline of identical size calibrates the skew
    penalty. Wall + shuffle bytes + max single-task ms per leg; the
    result of every leg is the same one-row aggregate (count + exact
    dot), asserted equal across legs — topology changes, rows don't.
    """
    from pyspark.sql import functions as F

    from tgdigest_spark.operators.smart_join import (
        plan_equijoin,
        smart_equijoin,
    )
    from tgdigest_spark.session import get_spark

    spark = get_spark(
        "tgdigest-joinstress",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )

    def build(tag: str, skew: bool):
        fpath = os.path.join(
            DATA_DIR, "bench_cache", f"joinstress_fact_{tag}_{target_rows}"
        )
        if not os.path.exists(os.path.join(fpath, "_SUCCESS")):
            key = (
                F.when(F.col("id") % 5 == 0, F.lit(7)).otherwise(
                    (F.col("id") * 2654435761) % n_dim
                )
                if skew
                else (F.col("id") * 2654435761) % n_dim
            )
            (
                spark.range(target_rows)
                .select(
                    key.cast("long").alias("fk"),
                    (F.col("id") % 97).alias("fval"),
                )
                .repartition(CPUS * 2)
                .write.mode("overwrite")
                .parquet(fpath)
            )
        dpath = os.path.join(
            DATA_DIR, "bench_cache", f"joinstress_dim_{n_dim}"
        )
        if not os.path.exists(os.path.join(dpath, "_SUCCESS")):
            (
                spark.range(n_dim)
                .select(
                    F.col("id").alias("dk"), (F.col("id") % 13).alias("dval")
                )
                .repartition(max(CPUS // 2, 4))
                .write.mode("overwrite")
                .parquet(dpath)
            )
        return spark.read.parquet(fpath), spark.read.parquet(dpath)

    def consume(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("fval") * F.col("dval")).alias("dot"),
        ).collect()[0]
        return (int(row["n"]), int(row["dot"]))

    legs: dict[str, dict] = {}
    answers: dict[str, tuple] = {}
    for tag, skew in (("uniform", False), ("hot20", True)):
        fact, dim = build(tag, skew)
        t0 = time.perf_counter()
        plan = plan_equijoin(fact, "fk", dim, "dk", sample_fraction=0.1)
        plan_s = round(time.perf_counter() - t0, 3)

        def q_plain():
            return consume(fact.join(dim, fact["fk"] == dim["dk"], "inner"))

        def q_plain_noskewfix():
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            try:
                return q_plain()
            finally:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        def q_smart():
            return consume(
                smart_equijoin(fact, "fk", dim, "dk", plan=plan)
            )

        for name, fn in (
            ("plain", q_plain),
            ("plain_noskewfix", q_plain_noskewfix),
            ("smart", q_smart),
        ):
            fn()  # warmup
            pre_stages = _completed_stage_ids(spark)
            s0 = _shuffle_totals(spark)
            t0 = time.perf_counter()
            ans = fn()
            wall = time.perf_counter() - t0
            s1 = _shuffle_totals(spark)
            new_stages = (
                _completed_stage_ids(spark) - pre_stages
                if pre_stages
                else set()
            )
            answers[f"{name}@{tag}"] = ans
            legs[f"{name}@{tag}"] = {
                "wall_s": round(wall, 3),
                "shuffle_read_mb": round((s1[0] - s0[0]) / 1e6, 2)
                if s0 and s1
                else None,
                "max_task_ms": _max_task_ms(spark, new_stages),
            }
            print(f"{name}@{tag}: {legs[f'{name}@{tag}']}", flush=True)
        legs[f"smart@{tag}"]["plan_s"] = plan_s
        legs[f"smart@{tag}"]["strategy"] = plan["strategy"]
        legs[f"smart@{tag}"]["replication"] = plan["replication"]
        # every topology must produce the same rows
        uniq = {answers[f"{n}@{tag}"] for n in
                ("plain", "plain_noskewfix", "smart")}
        if len(uniq) != 1:
            raise AssertionError(f"leg results diverged at {tag}: {answers}")

    out = {
        "metric": "joinstress_equijoin",
        "value": round(sum(l["wall_s"] for l in legs.values()), 3),
        "unit": "sec",
        "queries": {k: v["wall_s"] for k, v in legs.items()},
        "legs": legs,
        "sf": SF,
        "extra": {
            "fact_rows": target_rows,
            "dim_rows": n_dim,
            "hot_share": 0.2,
        },
    }
    spark.stop()
    return out


def run_overlapstress(
    n_rows: int = 10_000_000, n_groups: int = 5_000
) -> dict:
    """Scale-stress for the block-pair overlap grid (r5 verdict #4):
    |G| ≈ 5,000 groups → C(5000,2) ≈ 12.5M pairs through
    grouped_kmv_overlap_distributed, plus a hot-group variant where ONE
    group holds ~20% of the 10^7 fact rows — that skew hits the
    sketch-build stage (the only stage that touches fact rows, absorbed
    by sketch_by_key's map-side combine) BEFORE the rank-capped blocks,
    whose bundle-memory bound (block_size·k hashes per bundle row) is
    independent of both |G| and the hot group's size. Reports wall,
    shuffle MB, and max single-task ms per leg; the pair matrix is
    consumed by an executor-side aggregate (never collected)."""
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_kmv_overlap_distributed
    from tgdigest_spark.session import get_spark

    spark = get_spark(
        "tgdigest-overlapstress",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    k, block_size = 512, 256
    legs: dict[str, dict] = {}
    for tag in ("uniform", "hot20"):
        base = spark.range(n_rows)
        if tag == "uniform":
            g = F.col("id") % n_groups
        else:
            # ids ending 0/1 (20% of rows) all land in one hot group
            g = F.when(F.pmod("id", 10) < 2, F.lit(-1)).otherwise(
                F.col("id") % (n_groups - 1)
            )
        # ~2k distinct hashed values per uniform group (k=512 keeps the
        # sketches saturated — the estimator regime, full-size blobs)
        fact = base.select(
            F.concat(F.lit("g"), g.cast("string")).alias("g"),
            (F.xxhash64("id") % 1_000_000).cast("string").alias("v"),
        )

        def q_grid():
            m = grouped_kmv_overlap_distributed(
                fact, "g", "v", k=k, block_size=block_size
            )
            release = m.release_cache
            try:
                return m.agg(
                    F.count(F.lit(1)).alias("n_pairs"),
                    F.avg("jaccard_est").alias("mean_jaccard"),
                    F.max("union_est").alias("max_union"),
                ).collect()[0]
            finally:
                release()

        row = q_grid()  # warmup (also yields the pair count)
        pre_stages = _completed_stage_ids(spark)
        s0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        q_grid()
        wall = time.perf_counter() - t0
        s1 = _shuffle_totals(spark)
        new_stages = (
            _completed_stage_ids(spark) - pre_stages if pre_stages else set()
        )
        legs[f"overlap_grid@{tag}"] = {
            "wall_s": round(wall, 3),
            "n_pairs": int(row["n_pairs"]),
            "shuffle_read_mb": round((s1[0] - s0[0]) / 1e6, 2)
            if s0 and s1
            else None,
            "max_task_ms": _max_task_ms(spark, new_stages),
        }
        print(f"overlap_grid@{tag}: {legs[f'overlap_grid@{tag}']}", flush=True)
    out = {
        "metric": "overlapstress_grid",
        "value": round(sum(l["wall_s"] for l in legs.values()), 3),
        "unit": "sec",
        "queries": {n: l["wall_s"] for n, l in legs.items()},
        "legs": legs,
        "sf": SF,
        "extra": {
            "n_rows": n_rows,
            "n_groups": n_groups,
            "k": k,
            "block_size": block_size,
            "hot_share": 0.2,
        },
    }
    spark.stop()
    return out


def run_cubestress(n_rows: int = 20_000_000) -> dict:
    """Scale-stress for the round-6 re-aggregation surfaces.

    Leg 1 vs 2 — the sliding-window replication claim measured:
    7-day/1-day distinct users over 60 days of 2·10^7 facts. The naive
    form explodes every fact row into its 7 windows BEFORE the shuffle
    (7x raw-row shuffle + 7x aggregation state); the pane form sketches
    each row into ONE daily pane and derives windows by merging 7 pane
    BLOBS. Same answer semantics (HLL vs exact recorded separately —
    leg 2 is the exact groupBy the pane form replaces).

    Leg 3 — merge_blobs_by_key at 6M leaves: roll (bucket × day) leaf
    sketches (100k buckets × 60 days) up to bucket level. The map-side
    combine bounds the blob shuffle at min(B, G·P) partials — measured
    here, since at 10^12 turns the leaf layer IS the big table.
    """
    from pyspark.sql import functions as F

    from tgdigest_spark.agg import merge_blobs_by_key, sketch_by_key
    from tgdigest_spark.api import sliding_distinct_counts
    from tgdigest_spark.session import get_spark
    from tgdigest_spark.sketches import HLL

    spark = get_spark(
        "tgdigest-cubestress",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    n_days, win, slide = 60, 7, 1
    facts = spark.range(n_rows).select(
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            F.pmod("id", F.lit(n_days)).cast("int"),
        ).alias("d"),
        # pmod, not %: signed % doubles the universe to (-5M, 5M)
        F.pmod(F.xxhash64("id"), F.lit(5_000_000)).cast("string").alias("u"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100_000))).alias("bucket"),
    )
    facts = facts.withColumn("ts", F.col("d").cast("timestamp"))

    def q_pane_sliding():
        return (
            sliding_distinct_counts(facts, "ts", "u", win, slide, p=12)
            .agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.sum("distinct_est").alias("s"),
            )
            .collect()[0]
        )

    def q_naive_exact_sliding():
        pidx = F.unix_date(F.to_date("ts"))
        exploded = facts.select(
            F.explode(F.sequence(pidx - (win - 1), pidx)).alias("w"), "u"
        )
        return (
            exploded.groupBy("w")
            .agg(F.countDistinct("u").alias("n"))
            .agg(F.count(F.lit(1)).alias("n_windows"), F.sum("n").alias("s"))
            .collect()[0]
        )

    leaves = sketch_by_key(
        facts, ["bucket", "d"], "u", lambda: HLL(7)
    ).localCheckpoint(eager=True)  # isolate leg 3 to the ROLLUP cost
    n_leaves = leaves.count()

    def q_rollup_6m_leaves():
        rolled = merge_blobs_by_key(leaves, ["bucket"], lambda: HLL(7))
        return rolled.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.length("sketch")).alias("bytes"),
        ).collect()[0]

    legs: dict[str, dict] = {}
    for name, fn in (
        ("pane_sliding_7d1d", q_pane_sliding),
        ("naive_exact_sliding_7d1d", q_naive_exact_sliding),
        ("rollup_6m_leaves", q_rollup_6m_leaves),
    ):
        fn()  # identical warmup (spawns the full worker set)
        pre_stages = _completed_stage_ids(spark)
        s0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        row = fn()
        wall = time.perf_counter() - t0
        s1 = _shuffle_totals(spark)
        new_stages = (
            _completed_stage_ids(spark) - pre_stages if pre_stages else set()
        )
        legs[name] = {
            "wall_s": round(wall, 3),
            "shuffle_read_mb": round((s1[0] - s0[0]) / 1e6, 2)
            if s0 and s1
            else None,
            "max_task_ms": _max_task_ms(spark, new_stages),
            "result": {k: float(row[k]) for k in row.asDict()},
        }
        print(f"{name}: {legs[name]}", flush=True)
    out = {
        "metric": "cubestress",
        "value": round(sum(l["wall_s"] for l in legs.values()), 3),
        "unit": "sec",
        "queries": {n: l["wall_s"] for n, l in legs.items()},
        "legs": legs,
        "sf": SF,
        "extra": {
            "n_rows": n_rows,
            "n_days": n_days,
            "window_days": win,
            "slide_days": slide,
            "n_leaves": int(n_leaves),
            "cpus": CPUS,
        },
    }
    spark.stop()
    return out


def run_leafserve(n_rows: int = 20_000_000) -> dict:
    """Leaf-served dashboards measured (round-6 session 5).

    The 10^12-turn claim behind sources/sketch_table.py +
    api.sliding_windows_from_leaves: a 7d/1d distinct-users dashboard
    over 60 days of 2·10^7 facts, refreshed (a) from the fact table via
    the pane path — the best fact-scanning form, already 5.2x the naive
    explode (cubestress) — vs (b) from a PERSISTED day-leaf sketch
    table, where a refresh reads kilobyte blobs and never touches
    facts. Leg 1 is the nightly leaf build+write (paid once per day of
    new data, amortized over every refresh); at cluster scale it is the
    only leg whose cost grows with fact volume. Estimates of (a) and
    (b) are asserted IDENTICAL (register max is lossless), so the
    speedup is free of answer drift.
    """
    import tempfile

    from pyspark.sql import functions as F

    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.api import (
        _hll_estimates,
        sliding_distinct_counts,
        sliding_windows_from_leaves,
    )
    from tgdigest_spark.session import get_spark
    from tgdigest_spark.sketches import HLL
    from tgdigest_spark.sources.sketch_table import (
        read_sketch_table,
        write_sketch_table,
    )

    spark = get_spark(
        "tgdigest-leafserve",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    n_days, win, slide, p = 60, 7, 1, 12
    facts = spark.range(n_rows).select(
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            F.pmod("id", F.lit(n_days)).cast("int"),
        ).alias("d"),
        F.pmod(F.xxhash64("id"), F.lit(5_000_000)).cast("string").alias("u"),
    )
    facts = facts.withColumn("ts", F.col("d").cast("timestamp"))
    tmp = tempfile.mkdtemp(prefix="leafserve-")
    table = os.path.join(tmp, "dayleaves")
    state = {}

    def q_build_leaves():
        write_sketch_table(
            sketch_by_key(facts, ["d"], "u", lambda: HLL(p)),
            table,
            "hll",
            {"p": p},
        )
        return {"days": float(n_days)}

    def q_refresh_from_facts():
        est = sliding_distinct_counts(facts, "ts", "u", win, slide, p=p)
        rows = est.collect()
        state["facts"] = {r["window_start"]: r["distinct_est"] for r in rows}
        return {"n_windows": float(len(rows))}

    def q_refresh_from_leaves():
        back, _meta = read_sketch_table(spark, table, expect_kind="hll")
        served = _hll_estimates(
            sliding_windows_from_leaves(back, "d", lambda: HLL(p), win, slide)
        )
        rows = served.collect()
        state["leaves"] = {r["window_start"]: r["distinct_est"] for r in rows}
        return {"n_windows": float(len(rows))}

    legs: dict[str, dict] = {}
    for name, fn, warm in (
        # the build leg is NOT warmed with itself (it writes); warm the
        # worker set with the fact-path refresh instead
        ("build_day_leaves", q_build_leaves, q_refresh_from_facts),
        ("refresh_from_facts", q_refresh_from_facts, q_refresh_from_facts),
        ("refresh_from_leaves", q_refresh_from_leaves, q_refresh_from_leaves),
    ):
        warm()
        pre_stages = _completed_stage_ids(spark)
        s0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        row = fn()
        wall = time.perf_counter() - t0
        s1 = _shuffle_totals(spark)
        new_stages = (
            _completed_stage_ids(spark) - pre_stages if pre_stages else set()
        )
        legs[name] = {
            "wall_s": round(wall, 3),
            "shuffle_read_mb": round((s1[0] - s0[0]) / 1e6, 2)
            if s0 and s1
            else None,
            "max_task_ms": _max_task_ms(spark, new_stages),
            "result": {k: float(v) for k, v in row.items()},
        }
        print(f"{name}: {legs[name]}", flush=True)
    identical = state["facts"] == state["leaves"] and bool(state["facts"])
    table_mb = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(table)
        for f in fns
    ) / 1e6
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "metric": "leafserve",
        "value": round(sum(l["wall_s"] for l in legs.values()), 3),
        "unit": "sec",
        "queries": {n: l["wall_s"] for n, l in legs.items()},
        "legs": legs,
        "sf": SF,
        "extra": {
            "n_rows": n_rows,
            "n_days": n_days,
            "window_days": win,
            "slide_days": slide,
            "estimates_identical": bool(identical),
            "leaf_table_mb": round(table_mb, 3),
            "speedup_refresh": round(
                legs["refresh_from_facts"]["wall_s"]
                / max(legs["refresh_from_leaves"]["wall_s"], 1e-9),
                2,
            ),
            "cpus": CPUS,
        },
    }
    spark.stop()
    return out


def run_rehearse100x(target_rows: int = 100_000_000) -> dict:
    """One-command 100x rehearsal: replicate the sf transcripts to
    ~10^8 rows ON DISK (written once, cached), run the transcript
    headline queries, and report wall time + measured per-query shuffle
    bytes. The point: the shuffle profile at 270x the bench data is
    MEASURED, not argued — a plan whose shuffle grows with raw rows
    (instead of with groups/blobs) shows up immediately."""
    from pyspark.sql import functions as F

    from tgdigest_spark.session import get_spark

    tpath = _transcripts_path()
    spark = get_spark(
        "tgdigest-rehearse100x",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        extra_conf=_BENCH_CONF,
    )
    base = spark.read.parquet(tpath)
    n_base = base.count()
    rep = max(1, target_rows // n_base)
    big_path = os.path.join(
        DATA_DIR, "bench_cache", f"rehearse_sf{SF}_x{rep}"
    )
    if not os.path.exists(os.path.join(big_path, "_SUCCESS")):
        reps = spark.range(rep).withColumnRenamed("id", "rep")
        (
            base.crossJoin(reps)
            .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
            .drop("rep")
            # narrow crossJoin inherits the base scan's few tasks; fan
            # the 10^8-row write out across the cores
            .repartition(CPUS * 2)
            .write.mode("overwrite")
            .parquet(big_path)
        )
    transcripts = spark.read.parquet(big_path)
    n_turns = transcripts.count()

    all_q = _queries(spark, transcripts)
    qs = {
        k: all_q[k]
        for k in (
            "q_sketch_build",
            "q_grouped_sketch",
            "q_grouped_conv",
            "q_latency_sketch",
            "q_hll_distinct",
            "q_heavy_hitters",
        )
    }
    qs.update(_bucketed_rehearsal_queries(spark, big_path))
    qs.update(_temporal_rehearsal_queries(spark))
    timings, shuffle_mb = _time_queries(spark, qs)
    total = round(sum(timings.values()), 4)
    result = {
        "metric": "rehearse100x_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "shuffle_mb": shuffle_mb,
        "sf": SF,
        "extra": {
            "n_turns": n_turns,
            "replication": rep,
            "sketch_build_turns_per_sec": round(
                n_turns / timings["q_sketch_build"], 1
            ),
            "cpus": CPUS,
        },
    }
    spark.stop()
    return result


# ---------------------------------------------------------------------------
# scaling mode
# ---------------------------------------------------------------------------

# Methodology: each leg runs in a FRESH subprocess/JVM, warms up with the
# identical full query (spawning every Python worker), then takes the min
# of 2 timed runs. On this 32-core host the honest N-vs-4N pair is
# local[4] vs local[16]: each local[N] task slot pairs with a Python
# worker process, so local[32] would put 64 runnable threads on 32 cores
# and measure oversubscription, not scaling. A real cluster adds memory
# bandwidth with executors; this proxy only adds threads.
_SCALE_SNIPPET = r"""
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from tgdigest_spark.session import get_spark
from pyspark.sql import functions as F
from tgdigest_spark.operators.dedup_text import minhash_signatures

cores = int(sys.argv[1])
spark = get_spark("scale-bench", cores=cores, shuffle_partitions=cores * 2,
                  extra_conf={{"spark.ui.enabled": "true",
                               "spark.ui.retainedStages": "20000",
                               "spark.ui.retainedJobs": "20000"}})

def _stage_cpu():
    # cumulative (executorCpuTime_ns, executorRunTime_ms) over all
    # stages — CPU time is near-immune to noisy-neighbor wall-clock
    # swings, so cpu-per-row is the tenancy-robust scaling signal
    sc = spark.sparkContext
    url = getattr(sc, "uiWebUrl", None)
    if not url:
        return None
    try:
        with urllib.request.urlopen(
            url + "/api/v1/applications/" + sc.applicationId + "/stages",
            timeout=10,
        ) as r:
            st = json.load(r)
    except Exception:
        return None
    return (sum(int(s.get("executorCpuTime", 0) or 0) for s in st),
            sum(int(s.get("executorRunTime", 0) or 0) for s in st))

def timed(fn, reps):
    # per rep: wall + the SAME run's executor cpu/run time deltas;
    # keep the min-wall rep's triple
    best = (float("inf"), None, None)
    for _ in range(reps):
        c0 = _stage_cpu()
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        c1 = _stage_cpu()
        cpu_s = (c1[0] - c0[0]) / 1e9 if (c0 and c1) else None
        run_s = (c1[1] - c0[1]) / 1e3 if (c0 and c1) else None
        if wall < best[0]:
            best = (wall, cpu_s, run_s)
    return best

def record(name, rows, best, extra=None):
    wall, cpu_s, run_s = best
    row = {{"rows": rows, "seconds": wall, "rows_per_sec": rows / wall,
            "executor_cpu_seconds": cpu_s, "executor_run_seconds": run_s}}
    if cpu_s:
        row["rows_per_cpu_sec"] = rows / cpu_s
    if extra:
        row.update(extra)
    results[name] = row

results = {{"cores": cores}}

# job 1: t-digest sketch build over turns (replicated x64 ≈ 24M turns)
t = spark.read.parquet({tpath!r})
rep = spark.range(64).withColumnRenamed("id", "rep")
turns = (t.crossJoin(rep)
          .withColumn("conv_id", F.concat_ws("_", "conv_id", "rep"))
          .drop("rep")
          .select("conv_id", F.length("text").alias("text_len"))
          .repartition(cores * 2)
          .persist())
n_turns = turns.count()
def job1():
    from tgdigest_spark.api import quantiles
    return quantiles(turns, F.col("text_len").cast("double"), [0.5, 0.95, 0.99])
job1()
record("tdigest_build", n_turns, timed(job1, 3))

# job 1b: per-conversation grouped digests (~14M tiny groups over the
# same 24M rows) — the compute-dense north-star workload; the global
# build above is scan/bus-bound since the r3 combine vectorization
def job1b():
    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.sketches.tdigest import TDigest
    return sketch_by_key(
        turns, ["conv_id"], F.col("text_len").cast("double"),
        lambda: TDigest(200),
    ).count()
n_groups = job1b()
record("grouped_digest_build", n_turns, timed(job1b, 2),
       {{"groups": n_groups}})
turns.unpersist()

# job 2: minhash signature build over documents (replicated x96)
docs = spark.read.parquet({docs_path!r})
rep = spark.range(96).withColumnRenamed("id", "rep")
big_docs = (docs.crossJoin(rep)
            .withColumn("doc_id", F.col("doc_id") * 96 + F.col("rep"))
            .drop("rep").repartition(cores * 3).persist())
n_docs = big_docs.count()
job2 = lambda: minhash_signatures(big_docs, num_perm=128).count()
job2()
record("minhash_build", n_docs, timed(job2, 2))
print("SCALE_RESULT " + json.dumps(results))
spark.stop()
"""


def run_scaling(n_small: int = 4, n_big: int = 16, rounds: int = 2) -> dict:
    """Interleaved legs (small,big,small,big,...), min per leg — robust
    to this sandbox's noisy-neighbor variance (observed 2x swings)."""
    tpath = _transcripts_path()
    snippet = _SCALE_SNIPPET.format(
        repo=REPO, tpath=tpath, docs_path=f"{SF_DIR}/documents.parquet"
    )
    runs: dict[int, list[dict]] = {n_small: [], n_big: []}
    for _ in range(rounds):
        for cores in (n_small, n_big):
            proc = subprocess.run(
                [sys.executable, "-c", snippet, str(cores)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            lines = [
                l
                for l in proc.stdout.splitlines()
                if l.startswith("SCALE_RESULT")
            ]
            if proc.returncode != 0 or not lines:
                raise RuntimeError(
                    f"scaling leg local[{cores}] failed "
                    f"(rc={proc.returncode}): {proc.stderr[-2000:]}"
                )
            runs[cores].append(json.loads(lines[-1][len("SCALE_RESULT ") :]))
    ratio = n_big / n_small
    jobs = {}
    for job in ("tdigest_build", "grouped_digest_build", "minhash_build"):
        best = {
            c: min(rs, key=lambda r: r[job]["seconds"])[job]
            for c, rs in runs.items()
        }
        small, big = best[n_small], best[n_big]
        jobs[job] = {
            f"local[{n_small}]": small,
            f"local[{n_big}]": big,
            "speedup": round(big["rows_per_sec"] / small["rows_per_sec"], 3),
            "scaling_efficiency": round(
                big["rows_per_sec"] / small["rows_per_sec"] / ratio, 3
            ),
        }
        # tenancy-robust companion metric: per-CPU-second throughput at
        # each leg, and its ratio (1.0 = each core does the same work
        # per second at 4x parallelism; wall-clock noise cancels out)
        if small.get("rows_per_cpu_sec") and big.get("rows_per_cpu_sec"):
            jobs[job]["cpu_efficiency"] = round(
                big["rows_per_cpu_sec"] / small["rows_per_cpu_sec"], 3
            )
        # per-round raw numbers so run-to-run stability (the ±10%
        # CPU-efficiency claim) is checkable from one artifact
        jobs[job]["raw_rounds"] = {
            f"local[{c}]": [
                {
                    "seconds": round(r[job]["seconds"], 3),
                    "rows_per_sec": round(r[job]["rows_per_sec"], 1),
                    "rows_per_cpu_sec": round(r[job]["rows_per_cpu_sec"], 1)
                    if r[job].get("rows_per_cpu_sec")
                    else None,
                }
                for r in rs
            ]
            for c, rs in runs.items()
        }
    return {"n_small": n_small, "n_big": n_big, "rounds": rounds, "jobs": jobs}


def run_hllbias() -> dict:
    """Estimator-bias sweep: Ertl improved raw estimator (the round-6
    default) vs the original FFM07 raw + linear-counting estimator, on
    the SAME register states, across cardinalities bracketing the FFM
    crossover (2.5m). No Spark involved — this measures the estimator,
    which is a pure function of the register histogram; the distributed
    build path is byte-identical either way. Per (p, n): mean relative
    bias and relative RMSE over `trials` disjoint value universes
    (base_hash is deterministic, so trial variation comes from the
    universe, exactly as it would in production)."""
    import numpy as np
    import pandas as pd

    from tgdigest_spark.sketches import HLL

    trials = 30
    out: dict = {"trials": trials, "grid": {}}
    for p in (12, 14):
        m = 1 << p
        ns = sorted(
            {
                int(round(m * f))
                for f in (0.05, 0.3, 1.0, 1.8, 2.2, 2.5, 2.8, 3.5, 6.0, 20.0)
            }
        )
        rows = {}
        for n in ns:
            errs = {"ertl": [], "ffm": []}
            for t in range(trials):
                h = HLL(p)
                vals = pd.Series(
                    [f"u{t}x{i}" for i in range(n)], dtype=object
                )
                h.update(vals)
                for meth in errs:
                    errs[meth].append((h.estimate(meth) - n) / n)
            rows[n] = {
                meth: {
                    "bias_pct": round(100 * float(np.mean(e)), 3),
                    "rmse_pct": round(
                        100 * float(np.sqrt(np.mean(np.square(e)))), 3
                    ),
                }
                for meth, e in errs.items()
            }
        out["grid"][f"p{p}"] = rows
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--rehearse100x" in sys.argv:
        print(json.dumps(run_rehearse100x()))
    elif "--skewstress" in sys.argv:
        print(json.dumps(run_skewstress()))
    elif "--joinstress" in sys.argv:
        print(json.dumps(run_joinstress()))
    elif "--overlapstress" in sys.argv:
        print(json.dumps(run_overlapstress()))
    elif "--cubestress" in sys.argv:
        print(json.dumps(run_cubestress()))
    elif "--leafserve" in sys.argv:
        print(json.dumps(run_leafserve()))
    elif "--qerror" in sys.argv:
        print(json.dumps(run_qerror()))
    elif "--hllbias" in sys.argv:
        print(json.dumps(run_hllbias()))
    else:
        print(json.dumps(run_bench()))
