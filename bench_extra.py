#!/usr/bin/env python
"""Round-7 optimization instrumentation (bench.py is FROZEN — extra
measurements live here, per the optimization-round contract).

Modes:
    python bench_extra.py profile   # per-query per-stage breakdown
    python bench_extra.py plans     # explain("formatted") for headline queries
    python bench_extra.py noop      # noop-sink isolation timings (guide §1.4)

Reads the same env contract as bench.py: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS. Reuses bench.py's own query closures so the measured
workload is exactly what the driver times.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen harness — imported, never edited)


def _stages(spark, status=None):
    sc = spark.sparkContext
    url = getattr(sc, "uiWebUrl", None)
    if not url:
        return []
    q = f"?status={status}" if status else ""
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{sc.applicationId}/stages{q}",
            timeout=10,
        ) as r:
            return json.load(r)
    except Exception:
        return []


def _fmt_stage(s):
    return {
        "id": s["stageId"],
        "name": (s.get("name") or "")[:90],
        "tasks": s.get("numCompleteTasks"),
        "wall_ms": None,
        "run_ms": s.get("executorRunTime"),
        "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6, 1),
        "input_mb": round((s.get("inputBytes") or 0) / 1e6, 2),
        "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
        "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
        "fetch_wait_ms": s.get("shuffleFetchWaitTime"),
        "desc": (s.get("description") or "")[:60],
    }


def run_profile() -> dict:
    from tgdigest_spark.session import get_spark

    tpath = bench._transcripts_path()
    spark = get_spark(
        "tgdigest-bench-profile",
        cores=bench.CPUS,
        shuffle_partitions=max(bench.CPUS, 8),
        extra_conf=bench._BENCH_CONF,
    )
    transcripts = spark.read.parquet(tpath)
    transcripts.count()
    qs = bench._queries(spark, transcripts)

    out: dict = {}
    for name, fn in qs.items():
        fn()  # warmup
        fn()
        pre = {(s["stageId"], s["attemptId"]) for s in _stages(spark, "complete")}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        stages = [
            _fmt_stage(s)
            for s in _stages(spark, "complete")
            if (s["stageId"], s["attemptId"]) not in pre
        ]
        stages.sort(key=lambda s: -(s["run_ms"] or 0))
        out[name] = {"wall_s": round(wall, 4), "stages": stages}
        print(f"\n=== {name}: {wall:.3f}s", flush=True)
        for s in stages:
            print(
                f"  stage {s['id']:>4} run={s['run_ms']:>7}ms cpu={s['cpu_ms']:>9}ms "
                f"tasks={s['tasks']:>3} in={s['input_mb']:>8}MB "
                f"shR={s['sh_read_mb']:>7}MB shW={s['sh_write_mb']:>7}MB "
                f"fw={s['fetch_wait_ms']}ms  {s['name']}",
                flush=True,
            )
    spark.stop()
    return out


# DataFrame builders mirroring bench._queries' closures, for explain()
# (the closures call actions internally; plans need the frame itself).
def _headline_frames(spark, transcripts):
    import numpy as np
    from pyspark.sql import Window, functions as F

    from tgdigest_spark.api import grouped_quantiles
    from tgdigest_spark.operators.dedup_text import lsh_candidate_pairs
    from tgdigest_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(bench._staged(spark, "embeddings"))
    docs = spark.read.parquet(bench._staged(spark, "documents"))
    lineitem = spark.read.parquet(bench._staged(spark, "lineitem"))

    frames = {}
    frames["q_grouped_conv"] = grouped_quantiles(
        transcripts, ["conv_id"], F.length("text").cast("double"), [0.5]
    )
    unpiv = lineitem.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount, 'tax', l_tax) as (metric, value)",
    )
    w = Window.partitionBy("metric").orderBy(
        F.desc_nulls_last("value"), "l_orderkey", "l_linenumber"
    )
    frames["q_topk_per_metric"] = (
        unpiv.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 3)
    )
    frames["q_pricing_summary"] = (
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
    )
    lsh = lsh_candidate_pairs(docs, num_perm=128)
    frames["q_minhash_lsh"] = lsh.orderBy(F.desc("est_jaccard")).limit(20)
    pdf = emb.where(F.col("vec_id") < 8).toPandas().sort_values("vec_id")
    queries = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    frames["q_ann_cosine"] = cosine_topk(
        emb, queries, pdf["vec_id"].to_numpy(), k=10
    )
    return frames


def run_plans(outdir: str) -> None:
    from tgdigest_spark.session import get_spark

    tpath = bench._transcripts_path()
    spark = get_spark(
        "tgdigest-bench-plans",
        cores=bench.CPUS,
        shuffle_partitions=max(bench.CPUS, 8),
        extra_conf=bench._BENCH_CONF,
    )
    transcripts = spark.read.parquet(tpath)
    os.makedirs(outdir, exist_ok=True)
    for name, df in _headline_frames(spark, transcripts).items():
        p = os.path.join(outdir, f"{name}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print(f"wrote {p}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "profile"
    if mode == "profile":
        res = run_profile()
        print(json.dumps({k: v["wall_s"] for k, v in res.items()}))
    elif mode == "plans":
        run_plans(sys.argv[2] if len(sys.argv) > 2 else "plans/r07/tmp")
    else:
        raise SystemExit(f"unknown mode {mode}")
