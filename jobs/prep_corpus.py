"""spark-submit job: end-to-end training-corpus preparation.

Composes the engine's training-data operators into the standard prep
pipeline and writes the cleaned, split corpus plus one JSON line of
per-stage metrics (the lineage a production run ships to its sink):

    ingest → quality filter → repetition filter → exact dedup
           → near-dup prune (MinHash LSH) → benchmark decontamination
           → PII scrub → stratified train/val/test split → parquet

Usage:
    spark-submit --py-files tgdigest_spark.zip jobs/prep_corpus.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --benchmark-ids-below 25 --out /tmp/clean_corpus

Every stage is a tested operator (see tests/test_training_ops.py and
the oracle-gated driver queries); this job is the composition surface.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--benchmark", help="parquet of benchmark docs to decontaminate against")
    ap.add_argument(
        "--benchmark-ids-below",
        type=int,
        help="treat input docs with doc_id < N as the benchmark (demo mode)",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--max-token-frac", type=float, default=0.3)
    ap.add_argument("--min-ttr", type=float, default=0.1)
    ap.add_argument("--neardup-jaccard", type=float, default=0.8)
    ap.add_argument("--decontam-overlap", type=float, default=0.5)
    ap.add_argument("--splits", default="train:0.9,val:0.05,test:0.05")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("tgdigest-prep-corpus").getOrCreate()
    from tgdigest_spark.pyfiles import ensure_shipped

    ensure_shipped(spark)

    from tgdigest_spark.operators.dedup_cluster import dedup_survivors
    from tgdigest_spark.operators.dedup_text import (
        decontaminate,
        lsh_candidate_pairs,
    )
    from tgdigest_spark.operators.sampling import assign_splits
    from tgdigest_spark.operators.text_analysis import (
        fingerprint,
        quality_score,
        repetition_filter,
        scrub_pii,
        token_count,
    )
    from pyspark.sql import Window

    metrics: dict = {"stages": {}}

    docs = spark.read.parquet(args.input)
    metrics["stages"]["ingested"] = docs.count()

    t = F.col("text")
    # persist the scored frame: the stage-count actions below would
    # otherwise re-scan the input and re-run the scoring 3-4x
    scored = docs.select(
        "doc_id", "text", quality_score(t), token_count(t)
    ).persist()
    quality = scored.where(F.col("quality") >= args.min_quality).drop("quality")
    metrics["stages"]["after_quality"] = quality.count()

    unrepeated = repetition_filter(
        quality, max_token_frac=args.max_token_frac, min_ttr=args.min_ttr
    )
    metrics["stages"]["after_repetition"] = unrepeated.count()

    deduped = (
        unrepeated.withColumn("fp", fingerprint(F.col("text")))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .where(F.col("rn") == 1)
        .drop("rn", "fp")
    ).persist()
    metrics["stages"]["after_exact_dedup"] = deduped.count()

    pairs = lsh_candidate_pairs(deduped, num_perm=128)
    release = pairs.release_cache  # capture BEFORE transformations
    near = pairs.where(F.col("est_jaccard") >= args.neardup_jaccard)
    surviving = dedup_survivors(deduped, near)
    metrics["stages"]["after_near_dedup"] = surviving.count()
    # NOTE: release() is deferred to the end — `surviving` -> `final`
    # still depends on the LSH join, so unpersisting the signature cache
    # here would force the final write to recompute the whole
    # signature+band+verify pipeline from scratch.

    if args.benchmark or args.benchmark_ids_below is not None:
        bench = (
            spark.read.parquet(args.benchmark)
            if args.benchmark
            else docs.where(F.col("doc_id") < args.benchmark_ids_below)
        )
        surviving = decontaminate(
            surviving, bench, max_overlap=args.decontam_overlap
        ).persist()  # consumed by the stage count AND the final write
        metrics["stages"]["after_decontamination"] = surviving.count()

    weights = {}
    for part in args.splits.split(","):
        name, w = part.split(":")
        weights[name] = float(w)
    final = surviving.select(
        "doc_id",
        scrub_pii(F.col("text")).alias("text"),
        F.col("token_cnt"),
    )
    final = assign_splits(final, weights, key="doc_id", seed=args.seed)

    final.write.mode("overwrite").partitionBy("split").parquet(args.out)
    out = spark.read.parquet(args.out)
    metrics["stages"]["written"] = out.count()
    metrics["split_counts"] = {
        r["split"]: r["cnt"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    metrics["surviving_tokens"] = int(
        out.agg(F.sum("token_cnt")).collect()[0][0] or 0
    )
    release()
    scored.unpersist()
    deduped.unpersist()
    print(json.dumps(metrics, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
