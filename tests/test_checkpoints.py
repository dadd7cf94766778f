"""Checkpoint layer: resume without recompute, refresh, lineage; and
streaming sketch maintenance via foreachBatch.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tgdigest_spark.plans.checkpoints import (
    SketchCheckpointStore,
    build_checkpointed,
    merged_sketch,
)
from tgdigest_spark.sketches.tdigest import TDigest

FACTORY = lambda: TDigest(200)  # noqa: E731


def PART():
    return F.date_format(F.col("ts"), "yyyy-MM-dd")


def VALUE():
    return F.length(F.col("text")).cast("double")


def test_build_resume_refresh(spark, transcripts, tmp_path):
    store = SketchCheckpointStore(str(tmp_path / "ckpt"))

    # simulate a killed job: only the first 10 days get built
    days = sorted(
        r["p"] for r in transcripts.select(PART().alias("p")).distinct().collect()
    )
    first_half = transcripts.where(PART().isin(*days[:10]))
    build_checkpointed(first_half, PART(), VALUE(), FACTORY, store)
    assert store.completed_partitions() == set(days[:10])
    mtimes_before = {
        k: os.path.getmtime(store._blob_path(k)) for k in days[:10]
    }

    # resume over the full table: ONLY missing partitions computed
    build_checkpointed(transcripts, PART(), VALUE(), FACTORY, store)
    assert store.completed_partitions() == set(days)
    for k, t in mtimes_before.items():
        assert os.path.getmtime(store._blob_path(k)) == t, f"{k} recomputed"

    # re-run is a no-op (ST8 idempotence)
    manifest_before = store.manifest()
    build_checkpointed(transcripts, PART(), VALUE(), FACTORY, store)
    assert store.manifest() == manifest_before

    # merged estimate matches a from-scratch global sketch within bound
    merged = merged_sketch(store, FACTORY)
    exact = transcripts.select(
        F.expr("percentile(length(text), array(0.5,0.95,0.99))").alias("p")
    ).collect()[0]["p"]
    est = merged.quantile([0.5, 0.95, 0.99])
    for e, x in zip(est, exact):
        assert abs(e - x) / max(abs(x), 1) < 0.05

    assert merged.count == transcripts.count()

    # refresh recomputes exactly the requested partitions
    target = days[0]
    build_checkpointed(
        transcripts, PART(), VALUE(), FACTORY, store, refresh={target}
    )
    assert os.path.getmtime(store._blob_path(target)) > mtimes_before[target]
    others = [d for d in days[:10] if d != target]
    for k in others:
        assert os.path.getmtime(store._blob_path(k)) == mtimes_before[k]


def test_lineage_records(spark, transcripts, tmp_path):
    store = SketchCheckpointStore(str(tmp_path / "ckpt2"))
    build_checkpointed(transcripts, PART(), VALUE(), FACTORY, store)
    with open(store.lineage_path) as f:
        records = [json.loads(line) for line in f]
    parts = store.completed_partitions()
    assert {r["partition"] for r in records} == parts
    total_rows = sum(r["rows"] for r in records)
    assert total_rows == transcripts.count()
    for r in records:
        assert r["rows"] > 0
        assert r["rows_per_sec_job"] > 0
        assert r["status"] == "done"


def test_force_rebuild(spark, transcripts, tmp_path):
    store = SketchCheckpointStore(str(tmp_path / "ckpt3"))
    sample = transcripts.limit(500)
    build_checkpointed(sample, PART(), VALUE(), FACTORY, store)
    before = {
        k: os.path.getmtime(store._blob_path(k))
        for k in store.completed_partitions()
    }
    build_checkpointed(sample, PART(), VALUE(), FACTORY, store, force=True)
    after = {
        k: os.path.getmtime(store._blob_path(k))
        for k in store.completed_partitions()
    }
    assert all(after[k] > before[k] for k in before)


def test_streaming_sketch(spark, transcripts_path, tmp_path):
    from tgdigest_spark.streaming.stream_agg import sketch_stream_to_store

    # stage the parquet as a "stream" directory
    src = spark.read.parquet(transcripts_path)
    stream_dir = str(tmp_path / "stream_src")
    src.limit(2000).repartition(4).write.parquet(stream_dir)

    store = SketchCheckpointStore(str(tmp_path / "stream_ckpt"))
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
    )
    q = sketch_stream_to_store(
        stream,
        bucket=F.col("role"),
        value=F.length("text").cast("double"),
        factory=FACTORY,
        store=store,
        checkpoint_location=str(tmp_path / "query_ckpt"),
    )
    q.awaitTermination(120)
    assert not q.isActive

    merged = merged_sketch(store, FACTORY)
    batch = spark.read.parquet(stream_dir)
    assert merged.count == batch.count()
    exact = batch.select(
        F.expr("percentile(length(text), 0.5)").alias("m")
    ).collect()[0]["m"]
    assert abs(merged.quantile(0.5) - exact) / max(exact, 1) < 0.05
    # per-role buckets exist
    roles = {r["role"] for r in batch.select("role").distinct().collect()}
    assert store.completed_partitions() == roles


def test_stateful_sketch_stream(spark, transcripts_path, tmp_path):
    from pyspark.sql import functions as F

    from tgdigest_spark.streaming.stateful import stateful_sketch_stream
    from tgdigest_spark.sketches.tdigest import TDigest

    src = spark.read.parquet(transcripts_path)
    stream_dir = str(tmp_path / "stateful_src")
    sample = src.where(F.col("role").isin("user", "assistant")).limit(3000)
    sample.repartition(3).write.parquet(stream_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select(F.col("role").alias("key_in"), F.length("text").cast("double").alias("v"))
    )
    out = stateful_sketch_stream(
        stream, "key_in", "v", lambda: TDigest(200)
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .option("checkpointLocation", str(tmp_path / "stateful_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    # last update per key reflects ALL rows of that key
    res = spark.sql(
        "SELECT key, max(n) AS n FROM stateful_out GROUP BY key"
    ).collect()
    got = {r["key"]: r["n"] for r in res}
    batch = spark.read.parquet(stream_dir)
    exact_counts = {
        r["role"]: r["c"]
        for r in batch.groupBy("role").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == exact_counts
    # final p50 estimate close to exact
    final = {
        r["key"]: r["p50"]
        for r in spark.sql(
            "SELECT key, p50 FROM stateful_out s WHERE n = "
            "(SELECT max(n) FROM stateful_out t WHERE t.key = s.key)"
        ).collect()
    }
    exact_p50 = {
        r["role"]: r["m"]
        for r in batch.groupBy("role")
        .agg(F.expr("percentile(length(text), 0.5)").alias("m"))
        .collect()
    }
    for k, m in exact_p50.items():
        assert abs(final[k] - m) / max(m, 1) < 0.06, (k, final[k], m)


def test_windowed_watermark_agg(spark, transcripts_path, tmp_path):
    from pyspark.sql import functions as F

    from tgdigest_spark.streaming.windowed import windowed_turn_stats

    src = spark.read.parquet(transcripts_path)
    stream_dir = str(tmp_path / "win_src")
    src.limit(5000).repartition(4).write.parquet(stream_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
    )
    agg = windowed_turn_stats(stream, window="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    out = spark.sql("SELECT * FROM win_out").toPandas()
    # append mode emits only windows closed by the watermark; with
    # availableNow the final watermark closes all but the latest windows
    batch = spark.read.parquet(stream_dir)
    exact = (
        batch.groupBy(
            F.window("ts", "6 hours").alias("win"), "role"
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("win.start").alias("window_start"), "role", "n_turns")
        .toPandas()
    )
    assert len(out) > 0
    merged = out.merge(
        exact, on=["window_start", "role"], suffixes=("", "_exact")
    )
    # every emitted window matches the batch-exact count
    assert len(merged) == len(out)
    assert (merged["n_turns"] == merged["n_turns_exact"]).all()


def test_streaming_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers a whole epoch after a failure between
    sink write and stream-checkpoint commit; merging the same epoch
    twice must not double-count."""
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    store = SketchCheckpointStore(str(tmp_path / "replay_ckpt"))
    batch = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "role string, v double"
    )
    merge_batch_into_store(batch, 0, F.col("role"), F.col("v"), FACTORY, store)
    n1 = merged_sketch(store, FACTORY).count
    # replay of epoch 0 (same data) — skipped
    merge_batch_into_store(batch, 0, F.col("role"), F.col("v"), FACTORY, store)
    n2 = merged_sketch(store, FACTORY).count
    assert n1 == n2 == 100
    # a NEW epoch does merge
    merge_batch_into_store(batch, 1, F.col("role"), F.col("v"), FACTORY, store)
    assert merged_sketch(store, FACTORY).count == 200


def test_window_quantiles_from_checkpoints(spark, transcripts, tmp_path):
    """The reference recomputes each date-windowed digest from raw rows
    (post.rs:76-90); here the window answer is a merge of just that
    window's checkpoint blobs and must match the raw-row digest's
    accuracy class vs the exact percentile over the same rows."""
    from tgdigest_spark.plans.checkpoints import (
        build_checkpointed,
        window_quantiles,
    )

    store = SketchCheckpointStore(str(tmp_path / "win_ckpt"))
    part = F.date_format(F.col("ts"), "yyyy-MM-dd")
    val = F.length("text").cast("double")
    build_checkpointed(transcripts, part, val, FACTORY, store)

    lo, hi = "2024-01-10", "2024-01-20"
    got = window_quantiles(store, FACTORY, [0.5, 0.99], lo, hi)
    rows = transcripts.where(
        F.date_format(F.col("ts"), "yyyy-MM-dd").between(lo, hi)
    )
    exact = rows.agg(
        F.expr("percentile(length(text), 0.5)").alias("p50"),
        F.expr("percentile(length(text), 0.99)").alias("p99"),
    ).collect()[0]
    assert abs(got[0] - exact["p50"]) / max(exact["p50"], 1) < 0.05
    assert abs(got[1] - exact["p99"]) / max(exact["p99"], 1) < 0.05
    # the window digest counted exactly the window's rows
    from tgdigest_spark.plans.checkpoints import merged_sketch

    sk = merged_sketch(store, FACTORY, keys=lambda k: lo <= k <= hi)
    assert sk.count == rows.count()


def test_resume_recovers_from_crash_between_blob_and_manifest(
    spark, transcripts, tmp_path
):
    """Crash injection: a blob written but never committed to the
    manifest must be recomputed on resume (the manifest is the source
    of truth); a manifest entry whose blob file vanished must also be
    recomputed, not trusted."""
    import os

    from tgdigest_spark.plans.checkpoints import (
        build_checkpointed,
        merged_sketch,
    )

    store = SketchCheckpointStore(str(tmp_path / "crash_ckpt"))
    part = F.date_format(F.col("ts"), "yyyy-MM-dd")
    val = F.length("text").cast("double")
    sub = transcripts.where(part < "2024-01-20")
    build_checkpointed(sub, part, val, FACTORY, store)
    done = store.completed_partitions()
    assert done

    # crash type 1: orphan blob with no manifest entry
    orphan_key = "2024-09-99"
    with open(store._blob_path(orphan_key), "wb") as f:
        f.write(FACTORY().serialize())
    assert orphan_key not in store.completed_partitions()

    # crash type 2: manifest says done, blob missing
    victim = sorted(done)[0]
    os.unlink(store._blob_path(victim))
    assert victim not in store.completed_partitions()

    # resume rebuilds ONLY the victim (and any genuinely new partitions)
    build_checkpointed(sub, part, val, FACTORY, store)
    assert victim in store.completed_partitions()
    merged = merged_sketch(store, FACTORY)
    assert merged.count == sub.count()


def test_window_quantiles_over_streaming_store(spark, tmp_path):
    """merged_sketch key-filters must follow the streaming sink's
    manifest file pointers (epoch-versioned blob names)."""
    from tgdigest_spark.plans.checkpoints import merged_sketch
    from tgdigest_spark.streaming.stream_agg import merge_batch_into_store

    store = SketchCheckpointStore(str(tmp_path / "winstream"))
    rows = [(f"2024-01-{d:02d}", float(v)) for d in (1, 2, 3) for v in range(100)]
    batch = spark.createDataFrame(rows, "day string, v double")
    merge_batch_into_store(batch, 0, F.col("day"), F.col("v"), FACTORY, store)
    merge_batch_into_store(batch, 1, F.col("day"), F.col("v"), FACTORY, store)

    all_sk = merged_sketch(store, FACTORY)
    assert all_sk.count == 600  # 2 epochs x 300 rows
    win = merged_sketch(
        store, FACTORY, keys=lambda k: "2024-01-02" <= k <= "2024-01-03"
    )
    assert win.count == 400


def test_streaming_session_windows_match_batch(spark, transcripts_path, tmp_path):
    """Streaming session_window sessionization emits exactly the batch
    session_window sessions the final watermark has closed (value-equal
    rows), withholds only still-open tail sessions, and the per-key
    session COUNTS match the batch lag-formulation under the >=
    boundary convention for fully-closed keys."""
    from pyspark.sql import Window, functions as F

    from tgdigest_spark.streaming.windowed import session_turn_stats

    src = spark.read.parquet(transcripts_path)
    stream_dir = str(tmp_path / "sess_src")
    src.limit(5000).repartition(4).write.parquet(stream_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
    )
    agg = session_turn_stats(
        stream, gap="5 minutes", watermark="1 hour", key="conv_id"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    out = (
        spark.sql("SELECT * FROM sess_out")
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(out) > 0

    # batch oracle must rebuild the TIMESTAMP the same tz-safe way the
    # streaming operator does, or the parity claim only holds under UTC
    from tgdigest_spark.functions.timeutil import to_instant_of

    batch_raw = spark.read.parquet(stream_dir)
    batch = batch_raw.withColumn("ts", to_instant_of(batch_raw, "ts"))
    exact = (
        batch.groupBy(
            F.session_window("ts", "5 minutes").alias("sess"), "conv_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "conv_id", "n_events", "first_ts", "last_ts",
        )
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    # append mode emits a session only once the watermark passes its
    # end; the final watermark is max(ts) - delay, so sessions ending
    # inside the last hour stay OPEN and are withheld. Emitted rows
    # must be exactly the batch sessions past that cutoff, and every
    # withheld row must still be open at stream end.
    import datetime

    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(hours=1)
    merged = out.merge(exact, how="outer", indicator=True)
    assert (merged["_merge"] != "left_only").all()  # stream ⊆ batch
    withheld = merged[merged["_merge"] == "right_only"]
    assert (withheld["session_end"] > cutoff).all()
    closed = (
        exact[exact["session_end"] <= cutoff]
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    emitted_closed = (
        out[out["session_end"] <= cutoff]
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(emitted_closed, closed, check_exact=True)

    # cross-formulation: per-key session counts equal the lag-form with
    # the session_window boundary convention (new session at gap >= g),
    # restricted to keys with no withheld (still-open) session
    # microsecond-exact gap: cast('long') truncates to whole seconds,
    # which diverges from session_window's exact boundaries when a gap
    # straddles the threshold inside one second (same fix as the batch
    # sessionization gate query)
    w = Window.partitionBy("conv_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    lag_form = (
        batch.withColumn(
            "new_s",
            F.when(gap_us.isNull() | (gap_us >= 300_000_000), 1).otherwise(0),
        )
        .groupBy("conv_id")
        .agg(F.sum("new_s").alias("n_sessions"))
        .toPandas()
        .set_index("conv_id")["n_sessions"]
    )
    open_convs = set(withheld["conv_id"])
    stream_counts = out.groupby("conv_id").size()
    checked = 0
    for conv, n in stream_counts.items():
        if conv in open_convs:
            continue
        assert n == lag_form[conv], conv
        checked += 1
    assert checked > 0


def test_streaming_exact_dedup_bounded_state(spark, transcripts_path, tmp_path):
    """dropDuplicatesWithinWatermark-based streaming exact dedup: with
    every duplicate pair inside the watermark horizon, the streamed
    output has exactly the batch-distinct key set, once each —
    including dups split across micro-batches."""
    from tgdigest_spark.streaming.dedup_stream import exact_dedup_stream

    src = spark.read.parquet(transcripts_path).limit(3000)
    dup_src = src.limit(1000)  # exact re-delivery of the first 1000 rows
    stream_dir = str(tmp_path / "dedup_src")
    src.unionByName(dup_src).repartition(4).write.parquet(stream_dir)

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
    )
    deduped = exact_dedup_stream(
        stream, keys=["conv_id", "turn_idx"], watermark="90 days"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    out = spark.sql("SELECT conv_id, turn_idx FROM dedup_out").toPandas()
    assert not out.duplicated(["conv_id", "turn_idx"]).any()
    # oracle from the WRITTEN files, not a re-evaluation of the
    # nondeterministic limit() plan (a parallel scan may pick a
    # different row subset on the second evaluation)
    batch_keys = (
        spark.read.parquet(stream_dir)
        .select("conv_id", "turn_idx")
        .distinct()
        .toPandas()
    )
    assert len(out) == len(batch_keys)
    merged = out.merge(batch_keys, how="outer", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_streaming_exact_dedup_content_hash_null_guard(spark, tmp_path):
    """content_cols path: all-null content rows are duplicates of each
    other, and a row whose text is a literal sentinel-lookalike string
    stays DISTINCT from a true-NULL row (an in-band sentinel would
    collide with its own literal — the 128-bit md5 key hashes an
    out-of-band null flag plus a length-prefixed value instead)."""
    import pandas as pd

    from tgdigest_spark.streaming.dedup_stream import exact_dedup_stream

    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "text": [None, None, "\x00null", "same"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:05",
                 "2024-01-01 00:10", "2024-01-01 00:15"]
            ),
        }
    )
    stream_dir = str(tmp_path / "content_src")
    spark.createDataFrame(pdf).write.parquet(stream_dir)

    stream = (
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .parquet(stream_dir)
    )
    deduped = exact_dedup_stream(
        stream, content_cols=["text"], watermark="1 day"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("content_out")
        .option("checkpointLocation", str(tmp_path / "content_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    out = spark.sql("SELECT * FROM content_out").toPandas()
    texts = set(out["text"].where(out["text"].notna(), "<NULL>"))
    # one NULL survivor, the sentinel-lookalike string, and "same"
    assert len(out) == 3 and texts == {"<NULL>", "\x00null", "same"}
    assert "_content_key" not in out.columns


def test_to_instant_monotone_across_dst_gap(spark):
    """to_instant (the streaming modules' NTZ->TIMESTAMP rebuild) stays
    monotone across a spring-forward gap under a DST session timezone,
    where the bare cast idiom relabels wall times non-monotonically."""
    import pandas as pd

    from tgdigest_spark.functions.timeutil import to_instant

    # wall times straddling the US 2024 spring-forward gap (02:00->03:00)
    walls = ["2024-03-10 01:30:00", "2024-03-10 02:15:00",
             "2024-03-10 02:45:00", "2024-03-10 03:10:00"]
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        df = spark.createDataFrame(
            [(s,) for s in walls], "s string"
        ).select(F.to_timestamp_ntz("s").alias("ts"))  # tz-free parse
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        inst = df.select(
            F.unix_micros(to_instant("ts", "timestamp_ntz")).alias("us")
        ).toPandas()["us"]
        assert list(inst) == sorted(inst) and inst.is_unique
        # spacing preserved exactly: 45, 30, 25 minutes
        diffs = inst.diff().dropna().tolist()
        assert diffs == [45 * 60e6, 30 * 60e6, 25 * 60e6]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_to_instant_rejects_string_ts(spark):
    """to_instant raises on unsupported dtypes instead of silently
    nulling every event time (the watermark would never advance)."""
    import pytest as _pytest

    from tgdigest_spark.functions.timeutil import to_instant
    from tgdigest_spark.streaming.dedup_stream import exact_dedup_stream

    with _pytest.raises(ValueError, match="unsupported ts dtype"):
        to_instant("ts", "string")
    df = spark.createDataFrame([("a", "2024-01-01 00:00:00")], "k string, ts string")
    with _pytest.raises(ValueError, match="unsupported ts dtype"):
        exact_dedup_stream(df, keys=["k"])
