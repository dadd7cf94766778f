"""Streaming ingestion: file-source deliveries through the incremental
dedup store with checkpointed offsets — catch-up processing, replay
convergence via the id contract, and incremental pickup of new files."""

from __future__ import annotations

import json
import os
import shutil


def _write_delivery(spark, landing, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(landing)


def _run_available_now(writer):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_ingest_end_to_end(spark, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import init_signature_store
    from tgdigest_spark.streaming.ingest_stream import dedup_ingest_stream

    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics")
    init_signature_store(store)

    # include one junk doc that the quality filter drops (no alpha
    # chars, out-of-range word length → score ~0.01) and one near-dup
    # pair
    base = (
        "the quick brown fox jumps over the lazy dog and runs to the "
        "hills where the other animals of the forest meet"
    )
    _write_delivery(
        spark,
        landing,
        [
            (1, base),
            (2, base.replace("quick", "swift")),  # near-dup of 1
            (3, "0 1 0 1 0 1 0 1"),  # junk (no alpha, 1-char tokens) → quality filter
            (4, "completely different words about cooking pasta with "
                "tomatoes and basil in the italian style of the south"),
        ],
    )

    def writer():
        return dedup_ingest_stream(
            spark,
            landing,
            "doc_id long, text string",
            store,
            corpus,
            ckpt,
            threshold=0.5,
            min_quality=0.4,
            metrics_dir=metrics,
        )

    _run_available_now(writer())
    got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert 1 in got and 4 in got
    assert 2 not in got  # near-dup of 1 dropped
    assert 3 not in got  # failed quality

    # restart from the same checkpoint with no new files: nothing
    # reprocessed, corpus unchanged
    n_before = spark.read.parquet(corpus).count()
    _run_available_now(writer())
    assert spark.read.parquet(corpus).count() == n_before

    # a second delivery: only the new file is processed; a re-delivered
    # doc (id 4) converges via the id contract, a cross-delivery
    # near-dup (of doc 1) is dropped against the STORE
    _write_delivery(
        spark,
        landing,
        [
            (4, "completely different words about cooking pasta with "
                "tomatoes and basil in the italian style of the south"),
            (5, base.replace("lazy", "sleepy")),  # near-dup of stored 1
            (6, "fresh unrelated text where sailors navigate the wide "
                "ocean by the stars and the wind every single night"),
        ],
    )
    _run_available_now(writer())
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == got | {6}

    # lineage metrics: one line per non-empty micro-batch, counts close
    lines = [
        json.loads(l)
        for l in open(os.path.join(metrics, "ingest_metrics.jsonl"))
    ]
    assert len(lines) == 2
    assert lines[1]["dropped_redelivered"] == 1  # doc 4 replay
    assert lines[1]["dropped_vs_store"] == 1  # doc 5 vs stored doc 1
    assert lines[1]["survivors"] == 1  # doc 6


def test_stream_ingest_empty_landing_noop(spark, tmp_path):
    from tgdigest_spark.operators.dedup_incremental import init_signature_store
    from tgdigest_spark.streaming.ingest_stream import dedup_ingest_stream

    landing = str(tmp_path / "landing2")
    os.makedirs(landing)
    store = str(tmp_path / "store2")
    init_signature_store(store)
    w = dedup_ingest_stream(
        spark,
        landing,
        "doc_id long, text string",
        store,
        str(tmp_path / "corpus2"),
        str(tmp_path / "ckpt2"),
    )
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(60)
    assert not os.path.exists(str(tmp_path / "corpus2") + "/_SUCCESS")


# ---------------------------------------------------------------------------
# Round-6 soak (r5 verdict #5): kill/restart mid-stream with deliberately
# late events, asserting post-restart convergence to batch parity and the
# documented drop/survive behavior at the watermark boundary.
# ---------------------------------------------------------------------------

T0 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in epoch micros
MIN = 60_000_000
HOUR = 3_600_000_000


def _append_file(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _kill_mid_stream(start_writer):
    """Start a continuous-trigger run, stop it as soon as rows flow
    (lands between/inside micro-batches), return after the kill."""
    import time

    q = start_writer(trigger={"processingTime": "0 seconds"})
    deadline = time.time() + 120
    while time.time() < deadline:
        done = sum(p["numInputRows"] for p in q.recentProgress)
        if done > 0:
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(60)


def _drain(start_writer):
    q = start_writer(trigger={"availableNow": True})
    q.awaitTermination(180)
    assert not q.isActive


def test_session_stream_kill_restart_late_data(spark, tmp_path):
    """session_turn_stats soak: a mid-stream kill + checkpoint restart
    converges to batch parity, a late event below the persisted
    watermark is DROPPED (its session's count is unchanged), and
    still-open sessions are withheld."""
    from pyspark.sql import functions as F

    from tgdigest_spark.functions.timeutil import to_instant_of
    from tgdigest_spark.streaming.windowed import session_turn_stats

    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    sch = "conv_id string, ts long"

    def start_writer(trigger):
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = session_turn_stats(
            stream, gap="5 minutes", watermark="1 hour", key="conv_id"
        )
        return (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    # phase 1: three files, all event times within 2 minutes of T0
    # (watermark stays below every session, nothing can be late yet)
    _append_file(spark, src, [("A", T0), ("A", T0 + MIN)], sch)
    _append_file(spark, src, [("B", T0 + 30_000_000)], sch)
    _append_file(spark, src, [("C", T0 + 90_000_000)], sch)
    _kill_mid_stream(start_writer)  # KILL with input still pending
    _drain(start_writer)  # restart from the checkpoint, drain

    # phase 2: a clock event advances the watermark to T0+3h, closing
    # (and emitting) the A/B/C sessions
    _append_file(spark, src, [("Z", T0 + 4 * HOUR)], sch)
    _drain(start_writer)

    # phase 3: one event 2 minutes after A's session start — now far
    # BELOW the persisted watermark → dropped (A keeps n_events=2);
    # one fresh event above the watermark → accepted but its session
    # stays open (withheld), like Z's
    _append_file(
        spark, src, [("A", T0 + 2 * MIN), ("D", T0 + 4 * HOUR + MIN)], sch
    )
    _drain(start_writer)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    # exactly the three closed sessions, once each — no duplicates from
    # the kill/restart, no session for the dropped late event, Z and D
    # withheld (still open at the final watermark T0+3h+1min)
    assert list(got["conv_id"]) == ["A", "B", "C"]
    assert got.set_index("conv_id")["n_events"].to_dict() == {
        "A": 2, "B": 1, "C": 1,
    }

    # batch parity: the emitted rows equal the batch session_window
    # over every row EXCEPT the dropped late one, restricted to
    # sessions the final watermark closed
    import pandas as pd

    kept = spark.createDataFrame(
        [
            ("A", T0), ("A", T0 + MIN), ("B", T0 + 30_000_000),
            ("C", T0 + 90_000_000), ("Z", T0 + 4 * HOUR),
            ("D", T0 + 4 * HOUR + MIN),
        ],
        sch,
    )
    kept = kept.withColumn("ts", to_instant_of(kept, "ts"))
    exact = (
        kept.groupBy(
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
    )
    final_wm = pd.Timestamp((T0 + 3 * HOUR + MIN) * 1000)
    closed = (
        exact[exact["session_end"] <= final_wm]
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[closed.columns], closed, check_exact=True
    )


def test_dedup_stream_kill_restart_watermark_horizon(spark, tmp_path):
    """exact_dedup_stream soak: kill/restart drops no rows and emits no
    duplicates; a duplicate INSIDE the watermark horizon is dropped;
    after the watermark passes a key's horizon its state is evicted, so
    a far-apart re-arrival of the same key SURVIVES (the documented
    bounded-state trade) and a late re-delivery below the watermark is
    discarded."""
    from tgdigest_spark.streaming.dedup_stream import exact_dedup_stream

    src = str(tmp_path / "dd_src")
    out = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    sch = "k string, ts long"

    def start_writer(trigger):
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        deduped = exact_dedup_stream(stream, keys=["k"], watermark="1 hour")
        return (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    # phase 1: first arrivals + an in-horizon duplicate of k1
    _append_file(spark, src, [("k1", T0), ("k2", T0 + 1_000_000)], sch)
    _append_file(spark, src, [("k1", T0)], sch)  # dup within horizon
    _append_file(spark, src, [("k3", T0 + 2_000_000)], sch)
    _kill_mid_stream(start_writer)
    _drain(start_writer)

    # phase 2: clock event → watermark T0+3h, k1/k2/k3 state evicted
    _append_file(spark, src, [("z", T0 + 4 * HOUR)], sch)
    _drain(start_writer)

    # phase 3: k1 re-arrives far outside the horizon → SURVIVES
    # (documented trade); k2 re-delivered with its ORIGINAL event time,
    # now below the watermark → discarded as late
    _append_file(
        spark, src,
        [("k1", T0 + 3 * HOUR + 30 * MIN), ("k2", T0 + 1_000_000)],
        sch,
    )
    _drain(start_writer)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    expect = {
        ("k1", T0),
        ("k1", T0 + 3 * HOUR + 30 * MIN),
        ("k2", T0 + 1_000_000),
        ("k3", T0 + 2_000_000),
        ("z", T0 + 4 * HOUR),
    }
    import pandas as pd

    got_set = {
        (k, int(pd.Timestamp(t).value // 1000))
        for k, t in zip(got["k"], got["ts"])
    }
    assert got_set == expect
    assert len(got) == len(expect)  # no kill/restart duplicates
