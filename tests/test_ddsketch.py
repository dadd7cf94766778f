"""DDSketch: published relative-error bound, BIT-EXACT merge
associativity under partition permutations and arbitrary merge trees,
serialization, bulk-hook parity, and Spark-topology blob equality."""

from __future__ import annotations

import random

import numpy as np
import pytest

from tgdigest_spark.sketches import DDSketch

ALPHA = 0.01
QS = [0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999]
# the bucket boundary ceil(log(x)/log(gamma)) carries ~1-ulp float
# slack vs the ideal geometric fence (module docstring); 1% margin
BOUND = ALPHA * 1.01


def _rel_err(est: float, true: float) -> float:
    return abs(est - true) if true == 0.0 else abs(est - true) / abs(true)


def _rank_item(sorted_vals: np.ndarray, q: float) -> float:
    n = sorted_vals.size
    rank = max(int(np.ceil(q * n)), 1)
    return float(sorted_vals[rank - 1])


@pytest.mark.parametrize(
    "dist", ["lognormal", "uniform", "signed", "heavy_tail", "integers"]
)
def test_relative_error_bound(dist):
    rng = np.random.default_rng(11)
    if dist == "lognormal":
        data = rng.lognormal(3, 2, 100_000)
    elif dist == "uniform":
        data = rng.uniform(0.5, 1e6, 100_000)
    elif dist == "signed":
        data = np.concatenate(
            [rng.lognormal(2, 1, 60_000), -rng.lognormal(1, 2, 40_000),
             np.zeros(500)]
        )
        rng.shuffle(data)
    elif dist == "heavy_tail":
        data = rng.pareto(0.7, 100_000) + 1e-3
    else:
        data = rng.integers(1, 10_000, 100_000).astype(np.float64)
    sk = DDSketch(ALPHA)
    for chunk in np.array_split(data, 23):
        sk.update(chunk)
    srt = np.sort(data)
    est = sk.quantile(QS)
    for q, e in zip(QS, est):
        true = _rank_item(srt, q)
        assert _rel_err(float(e), true) <= BOUND, (dist, q, e, true)


def test_p99_tail_bound_vs_rank_sketches():
    """The reason DDSketch exists here: on a 6-decade long-tailed
    distribution the p99/p999 estimates stay within alpha RELATIVE
    error — a value-domain contract rank sketches don't make."""
    rng = np.random.default_rng(5)
    data = rng.lognormal(0, 3, 500_000)  # spans ~1e-4 .. 1e4
    sk = DDSketch(ALPHA).update(data)
    srt = np.sort(data)
    for q in (0.99, 0.999, 0.9999):
        true = _rank_item(srt, q)
        assert _rel_err(float(sk.quantile(q)), true) <= BOUND


def test_bitexact_merge_any_tree_and_order():
    rng = np.random.default_rng(3)
    data = np.concatenate(
        [rng.lognormal(3, 2, 50_000), -rng.lognormal(1, 1, 20_000),
         np.zeros(100)]
    )
    direct = DDSketch(ALPHA).update(data).serialize()
    parts = np.array_split(data, 17)
    for seed in range(6):
        r = random.Random(seed)
        order = list(range(len(parts)))
        r.shuffle(order)
        sks = [DDSketch(ALPHA).update(parts[i]) for i in order]
        while len(sks) > 1:
            i = r.randrange(len(sks) - 1)
            sks[i].merge(sks.pop(i + 1))
        assert sks[0].serialize() == direct


def test_update_order_insensitive_bitexact():
    rng = np.random.default_rng(9)
    data = rng.lognormal(2, 2, 30_000)
    a = DDSketch(ALPHA).update(data).serialize()
    b = DDSketch(ALPHA).update(data[::-1]).serialize()
    perm = rng.permutation(data.size)
    c = DDSketch(ALPHA).update(data[perm]).serialize()
    assert a == b == c


def test_serialization_roundtrip_and_empty():
    sk = DDSketch(0.02)
    blob = sk.serialize()
    back = DDSketch.deserialize(blob)
    assert back.serialize() == blob
    assert np.isnan(back.quantile(0.5))
    sk.update(np.array([1.0, -2.0, 0.0, 1e9]))
    blob = sk.serialize()
    back = DDSketch.deserialize(blob)
    assert back.serialize() == blob
    assert back.n == 4 and back.zero == 1
    assert back.quantile(0.0) == -2.0 and back.quantile(1.0) == 1e9


def test_alpha_mismatch_and_validation():
    with pytest.raises(ValueError):
        DDSketch(0.0)
    with pytest.raises(ValueError):
        DDSketch(1.0)
    with pytest.raises(ValueError):
        DDSketch(0.01).merge(DDSketch(0.02))


def test_min_max_exact_and_clamped():
    rng = np.random.default_rng(2)
    data = rng.lognormal(0, 1, 10_000)
    sk = DDSketch(ALPHA).update(data)
    assert sk.quantile(0.0) == data.min()
    assert sk.quantile(1.0) == data.max()
    est = np.asarray(sk.quantile(QS))
    assert np.all(est >= data.min()) and np.all(est <= data.max())


def test_infinities_rank_correctly_all_paths():
    """Review regression: +/-inf must land in the reserved overflow
    buckets (representative = +/-inf), not wrap through an int64 cast
    into the smallest bucket — rank parity with TDigest/KLL, pinned
    across update / from_sorted_like / bulk / mass-extraction paths."""
    import warnings

    rng = np.random.default_rng(0)
    data = np.concatenate(
        [rng.lognormal(1, 2, 5000), [np.inf] * 30, [-np.inf] * 10,
         [0.0] * 5, -rng.lognormal(0, 1, 500)]
    )
    rng.shuffle(data)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old path warned on the cast
        sk = DDSketch(ALPHA).update(data)
        srt = np.sort(data)
        n = data.size
        for q in (0.001, 0.5, 0.99, 0.999, 1.0):
            true = _rank_item(srt, q)
            est = float(sk.quantile(q))
            if np.isinf(true):
                assert est == true, (q, est, true)
            else:
                assert _rel_err(est, true) <= BOUND, (q, est, true)
        direct = sk.serialize()
        proto = DDSketch(ALPHA)
        assert proto.from_sorted_like(srt).serialize() == direct
        assert proto.serialize_sorted_groups_like(srt, [0], [n])[0] == direct
        blobs = [DDSketch(ALPHA).update(p).serialize()
                 for p in np.array_split(data, 7)]
        assert proto.merge_blob_groups_like(
            np.array(blobs, dtype=object), [0], [7]
        )[0] == direct
        qs = [0.001, 0.5, 0.999, 1.0]
        assert np.array_equal(
            DDSketch.quantile_blobs([direct], qs)[0],
            np.asarray(DDSketch.deserialize(direct).quantile(qs)),
        )


def test_weighted_update_bitexact_vs_exploded():
    """update(v, counts) must be byte-identical to
    update(np.repeat(v, counts)) — the pre-aggregated (value, count)
    table pattern."""
    rng = np.random.default_rng(14)
    v = np.concatenate(
        [rng.normal(0, 50, 2000), [0.0, np.inf, -np.inf]]
    )
    w = rng.integers(0, 7, v.size)
    a = DDSketch(ALPHA).update(v, w).serialize()
    b = DDSketch(ALPHA).update(np.repeat(v[w > 0], w[w > 0])).serialize()
    assert a == b
    # mixed weighted + unweighted updates compose
    sk = DDSketch(ALPHA).update(v[:100]).update(v[100:], w[100:])
    ref = DDSketch(ALPHA).update(
        np.concatenate([v[:100], np.repeat(v[100:], w[100:])])
    )
    assert sk.serialize() == ref.serialize()
    with pytest.raises(ValueError):
        DDSketch(ALPHA).update([1.0], [-1])
    with pytest.raises(ValueError):
        DDSketch(ALPHA).update([1.0], [0.5])
    with pytest.raises(ValueError):
        DDSketch(ALPHA).update([1.0, 2.0], [1])
    # null value or null weight drops the pair
    import pandas as pd

    sk = DDSketch(ALPHA).update(
        pd.Series([1.0, None, 3.0]), pd.Series([2, 5, None])
    )
    assert sk.n == 2


def test_weighted_quantiles_dd_spark(spark, transcripts):
    """quantiles_dd over a pre-aggregated (value, count) rollup equals
    (bit-exact blob ⇒ identical estimates) the unweighted build over
    the raw rows."""
    from pyspark.sql import functions as F

    from tgdigest_spark.agg import sketch_column
    from tgdigest_spark.api import quantiles_dd

    raw = transcripts.select(F.length("text").cast("double").alias("v"))
    pre = raw.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    est_w = quantiles_dd(pre, "v", [0.5, 0.95, 0.99], weight="c")
    est_raw = quantiles_dd(raw, "v", [0.5, 0.95, 0.99])
    assert est_w == est_raw
    blob_w = sketch_column(
        pre, ["v", F.col("c").cast("long")], lambda: DDSketch(ALPHA)
    ).serialize()
    blob_raw = sketch_column(raw, "v", lambda: DDSketch(ALPHA)).serialize()
    assert blob_w == blob_raw


def test_nulls_dropped_like_library_convention():
    import pandas as pd

    sk = DDSketch(ALPHA).update(pd.Series([1.0, None, np.nan, 3.0]))
    assert sk.n == 2


def test_cdf_matches_quantile_inverse():
    rng = np.random.default_rng(4)
    data = rng.lognormal(1, 1.5, 200_000)
    sk = DDSketch(ALPHA).update(data)
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        x = _rank_item(srt, q)
        est = float(sk.cdf([x])[0])
        assert abs(est - q) <= 0.005, (q, est)
    # NaN probe propagates NaN (family parity with TDigest.cdf and
    # DDSketch.quantile), never reads as "100% below threshold"
    out = sk.cdf([np.nan, 1.0])
    assert np.isnan(out[0]) and not np.isnan(out[1])


# -- bulk hooks ---------------------------------------------------------


def test_from_sorted_like_bitexact():
    rng = np.random.default_rng(6)
    data = np.concatenate(
        [rng.lognormal(1, 2, 5_000), -rng.lognormal(0, 1, 2_000),
         np.zeros(37)]
    )
    proto = DDSketch(ALPHA)
    assert (
        proto.from_sorted_like(np.sort(data)).serialize()
        == DDSketch(ALPHA).update(data).serialize()
    )
    assert proto.from_sorted_like(np.empty(0)).serialize() == DDSketch(
        ALPHA
    ).serialize()


def test_serialize_sorted_groups_like_bitexact():
    rng = np.random.default_rng(8)
    vals = np.concatenate(
        [rng.normal(0, 100, 4_000), np.zeros(50), rng.lognormal(0, 3, 1_000)]
    )
    codes = rng.integers(0, 300, vals.size)
    order = np.lexsort((vals, codes))
    v_s, c_s = vals[order], codes[order]
    starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
    ends = np.r_[starts[1:], c_s.size]
    proto = DDSketch(ALPHA)
    blobs = proto.serialize_sorted_groups_like(v_s, starts, ends)
    for s, e, b in zip(starts, ends, blobs):
        assert b == proto.from_sorted_like(v_s[s:e]).serialize()
    # empty segment -> empty sketch blob
    assert proto.serialize_sorted_groups_like(v_s, [0], [0])[0] == DDSketch(
        ALPHA
    ).serialize()


def test_merge_blob_groups_like_bitexact():
    rng = np.random.default_rng(10)
    proto = DDSketch(ALPHA)
    blobs, gs, ge = [], [], []
    pos = 0
    for gi in range(80):
        gs.append(pos)
        for _ in range(int(rng.integers(1, 6))):
            n = int(rng.integers(0, 60))
            blobs.append(
                DDSketch(ALPHA).update(rng.normal(gi, 10, n)).serialize()
            )
            pos += 1
        ge.append(pos)
    merged = proto.merge_blob_groups_like(
        np.array(blobs, dtype=object), np.array(gs), np.array(ge)
    )
    for gi, (s, e) in enumerate(zip(gs, ge)):
        acc = DDSketch.deserialize(blobs[s])
        for b in blobs[s + 1 : e]:
            acc.merge(DDSketch.deserialize(b))
        assert merged[gi] == acc.serialize(), gi
    with pytest.raises(ValueError):
        proto.merge_blob_groups_like(
            [DDSketch(0.05).update(np.ones(3)).serialize()], [0], [1]
        )


def test_quantile_blobs_exact_parity():
    rng = np.random.default_rng(12)
    blobs = [DDSketch(ALPHA).serialize()]  # empty blob -> NaN row
    for gi in range(60):
        n = int(rng.integers(1, 500))
        sign = -1.0 if gi % 3 == 0 else 1.0
        blobs.append(
            DDSketch(ALPHA)
            .update(sign * rng.lognormal(gi % 5, 1 + gi % 3, n))
            .serialize()
        )
    qs = [0.0, 0.01, 0.5, 0.95, 0.99, 1.0]
    bulk = DDSketch.quantile_blobs(blobs, qs)
    for i, b in enumerate(blobs):
        ref = np.asarray(DDSketch.deserialize(b).quantile(qs))
        assert np.array_equal(
            np.nan_to_num(ref, nan=-1e308), np.nan_to_num(bulk[i], nan=-1e308)
        ), i


# -- Spark topology -----------------------------------------------------


def test_spark_build_bitexact_and_grouped_topologies(spark, transcripts):
    """Distributed build == single-process fold, byte-for-byte; and all
    three grouped topologies produce IDENTICAL blobs (the north-rule
    merge-associativity contract in its strongest, bit-exact form)."""
    from pyspark.sql import functions as F

    from tgdigest_spark.agg import sketch_by_key, sketch_column

    pdf = transcripts.select(F.length("text").alias("v")).toPandas()
    local = DDSketch(ALPHA).update(pdf["v"]).serialize()
    dist = sketch_column(
        transcripts.repartition(16), F.length("text"), lambda: DDSketch(ALPHA)
    ).serialize()
    assert dist == local

    def blobs_of(method, df):
        rows = sketch_by_key(
            df, ["role"], F.length("text"), lambda: DDSketch(ALPHA),
            method=method,
        ).collect()
        return {r["role"]: bytes(r["sketch"]) for r in rows}

    a = blobs_of("combine", transcripts.repartition(16))
    b = blobs_of("salted", transcripts.repartition(7))
    c = blobs_of("clustered", transcripts.repartition("role"))
    assert a == b == c


def test_dd_cube_rollup_bitexact_blobs(spark, sf001_dir):
    """Rolled-up DDSketch cube cells are BYTE-identical to sketches
    built directly from the raw rows of that group — the strongest form
    of the merge-of-leaves == direct-build cube contract (HLL pins
    register equality; t-digest only a rank bound)."""
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.api import sketch_cube_scope

    ev = (
        spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
        .withColumn("day", F.to_date("ts"))
    )
    gs = [("event_type", "day"), ("event_type",), ()]
    with sketch_cube_scope(
        ev, ["event_type", "day"], "value", lambda: DDSketch(ALPHA),
        grouping_sets=gs,
    ) as cube:
        rows = cube.collect()
    rolled = {
        r["event_type"]: bytes(r["sketch"])
        for r in rows
        if r["grouping_id"] == 1
    }
    direct = {
        r["event_type"]: bytes(r["sketch"])
        for r in sketch_by_key(
            ev, ["event_type"], "value", lambda: DDSketch(ALPHA)
        ).collect()
    }
    assert rolled == direct
    (global_blob,) = [
        bytes(r["sketch"]) for r in rows if r["grouping_id"] == 3
    ]
    from tgdigest_spark.agg import sketch_column

    assert global_blob == sketch_column(
        ev, "value", lambda: DDSketch(ALPHA)
    ).serialize()


def test_sliding_quantiles_dd_bitexact_and_bound(spark, sf001_dir):
    """Pane-merged sliding DD windows: blobs byte-equal to direct
    per-window builds from exploded raw rows, and the per-window p95
    satisfies the relative-error bound vs the exact rank item."""
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.agg import sketch_by_key
    from tgdigest_spark.api import sliding_quantiles_dd, sliding_window_sketches

    ev = spark.read.parquet(os.path.join(sf001_dir, "events.parquet"))
    got = {
        r["window_start"]: bytes(r["sketch"])
        for r in sliding_window_sketches(
            ev, "ts", "value", lambda: DDSketch(ALPHA), 6, 2
        ).collect()
    }
    pidx = F.floor(F.unix_date(F.to_date("ts")) / 2)
    facts_w = ev.select(
        F.explode(F.sequence(pidx - 2, pidx)).alias("w"),
        F.col("value").alias("v"),
    )
    direct = {
        r["w"]: bytes(r["sketch"])
        for r in sketch_by_key(
            facts_w, ["w"], "v", lambda: DDSketch(ALPHA)
        ).collect()
    }
    assert len(got) == len(direct)
    for ws, blob in got.items():
        assert direct[(ws.toordinal() - 719163) // 2] == blob
    # estimate extraction + bound per window
    est = {
        r["window_start"]: r["p95"]
        for r in sliding_quantiles_dd(ev, "ts", "value", [0.95], 6, 2)
        .collect()
    }
    vals = facts_w.toPandas()
    for ws, e in est.items():
        gv = np.sort(
            vals[vals["w"] == (ws.toordinal() - 719163) // 2]["v"].to_numpy(
                np.float64
            )
        )
        assert _rel_err(float(e), _rank_item(gv, 0.95)) <= BOUND


def test_stateful_stream_dd_exact_batch_parity(spark, transcripts_path, tmp_path):
    """Streaming per-key DD state converges to EXACTLY the batch
    sketch's estimates (bit-exact merges make streaming == batch a
    byte-level identity, not a bound)."""
    from pyspark.sql import functions as F

    from tgdigest_spark.streaming.stateful import stateful_sketch_stream

    src = spark.read.parquet(transcripts_path)
    stream_dir = str(tmp_path / "dd_src")
    sample = src.where(F.col("role").isin("user", "assistant")).limit(2000)
    sample.repartition(3).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select(
            F.col("role").alias("key_in"),
            F.length("text").cast("double").alias("v"),
        )
    )
    out = stateful_sketch_stream(stream, "key_in", "v", lambda: DDSketch(ALPHA))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("dd_stateful_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    final = {
        r["key"]: (r["n"], r["p50"], r["p95"])
        for r in spark.sql(
            "SELECT key, n, p50, p95 FROM dd_stateful_out s WHERE n = "
            "(SELECT max(n) FROM dd_stateful_out t WHERE t.key = s.key)"
        ).collect()
    }
    batch = spark.read.parquet(stream_dir)
    pdf = batch.select("role", F.length("text").cast("double").alias("v")).toPandas()
    for role, (n, p50, p95) in final.items():
        sk = DDSketch(ALPHA).update(pdf[pdf["role"] == role]["v"])
        assert n == sk.n
        ref = sk.quantile([0.5, 0.95])
        assert (p50, p95) == (float(ref[0]), float(ref[1]))


def test_dd_sketch_table_roundtrip_rollup_bitexact(spark, sf001_dir, tmp_path):
    """Persisted DD leaf table (sources/sketch_table.py) → day leaves
    written, read back manifest-gated, rolled up by event_type — the
    rollup blob is byte-equal to a direct build from the raw rows (the
    persisted-re-aggregation contract, DD flavor)."""
    import os

    from pyspark.sql import functions as F

    from tgdigest_spark.agg import merge_blobs_by_key, sketch_by_key
    from tgdigest_spark.sources.sketch_table import (
        read_sketch_table,
        write_sketch_table,
    )

    ev = spark.read.parquet(
        os.path.join(sf001_dir, "events.parquet")
    ).withColumn("day", F.to_date("ts"))
    leaves = sketch_by_key(
        ev, ["event_type", "day"], "value", lambda: DDSketch(ALPHA)
    )
    path = str(tmp_path / "ddtbl")
    write_sketch_table(leaves, path, "ddsketch", {"alpha": ALPHA})
    back, meta = read_sketch_table(
        spark, path, expect_kind="ddsketch", expect_params={"alpha": ALPHA}
    )
    assert meta["sketch_kind"] == "ddsketch"
    rolled = {
        r["event_type"]: bytes(r["sketch"])
        for r in merge_blobs_by_key(
            back, ["event_type"], lambda: DDSketch(ALPHA)
        ).collect()
    }
    direct = {
        r["event_type"]: bytes(r["sketch"])
        for r in sketch_by_key(
            ev, ["event_type"], "value", lambda: DDSketch(ALPHA)
        ).collect()
    }
    assert rolled == direct


def test_api_quantiles_dd_bound(spark, transcripts):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import grouped_quantiles_dd, quantiles_dd

    pdf = transcripts.select(F.length("text").alias("v")).toPandas()
    srt = np.sort(pdf["v"].to_numpy(dtype=np.float64))
    est = quantiles_dd(transcripts, F.length("text"), [0.5, 0.95, 0.99])
    for q, e in est.items():
        assert _rel_err(e, _rank_item(srt, q)) <= BOUND
    g = grouped_quantiles_dd(
        transcripts, ["role"], F.length("text"), [0.5, 0.99]
    ).toPandas()
    vals = transcripts.select(
        "role", F.length("text").alias("v")
    ).toPandas()
    for _, row in g.iterrows():
        gv = np.sort(
            vals[vals["role"] == row["role"]]["v"].to_numpy(np.float64)
        )
        assert _rel_err(row["p50"], _rank_item(gv, 0.5)) <= BOUND
        assert _rel_err(row["p99"], _rank_item(gv, 0.99)) <= BOUND
