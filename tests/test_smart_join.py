"""Sketch-advised equi-join: strategy selection + exact result parity.

The PLAN is approximate (HLL / MG / AGMS bounds); the RESULT must be
row-for-row identical to the plain join under every strategy — that is
the contract the driver gate (smart_join_agg) also checks against its
DuckDB oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tgdigest_spark.operators.smart_join import plan_equijoin, smart_equijoin


@pytest.fixture(scope="module")
def skewed_pair(spark):
    """200k-row fact with one key holding ~30% of rows + a 5k-row dim
    too big to broadcast under the test threshold."""
    n, n_dim = 200_000, 5_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit(7))
        .otherwise((F.col("id") * 2654435761 % n_dim).cast("long"))
        .alias("fk"),
        (F.col("id") % 97).alias("fval"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("dk"), (F.col("id") % 13).alias("dval")
    )
    return fact, dim


def _plain(fact, dim):
    return fact.join(dim, fact["fk"] == dim["dk"], "inner")


def _digest(df):
    """Order-free exact fingerprint of the join output."""
    return df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("fval") * F.col("dval")).alias("dot"),
        F.sum(
            F.xxhash64("fk", "fval", "dk", "dval").cast("decimal(38,0)")
        ).alias("hash"),
    ).collect()[0]


def test_plan_broadcast_small_dim(spark, sf001_dir):
    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf001_dir}/customer.parquet")
    plan = plan_equijoin(orders, "o_custkey", customer, "c_custkey")
    assert plan["strategy"] == "broadcast_b"
    assert plan["hints"] == {"bloom_prune": False}  # uniform schema
    true_out = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert abs(plan["est_output_rows"] - true_out) <= max(
        50, 0.15 * true_out
    )
    joined = smart_equijoin(orders, "o_custkey", customer, "c_custkey",
                            plan=plan)
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == true_out


def test_plan_salted_detects_hot_key(skewed_pair):
    fact, dim = skewed_pair
    plan = plan_equijoin(
        fact, "fk", dim, "dk", broadcast_rows=1_000, broadcast_bytes=0,
        partitions=32,
    )
    assert plan["strategy"] == "salted"
    assert "7" in plan["hot_keys"]
    # ~30% share vs 1/32 uniform -> ratio ~9.6; replication follows it
    assert 2 <= plan["replication"] <= 64
    est = plan["est_output_rows"]
    true_out = _plain(fact, dim).count()
    assert abs(est - true_out) <= 0.2 * true_out


def test_salted_parity_with_plain_join(skewed_pair):
    fact, dim = skewed_pair
    plan = plan_equijoin(
        fact, "fk", dim, "dk", broadcast_rows=1_000, broadcast_bytes=0,
        partitions=32,
    )
    assert plan["strategy"] == "salted"
    got = _digest(smart_equijoin(fact, "fk", dim, "dk", plan=plan))
    want = _digest(_plain(fact, dim))
    assert tuple(got) == tuple(want)


def test_plan_sampled_profile_same_decision(skewed_pair):
    """A 20% deterministic sample reaches the same salted decision
    (the hot-share ratio is scale-free under sampling) and the scaled
    AGMS output estimate stays in tolerance."""
    fact, dim = skewed_pair
    plan = plan_equijoin(
        fact, "fk", dim, "dk", broadcast_rows=1_000, broadcast_bytes=0,
        partitions=32, sample_fraction=0.2,
    )
    assert plan["strategy"] == "salted"
    assert "7" in plan["hot_keys"]
    true_out = _plain(fact, dim).count()
    assert abs(plan["est_output_rows"] - true_out) <= 0.3 * true_out
    # the decision parameterizes the SAME exact execution
    got = _digest(smart_equijoin(fact, "fk", dim, "dk", plan=plan))
    want = _digest(_plain(fact, dim))
    assert tuple(got) == tuple(want)


def test_salt_side_follows_the_hot_mass(skewed_pair):
    """When the hot rows live on side B (inputs swapped), the plan
    must salt B and replicate A — salting the light side would leave
    the heavy reducer input unchanged while multiplying shuffle by R.
    Output parity must hold either way."""
    fact, dim = skewed_pair
    plan = plan_equijoin(
        dim, "dk", fact, "fk", broadcast_rows=1_000, broadcast_bytes=0,
        partitions=32,
    )
    assert plan["strategy"] == "salted"
    assert plan["salt_side"] == "b"
    got = _digest(smart_equijoin(dim, "dk", fact, "fk", plan=plan))
    want = _digest(_plain(fact, dim))
    assert tuple(got) == tuple(want)


def test_plan_broadcast_by_catalyst_bytes(skewed_pair):
    """Even with the row threshold forced to 0, a dim whose Catalyst
    size estimate fits under autoBroadcastJoinThreshold is broadcast —
    the planner must never salt a join Catalyst would broadcast (the
    first joinstress run measured that mistake: BHJ on every branch,
    salting pure overhead)."""
    fact, dim = skewed_pair
    plan = plan_equijoin(fact, "fk", dim, "dk", broadcast_rows=0,
                         partitions=32)
    assert plan["strategy"] == "broadcast_b", plan["reasons"]
    assert "Catalyst stats" in " ".join(plan["reasons"])


def test_plan_shuffle_when_uniform_and_big(spark):
    a = spark.range(50_000).select((F.col("id") % 40_000).alias("ka"))
    b = spark.range(50_000).select((F.col("id") % 40_000).alias("kb"))
    plan = plan_equijoin(a, "ka", b, "kb", broadcast_rows=1_000,
                         broadcast_bytes=0, partitions=8)
    assert plan["strategy"] == "shuffle"
    assert plan["hot_keys"] == []
    # ~all rows match (est_out ~ 62.5k > half the bigger input): no
    # bloom-prune hint on a non-selective join
    assert plan["hints"]["bloom_prune"] is False
    # a selective join (dim holds 1% of the key domain) hints pruning
    sel = spark.range(400).select((F.col("id") % 400).alias("kb"))
    plan2 = plan_equijoin(a, "ka", sel, "kb", broadcast_rows=0,
                          broadcast_bytes=0, partitions=8)
    assert plan2["hints"]["bloom_prune"] is True
    got = smart_equijoin(a, "ka", b, "kb", plan=plan).count()
    assert got == a.join(b, a["ka"] == b["kb"]).count()


def test_null_keys_never_match(spark):
    a = spark.createDataFrame(
        [(None, 1), (7, 2), (8, 3)], "ka int, va int"
    )
    b = spark.createDataFrame(
        [(None, 10), (7, 20)], "kb int, vb int"
    )
    # force the salted path so null handling crosses the hot/cold split
    plan = {
        "strategy": "salted", "hot_keys": ["7"], "replication": 3,
        "est_output_rows": 1, "partitions": 4, "reasons": [],
    }
    rows = smart_equijoin(a, "ka", b, "kb", plan=plan).collect()
    assert [(r["ka"], r["vb"]) for r in rows] == [(7, 20)]


def test_transcripts_conv_join_plan(transcripts):
    """North-star payload shape: joining turns to a per-conversation
    dim on conv_id. At test scale the dim qualifies for broadcast —
    the planner must say so (either signal), and the executed join
    must match the plain one."""
    spark = transcripts.sparkSession
    turns = transcripts.select("conv_id", "turn_idx", "role")
    conv_dim = (
        transcripts.groupBy(F.col("conv_id").alias("cid"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    plan = plan_equijoin(turns, "conv_id", conv_dim, "cid")
    assert plan["strategy"] == "broadcast_b", plan["reasons"]
    got = smart_equijoin(turns, "conv_id", conv_dim, "cid", plan=plan)
    want = turns.join(conv_dim, turns["conv_id"] == conv_dim["cid"])
    assert got.count() == want.count() == turns.count()


def test_plan_from_persisted_profile_table(skewed_pair, tmp_path):
    """The amortization path: day-grain profile MultiSketch leaves
    persisted in a sketch table, merged back to ONE profile, handed to
    plan_equijoin as a precomputed sketch — same salted decision, zero
    profile scans at plan time. The profile value domain must match
    key_profile_sketch's (cast to string)."""
    from tgdigest_spark.agg import merge_blob_rows, sketch_by_key
    from tgdigest_spark.sketches import HLL, CountSketch, FrequentItems
    from tgdigest_spark.sketches.multi import MultiSketch
    from tgdigest_spark.sources.sketch_table import (
        read_sketch_table,
        write_sketch_table,
    )

    fact, dim = skewed_pair
    spark = fact.sparkSession

    def prof_factory():
        return MultiSketch(
            [HLL(14), CountSketch(5, 8192), FrequentItems(256)]
        )

    # nightly job shape: one leaf per synthetic "day"
    leaves = sketch_by_key(
        fact.select(
            (F.col("fval") % 4).alias("day"),
            F.col("fk").cast("string").alias("_v"),
        ),
        ["day"],
        "_v",
        prof_factory,
    )
    path = str(tmp_path / "profile_tbl")
    write_sketch_table(leaves, path, "multi", {"profile": "fk"})
    blobs, _ = read_sketch_table(spark, path)
    merged = merge_blob_rows(blobs, prof_factory)

    plan = plan_equijoin(
        fact, "fk", dim, "dk", broadcast_rows=1_000, broadcast_bytes=0,
        partitions=32, sketch_a=merged,
    )
    assert plan["strategy"] == "salted"
    assert "7" in plan["hot_keys"]
    direct = plan_equijoin(
        fact, "fk", dim, "dk", broadcast_rows=1_000, broadcast_bytes=0,
        partitions=32,
    )
    assert plan["hot_keys"] == direct["hot_keys"]
    # HLL/CS children merge losslessly -> identical estimates; MG is
    # merge-order-bounded, so compare the decision, not the counters
    assert plan["profile_a"]["distinct_est"] == \
        direct["profile_a"]["distinct_est"]
    assert plan["profile_a"]["selfjoin_size_est"] == \
        direct["profile_a"]["selfjoin_size_est"]


def test_salted_plan_shape(skewed_pair):
    """Pin the PLANS.md topology: Union of two joins, the hot branch
    keyed on (key, _tg_salt) with the dim side exploded BELOW its
    exchange, and the hot/cold predicates pushed into the scans (here:
    into the project over the in-memory range — no filter survives
    above the join)."""
    fact, dim = skewed_pair
    plan = {
        "strategy": "salted", "hot_keys": ["7"], "replication": 3,
        "est_output_rows": 0, "partitions": 8, "reasons": [],
    }
    joined = smart_equijoin(fact, "fk", dim, "dk", plan=plan)
    phys = joined._jdf.queryExecution().executedPlan().toString()
    assert "Union" in phys
    assert "_tg_salt" in phys
    assert "explode" in phys.lower()
    # exactly two joins: cold (key only) + hot (key, salt)
    n_joins = sum(phys.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin",
                   "ShuffledHashJoin"))
    assert n_joins == 2, phys


def test_left_semi_paths(skewed_pair, spark):
    """Semi join (decontamination shape): right side deduped to
    distinct keys before any shuffle; salted and broadcast paths both
    match the plain semi join row-for-row; same-named keys allowed."""
    fact, dim = skewed_pair
    # duplicate + null-polluted right side: dedup must neutralize it
    probes = (
        dim.where(F.col("dk") % 50 == 0)
        .select(F.col("dk").alias("fk"))  # SAME name as the left key
        .unionAll(dim.limit(3).select(F.lit(None).cast("long").alias("fk")))
    )
    probes = probes.unionAll(probes)  # duplicates
    want = fact.join(
        probes.select(F.col("fk").alias("pk")).distinct(),
        fact["fk"] == F.col("pk"), "left_semi",
    ).groupBy().agg(F.count(F.lit(1)).alias("n"),
                    F.sum("fval").alias("s")).collect()[0]

    # forced salted path (hot key 7 is NOT in the probe set -> it
    # lands in the cold branch; 0 and 50... are)
    plan = {
        "strategy": "salted", "hot_keys": ["0", "7"], "replication": 3,
        "est_output_rows": 0, "partitions": 8, "reasons": [],
    }
    got = smart_equijoin(fact, "fk", probes, "fk", plan=plan,
                         how="left_semi")
    row = got.groupBy().agg(F.count(F.lit(1)).alias("n"),
                            F.sum("fval").alias("s")).collect()[0]
    assert (row["n"], row["s"]) == (want["n"], want["s"])
    assert got.columns == fact.columns  # left columns only

    # planned path: deduped probe side is tiny -> broadcast_b
    auto = smart_equijoin(fact, "fk", probes, "fk", how="left_semi",
                          broadcast_rows=1_000)
    r2 = auto.groupBy().agg(F.count(F.lit(1)).alias("n"),
                            F.sum("fval").alias("s")).collect()[0]
    assert (r2["n"], r2["s"]) == (want["n"], want["s"])

    # Spark's own aliases accepted, same as bloom_prune_join
    alias = smart_equijoin(fact, "fk", probes, "fk", plan=plan,
                           how="semi")
    assert alias.count() == want["n"]

    with pytest.raises(ValueError, match="unsupported"):
        smart_equijoin(fact, "fk", probes, "fk", how="left_outer")


def test_left_anti_keeps_null_keys(spark):
    """Anti (the keep-what's-NOT-in-the-benchmark half): null-key left
    rows match nothing and must SURVIVE, including through the forced
    salted split; parity with the plain anti join."""
    a = spark.createDataFrame(
        [(None, 1), (7, 2), (7, 3), (8, 4), (9, 5)], "fk int, fv int"
    )
    b = spark.createDataFrame([(7,), (9,), (None,)], "bk int")
    want = sorted(
        ((r["fk"], r["fv"])
         for r in a.join(b, a["fk"] == b["bk"], "left_anti").collect()),
        key=lambda t: t[1],
    )
    assert want == [(None, 1), (8, 4)]
    plan = {
        "strategy": "salted", "hot_keys": ["7"], "replication": 3,
        "est_output_rows": 0, "partitions": 4, "reasons": [],
    }
    got = sorted(
        ((r["fk"], r["fv"])
         for r in smart_equijoin(a, "fk", b, "bk", plan=plan,
                                 how="anti").collect()),
        key=lambda t: t[1],
    )
    assert got == want
    # planned path (tiny deduped right -> broadcast_b)
    got2 = sorted(
        ((r["fk"], r["fv"])
         for r in smart_equijoin(a, "fk", b, "bk",
                                 how="left_anti").collect()),
        key=lambda t: t[1],
    )
    assert got2 == want


def test_validation(spark):
    a = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    b = spark.range(5).select(F.col("id").alias("j"), F.lit(2).alias("x"))
    with pytest.raises(ValueError, match="disjoint"):
        smart_equijoin(a, "k", b, "j")
    c = spark.range(5).select(
        F.col("id").alias("j"), F.lit(2).alias("_tg_salt")
    )
    with pytest.raises(ValueError, match="reserved"):
        smart_equijoin(a, "k", c, "j")
