"""Priority sampling: DLT unbiasedness, tau = (k+1)-th largest priority,
exact regime, bit-exact KMV-shaped merge, Spark topology parity."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from tgdigest_spark.sketches import PrioritySample
from tgdigest_spark.sketches.hashing import base_hash_full
from tgdigest_spark.sketches.prioritysample import _uniforms


def _ids(prefix: str, n: int) -> np.ndarray:
    return np.array([f"{prefix}{i}" for i in range(n)], dtype=object)


def test_tau_is_k_plus_1_th_largest_priority():
    rng = np.random.default_rng(3)
    n, k = 5000, 256
    ids = _ids("x", n)
    w = rng.pareto(1.2, n) + 0.05
    sk = PrioritySample(k)
    for lo in range(0, n, 977):
        sk.update(ids[lo : lo + 977], w[lo : lo + 977])
    h, _ = base_hash_full(__import__("pandas").Series(ids))
    pri = np.sort(w / _uniforms(h.astype(np.uint64)))[::-1]
    assert sk.tau == pri[k]
    # retained set == brute-force top-k by priority
    assert set(sk.ids) == set(
        np.asarray(ids)[np.argsort(-(w / _uniforms(h.astype(np.uint64))))[:k]]
    )


def test_total_and_subset_accuracy_skewed():
    rng = np.random.default_rng(1)
    n, k = 200_000, 4096
    ids = _ids("it", n)
    w = rng.pareto(1.5, n) + 0.1
    sk = PrioritySample(k)
    for lo in range(0, n, 7013):
        sk.update(ids[lo : lo + 7013], w[lo : lo + 7013])
    tot = w.sum()
    assert abs(sk.total_estimate() - tot) / tot < 0.05
    true_sub = w[np.array([i.endswith("3") for i in ids])].sum()
    est_sub = sk.subset_sum(lambda s: s.endswith("3"))
    assert abs(est_sub - true_sub) / true_sub < 0.15


def test_unbiasedness_across_independent_universes():
    """DLT Theorem 1: E[estimate] = true subset sum. The uniforms are
    deterministic per id, so independent trials = disjoint id
    universes; the mean over trials must converge at CLT rate."""
    rng = np.random.default_rng(7)
    trials, n, k = 200, 1500, 64
    errs = []
    rels = []
    for t in range(trials):
        ids = _ids(f"u{t}_", n)
        w = rng.lognormal(0, 1.2, n)
        sk = PrioritySample(k).update(ids, w)
        tot = w.sum()
        errs.append(sk.total_estimate() - tot)
        rels.append((sk.total_estimate() - tot) / tot)
    mean_rel = float(np.mean(rels))
    sd_rel = float(np.std(rels)) / math.sqrt(trials)
    # mean within 4 standard errors of zero (and sd_rel is small enough
    # for the check to have teeth)
    assert abs(mean_rel) <= 4.0 * sd_rel + 1e-12, (mean_rel, sd_rel)
    assert sd_rel < 0.02


def test_exact_regime_full_multiset():
    rng = np.random.default_rng(2)
    ids = _ids("e", 500)
    w = rng.pareto(1.5, 500) + 0.1
    sk = PrioritySample(1000).update(ids, w)
    assert sk.exact_regime and sk.tau == 0.0
    assert dict(zip(sk.ids, sk.wts)) == dict(zip(ids, w))
    assert math.fsum(sk.adjusted_weights()) == math.fsum(w)
    # exact subset too
    mask = np.array([i.endswith("7") for i in sk.ids])
    true = math.fsum(w[np.array([i.endswith("7") for i in ids])])
    assert math.isclose(sk.subset_sum(mask), true, rel_tol=1e-12)


def test_bitexact_merge_any_tree_and_update_order():
    rng = np.random.default_rng(5)
    n, k = 60_000, 1024
    ids = _ids("m", n)
    w = rng.pareto(1.1, n) + 0.01
    direct = PrioritySample(k).update(ids, w).serialize()
    perm = rng.permutation(n)
    assert PrioritySample(k).update(ids[perm], w[perm]).serialize() == direct
    parts = [(ids[lo : lo + 9001], w[lo : lo + 9001]) for lo in range(0, n, 9001)]
    for seed in range(4):
        r = random.Random(seed)
        order = list(range(len(parts)))
        r.shuffle(order)
        sks = [PrioritySample(k).update(*parts[i]) for i in order]
        while len(sks) > 1:
            i = r.randrange(len(sks) - 1)
            sks[i].merge(sks.pop(i + 1))
        assert sks[0].serialize() == direct, seed


def test_serialization_roundtrip_unicode_and_empty():
    sk = PrioritySample(8)
    blob = sk.serialize()
    back = PrioritySample.deserialize(blob)
    assert back.serialize() == blob and back.n == 0 and back.exact_regime
    ids = np.array(["héllo", "世界", "a b", ""], dtype=object)
    # empty-string id is a valid key
    sk.update(ids, np.array([1.0, 2.0, 3.0, 4.0]))
    back = PrioritySample.deserialize(sk.serialize())
    assert back.serialize() == sk.serialize()
    assert set(back.ids) == set(ids)


def test_id_dtype_independence_bitexact():
    """Review regression: priorities must be drawn from the STRING form
    of the id (the serialized domain) — an int-typed id column and its
    cast-to-string form are the same item, byte-for-byte."""
    import pandas as pd

    w = np.array([1.0, 2.0, 3.0, 4.0])
    a = PrioritySample(8).update(pd.Series([1, 2, 3, 4]), w).serialize()
    b = PrioritySample(8).update(pd.Series(["1", "2", "3", "4"]), w).serialize()
    assert a == b
    # and merging the two forms does NOT double-count
    m = PrioritySample.deserialize(a).merge(PrioritySample.deserialize(b))
    assert sorted(m.ids) == ["1", "1", "2", "2", "3", "3", "4", "4"]


def test_validation_and_null_policy():
    import pandas as pd

    with pytest.raises(ValueError):
        PrioritySample(0)
    with pytest.raises(ValueError):
        PrioritySample(4).update(["a"], [-1.0])
    with pytest.raises(ValueError):
        PrioritySample(4).merge(PrioritySample(8))
    with pytest.raises(ValueError):
        PrioritySample(4).update(["a", "b"], [1.0])
    sk = PrioritySample(16).update(
        pd.Series(["a", None, "c", "d"]), pd.Series([1.0, 2.0, None, 0.0])
    )
    # null id, null weight, zero weight all dropped
    assert sk.n == 1 and list(sk.ids) == ["a"]
    with pytest.raises(ValueError):
        sk.subset_sum(np.array([True, False]))
    # a negative weight raises even when its id is null — the defect
    # must not hide behind a failed upstream join
    with pytest.raises(ValueError):
        PrioritySample(8).update(
            pd.Series([None, "x"]), pd.Series([-5.0, 1.0])
        )


def test_grouped_priority_sample_bitexact_and_rows(spark, transcripts):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import (
        grouped_priority_sample,
        grouped_priority_sample_rows,
    )
    from tgdigest_spark.sketches.prioritysample import PrioritySample

    k = 128
    key = F.concat_ws("#", "conv_id", "turn_idx")
    wcol = F.length("text").cast("double")
    got = {
        r["role"]: bytes(r["sketch"])
        for r in grouped_priority_sample(
            transcripts.repartition(16), ["role"], key, wcol, k=k
        ).collect()
    }
    # per-group local fold, byte-equal
    pdf = transcripts.select(
        "role", key.alias("i"), wcol.alias("w")
    ).toPandas()
    for role, grp in pdf.groupby("role"):
        assert got[role] == PrioritySample(k).update(grp["i"], grp["w"]).serialize()
    # layout independence
    got2 = {
        r["role"]: bytes(r["sketch"])
        for r in grouped_priority_sample(
            transcripts.repartition(5, "conv_id"), ["role"], key, wcol, k=k
        ).collect()
    }
    assert got == got2
    rows = grouped_priority_sample_rows(
        transcripts, ["role"], key, wcol, k=k
    ).toPandas()
    expect_rows = int(
        pdf.groupby("role").size().clip(upper=k).sum()
    )  # strata smaller than k are fully retained
    assert len(rows) == expect_rows
    assert (rows["adjusted_weight"] >= rows["weight"]).all()
    # per-stratum total estimates within 25% (k=128 -> ~9% 1 sigma)
    for role, grp in pdf.groupby("role"):
        est = rows[rows["role"] == role]["adjusted_weight"].sum()
        exact = grp["w"].sum()
        assert abs(est - exact) / exact < 0.25, role


def test_spark_build_bitexact_and_rows(spark, transcripts):
    from pyspark.sql import functions as F

    from tgdigest_spark.api import priority_sample_rows, priority_sample_sketch
    from tgdigest_spark.sketches.prioritysample import PrioritySample

    k = 512
    key = F.concat_ws("#", "conv_id", "turn_idx")
    wcol = F.length("text").cast("double")
    pdf = transcripts.select(
        key.alias("i"), wcol.alias("w")
    ).toPandas()
    local = PrioritySample(k).update(pdf["i"], pdf["w"]).serialize()
    dist = priority_sample_sketch(
        transcripts.repartition(16), key, wcol, k=k
    ).serialize()
    assert dist == local
    # layout independence
    dist2 = priority_sample_sketch(
        transcripts.repartition(5, "conv_id"), key, wcol, k=k
    ).serialize()
    assert dist2 == local
    rows = priority_sample_rows(transcripts, key, wcol, k=k)
    out = rows.toPandas()
    assert len(out) == k
    assert (out["adjusted_weight"] >= out["weight"]).all()
    # total estimate within 10% of the exact sum
    exact = float(pdf["w"].sum())
    est = float(out["adjusted_weight"].sum())
    assert abs(est - exact) / exact < 0.1
