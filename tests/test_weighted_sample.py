"""weighted_sample: determinism, layout independence, weight
monotonicity, strata exactness, and degenerate-weight exclusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def items(spark):
    # 80 light (w=1) + 20 heavy (w=9) items
    rows = [(i, 9.0 if i < 20 else 1.0, "h" if i < 20 else "l") for i in range(100)]
    return spark.createDataFrame(rows, "id long, w double, grp string")


def _sample_ids(df, n, seed, by=None):
    from tgdigest_spark.operators.sampling import weighted_sample

    got = weighted_sample(
        df, n, weight="w", key="id", seed=seed, by=by, tiebreak="id"
    )
    return sorted(r["id"] for r in got.select("id").collect())


def test_deterministic_and_layout_independent(spark, items):
    a = _sample_ids(items, 10, seed="s1")
    b = _sample_ids(items.repartition(7), 10, seed="s1")
    c = _sample_ids(items.coalesce(1), 10, seed="s1")
    assert a == b == c
    assert len(a) == 10
    # a different seed gives a different draw
    assert a != _sample_ids(items, 10, seed="s2")


def test_heavier_weights_sampled_more(spark, items):
    """Inclusion frequency must track weight: with 20 items at w=9 and
    80 at w=1 (64% of total mass on the heavy fifth), the heavy items
    should dominate repeated draws."""
    heavy = light = 0
    for s in range(30):
        ids = _sample_ids(items, 20, seed=f"seed{s}")
        heavy += sum(1 for i in ids if i < 20)
        light += sum(1 for i in ids if i >= 20)
    # per-draw expectation ≈ 12 heavy of 20 (uniform would give 4);
    # PER-ITEM inclusion rate is the right comparison: each heavy item
    # (w=9) should appear several times as often as each light (w=1)
    per_heavy = heavy / 30 / 20
    per_light = light / 30 / 80
    assert heavy / 30 > 9.0, (heavy / 30, light / 30)
    assert per_heavy > 4 * per_light, (per_heavy, per_light)


def test_stratified_exact_n_and_exclusions(spark, items):
    from tgdigest_spark.operators.sampling import weighted_sample

    with_bad = items.union(
        spark.createDataFrame(
            [(1000, 0.0, "l"), (1001, None, "l"), (1002, -3.0, "h")],
            "id long, w double, grp string",
        )
    )
    got = weighted_sample(
        with_bad, 5, weight="w", key="id", by="grp", seed="x", tiebreak="id"
    )
    rows = got.collect()
    per = {}
    for r in rows:
        per.setdefault(r["grp"], []).append(r["id"])
    assert sorted(len(v) for v in per.values()) == [5, 5]
    assert all(i < 1000 for v in per.values() for i in v)  # bad weights out


def test_selection_invariant_to_ulp_perturbation():
    """Cross-engine robustness by construction: the 6dp rank rounding
    must absorb libm ulp differences — perturbing the -ln(u) input by
    ±1 ulp (the worst divergence a correctly-rounded-vs-not libm can
    produce) must not change the selected set on real data. Pure-numpy
    replica of the operator's formula over the sf0.001 documents table."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    ).to_pandas()
    t = t[t["n_chars"].notna() & (t["n_chars"] > 0)]
    ids = t["doc_id"].to_numpy()
    w = t["n_chars"].to_numpy(dtype=np.float64)
    u = np.array(
        [
            (int(hashlib.md5(f"{i}\x1fws42".encode()).hexdigest()[:13], 16) + 1)
            / float(16**13)
            for i in ids
        ]
    )
    neglog = -np.log(u)

    def select(nl):
        rank = np.round(nl / w, 6)
        order = np.lexsort((ids, rank))  # rank, then id tiebreak
        picked = {}
        out = []
        for idx in order:
            g = t["lang"].iat[idx]
            if picked.get(g, 0) < 50:
                picked[g] = picked.get(g, 0) + 1
                out.append(ids[idx])
        return sorted(out)

    base = select(neglog)
    up = select(np.nextafter(neglog, np.inf))
    down = select(np.nextafter(neglog, -np.inf))
    assert base == up == down


def test_rejects_bad_n(spark, items):
    from tgdigest_spark.operators.sampling import weighted_sample

    with pytest.raises(ValueError):
        weighted_sample(items, 0, weight="w", key="id")


def test_stratified_plan_uses_window_group_limit(spark, items):
    """Scale shape: the per-stratum top-n must plan as WindowGroupLimit
    (each task keeps an n-heap) — not a full sort of every stratum."""
    from tgdigest_spark.operators.sampling import weighted_sample

    plan = (
        weighted_sample(
            items, 5, weight="w", key="id", by="grp", tiebreak="id"
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan  # built-ins only
