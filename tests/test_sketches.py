"""KLL / HLL / count-min / Bloom: published-bound accuracy, merge
associativity under permutations, serialization round-trips.
"""

from __future__ import annotations

import functools

import numpy as np
import pytest

from tgdigest_spark.sketches import HLL, KLL, Bloom, CountMin

# ---------------------------------------------------------------------------
# KLL
# ---------------------------------------------------------------------------

KLL_K = 200
# measured worst rank error 0.0041 for k=200 over 12 seeds x 7 quantiles
# x 3 distributions (theory ~ c/k); asserted with ~2.5x slack
KLL_EPS = 0.01


def _rank(sorted_data: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_data, x, side="right") / len(sorted_data)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "sorted", "reversed"])
def test_kll_rank_error(dist):
    rng = np.random.default_rng(1)
    n = 200_000
    data = {
        "uniform": lambda: rng.uniform(0, 1, n),
        "lognormal": lambda: rng.lognormal(5, 1, n),
        "sorted": lambda: np.sort(rng.uniform(0, 1, n)),
        "reversed": lambda: np.sort(rng.uniform(0, 1, n))[::-1],
    }[dist]()
    kll = KLL(KLL_K)
    for c in np.array_split(data, 23):
        kll.update(c)
    assert kll.n == n
    s = np.sort(data)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        est = kll.quantile(q)
        assert abs(_rank(s, est) - q) <= KLL_EPS, (dist, q)


def test_kll_merge_permutations():
    rng = np.random.default_rng(2)
    data = rng.normal(0, 1, 120_000)
    s = np.sort(data)
    chunks = np.array_split(data, 16)
    for seed in range(4):
        perm = np.random.default_rng(seed).permutation(16)
        parts = [KLL(KLL_K).update(chunks[i]) for i in perm]
        merged = functools.reduce(lambda a, b: a.merge(b), parts)
        assert merged.n == len(data)
        for q in [0.1, 0.5, 0.9]:
            assert abs(_rank(s, merged.quantile(q)) - q) <= KLL_EPS


def test_kll_serialization():
    rng = np.random.default_rng(3)
    kll = KLL(128).update(rng.uniform(0, 100, 50_000))
    rt = KLL.deserialize(kll.serialize())
    assert rt.n == kll.n
    assert np.allclose(
        rt.quantile([0.1, 0.5, 0.9]), kll.quantile([0.1, 0.5, 0.9])
    )


def test_kll_extremes_and_empty():
    kll = KLL(64).update(np.arange(1000.0))
    assert kll.quantile(0.0) == 0.0 and kll.quantile(1.0) == 999.0
    empty = KLL(64)
    assert np.isnan(empty.quantile(0.5))
    assert KLL.deserialize(empty.serialize()).n == 0


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("true_n", [100, 5_000, 200_000])
def test_hll_error_bound(true_n):
    p = 14
    items = np.array([f"item_{i}" for i in range(true_n)])
    hll = HLL(p)
    for c in np.array_split(items, 7):
        hll.update(c)
    est = hll.estimate()
    se = 1.04 / np.sqrt(1 << p)
    assert abs(est - true_n) / true_n <= 4 * se + 0.01, (true_n, est)


def test_hll_duplicates_dont_count():
    hll = HLL(12)
    items = np.array([f"x{i % 50}" for i in range(10_000)])
    hll.update(items)
    assert abs(hll.estimate() - 50) <= 5


def test_hll_merge_is_union():
    a_items = np.array([f"a{i}" for i in range(30_000)])
    b_items = np.array([f"b{i}" for i in range(30_000)])
    overlap = np.array([f"a{i}" for i in range(10_000)])  # subset of a
    a = HLL(14).update(a_items)
    b = HLL(14).update(b_items).update(overlap)
    ab = HLL.deserialize(a.serialize()).merge(b)
    ba = HLL.deserialize(b.serialize()).merge(a)
    assert ab.estimate() == ba.estimate()  # register-max is exact-commutative
    assert abs(ab.estimate() - 60_000) / 60_000 <= 0.05


def test_hll_serialization():
    hll = HLL(10).update(np.arange(1000))
    rt = HLL.deserialize(hll.serialize())
    assert rt.estimate() == hll.estimate()


def test_hll_ertl_beats_ffm_at_crossover():
    """The FFM07 raw/linear-counting switch sits at 2.5m; right there
    the raw estimator's bias peaks (Ertl 2017 fig. 2 — a few percent
    at p=12..14). The Ertl improved estimator (the round-6 default)
    has no switch and must stay inside the normal 1.04/sqrt(m) band
    at the crossover while FFM visibly exceeds it on average."""
    p = 12
    m = 1 << p
    n = int(2.5 * m)
    ertl_err, ffm_err = [], []
    for t in range(10):
        h = HLL(p)
        h.update(np.array([f"t{t}_{i}" for i in range(n)]))
        ertl_err.append((h.estimate("ertl") - n) / n)
        ffm_err.append((h.estimate("ffm") - n) / n)
    se = 1.04 / np.sqrt(m)  # 1.63% at p=12
    assert abs(np.mean(ertl_err)) <= se, np.mean(ertl_err)
    # FFM's known crossover bias: mean error above one sigma
    assert np.mean(ffm_err) > se, np.mean(ffm_err)


def test_hll_ertl_estimator_properties():
    # empty
    assert HLL(12).estimate() == 0.0
    # tiny-n near exactness (sparse regime): sigma series == linear
    # counting territory, error well under 1 item in expectation
    h = HLL(14).update(np.array([f"v{i}" for i in range(8)]))
    assert abs(h.estimate() - 8) < 0.5
    # estimate is a pure function of registers: dense/sparse round-trip
    # and merge order leave it bit-identical
    a = HLL(12).update(np.array([f"a{i}" for i in range(5000)]))
    b = HLL(12).update(np.array([f"b{i}" for i in range(50)]))
    ab = HLL.deserialize(a.serialize()).merge(b)
    ba = HLL.deserialize(b.serialize()).merge(a)
    assert ab.estimate() == ba.estimate()
    # unknown method rejected
    with pytest.raises(ValueError):
        h.estimate("bogus")
    # saturated sketch (every register at q+1) → inf, not ZeroDivision
    sat = HLL(4, sparse=False)
    sat.registers[:] = 64 - 4 + 1
    assert sat.estimate() == float("inf")


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------

def test_countmin_never_undercounts_and_bound():
    rng = np.random.default_rng(5)
    eps, delta = 0.005, 0.01
    cm = CountMin.from_error(eps, delta)
    zipf = np.minimum(rng.zipf(1.5, 100_000), 1000)
    items = np.array([f"tool_{z}" for z in zipf])
    for c in np.array_split(items, 9):
        cm.update(c)
    import collections

    true = collections.Counter(items.tolist())
    keys = np.array(list(true))
    est = cm.estimate(keys)
    truth = np.array([true[k] for k in keys])
    assert (est >= truth).all()  # one-sided guarantee
    assert (est - truth <= eps * cm.total).all()


def test_countmin_merge_equals_single():
    items = np.array([f"k{i % 100}" for i in range(50_000)])
    whole = CountMin(1024, 5).update(items)
    parts = [CountMin(1024, 5).update(c) for c in np.array_split(items, 8)]
    merged = functools.reduce(lambda a, b: a.merge(b), parts)
    # table addition is exactly associative → identical tables
    assert (merged.table == whole.table).all()
    assert merged.total == whole.total


def test_countmin_weighted_and_serialization():
    cm = CountMin(512, 4)
    cm.update(np.array(["a", "b"]), counts=np.array([10, 3]))
    rt = CountMin.deserialize(cm.serialize())
    assert rt.estimate(np.array(["a"]))[0] >= 10
    assert (rt.table == cm.table).all() and rt.total == 13


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fpr():
    n = 50_000
    b = Bloom.from_capacity(n, fpr=0.01)
    members = np.array([f"conv{i:08d}" for i in range(n)])
    for c in np.array_split(members, 11):
        b.update(c)
    assert b.contains(members).all()  # zero false negatives, guaranteed
    probes = np.array([f"other{i}" for i in range(20_000)])
    fpr = b.contains(probes).mean()
    assert fpr <= 0.03, fpr


def test_bloom_merge_is_union():
    a = Bloom(1 << 16, 5).update(np.array(["x", "y"]))
    b = Bloom(1 << 16, 5).update(np.array(["z"]))
    m = Bloom.deserialize(a.serialize()).merge(b)
    assert m.contains(np.array(["x", "y", "z"])).all()
    # commutative: identical bit arrays
    m2 = Bloom.deserialize(b.serialize()).merge(a)
    assert (m.words == m2.words).all()


def test_bloom_serialization():
    b = Bloom(1 << 12, 4).update(np.array([f"v{i}" for i in range(100)]))
    rt = Bloom.deserialize(b.serialize())
    assert (rt.words == b.words).all()
    assert rt.contains(np.array(["v5", "v99"])).all()


# ---------------------------------------------------------------------------
# cross-sketch: dimension-mismatch safety
# ---------------------------------------------------------------------------

def test_mismatched_merge_raises():
    with pytest.raises(ValueError):
        HLL(10).merge(HLL(12))
    with pytest.raises(ValueError):
        CountMin(512, 4).merge(CountMin(512, 5))
    with pytest.raises(ValueError):
        Bloom(1 << 10, 3).merge(Bloom(1 << 11, 3))
    with pytest.raises(ValueError):
        KLL(64).merge(KLL(128))


def test_kll_quantile_blobs_exact_parity():
    """Vectorized KLL mass extraction is EXACTLY per-blob quantile()
    (integer-rank threshold trick), across sizes incl. empty/single."""
    import numpy as np

    from tgdigest_spark.sketches.kll import KLL

    rng = np.random.default_rng(5)
    qs = [0.0, 0.01, 0.5, 0.95, 1.0]
    blobs = []
    for i in range(200):
        sk = KLL(64)
        n = int(rng.choice([0, 1, 2, 7, 100, 20000]))
        if n:
            sk.update(rng.normal(0, 100, n))
        blobs.append(sk.serialize())
    bulk = KLL.quantile_blobs(blobs, qs)
    for i, b in enumerate(blobs):
        ref = KLL.deserialize(b).quantile(qs)
        if np.all(np.isnan(ref)):
            assert np.all(np.isnan(bulk[i]))
        else:
            assert bulk[i].tolist() == list(ref), i  # bit-exact
