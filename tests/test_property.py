"""Hypothesis property tests: merge associativity/commutativity and
serialization closure for every sketch, under arbitrary batch splits.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from tgdigest_spark.sketches import HLL, KLL, Bloom, CountMin, TDigest

finite_floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(finite_floats, min_size=1, max_size=400),
    cut=st.integers(min_value=0, max_value=400),
)
def test_tdigest_split_invariance(data, cut):
    """count/min/max are exactly split-invariant; quantiles within bound."""
    arr = np.array(data)
    cut = min(cut, len(arr))
    whole = TDigest(100).update(arr)
    a = TDigest(100).update(arr[:cut])
    b = TDigest(100).update(arr[cut:])
    merged = a.merge(b)
    assert merged.count == whole.count == len(arr)
    assert merged.min == whole.min and merged.max == whole.max
    if len(arr) >= 10:
        s = np.sort(arr)
        for q in (0.25, 0.5, 0.75):
            e = merged.quantile(q)
            lo = np.searchsorted(s, e, "left") / len(s)
            hi = np.searchsorted(s, e, "right") / len(s)
            err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
            assert err <= 0.26  # coarse: tiny n dominates, bound 8*q(1-q)/100 + atom slack


@settings(max_examples=30, deadline=None)
@given(st.lists(finite_floats, min_size=0, max_size=300))
def test_tdigest_serialization_closure(data):
    td = TDigest(64).update(np.array(data)) if data else TDigest(64)
    rt = TDigest.deserialize(td.serialize())
    assert rt.count == td.count
    if data:
        assert np.allclose(rt.quantile([0.1, 0.9]), td.quantile([0.1, 0.9]))


@settings(max_examples=25, deadline=None)
@given(
    items=st.lists(st.text(min_size=0, max_size=8), min_size=0, max_size=300),
    cut=st.integers(min_value=0, max_value=300),
)
def test_hll_merge_commutes_exactly(items, cut):
    arr = np.array(items, dtype=object)
    cut = min(cut, len(arr))
    a = HLL(10).update(arr[:cut])
    b = HLL(10).update(arr[cut:])
    ab = HLL.deserialize(a.serialize()).merge(b)
    ba = HLL.deserialize(b.serialize()).merge(a)
    assert ab.estimate() == ba.estimate()
    whole = HLL(10).update(arr)
    # register state of merged == single-pass state (max is exact)
    ab._densify()
    whole._densify()
    assert (ab.registers == whole.registers).all()


@settings(max_examples=25, deadline=None)
@given(
    items=st.lists(st.text(min_size=1, max_size=6), min_size=1, max_size=200),
    cuts=st.tuples(st.integers(0, 200), st.integers(0, 200)),
)
def test_countmin_three_way_associative(items, cuts):
    arr = np.array(items, dtype=object)
    i, j = sorted((min(cuts[0], len(arr)), min(cuts[1], len(arr))))
    parts = [arr[:i], arr[i:j], arr[j:]]
    cms = [CountMin(256, 4).update(p) for p in parts if True]
    left = CountMin.deserialize(cms[0].serialize()).merge(cms[1]).merge(cms[2])
    right = cms[0].merge(CountMin.deserialize(cms[1].serialize()).merge(cms[2]))
    assert (left.table == right.table).all()
    whole = CountMin(256, 4).update(arr)
    assert (left.table == whole.table).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=6), min_size=0, max_size=200))
def test_bloom_union_equals_single(items):
    arr = np.array(items, dtype=object)
    half = len(arr) // 2
    a = Bloom(1 << 12, 4).update(arr[:half])
    b = Bloom(1 << 12, 4).update(arr[half:])
    merged = a.merge(b)
    whole = Bloom(1 << 12, 4).update(arr)
    assert (merged.words == whole.words).all()
    if len(arr):
        assert merged.contains(arr).all()


@settings(max_examples=20, deadline=None)
@given(
    data=st.lists(finite_floats, min_size=1, max_size=500),
    nchunks=st.integers(min_value=1, max_value=8),
)
def test_kll_n_exact_under_chunking(data, nchunks):
    arr = np.array(data)
    chunks = np.array_split(arr, min(nchunks, len(arr)))
    kll = KLL(64)
    for c in chunks:
        kll.update(c)
    assert kll.n == len(arr)
    assert kll.min == arr.min() and kll.max == arr.max()
    rt = KLL.deserialize(kll.serialize())
    assert rt.quantile(0.5) == kll.quantile(0.5)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(finite_floats, min_size=0, max_size=200),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.floats(min_value=0.0, max_value=1.0), min_size=1, max_size=4
    ),
)
def test_quantile_blobs_property_parity(populations, qs):
    """Vectorized mass extraction == per-blob quantile() for arbitrary
    digest populations and quantile sets (incl. q=0/1 endpoints)."""
    import numpy as np

    from tgdigest_spark.sketches.tdigest import TDigest

    blobs = []
    for pop in populations:
        td = TDigest(64)
        if pop:
            td.update(np.asarray(pop, dtype=np.float64))
        blobs.append(td.serialize())
    bulk = TDigest.quantile_blobs(blobs, qs)
    for i, b in enumerate(blobs):
        td = TDigest.deserialize(b)
        ref = td.quantile(qs)
        if np.all(np.isnan(ref)):
            assert np.all(np.isnan(bulk[i]))
        else:
            # arithmetic is bit-identical for the same node pair; node
            # selection via the packed normalized key may differ by one
            # node when q collides with a node rank within ~an ulp, so
            # the honest bound is eps-scaled by count and value span
            span = max(abs(td.min), abs(td.max), 1.0)
            atol = 1e-9 + 32 * np.finfo(np.float64).eps * td.count * span
            np.testing.assert_allclose(bulk[i], ref, rtol=1e-9, atol=atol)


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["train", "val", "test", "holdout"]),
        st.floats(min_value=0.01, max_value=10.0),
        min_size=1,
        max_size=4,
    )
)
def test_split_boundaries_partition_unit_interval(weights):
    """Boundaries are increasing, end exactly at the (fp-safe) top, and
    every fraction in [0,1) lands in exactly one interval — the winner
    under CASE first-match-wins equals the [prev, b) interval owner."""
    from tgdigest_spark.operators.sampling import _boundaries

    bounds = _boundaries(weights)
    vals = [b for _, b in bounds]
    assert all(b2 >= b1 for b1, b2 in zip(vals, vals[1:]))
    assert vals[-1] >= 1.0
    import numpy as np

    for frac in np.linspace(0, 0.999999, 23):
        # CASE first-match-wins winner
        winner = next(name for name, b in bounds if frac < b)
        # interval owner: the unique name with prev_b <= frac < b
        prev = 0.0
        owners = []
        for name, b in bounds:
            if prev <= frac < b:
                owners.append(name)
            prev = b
        assert owners == [winner]
