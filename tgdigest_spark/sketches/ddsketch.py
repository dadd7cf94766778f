"""DDSketch: relative-error quantiles with a BIT-EXACT associative merge.

Algorithm: Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable
Quantile Sketch with Relative-Error Guarantees" (VLDB 2019). Values map
to geometric buckets

    index(x) = ceil( log(x) / log(gamma) ),   gamma = (1+alpha)/(1-alpha)

so bucket ``k`` covers ``(gamma^(k-1), gamma^k]`` and the bucket's
representative value ``2*gamma^k/(gamma+1)`` is within relative error
``alpha`` of EVERY value in the bucket: the returned quantile estimate
satisfies ``|est - x_q| <= alpha * |x_q|`` where ``x_q`` is the item at
the queried rank (paper Theorem 3; plus a ~1-ulp float slack on the
log-domain bucket boundaries, which the tests absorb with a 1% margin
on alpha).

Why this sketch exists next to t-digest / KLL in this library:

* **Relative error** — t-digest and KLL bound *rank* error; DDSketch
  bounds *value* error multiplicatively, which is the natural contract
  for long-tailed latency/length distributions at p99+ (the metric in
  BASELINE.json is explicitly "p99 quantile error").
* **Bit-exact mergeability** — the state is a multiset of integer
  bucket counters, so ``merge`` is bucket-wise int64 addition: exactly
  associative AND commutative, byte-identical blobs under ANY merge
  tree, partition layout, or update order. t-digest is associative only
  up to its rank bound; DDSketch turns the north-rule merge-
  associativity clause into literal blob equality (gate row pins
  ``merge_equals_direct`` bit-exact, like HLL).

Unlike the paper's collapsing variant this store does NOT collapse: the
bucket count is bounded by the value dynamic range, not the data size —
``log_gamma(max/min)`` buckets, e.g. ~1,390 for values spanning 1..10^6
at alpha=0.01 — so boundedness comes for free on any real column while
keeping the merge lossless (a collapsed store's content would depend on
merge order). Signed values are supported with a mirrored negative
store plus an exact zero counter.

Scale notes: blobs are a few KB; updates are one vectorized log + RLE
per Arrow batch; the agg.py bulk hooks (``from_sorted_like`` /
``serialize_sorted_groups_like`` / ``merge_blob_groups_like`` /
``quantile_blobs``) run the tiny-group fast paths with ONE log pass per
partition and no per-group Python objects.

Reference anchor: approximates the same full-sort quantile the
reference computes per digest post (/root/reference/src/post.rs:76-90);
the DuckDB oracle compares against exact rank-item quantiles.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

from .base import Sketch, clean_numeric

_EMPTY_I64 = np.empty(0, dtype=np.int64)

# header: alpha d, zero q, n q, min d, max d, n_pos I, n_neg I
# (format string, not a pre-compiled Struct: cloudpickle must ship
#  quantile_blobs to executors, and _struct.Struct cannot pickle;
#  stdlib struct caches compiled formats internally)
_HEAD_FMT = "<4sHdqqddII"
_HEAD_SIZE = struct.calcsize(_HEAD_FMT)


def _parse_blob(b) -> tuple:
    """Decode one serialized DDSketch blob into
    ``(alpha, zero, n, mn, mx, pk, pc, nk, nc)`` — the single place
    that knows the _HEAD_FMT offset arithmetic (deserialize and both
    executor bulk hooks all route here, so a format change cannot
    silently desynchronize them). The key/count arrays are zero-copy
    views into ``b``; callers that retain them must ``.copy()``."""
    (magic, ver, a, zero, n, mn, mx, n_pos, n_neg) = struct.unpack_from(
        _HEAD_FMT, b, 0
    )
    if magic != DDSketch.MAGIC or ver != DDSketch.VERSION:
        raise ValueError("bad DDSketch blob header")
    off = _HEAD_SIZE
    pk = np.frombuffer(b, np.int64, n_pos, off)
    off += 8 * n_pos
    pc = np.frombuffer(b, np.int64, n_pos, off)
    off += 8 * n_pos
    nk = np.frombuffer(b, np.int64, n_neg, off)
    off += 8 * n_neg
    nc = np.frombuffer(b, np.int64, n_neg, off)
    return a, int(zero), int(n), mn, mx, pk, pc, nk, nc

# reserved overflow bucket for +/-inf magnitudes: above every finite
# bucket index (max finite key ~= 710/log(gamma) << 2^60 for any alpha
# in (0,1)), and 4*_INF_KEY still fits int64 for the slot encodings.
# Rationale: TDigest/KLL in this library rank inf correctly (they store
# values); casting ceil(log(inf)) to int64 would wrap to INT64_MIN and
# silently rank +inf BELOW every finite value. The bucket's
# representative value is +/-inf itself, so rank placement is exact.
_INF_KEY = np.int64(1) << np.int64(60)


def _rle_sorted_runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length encode an array whose equal keys are contiguous
    (monotone slices). Returns (run_keys, run_counts int64)."""
    if keys.size == 0:
        return _EMPTY_I64, _EMPTY_I64
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends = np.r_[starts[1:], keys.size]
    return keys[starts], (ends - starts).astype(np.int64)


def _add_store(
    k1: np.ndarray, c1: np.ndarray, k2: np.ndarray, c2: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Union-add two (sorted-unique-keys, counts) stores — int64 adds,
    canonical ascending key order: the bit-exact merge kernel."""
    if k2.size == 0:
        return k1, c1
    if k1.size == 0:
        return k2.copy(), c2.copy()
    keys = np.concatenate([k1, k2])
    cnts = np.concatenate([c1, c2])
    uk, inv = np.unique(keys, return_inverse=True)
    uc = np.zeros(uk.size, dtype=np.int64)
    np.add.at(uc, inv, cnts)
    return uk, uc


class DDSketch(Sketch):
    MAGIC = b"DDS1"

    def __init__(self, alpha: float = 0.01):
        if not (0.0 < alpha < 1.0):
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = float(alpha)
        self.gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        self._lg = float(np.log(self.gamma))
        # log of the representative-value factor 2/(gamma+1); the
        # single-exp form exp(k*lg + _lrep) never overflows an
        # intermediate for in-range doubles
        self._lrep = float(np.log(2.0 / (self.gamma + 1.0)))
        self.pos_k = _EMPTY_I64
        self.pos_c = _EMPTY_I64
        self.neg_k = _EMPTY_I64
        self.neg_c = _EMPTY_I64
        self.zero = 0
        self.n = 0
        self.min = np.inf
        self.max = -np.inf

    @property
    def count(self) -> float:
        """Protocol-uniform row count (TDigest exposes .count; generic
        consumers like streaming/stateful.py rely on it)."""
        return float(self.n)

    # -- bucket math -----------------------------------------------------
    def _index(self, pos_vals: np.ndarray) -> np.ndarray:
        """ceil(log(x)/log(gamma)) for strictly-positive float64;
        +inf maps to the reserved overflow bucket."""
        fin = np.isfinite(pos_vals)
        if np.all(fin):
            return np.ceil(np.log(pos_vals) / self._lg).astype(np.int64)
        k = np.full(pos_vals.size, _INF_KEY, dtype=np.int64)
        k[fin] = np.ceil(np.log(pos_vals[fin]) / self._lg)
        return k

    def _rep(self, keys: np.ndarray) -> np.ndarray:
        """Bucket representative 2*gamma^k/(gamma+1), overflow-safe;
        the overflow bucket's representative is inf by construction."""
        with np.errstate(over="ignore"):
            return np.exp(keys.astype(np.float64) * self._lg + self._lrep)

    # -- protocol --------------------------------------------------------
    def update(self, values, weights=None) -> "DDSketch":
        """Absorb a batch. With ``weights`` (integral repetition counts,
        aligned with ``values``), the result is BIT-identical to
        ``update(np.repeat(values, weights))`` — the pre-aggregated
        (value, count) table pattern: quantiles over 10^12 logical rows
        from a rollup without exploding it. Zero-weight pairs are
        dropped; negative or fractional weights raise (a fractional
        repetition count has no bucket-counter meaning)."""
        if weights is None:
            arr = clean_numeric(values)
            if arr.size == 0:
                return self
            w = None
            n_add = int(arr.size)
        else:
            import pandas as pd

            v = (
                values.to_numpy(dtype=np.float64, na_value=np.nan)
                if isinstance(values, pd.Series)
                else np.asarray(values, dtype=np.float64)
            )
            wf = (
                weights.to_numpy(dtype=np.float64, na_value=np.nan)
                if isinstance(weights, pd.Series)
                else np.asarray(weights, dtype=np.float64)
            )
            if v.size != wf.size:
                raise ValueError("values and weights must align")
            if np.any(wf[~np.isnan(wf)] < 0.0):
                raise ValueError("weights must be >= 0")
            if np.any(wf[~np.isnan(wf)] != np.floor(wf[~np.isnan(wf)])):
                raise ValueError("weights must be integral counts")
            mask = ~np.isnan(v) & ~np.isnan(wf) & (wf > 0.0)
            if not np.any(mask):
                return self
            arr = v[mask]
            w = wf[mask].astype(np.int64)
            n_add = int(w.sum())
        self.min = min(self.min, float(arr.min()))
        self.max = max(self.max, float(arr.max()))
        self.n += n_add
        posm = arr > 0.0
        negm = arr < 0.0
        pos = arr[posm]
        neg = -arr[negm]
        if w is None:
            self.zero += int(arr.size - pos.size - neg.size)
            wp = wn = None
        else:
            self.zero += int(w[~posm & ~negm].sum())
            wp, wn = w[posm], w[negm]
        for vals, wts, store in (
            (pos, wp, "pos"),
            (neg, wn, "neg"),
        ):
            if not vals.size:
                continue
            if wts is None:
                uk, uc = np.unique(self._index(vals), return_counts=True)
                uc = uc.astype(np.int64)
            else:
                uk, inv = np.unique(self._index(vals), return_inverse=True)
                uc = np.zeros(uk.size, dtype=np.int64)
                np.add.at(uc, inv, wts)
            if store == "pos":
                self.pos_k, self.pos_c = _add_store(
                    self.pos_k, self.pos_c, uk, uc
                )
            else:
                self.neg_k, self.neg_c = _add_store(
                    self.neg_k, self.neg_c, uk, uc
                )
        return self

    def merge(self, other: "DDSketch") -> "DDSketch":
        if not isinstance(other, DDSketch) or other.alpha != self.alpha:
            raise ValueError("alpha mismatch")
        if other.n == 0:
            return self
        self.pos_k, self.pos_c = _add_store(
            self.pos_k, self.pos_c, other.pos_k, other.pos_c
        )
        self.neg_k, self.neg_c = _add_store(
            self.neg_k, self.neg_c, other.neg_k, other.neg_c
        )
        self.zero += other.zero
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        return self

    def serialize(self) -> bytes:
        head = struct.pack(
            _HEAD_FMT,
            self.MAGIC,
            self.VERSION,
            self.alpha,
            self.zero,
            self.n,
            self.min,
            self.max,
            self.pos_k.size,
            self.neg_k.size,
        )
        return (
            head
            + self.pos_k.tobytes()
            + self.pos_c.tobytes()
            + self.neg_k.tobytes()
            + self.neg_c.tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "DDSketch":
        alpha, zero, n, mn, mx, pk, pc, nk, nc = _parse_blob(data)
        sk = cls(alpha)
        sk.zero, sk.n, sk.min, sk.max = zero, n, mn, mx
        sk.pos_k, sk.pos_c = pk.copy(), pc.copy()
        sk.neg_k, sk.neg_c = nk.copy(), nc.copy()
        return sk

    # -- queries ---------------------------------------------------------
    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        """(values ascending, int64 weights): mirrored negative buckets
        (largest key = most negative value, so descending key order),
        the zero bucket, then positive buckets ascending."""
        vals = []
        wts = []
        if self.neg_k.size:
            vals.append(-self._rep(self.neg_k[::-1]))
            wts.append(self.neg_c[::-1])
        if self.zero:
            vals.append(np.zeros(1))
            wts.append(np.array([self.zero], dtype=np.int64))
        if self.pos_k.size:
            vals.append(self._rep(self.pos_k))
            wts.append(self.pos_c)
        if not vals:
            return np.empty(0), _EMPTY_I64
        return np.concatenate(vals), np.concatenate(wts)

    def quantile(self, q) -> float | np.ndarray:
        """Estimate of the item at rank ceil(q*n) (1-based, inclusive);
        within relative error alpha of it. q<=0 -> exact min, q>=1 ->
        exact max; estimates are clamped to the exact [min, max]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.n == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if np.isscalar(q) else out
        v, w = self._items()
        cum = np.cumsum(w)
        qc = np.clip(qs, 0.0, 1.0)
        targets = np.where(
            np.isnan(qs),
            np.nan,
            np.maximum(np.ceil(qc * float(self.n)), 1.0),
        )
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.minimum(idx, v.size - 1)
        out = np.clip(v[idx], self.min, self.max)
        out = np.where(qs <= 0.0, self.min, np.where(qs >= 1.0, self.max, out))
        out = np.where(np.isnan(qs), np.nan, out)
        return float(out[0]) if np.isscalar(q) else out

    def cdf(self, values) -> np.ndarray:
        """Estimated fraction of items <= v for each query value —
        the rank of the last bucket whose representative is <= v."""
        vq = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if self.n == 0:
            return np.full(vq.shape, np.nan)
        v, w = self._items()
        cum = np.cumsum(w)
        idx = np.searchsorted(v, vq, side="right")
        ranks = np.where(idx == 0, 0, cum[np.maximum(idx - 1, 0)])
        frac = ranks.astype(np.float64) / float(self.n)
        return np.where(np.isnan(vq), np.nan, frac)

    # -- agg.py bulk hooks -------------------------------------------------
    def from_sorted_like(self, arr: np.ndarray) -> "DDSketch":
        """Bulk-builder hook: build from an ASCENDING-sorted, NaN-free
        float64 array. Pure function of the value multiset — blobs are
        bit-identical to ``DDSketch(alpha).update(arr)``."""
        sk = DDSketch(self.alpha)
        n = int(arr.size)
        if n == 0:
            return sk
        sk.n = n
        sk.min, sk.max = float(arr[0]), float(arr[-1])
        neg_end = int(np.searchsorted(arr, 0.0, side="left"))
        pos_start = int(np.searchsorted(arr, 0.0, side="right"))
        sk.zero = pos_start - neg_end
        pos = arr[pos_start:]
        if pos.size:
            # sorted input -> equal keys contiguous: RLE == unique
            sk.pos_k, sk.pos_c = _rle_sorted_runs(self._index(pos))
        if neg_end:
            neg = -arr[:neg_end]  # descending magnitude -> keys non-increasing
            rk, rc = _rle_sorted_runs(self._index(neg))
            sk.neg_k, sk.neg_c = rk[::-1].copy(), rc[::-1].copy()
        return sk

    def serialize_sorted_groups_like(self, values, starts, ends) -> list:
        """Bulk hook: blobs for consecutive sorted group segments,
        bit-identical to ``from_sorted_like(values[s:e]).serialize()``
        per group, with ONE log pass over the whole partition (the
        per-group log/unique calls are the tiny-group trap)."""
        magic, ver, alpha = self.MAGIC, self.VERSION, self.alpha
        pack = functools.partial(struct.pack, _HEAD_FMT)
        v = np.ascontiguousarray(values, dtype=np.float64)
        absv = np.abs(v)
        keys = np.zeros(v.size, dtype=np.int64)
        fin = np.isfinite(absv)
        nz = (absv > 0.0) & fin
        if np.any(nz):
            keys[nz] = np.ceil(np.log(absv[nz]) / self._lg)
        if not np.all(fin):  # +/-inf -> overflow bucket (NaN-free input)
            keys[~fin] = _INF_KEY
        sign = np.sign(v).astype(np.int64)
        # distinct slot per (key, sign); zero rows collapse to slot 1
        comb = keys * 4 + (sign + 1)
        out = []
        empty_blob = None
        for s, e in zip(starts, ends):
            n = int(e - s)
            if n == 0:
                if empty_blob is None:
                    empty_blob = pack(
                        magic, ver, alpha, 0, 0, np.inf, -np.inf, 0, 0
                    )
                out.append(empty_blob)
                continue
            cseg = comb[s:e]
            rs = np.flatnonzero(np.r_[True, cseg[1:] != cseg[:-1]])
            re_ = np.r_[rs[1:], n]
            rk = keys[s:e][rs]
            rsign = sign[s:e][rs]
            rc = (re_ - rs).astype(np.int64)
            negm = rsign < 0
            posm = rsign > 0
            zm = rsign == 0
            zero = int(rc[zm].sum()) if np.any(zm) else 0
            # group values ascending: neg runs arrive most-negative
            # first = key DESCENDING; canonical store is ascending
            nk, nc = rk[negm][::-1], rc[negm][::-1]
            pk, pc = rk[posm], rc[posm]
            out.append(
                pack(
                    magic, ver, alpha, zero, n,
                    v[s], v[e - 1], pk.size, nk.size,
                )
                + np.ascontiguousarray(pk).tobytes()
                + np.ascontiguousarray(pc).tobytes()
                + np.ascontiguousarray(nk).tobytes()
                + np.ascontiguousarray(nc).tobytes()
            )
        return out

    def merge_blob_groups_like(self, blobs, starts, ends) -> list:
        """Reducer bulk hook: merge each group's partial blobs without
        per-group sketch objects. All partials decode to (slot, count)
        runs; ONE lexsort + reduceat across every group does the
        bucket-wise int64 addition, then each group re-serializes from
        its reduced runs. Bit-identical to sequential ``merge`` folds
        (the merge is already bit-exact, so this only changes speed)."""
        n_groups = len(starts)
        if n_groups == 0:
            return []
        alpha = self.alpha
        n_blobs = len(blobs)
        slots_parts: list[np.ndarray] = []
        cnts_parts: list[np.ndarray] = []
        part_sizes = np.zeros(n_blobs, dtype=np.int64)
        mins = np.empty(n_blobs)
        maxs = np.empty(n_blobs)
        ns = np.zeros(n_blobs, dtype=np.int64)
        for i, b in enumerate(blobs):
            a, zero, n, mn, mx, pk, pc, nk, nc = _parse_blob(b)
            if a != alpha:
                raise ValueError("alpha mismatch")
            mins[i], maxs[i], ns[i] = mn, mx, n
            n_pos, n_neg = pk.size, nk.size
            parts_s = []
            parts_c = []
            if n_neg:
                parts_s.append(nk * 4)
                parts_c.append(nc)
            if zero:
                parts_s.append(np.array([1], dtype=np.int64))
                parts_c.append(np.array([zero], dtype=np.int64))
            if n_pos:
                parts_s.append(pk * 4 + 2)
                parts_c.append(pc)
            if parts_s:
                sl = np.concatenate(parts_s)
                ct = np.concatenate(parts_c)
                slots_parts.append(sl)
                cnts_parts.append(ct)
                part_sizes[i] = sl.size
        # group id per blob, then per run
        gid_of_blob = np.zeros(n_blobs, dtype=np.int64)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            gid_of_blob[s:e] = gi
        out: list = [None] * n_groups
        g_n = np.zeros(n_groups, dtype=np.int64)
        np.add.at(g_n, gid_of_blob, ns)
        g_min = np.full(n_groups, np.inf)
        g_max = np.full(n_groups, -np.inf)
        np.minimum.at(g_min, gid_of_blob, mins)
        np.maximum.at(g_max, gid_of_blob, maxs)
        if slots_parts:
            slots = np.concatenate(slots_parts)
            cnts = np.concatenate(cnts_parts)
            seg = np.repeat(gid_of_blob, part_sizes)
            order = np.lexsort((slots, seg))
            slots_s, cnts_s, seg_s = slots[order], cnts[order], seg[order]
            rs = np.flatnonzero(
                np.r_[True, (slots_s[1:] != slots_s[:-1]) | (seg_s[1:] != seg_s[:-1])]
            )
            red = np.add.reduceat(cnts_s, rs)
            rslots = slots_s[rs]
            rseg = seg_s[rs]
            # per-group run extents over the reduced arrays
            grs = np.flatnonzero(np.r_[True, rseg[1:] != rseg[:-1]])
            gre = np.r_[grs[1:], rseg.size]
        else:
            rslots = red = rseg = _EMPTY_I64
            grs = gre = _EMPTY_I64
        pack = functools.partial(struct.pack, _HEAD_FMT)
        magic, ver = self.MAGIC, self.VERSION
        seen = np.zeros(n_groups, dtype=bool)
        for s, e in zip(grs, gre):
            gi = int(rseg[s])
            seen[gi] = True
            sl = rslots[s:e]  # ascending slots: neg (4k) < zero (1)? no —
            # slot order is numeric: neg keys ascending interleave with
            # zero/pos numerically, so re-split by slot % 4
            ct = red[s:e]
            m = sl & 3
            negm = m == 0
            posm = m == 2
            zm = m == 1
            zero = int(ct[zm].sum()) if np.any(zm) else 0
            nk = (sl[negm] >> 2).astype(np.int64)
            nc = ct[negm]
            pk = (sl[posm] >> 2).astype(np.int64)
            pc = ct[posm]
            out[gi] = (
                pack(
                    magic, ver, alpha, zero, int(g_n[gi]),
                    g_min[gi], g_max[gi], pk.size, nk.size,
                )
                + np.ascontiguousarray(pk).tobytes()
                + np.ascontiguousarray(pc).tobytes()
                + np.ascontiguousarray(nk).tobytes()
                + np.ascontiguousarray(nc).tobytes()
            )
        if not np.all(seen):
            empty = pack(magic, ver, alpha, 0, 0, np.inf, -np.inf, 0, 0)
            for gi in np.flatnonzero(~seen):
                # groups whose partials were all empty sketches
                gi = int(gi)
                out[gi] = (
                    pack(
                        magic, ver, alpha, 0, int(g_n[gi]),
                        g_min[gi], g_max[gi], 0, 0,
                    )
                    if g_n[gi]
                    else empty
                )
        return out

    @classmethod
    def quantile_blobs(cls, blobs, qs) -> np.ndarray:
        """(len(blobs), len(qs)) estimates in one vectorized pass —
        exactly equal to ``[cls.deserialize(b).quantile(qs) for b in
        blobs]`` (weights are int64, so per-segment cums are exact and
        the inclusive-rank select shares one global int64 key space —
        the KLL quantile_blobs trick)."""
        p = len(blobs)
        qs_arr = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        nq = qs_arr.size
        out = np.full((p, nq), np.nan)
        if p == 0:
            return out
        mins = np.empty(p)
        maxs = np.empty(p)
        totals = np.zeros(p, dtype=np.int64)
        vals_parts: list[np.ndarray] = []
        wts_parts: list[np.ndarray] = []
        item_counts = np.zeros(p, dtype=np.int64)
        proto_cache: dict[float, DDSketch] = {}
        for i, b in enumerate(blobs):
            a, zero, n, mn, mx, pk, pc, nk, nc = _parse_blob(b)
            mins[i], maxs[i], totals[i] = mn, mx, n
            proto = proto_cache.get(a)
            if proto is None:
                proto = proto_cache[a] = cls(a)
            n_pos, n_neg = pk.size, nk.size
            parts_v = []
            parts_w = []
            if n_neg:
                parts_v.append(-proto._rep(nk[::-1]))
                parts_w.append(nc[::-1])
            if zero:
                parts_v.append(np.zeros(1))
                parts_w.append(np.array([zero], dtype=np.int64))
            if n_pos:
                parts_v.append(proto._rep(pk))
                parts_w.append(pc)
            if parts_v:
                v = np.concatenate(parts_v)
                vals_parts.append(v)
                wts_parts.append(np.concatenate(parts_w))
                item_counts[i] = v.size
        # items imply n > 0 and vice versa (n counts absorbed values)
        has_items = np.flatnonzero(item_counts > 0)
        if has_items.size:
            v = np.concatenate(vals_parts)
            w = np.concatenate(wts_parts)
            seg_sizes = item_counts[has_items]
            seg_of = np.repeat(np.arange(has_items.size), seg_sizes)
            # per-segment cumulative weights, exact int64
            cs = np.cumsum(w)
            ends = np.cumsum(seg_sizes)
            cs_before = np.concatenate(([np.int64(0)], cs[ends[:-1] - 1]))
            cum = cs - cs_before[seg_of]
            tot = totals[has_items]
            base = np.concatenate(([np.int64(0)], np.cumsum(tot)[:-1]))
            keys = base[seg_of] + cum
            qc = np.clip(qs_arr, 0.0, 1.0)
            nan_q = np.isnan(qs_arr)
            targets = np.maximum(
                np.ceil(np.where(nan_q, 1.0, qc)[None, :] * tot[:, None].astype(np.float64)),
                1.0,
            )
            tkeys = base[:, None] + targets
            idx = np.searchsorted(keys, tkeys.ravel(), side="left").reshape(
                has_items.size, nq
            )
            seg_end = np.cumsum(seg_sizes) - 1
            idx = np.minimum(idx, seg_end[:, None])
            est = v[idx]
            est = np.clip(
                est, mins[has_items][:, None], maxs[has_items][:, None]
            )
            est = np.where(qs_arr[None, :] <= 0.0, mins[has_items][:, None], est)
            est = np.where(qs_arr[None, :] >= 1.0, maxs[has_items][:, None], est)
            est = np.where(nan_q[None, :], np.nan, est)
            out[has_items] = est
        # blobs with n>0 but no items cannot exist (n counts updates);
        # blobs with n==0 keep their NaN rows
        return out


__all__ = ["DDSketch"]
