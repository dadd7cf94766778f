"""KMV (k minimum values / bottom-k) distinct sketch with set algebra.

From scratch, after the published bottom-k literature: Bar-Yossef,
Jayram, Kumar, Sivakumar & Trevisan, "Counting distinct elements in a
data stream" (RANDOM 2002); Beyer, Haas, Reinwald, Sismanis & Gemulla,
"On synopses for distinct-value estimation under multiset operations"
(SIGMOD 2007) — the (k-1)/U_(k) unbiased estimator and the
theta-intersection construction popularized by the Apache DataSketches
theta sketch are both from that line of work.

Why carry a second distinct sketch next to HLL: the KMV keeps the
actual bottom-k *hash sample* of the distinct set, which HLL's register
array throws away. That sample supports the set algebra HLL cannot do
— intersection / difference / Jaccard between sketches — and it makes
the sketch EXACT (not approximate) whenever the true distinct count is
below k, a regime the per-role/tool cardinalities of the transcript
table live in permanently.

Reference anchor: tgdigest's exact HashSet distinct membership
(/root/reference/src/cache.rs:181); the engine-side exact counterpart
is countDistinct.

Determinism and merge algebra: the sketch content is a pure function
of the SET of input values (fixed hash key, union1d set semantics), so
updates and merges are fully order- and partition-insensitive —
merge(a, b) == merge(b, a) bit-for-bit, unlike t-digest's bound-level
agreement. Estimates inherit that determinism.

Accuracy (published): for D > k the (k-1)/U_(k) estimator is unbiased
with relative std err ~ 1/sqrt(k-2); intersections add the usual
theta-framework variance scaled by 1/J (small overlaps are noisier).
All vectorized numpy; no per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import Sketch
from .hashing import base_hash

# hashes normalize to [0, 1) by dividing by 2^64
_SCALE = float(2**64)


class KMV(Sketch):
    MAGIC = b"KMV1"

    def __init__(self, k: int = 1024):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        # sorted ascending, unique uint64 hashes; len <= k
        self.hashes = np.empty(0, dtype=np.uint64)

    # -- core protocol --------------------------------------------------
    def update(self, values) -> "KMV":
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        h = base_hash(s)
        if h.size == 0:
            return self
        self.hashes = np.union1d(self.hashes, h)[: self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        if other.k != self.k:
            raise ValueError("k mismatch")
        self.hashes = np.union1d(self.hashes, other.hashes)[: self.k]
        return self

    # -- estimation -----------------------------------------------------
    @property
    def saturated(self) -> bool:
        return self.hashes.size >= self.k

    def theta(self) -> float:
        """Inclusion threshold in [0, 1]: every distinct input hash
        below theta is IN the sample (1.0 while unsaturated)."""
        if not self.saturated:
            return 1.0
        return float(self.hashes[self.k - 1]) / _SCALE

    def estimate(self) -> float:
        """Distinct-count estimate; EXACT (= sample size) while the
        sketch is unsaturated (modulo 64-bit hash collisions)."""
        if not self.saturated:
            return float(self.hashes.size)
        u_k = float(self.hashes[self.k - 1]) / _SCALE
        return (self.k - 1) / u_k

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        head = struct.pack("<4sHIQ", self.MAGIC, self.VERSION, self.k,
                           self.hashes.size)
        return head + self.hashes.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "KMV":
        (k, n), off = cls._check_header(data, "IQ")
        sk = cls(k)
        sk.hashes = np.frombuffer(data, dtype=np.uint64, count=n,
                                  offset=off).copy()
        return sk

    # -- bulk tiny-group hooks (agg.py map-side combine / reducers) -----
    def _serialize_hash_groups(
        self, hashes: np.ndarray, codes: np.ndarray, n_groups: int
    ) -> list:
        """(hash, group code) pairs → one serialized bottom-k KMV per
        group index in [0, n_groups): ONE global lexsort + dedupe +
        positional bottom-k cut instead of per-group union1d calls —
        content identical to per-group update/merge folds (the sketch
        is a pure function of the distinct hash set)."""
        head = struct.Struct("<4sHIQ")
        empty = head.pack(self.MAGIC, self.VERSION, self.k, 0)
        if codes.size == 0:
            return [empty] * n_groups
        order = np.lexsort((hashes, codes))
        c_s, h_s = codes[order], hashes[order]
        keep = np.r_[True, (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])]
        c_k, h_k = c_s[keep], h_s[keep]
        g_starts = np.flatnonzero(np.r_[True, c_k[1:] != c_k[:-1]])
        # position within group, vectorized: arange - start-of-own-group
        run_starts = np.repeat(g_starts, np.diff(np.r_[g_starts, c_k.size]))
        in_k = (np.arange(c_k.size) - run_starts) < self.k
        c_f, h_f = c_k[in_k], h_k[in_k]
        f_starts = np.flatnonzero(np.r_[True, c_f[1:] != c_f[:-1]])
        f_ends = np.r_[f_starts[1:], c_f.size]
        out = [empty] * n_groups
        for s, e in zip(f_starts, f_ends):
            n = int(e - s)
            out[int(c_f[s])] = (
                head.pack(self.MAGIC, self.VERSION, self.k, n)
                + h_f[s:e].tobytes()
            )
        return out

    def serialize_hashed_groups_like(
        self, hashes: np.ndarray, starts: np.ndarray, ends: np.ndarray
    ) -> list:
        """Map-side bulk build from per-partition value hashes sorted by
        group (slice boundaries in starts/ends); one blob per group,
        empty segments included (see HLL's sibling hook)."""
        n_groups = len(starts)
        if n_groups == 0:
            return []
        lens = np.asarray(ends) - np.asarray(starts)
        codes = np.repeat(np.arange(n_groups), lens)
        return self._serialize_hash_groups(
            hashes.astype(np.uint64), codes, n_groups
        )

    def merge_blob_groups_like(self, blobs, starts, ends) -> list:
        """Reducer bulk hook: merge blob runs per group with one global
        dedupe + bottom-k pass (blob parse is the only per-blob loop)."""
        h_parts, code_parts = [], []
        for g, (s, e) in enumerate(zip(starts, ends)):
            for b in blobs[s:e]:
                other = KMV.deserialize(bytes(b))
                if other.k != self.k:
                    raise ValueError("k mismatch")
                if other.hashes.size:
                    h_parts.append(other.hashes)
                    code_parts.append(np.full(other.hashes.size, g))
        n_groups = len(starts)
        if not h_parts:
            return self._serialize_hash_groups(
                np.empty(0, dtype=np.uint64),
                np.empty(0, dtype=np.int64),
                n_groups,
            )
        return self._serialize_hash_groups(
            np.concatenate(h_parts),
            np.concatenate(code_parts),
            n_groups,
        )


# ---------------------------------------------------------------------------
# theta-framework set algebra over KMV sketches (Beyer et al. 2007 §4)
# ---------------------------------------------------------------------------

def _shared_cut(a: KMV, b: KMV) -> int | None:
    """Shared theta threshold as a raw uint64 (no float round-trip, so
    the boundary hash's membership is exact): the smaller of the two
    sketches' k-th hashes, or None when both are unsaturated (their
    samples are the complete distinct sets — exact regime)."""
    cuts = [int(s.hashes[s.k - 1]) for s in (a, b) if s.saturated]
    return min(cuts) if cuts else None


def _below(sk: KMV, cut: int | None) -> np.ndarray:
    """Sample prefix STRICTLY below the cut (matching the (k-1)/U_(k)
    estimator, which treats the k-th order statistic itself as the
    boundary, not a member); the full sample when cut is None."""
    if cut is None:
        return sk.hashes
    return sk.hashes[
        : int(np.searchsorted(sk.hashes, np.uint64(cut), side="left"))
    ]


def kmv_union(a: KMV, b: KMV) -> KMV:
    """Union sketch — the merge itself (lossless in the theta sense)."""
    out = KMV(min(a.k, b.k))
    out.hashes = np.union1d(a.hashes, b.hashes)[: out.k]
    return out


def _theta(cut: int | None) -> float:
    """Scale factor matching the strictly-below sample convention:
    P(hash < cut) = cut/2^64; 1.0 in the exact (both-unsaturated)
    regime. Keeping this convention aligned with estimate()'s
    (k-1)/U_(k) makes the algebra internally consistent: for two
    identical saturated sketches, intersection == union == estimate()
    (previously the inclusive cut over-counted by k/(k-1), letting
    reported |A∩B| exceed |A∪B|)."""
    return 1.0 if cut is None else cut / _SCALE


def kmv_intersection_estimate(a: KMV, b: KMV) -> float:
    """|A ∩ B| estimate: count sample hashes both sketches retain
    strictly below the shared theta, scale by 1/theta. Exact when both
    unsaturated."""
    cut = _shared_cut(a, b)
    inter = np.intersect1d(_below(a, cut), _below(b, cut))
    return float(inter.size) / _theta(cut)


def kmv_difference_estimate(a: KMV, b: KMV) -> float:
    """|A \\ B| estimate (a-not-b), same theta construction."""
    cut = _shared_cut(a, b)
    diff = np.setdiff1d(_below(a, cut), _below(b, cut))
    return float(diff.size) / _theta(cut)


def kmv_jaccard_estimate(a: KMV, b: KMV) -> float:
    """Jaccard |A∩B|/|A∪B| from the shared-theta samples (ratio of
    counts — the theta scale cancels, so this is the minwise estimate
    with std err ~ sqrt(J(1-J)/k')."""
    cut = _shared_cut(a, b)
    ha, hb = _below(a, cut), _below(b, cut)
    union = np.union1d(ha, hb)
    if union.size == 0:
        return 0.0
    return float(np.intersect1d(ha, hb).size) / float(union.size)


def kmv_pair_row(ga: str, a: KMV, gb: str, b: KMV) -> tuple:
    """Canonical overlap-matrix row for one unordered group pair:
    (group_a, group_b, distinct_a, distinct_b, intersection_est,
    union_est, jaccard_est, kmv_exact) with group_a < group_b. THE
    single definition both grouped_kmv_overlap formulations (driver
    loop and block-pair grid) share — their bit-identical parity
    contract rests on this being one function, not two synchronized
    copies."""
    if gb < ga:
        ga, a, gb, b = gb, b, ga, a
    u = kmv_union(a, b)
    inter, jac = kmv_overlap_stats(a, b)
    return (
        ga, gb, a.estimate(), b.estimate(), inter, u.estimate(), jac,
        not u.saturated,
    )


def kmv_overlap_stats(a: KMV, b: KMV) -> tuple[float, float]:
    """(intersection_est, jaccard_est) in ONE pass over the shared-theta
    samples — identical values to kmv_intersection_estimate /
    kmv_jaccard_estimate (same cut, same strictly-below samples), but
    the cut search, prefix slicing, and intersect1d run once instead of
    per-estimator. The hot path for pairwise overlap matrices, where the
    caller evaluates O(|G|^2) pairs of up-to-k-element arrays."""
    cut = _shared_cut(a, b)
    ha, hb = _below(a, cut), _below(b, cut)
    inter = np.intersect1d(ha, hb, assume_unique=True)
    union = np.union1d(ha, hb)
    jac = float(inter.size) / float(union.size) if union.size else 0.0
    return float(inter.size) / _theta(cut), jac
