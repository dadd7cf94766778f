"""HyperLogLog distinct-count sketch (from scratch, dense registers).

Algorithm: Flajolet, Fusy, Gandouet, Meunier (2007) with the standard
small-range (linear counting) correction. Standard error 1.04/sqrt(m),
m = 2^p registers.

Exact-reference anchor: the engine's exact `countDistinct` path — and
the reference's HashSet membership/distinct logic
(/root/reference/src/cache.rs:181). Cross-checked in tests against
Spark's own HLL++ (`approx_count_distinct`).

Vectorization: register index = low p bits, rank = leading-zero count
of the remaining 64-p bits via a log2 trick; register update via
``np.maximum.at``. Merge = elementwise register max (associative,
commutative, idempotent).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch
from .hashing import base_hash


_ALPHA_INF = 1.0 / (2.0 * np.log(2.0))


def _sigma(x: float) -> float:
    """Ertl 2017 eq. (66): sigma(x) = x + sum_{k>=1} x^(2^k) 2^(k-1),
    the analytic small-range correction series. x = C[0]/m in [0, 1];
    sigma(1) = +inf (empty sketch is handled before the call)."""
    if x == 1.0:
        return float("inf")
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _tau(x: float) -> float:
    """Ertl 2017 eq. (67): tau(x) = (1/3)(1 - x - sum_{k>=1}
    (1 - x^(2^-k))^2 2^(-k)), the analytic large-range correction.
    x = 1 - C[q+1]/m in [0, 1]."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = np.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HLL(Sketch):
    """Dense or sparse register storage.

    Sparse mode keeps (idx, rank) pairs while the distinct register
    count is small — a per-group HLL over millions of tiny groups costs
    bytes, not 2^p (16 KB at p=14). Densifies automatically past
    m/8 occupied registers. Merge of mixed representations densifies.
    """

    MAGIC = b"HLL1"

    def __init__(self, p: int = 14, sparse: bool = True):
        if not 4 <= p <= 20:
            raise ValueError("p out of range")
        self.p = p
        self.m = 1 << p
        self.registers: np.ndarray | None = None if sparse else np.zeros(
            self.m, dtype=np.uint8
        )
        # sparse state: parallel arrays, idx strictly unique & sorted
        self.sp_idx = np.empty(0, dtype=np.int64) if sparse else None
        self.sp_rank = np.empty(0, dtype=np.uint8) if sparse else None

    # -- representation helpers -----------------------------------------
    @property
    def is_sparse(self) -> bool:
        return self.registers is None

    def _densify(self) -> None:
        if not self.is_sparse:
            return
        regs = np.zeros(self.m, dtype=np.uint8)
        if self.sp_idx.size:
            regs[self.sp_idx] = self.sp_rank
        self.registers = regs
        self.sp_idx = None
        self.sp_rank = None

    def _sparse_absorb(self, idx: np.ndarray, rank: np.ndarray) -> None:
        """Merge (idx, rank) pairs into sparse state: max per idx."""
        all_idx = np.concatenate([self.sp_idx, idx])
        all_rank = np.concatenate([self.sp_rank, rank])
        if all_idx.size == 0:
            return
        order = np.lexsort((-all_rank.astype(np.int16), all_idx))
        ai, ar = all_idx[order], all_rank[order]
        first = np.r_[True, ai[1:] != ai[:-1]]  # first = max rank per idx
        self.sp_idx, self.sp_rank = ai[first], ar[first]
        if self.sp_idx.size > self.m // 8:
            self._densify()

    def _idx_rank(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Hashes → (register index, rank) pairs (vectorized)."""
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        rest = h >> np.uint64(self.p)
        # rank = leading position of first 1-bit in the (64-p)-bit rest,
        # counted from the MSB side: 64-p - floor(log2(rest)) ; rest==0 → 64-p+1
        width = 64 - self.p
        rank = np.empty(h.size, dtype=np.uint8)
        nz = rest != 0
        # floor(log2) via bit_length: use float log2 is unsafe >2^53; do it
        # with a de Bruijn-free loop over bytes: numpy lacks clz, but
        # log2 on float64 is exact for values < 2^53 and rest < 2^50 for
        # p>=14; for smaller p clamp via shifting down 10 bits first.
        r = rest[nz]
        high = (r >> np.uint64(32)).astype(np.float64)
        low = (r & np.uint64(0xFFFFFFFF)).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            # np.where evaluates both branches; log2(0) on the unused
            # branch is discarded, silence its warning
            bitlen = np.where(
                high > 0,
                np.floor(np.log2(high)).astype(np.int64) + 33,
                np.where(
                    low > 0, np.floor(np.log2(low)).astype(np.int64) + 1, 0
                ),
            )
        rank[nz] = (width - bitlen + 1).astype(np.uint8)
        rank[~nz] = width + 1
        return idx, rank

    def update(self, values) -> "HLL":
        h = base_hash(values)
        if h.size == 0:
            return self
        idx, rank = self._idx_rank(h)
        if self.is_sparse:
            self._sparse_absorb(idx, rank)
        else:
            np.maximum.at(self.registers, idx, rank)
        return self

    # -- bulk tiny-group hooks (agg.py map-side combine / reducers) -----
    def _serialize_pair_groups(
        self, idx: np.ndarray, rank: np.ndarray, codes: np.ndarray
    ) -> list:
        """(idx, rank, group code) triples — codes non-decreasing is NOT
        required — → one serialized HLL per distinct code, in order of
        first appearance within sorted code order. Register content is
        IDENTICAL to per-group ``update``/``merge`` folds: the max-rank
        dedupe below is the same reduction ``_sparse_absorb`` performs,
        done once across all groups instead of once per group."""
        if codes.size == 0:
            return []
        order = np.lexsort((-rank.astype(np.int16), idx, codes))
        c_s, i_s, r_s = codes[order], idx[order], rank[order]
        keep = np.r_[True, (c_s[1:] != c_s[:-1]) | (i_s[1:] != i_s[:-1])]
        c_k, i_k, r_k = c_s[keep], i_s[keep], r_s[keep]
        starts = np.flatnonzero(np.r_[True, c_k[1:] != c_k[:-1]])
        ends = np.r_[starts[1:], c_k.size]
        head = struct.Struct("<4sHBBQ")
        dense_cut = self.m // 8
        out = []
        for s, e in zip(starts, ends):
            n = int(e - s)
            if n > dense_cut:  # same densify threshold as _sparse_absorb
                regs = np.zeros(self.m, dtype=np.uint8)
                regs[i_k[s:e]] = r_k[s:e]
                out.append(
                    head.pack(self.MAGIC, self.VERSION, self.p, 0, 0)
                    + regs.tobytes()
                )
            else:
                out.append(
                    head.pack(self.MAGIC, self.VERSION, self.p, 1, n)
                    + i_k[s:e].astype(np.int64).tobytes()
                    + r_k[s:e].tobytes()
                )
        return out

    def serialize_hashed_groups_like(
        self, hashes: np.ndarray, starts: np.ndarray, ends: np.ndarray
    ) -> list:
        """Map-side bulk build: value hashes sorted by group (slice
        boundaries in starts/ends) → one blob per group. Values were
        hashed ONCE for the whole partition (base_hash_full) — the
        per-group hash_pandas_object overhead the object path pays is
        the 10-30x trap this hook removes for millions of tiny groups."""
        n_groups = len(starts)
        if n_groups == 0:
            return []
        idx, rank = self._idx_rank(hashes.astype(np.uint64))
        lens = np.asarray(ends) - np.asarray(starts)
        codes = np.repeat(np.arange(n_groups), lens)
        blobs = self._serialize_pair_groups(idx, rank, codes)
        # empty (starts==ends) segments produce no codes — reinsert
        # empty blobs at their positions so output stays one-per-group
        # aligned (the documented contract). `lens` already encodes the
        # non-empty group indices; no need to re-sort the codes array.
        return self._realign(blobs, np.flatnonzero(lens > 0), n_groups)

    def merge_blob_groups_like(self, blobs, starts, ends) -> list:
        """Reducer bulk hook: merge blob runs (starts/ends slice the
        blob array per group) without per-group Python folds. Parses
        each blob once (header loop), then one global dedupe-max."""
        idx_parts, rank_parts, code_parts = [], [], []
        for g, (s, e) in enumerate(zip(starts, ends)):
            for b in blobs[s:e]:
                other = HLL.deserialize(bytes(b))
                if other.p != self.p:
                    raise ValueError("p mismatch")
                if other.is_sparse:
                    if other.sp_idx.size == 0:
                        continue
                    idx_parts.append(other.sp_idx)
                    rank_parts.append(other.sp_rank)
                else:
                    nz = np.flatnonzero(other.registers)
                    if nz.size == 0:
                        continue
                    idx_parts.append(nz.astype(np.int64))
                    rank_parts.append(other.registers[nz])
                code_parts.append(np.full(idx_parts[-1].size, g))
        n_groups = len(starts)
        if not idx_parts:
            return [HLL(self.p).serialize()] * n_groups
        idx = np.concatenate(idx_parts)
        rank = np.concatenate(rank_parts)
        codes = np.concatenate(code_parts)
        blobs_out = self._serialize_pair_groups(idx, rank, codes)
        # groups whose every blob was empty still need an (empty) blob
        return self._realign(blobs_out, np.unique(codes), n_groups)

    def _realign(self, blobs: list, present: np.ndarray, n_groups: int) -> list:
        """Shared one-blob-per-group realignment: scatter blobs (in
        sorted-`present` order) back to their group positions, filling
        absent groups with an empty sketch."""
        if len(blobs) == n_groups:
            return blobs
        empty = HLL(self.p).serialize()
        full = [empty] * n_groups
        for j, g in enumerate(present):
            full[int(g)] = blobs[j]
        return full

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError("p mismatch")
        if self.is_sparse and other.is_sparse:
            self._sparse_absorb(other.sp_idx, other.sp_rank)
        else:
            self._densify()
            if other.is_sparse:
                if other.sp_idx.size:
                    np.maximum.at(self.registers, other.sp_idx, other.sp_rank)
            else:
                np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def _register_histogram(self) -> np.ndarray:
        """C[k] = number of registers holding value k, k in 0..q+1
        (q = 64 - p; value q+1 means the hash remainder was all-zero)."""
        q = 64 - self.p
        if self.is_sparse:
            hist = np.bincount(self.sp_rank.astype(np.int64), minlength=q + 2)
            hist = hist.astype(np.float64)
            hist[0] = self.m - self.sp_idx.size
        else:
            hist = np.bincount(
                self.registers.astype(np.int64), minlength=q + 2
            ).astype(np.float64)
        return hist

    def estimate(self, method: str = "ertl") -> float:
        """Cardinality estimate.

        method="ertl" (default): Ertl's improved raw estimator
        ("New cardinality estimation algorithms for HyperLogLog
        sketches", arXiv:1702.01284, Alg. 6) — corrects the small- and
        large-range regimes analytically via the sigma/tau series, with
        no empirical bias tables and no estimator switch, so the
        FFGM07 raw/linear-counting crossover bump (up to a few percent
        bias near n ~ 2.5m) disappears. Pure function of the register
        histogram, hence merge-order/layout independent like the rest
        of the sketch.

        method="ffm": the original Flajolet-Fusy-Gandouet-Meunier
        estimator with the standard linear-counting small-range
        correction (the pre-round-6 behavior, kept for comparison and
        for any caller pinned to its exact values).
        """
        if method == "ffm":
            return self._estimate_ffm()
        if method != "ertl":
            raise ValueError(f"unknown estimate method {method!r}")
        hist = self._register_histogram()
        m = float(self.m)
        q = 64 - self.p
        if hist[0] == m:
            return 0.0
        z = m * _tau(1.0 - hist[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + hist[k])
        z += m * _sigma(hist[0] / m)
        if z == 0.0:
            return float("inf")  # every register saturated at q+1
        return _ALPHA_INF * m * m / z

    def _estimate_ffm(self) -> float:
        m = self.m
        if self.is_sparse:
            nnz = self.sp_idx.size
            if nnz == 0:
                return 0.0
            inv_sum = np.ldexp(1.0, -self.sp_rank.astype(np.int64)).sum() + (
                m - nnz
            )
            zeros = m - nnz
        else:
            inv_sum = np.ldexp(1.0, -self.registers.astype(np.int64)).sum()
            zeros = int((self.registers == 0).sum())
        raw = _alpha(m) * m * m / inv_sum
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def serialize(self) -> bytes:
        if self.is_sparse:
            head = struct.pack(
                "<4sHBBQ", self.MAGIC, self.VERSION, self.p, 1, self.sp_idx.size
            )
            return (
                head
                + self.sp_idx.astype(np.int64).tobytes()
                + self.sp_rank.tobytes()
            )
        head = struct.pack("<4sHBBQ", self.MAGIC, self.VERSION, self.p, 0, 0)
        return head + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HLL":
        (p, sparse, n), off = cls._check_header(data, "BBQ")
        hll = cls(p, sparse=bool(sparse))
        if sparse:
            hll.sp_idx = np.frombuffer(
                data, dtype=np.int64, count=n, offset=off
            ).copy()
            hll.sp_rank = np.frombuffer(
                data, dtype=np.uint8, count=n, offset=off + 8 * n
            ).copy()
        else:
            hll.registers = np.frombuffer(
                data, dtype=np.uint8, count=hll.m, offset=off
            ).copy()
        return hll
