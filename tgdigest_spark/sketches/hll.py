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

    def update(self, values) -> "HLL":
        h = base_hash(values)
        if h.size == 0:
            return self
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
        bitlen = np.where(
            high > 0,
            np.floor(np.log2(high)).astype(np.int64) + 33,
            np.where(low > 0, np.floor(np.log2(low)).astype(np.int64) + 1, 0),
        )
        rank[nz] = (width - bitlen + 1).astype(np.uint8)
        rank[~nz] = width + 1
        if self.is_sparse:
            self._sparse_absorb(idx, rank)
        else:
            np.maximum.at(self.registers, idx, rank)
        return self

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

    def estimate(self) -> float:
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
