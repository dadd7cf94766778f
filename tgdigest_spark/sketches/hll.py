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
    MAGIC = b"HLL1"

    def __init__(self, p: int = 14):
        if not 4 <= p <= 20:
            raise ValueError("p out of range")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

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
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError("p mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))  # 2^-reg
        raw = _alpha(m) * m * m / inv.sum()
        if raw <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def serialize(self) -> bytes:
        head = struct.pack("<4sHB", self.MAGIC, self.VERSION, self.p)
        return head + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HLL":
        (p,), off = cls._check_header(data, "B")
        hll = cls(p)
        hll.registers = np.frombuffer(
            data, dtype=np.uint8, count=hll.m, offset=off
        ).copy()
        return hll
