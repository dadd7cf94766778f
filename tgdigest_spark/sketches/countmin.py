"""Count-min sketch (Cormode & Muthukrishnan 2005), from scratch.

Guarantee: est(x) >= true(x), and est(x) <= true(x) + eps*N with
probability 1-delta, for width w = ceil(e/eps), depth d = ceil(ln 1/delta).

Exact-reference anchor: tgdigest's exact per-metric counts feeding its
top-k ranking (/root/reference/src/post.rs:76-90); the engine's exact
counterpart is groupBy().count().

Vectorization: d hash streams from one base hash (hashing.hash_k);
``np.add.at`` scatter-adds counts row-wise. Merge = elementwise sum
(associative & commutative). Supports weighted updates.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import Sketch
from .hashing import base_hash, hash_k


class CountMin(Sketch):
    MAGIC = b"CMS1"

    def __init__(self, width: int = 2048, depth: int = 5):
        if width < 8 or depth < 1 or depth > 32:
            raise ValueError("bad dimensions")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    @classmethod
    def from_error(cls, eps: float = 0.001, delta: float = 0.01) -> "CountMin":
        w = int(np.ceil(np.e / eps))
        d = int(np.ceil(np.log(1.0 / delta)))
        return cls(w, d)

    def update(self, values, counts=None) -> "CountMin":
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        mask = s.notna().to_numpy()
        h = base_hash(s)
        if h.size == 0:
            return self
        if counts is None:
            c = np.ones(h.size, dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64)[mask]
        hk = hash_k(h, self.depth) % np.uint64(self.width)
        for i in range(self.depth):
            np.add.at(self.table[i], hk[i].astype(np.int64), c)
        self.total += int(c.sum())
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("dimension mismatch")
        self.table += other.table
        self.total += other.total
        return self

    def estimate(self, values) -> np.ndarray:
        """Point-frequency estimates for a batch of items (vectorized)."""
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        h = base_hash(s)
        hk = hash_k(h, self.depth) % np.uint64(self.width)
        ests = np.stack(
            [self.table[i][hk[i].astype(np.int64)] for i in range(self.depth)]
        )
        return ests.min(axis=0)

    def serialize(self) -> bytes:
        head = struct.pack(
            "<4sHIIq", self.MAGIC, self.VERSION, self.width, self.depth, self.total
        )
        return head + self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMin":
        (w, d, total), off = cls._check_header(data, "IIq")
        cm = cls(w, d)
        cm.total = total
        cm.table = (
            np.frombuffer(data, dtype=np.int64, count=w * d, offset=off)
            .reshape(d, w)
            .copy()
        )
        return cm
