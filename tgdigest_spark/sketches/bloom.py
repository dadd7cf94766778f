"""Bloom filter (Bloom 1970), from scratch, numpy bit array.

FPR ≈ (1 - e^{-kn/m})^k; sized from (capacity, fpr) with the optimal
m = -n ln p / (ln 2)^2, k = (m/n) ln 2.

Exact-reference anchor: the reference's exact membership HashSet
``seen_groups`` (/root/reference/src/cache.rs:181) — the engine's
approximate generalization for conv_id membership at 10^12-turn scale.

Merge = bitwise OR (associative, commutative, idempotent); only valid
between filters with identical (m, k).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch
from .hashing import base_hash, hash_k


class Bloom(Sketch):
    MAGIC = b"BLM1"

    def __init__(self, n_bits: int = 1 << 20, k: int = 7):
        if n_bits < 64 or k < 1 or k > 32:
            raise ValueError("bad dimensions")
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.words = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def from_capacity(cls, capacity: int, fpr: float = 0.01) -> "Bloom":
        m = int(np.ceil(-capacity * np.log(fpr) / (np.log(2) ** 2)))
        k = max(1, int(round(m / capacity * np.log(2))))
        return cls(((m + 63) // 64) * 64, min(k, 32))

    def _positions(self, values) -> np.ndarray:
        h = base_hash(values)
        if h.size == 0:
            return np.empty((self.k, 0), dtype=np.uint64)
        return hash_k(h, self.k) % np.uint64(self.n_bits)

    def update(self, values) -> "Bloom":
        pos = self._positions(values)
        if pos.size:
            flat = pos.ravel()
            word = (flat >> np.uint64(6)).astype(np.int64)
            bit = (np.uint64(1) << (flat & np.uint64(63))).astype(np.uint64)
            np.bitwise_or.at(self.words, word, bit)
            self.n_added += pos.shape[1]
        return self

    def contains(self, values) -> np.ndarray:
        """Vectorized membership test → bool array (no false negatives)."""
        pos = self._positions(values)
        if pos.shape[1] == 0:
            return np.empty(0, dtype=bool)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = (np.uint64(1) << (pos & np.uint64(63))).astype(np.uint64)
        return ((self.words[word] & bit) != 0).all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        if (other.n_bits, other.k) != (self.n_bits, self.k):
            raise ValueError("dimension mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())

    def serialize(self) -> bytes:
        head = struct.pack(
            "<4sHQIq", self.MAGIC, self.VERSION, self.n_bits, self.k, self.n_added
        )
        return head + self.words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "Bloom":
        (n_bits, k, n_added), off = cls._check_header(data, "QIq")
        b = cls(n_bits, k)
        b.n_added = n_added
        b.words = np.frombuffer(
            data, dtype=np.uint64, count=len(b.words), offset=off
        ).copy()
        return b
