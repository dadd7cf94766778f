"""Count-Sketch (AMS tug-of-war, bucketed): unbiased frequencies + F2.

From scratch, after the published algorithm line: Charikar, Chen &
Farach-Colton, "Finding frequent items in data streams" (ICALP 2002) —
d rows x b signed counters, each item lands in ONE bucket per row with
a +/-1 sign; the point-frequency estimate is the median over rows of
sign(x) * C[row, h_row(x)]. The F2 (second frequency moment) estimate
is the AMS tug-of-war form (Alon, Matias & Szegedy, STOC 1996): each
row's sum of squared counters is an unbiased estimator of
F2 = sum_x f_x^2 with Var <= 2*F2^2/b; the median over d rows supplies
the standard (eps, delta) concentration.

Why carry this next to count-min and Misra-Gries:

* count-min is one-sided (always OVER-estimates; bound additive in n =
  total weight). Count-sketch is UNBIASED with error relative to
  sqrt(F2/b) — much tighter on skewed data where F2 << n^2, and it can
  under-estimate, which CM never does. Together they bracket.
* F2 is the SELF-JOIN SIZE of the column: |{(r1, r2) : key(r1) =
  key(r2)}|. At cluster scale that is the number the planner wants
  BEFORE running a self-join or skewed shuffle — one narrow map-side
  pass estimates the join output / reducer load without shuffling the
  fact rows. (Exactly the quantity the gate row pins against the SQL
  oracle SUM(cnt*cnt).)

Hash independence caveat (stated, not hidden): the published variance
proofs assume 2-universal bucket hashes and 4-wise independent signs;
this implementation derives both streams from splitmix64 rounds
(Kirsch-Mitzenmacher double hashing, same heuristic family as the
repo's Bloom/CM/HLL). Property tests pin the observed error well
inside the published bound on real data.

Merge algebra: counters are linear in the input (C = sum over rows of
sign * weight scattered by bucket), so merge is elementwise addition —
exactly associative + commutative, bit-identical under ANY merge tree
(stronger than t-digest/MG, same class as CM). Property-tested.

Reference anchor: the reference's exact per-metric counts feeding
top-k (/root/reference/src/post.rs:76-90) are the exact form of the
frequency queries this sketch answers approximately at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .base import Sketch
from .hashing import base_hash, hash_k


class CountSketch(Sketch):
    MAGIC = b"CSK1"

    def __init__(self, depth: int = 5, width: int = 2048):
        if depth < 1 or width < 1:
            raise ValueError("depth and width must be >= 1")
        self.depth = int(depth)
        self.width = int(width)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0  # total weight ingested (for diagnostics only)

    # -- core protocol ----------------------------------------------------
    def _route(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """base hashes -> (buckets, signs), each shape (depth, n).

        One splitmix-derived stream per row; the bucket is the stream
        mod width, the sign is an independent bit (bit 63 — not used by
        the mod for any width < 2^63)."""
        hk = hash_k(h, self.depth)  # (depth, n) uint64
        buckets = (hk % np.uint64(self.width)).astype(np.int64)
        signs = np.where((hk >> np.uint64(63)) & np.uint64(1), 1, -1).astype(
            np.int64
        )
        return buckets, signs

    def update(self, values, counts=None) -> "CountSketch":
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        h = base_hash(s)  # nulls dropped
        if len(h) == 0:
            return self
        if counts is None:
            w = np.ones(len(h), dtype=np.int64)
        else:
            w = np.asarray(counts, dtype=np.int64)[s.notna().to_numpy()]
            if (w < 0).any():
                raise ValueError("negative weights are not allowed")
        buckets, signs = self._route(h)
        sw = signs * w[None, :]  # (depth, n)
        for r in range(self.depth):
            np.add.at(self.table[r], buckets[r], sw[r])
        self.n += int(w.sum())
        return self

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("depth/width mismatch")
        self.table += other.table
        self.n += other.n
        return self

    # -- queries ----------------------------------------------------------
    def estimate(self, items) -> np.ndarray:
        """Unbiased point-frequency estimates (median over rows).

        items: scalar / sequence / Series -> int64 array (may be
        negative — callers wanting a frequency clamp at 0)."""
        s = pd.Series(items if not np.isscalar(items) else [items])
        h = base_hash(s)
        if len(h) != len(s):
            raise ValueError("null items have no frequency estimate")
        buckets, signs = self._route(h)
        per_row = signs * self.table[np.arange(self.depth)[:, None], buckets]
        return np.median(per_row, axis=0).astype(np.int64)

    def f2_estimate(self) -> int:
        """Second frequency moment / self-join size: median over rows of
        the row's sum of squared counters (AMS estimator)."""
        sq = self.table.astype(np.float64) ** 2
        return int(np.median(sq.sum(axis=1)))

    def f2_rows(self) -> np.ndarray:
        """Per-row F2 estimates (each unbiased) — for bound diagnostics."""
        sq = self.table.astype(np.float64) ** 2
        return sq.sum(axis=1)

    def inner_product(self, other: "CountSketch") -> int:
        """JOIN-SIZE estimate (AGMS): sum_x fA(x) * fB(x) =
        |{(ra, rb) : key(ra) = key(rb)}| for an equi-join of the two
        sketched columns. Because both sketches share the repo's fixed
        hash seeds, matching keys land in the same (row, bucket) with
        the same sign, so each row's counter dot-product is an unbiased
        estimator (Alon, Gibbons, Matias & Szegedy, PODS 1999 — "join
        sizes ... via sketches"); median over rows. Var per row <=
        2 * F2(A) * F2(B) / width. Requires identical (depth, width).
        """
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("depth/width mismatch")
        per_row = (
            self.table.astype(np.float64) * other.table.astype(np.float64)
        ).sum(axis=1)
        return int(np.median(per_row))

    # -- serialization ----------------------------------------------------
    def serialize(self) -> bytes:
        head = self._header(
            ("I", self.depth), ("I", self.width), ("q", self.n)
        )
        return head + self.table.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountSketch":
        (depth, width, n), off = cls._check_header(data, "IIq")
        sk = cls(depth, width)
        sk.n = int(n)
        sk.table = (
            np.frombuffer(data, dtype=np.int64, count=depth * width, offset=off)
            .reshape(depth, width)
            .copy()
        )
        return sk
