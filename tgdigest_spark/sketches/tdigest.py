"""Merging t-digest with scale-function-bounded centroids (from scratch).

Algorithm: Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests" (2019) — the *merging* variant. Centroid sizes are bounded by
the k1 scale function

    k1(q) = (delta / (2*pi)) * asin(2q - 1)

which allocates centroid capacity ~ q(1-q), giving relative rank error
<= q(1-q) * c / delta at the tails (the bound BASELINE.json requires).

Implementation notes (all vectorized, no per-value Python):

* ``update`` sorts the incoming batch (numpy), concatenates with the
  existing centroids via mergesort, and re-clusters.
* Re-clustering quantizes cumulative weight midpoints onto the integer
  grid of k1-space (``np.searchsorted`` against precomputed q-boundaries,
  ``np.add.reduceat`` for weighted means). Boundaries depend only on
  (delta, total weight), so merging is associative up to the published
  bound — deep and shallow merge trees land within bound of each other
  (property-tested in tests/test_tdigest.py).
* Exact min/max are kept for tail interpolation.

Reference anchor: the exact path this approximates is tgdigest's full
sort over fetched rows (/root/reference/src/post.rs:76-90); oracle tests
compare against exact percentiles on the same rows.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, clean_numeric

_TWO_PI = 2.0 * np.pi


class TDigest(Sketch):
    MAGIC = b"TDG1"

    def __init__(self, delta: int = 200):
        if delta < 10:
            raise ValueError("delta too small")
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf
        self.count = 0.0

    # -- scale function ------------------------------------------------
    def _q_boundaries(self) -> np.ndarray:
        """q values at integer steps of k1-space: the cluster fences.

        k1 spans [-delta/4, +delta/4] over q in [0,1] → delta/2 clusters,
        each of weight <= W * (q(k+1) - q(k)) ~ 4W*sqrt(q(1-q))/delta.
        """
        kmin, kmax = -self.delta / 4.0, self.delta / 4.0
        ks = np.arange(np.ceil(kmin), np.floor(kmax) + 1.0)
        qs = (np.sin(ks * _TWO_PI / self.delta) + 1.0) / 2.0
        return qs[(qs > 0.0) & (qs < 1.0)]

    # -- core clustering ------------------------------------------------
    def _recluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Given mean-sorted centroid arrays, quantize onto the k1 grid."""
        w_total = float(weights.sum())
        if w_total == 0.0:
            self.means = np.empty(0)
            self.weights = np.empty(0)
            self.count = 0.0
            return
        cum = np.cumsum(weights)
        q_mid = (cum - 0.5 * weights) / w_total
        fences = self._q_boundaries()
        cluster = np.searchsorted(fences, q_mid, side="right")
        # boundaries of runs of equal cluster id
        starts = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]])
        w_sum = np.add.reduceat(weights, starts)
        m_sum = np.add.reduceat(means * weights, starts)
        self.means = m_sum / w_sum
        self.weights = w_sum
        self.count = w_total

    @classmethod
    def from_sorted(cls, arr: np.ndarray, delta: int = 200) -> "TDigest":
        """Fast path for per-group builds: ``arr`` pre-sorted, no NaNs.

        Groups smaller than the centroid budget ARE their own digest
        (every value a unit-weight centroid) — skips the recluster pass
        that dominates building millions of tiny per-group sketches.
        """
        td = cls(delta)
        n = arr.size
        if n == 0:
            return td
        td.min, td.max = float(arr[0]), float(arr[-1])
        if n <= delta // 2:
            td.means = arr.astype(np.float64, copy=True)
            td.weights = np.ones(n)
            td.count = float(n)
        else:
            td._recluster(arr.astype(np.float64), np.ones(n))
        return td

    def from_sorted_like(self, arr: np.ndarray) -> "TDigest":
        """Instance hook used by agg's bulk per-group builder."""
        return TDigest.from_sorted(arr, self.delta)

    # -- protocol --------------------------------------------------------
    def update(self, values) -> "TDigest":
        arr = clean_numeric(values)
        if arr.size == 0:
            return self
        arr = np.sort(arr)
        self.min = min(self.min, float(arr[0]))
        self.max = max(self.max, float(arr[-1]))
        means = np.concatenate([self.means, arr])
        weights = np.concatenate([self.weights, np.ones(arr.size)])
        order = np.argsort(means, kind="mergesort")
        self._recluster(means[order], weights[order])
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.count == 0:
            return self
        if other.delta != self.delta:
            raise ValueError("delta mismatch")
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(means, kind="mergesort")
        self._recluster(means[order], weights[order])
        return self

    # -- queries ---------------------------------------------------------
    def quantile(self, q) -> float | np.ndarray:
        """Estimate value at quantile(s) q — piecewise-linear between
        centroid means with exact min/max endpoints."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.count == 0:
            out = np.full(qs.shape, np.nan)
            return out[0] if np.isscalar(q) else out
        if self.means.size == 1:
            out = np.full(qs.shape, self.means[0])
            return float(out[0]) if np.isscalar(q) else out
        w = self.weights
        cum_mid = np.cumsum(w) - 0.5 * w  # rank of each centroid's mean
        targets = np.clip(qs, 0.0, 1.0) * self.count
        # interpolation nodes: (rank, value) = (0,min) + centroids + (count,max)
        ranks = np.concatenate([[0.0], cum_mid, [self.count]])
        vals = np.concatenate([[self.min], self.means, [self.max]])
        out = np.interp(targets, ranks, vals)
        return float(out[0]) if np.isscalar(q) else out

    def cdf(self, x) -> float | np.ndarray:
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.count == 0:
            out = np.full(xs.shape, np.nan)
            return out[0] if np.isscalar(x) else out
        w = self.weights
        cum_mid = np.cumsum(w) - 0.5 * w
        ranks = np.concatenate([[0.0], cum_mid, [self.count]])
        vals = np.concatenate([[self.min], self.means, [self.max]])
        out = np.interp(xs, vals, ranks) / self.count
        return float(out[0]) if np.isscalar(x) else out

    # -- serialization ----------------------------------------------------
    def serialize(self) -> bytes:
        head = struct.pack(
            "<4sHIQ ddd".replace(" ", ""),
            self.MAGIC,
            self.VERSION,
            self.delta,
            self.means.size,
            self.min,
            self.max,
            self.count,
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        (delta, n, mn, mx, count), off = cls._check_header(data, "IQddd")
        td = cls(delta)
        td.min, td.max, td.count = mn, mx, count
        td.means = np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
        td.weights = np.frombuffer(
            data, dtype=np.float64, count=n, offset=off + 8 * n
        ).copy()
        return td
