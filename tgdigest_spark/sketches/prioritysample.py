"""Priority sampling: a mergeable bounded-k weighted sample with
unbiased subset-sum estimates — the SAMPLING sketch of the family.

Algorithm: Duffield, Lund & Thorup, "Priority sampling for estimation
of arbitrary subset sums" (JACM 54(6), 2007). Every item ``(id, w)``
gets a deterministic uniform ``u(id) ∈ (0,1]`` (hash-derived, like the
engine's weighted_sample / KMV conventions) and priority ``p = w/u``;
the sketch keeps the k items with the HIGHEST priorities plus
``tau`` = the (k+1)-th largest priority seen. Estimation: each retained
item represents weight ``max(w, tau)``; for ANY subset S fixed
independently of the sample,

    Ŝ = sum_{i in sample, i in S} max(w_i, tau)

is an UNBIASED estimator of ``sum_{i in S} w_i`` (DLT Theorem 1), with
near-optimal variance: Szegedy (STOC 2006) proved priority sampling
with k+1 samples beats the variance of ANY k-sample scheme.

Merge is KMV-shaped and BIT-EXACT: priorities are a pure function of
(id, w), so the top-k of a union is determined by the two retained
sets, and the union's (k+1)-th largest priority is
``max(tau_a, tau_b, (k+1)-th of the retained union)`` — every priority
ever evicted on either side is dominated by that side's own tau plus
its k retained items. Content is therefore a pure function of the item
multiset: byte-identical blobs under any merge tree or partition
layout (property-tested). Exact regime: while the stream holds <= k
items, tau = 0, every adjusted weight equals the raw weight, and every
subset sum is EXACT — the gate anchor, mirroring the KMV bound.

Caller contract: ``id`` must uniquely identify the sampled unit (a row
key). Re-presenting the same id draws the SAME uniform, so duplicate
ids across partitions are correlated draws, not independent items.
Weights must be > 0 (zero-weight items are dropped — they contribute
nothing to any subset sum; negative weights raise).

No reference analog (the reference keeps exact top-k only,
/root/reference/src/post.rs:76-90); this is the bounded-memory answer
to "estimate any slice's total without scanning it again".
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import Sketch
from .hashing import base_hash_full

# header: k I, n q, tau d, m I
_HEAD_FMT = "<4sHIqdI"
_HEAD_SIZE = struct.calcsize(_HEAD_FMT)

_U_SCALE = 2.0**-52


def _uniforms(h: np.ndarray) -> np.ndarray:
    """uint64 hash → deterministic uniform in (0, 1], double-exact
    (52 mantissa bits, +1 keeps it strictly positive)."""
    return ((h >> np.uint64(12)).astype(np.float64) + 1.0) * _U_SCALE


class PrioritySample(Sketch):
    MAGIC = b"PRS1"

    def __init__(self, k: int = 4096):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.n = 0  # items absorbed (post null/zero drop)
        self.tau = 0.0  # (k+1)-th largest priority seen; 0 while n <= k
        self.pri = np.empty(0, dtype=np.float64)
        self.wts = np.empty(0, dtype=np.float64)
        self.hsh = np.empty(0, dtype=np.uint64)
        self.ids = np.empty(0, dtype=object)

    # -- core ------------------------------------------------------------
    def _truncate(self) -> None:
        """Canonical order (priority desc, id-hash asc) + keep top k;
        the largest evicted priority feeds tau."""
        order = np.lexsort((self.hsh, -self.pri))
        if order.size > self.k:
            evict = order[self.k :]
            self.tau = max(self.tau, float(self.pri[evict].max()))
            order = order[: self.k]
        self.pri = self.pri[order]
        self.wts = self.wts[order]
        self.hsh = self.hsh[order]
        self.ids = self.ids[order]

    def update(self, ids, weights) -> "PrioritySample":
        s_ids = ids if isinstance(ids, pd.Series) else pd.Series(ids)
        w = np.asarray(
            weights.to_numpy(dtype=np.float64, na_value=np.nan)
            if isinstance(weights, pd.Series)
            else np.asarray(weights, dtype=np.float64)
        )
        if len(s_ids) != w.size:
            raise ValueError("ids and weights must align")
        # hash the STRING form of the id — the same domain the sketch
        # serializes — so the priority draw is dtype-independent (an
        # int-typed id column and its cast-to-string form are the SAME
        # item; hashing the raw dtype would give them independent
        # uniforms and double-count subset sums on merge)
        w_valid = ~np.isnan(w)
        # validate BEFORE the id-null mask: a negative weight is a data
        # defect even when its id is null (e.g. a failed upstream join)
        if np.any(w[w_valid] < 0.0):
            raise ValueError("weights must be >= 0")
        id_mask = s_ids.notna().to_numpy()
        s_str = s_ids.astype(str)  # nulls stringify but id_mask drops them
        h_all, _ = base_hash_full(s_str)
        mask = id_mask & w_valid & (w > 0.0)
        if not np.any(mask):
            return self
        h = h_all[mask].astype(np.uint64)
        wv = w[mask]
        p = wv / _uniforms(h)
        self.n += int(wv.size)
        self.pri = np.concatenate([self.pri, p])
        self.wts = np.concatenate([self.wts, wv])
        self.hsh = np.concatenate([self.hsh, h])
        self.ids = np.concatenate(
            [self.ids, s_ids[mask].astype(str).to_numpy(dtype=object)]
        )
        self._truncate()
        return self

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        if not isinstance(other, PrioritySample) or other.k != self.k:
            raise ValueError("k mismatch")
        if other.n == 0:
            return self
        self.n += other.n
        self.tau = max(self.tau, other.tau)
        self.pri = np.concatenate([self.pri, other.pri])
        self.wts = np.concatenate([self.wts, other.wts])
        self.hsh = np.concatenate([self.hsh, other.hsh])
        self.ids = np.concatenate([self.ids, other.ids])
        self._truncate()
        return self

    # -- serialization -----------------------------------------------------
    def serialize(self) -> bytes:
        m = self.pri.size
        enc = [str(s).encode("utf-8") for s in self.ids]
        lens = np.array([len(b) for b in enc], dtype=np.int32)
        return (
            struct.pack(
                _HEAD_FMT, self.MAGIC, self.VERSION, self.k, self.n,
                self.tau, m,
            )
            + self.pri.tobytes()
            + self.wts.tobytes()
            + self.hsh.tobytes()
            + lens.tobytes()
            + b"".join(enc)
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "PrioritySample":
        (k, n, tau, m), off = cls._check_header(data, "IqdI")
        sk = cls(k)
        sk.n, sk.tau = int(n), float(tau)
        sk.pri = np.frombuffer(data, np.float64, m, off).copy()
        off += 8 * m
        sk.wts = np.frombuffer(data, np.float64, m, off).copy()
        off += 8 * m
        sk.hsh = np.frombuffer(data, np.uint64, m, off).copy()
        off += 8 * m
        lens = np.frombuffer(data, np.int32, m, off)
        off += 4 * m
        ids = np.empty(m, dtype=object)
        for i, ln in enumerate(lens):
            ids[i] = data[off : off + int(ln)].decode("utf-8")
            off += int(ln)
        sk.ids = ids
        return sk

    # -- queries -----------------------------------------------------------
    @property
    def exact_regime(self) -> bool:
        """True while the whole stream is retained (n <= k): adjusted
        weights equal raw weights and every subset sum is exact."""
        return self.tau == 0.0

    def adjusted_weights(self) -> np.ndarray:
        """Per retained item: the weight it represents, max(w, tau)."""
        return np.maximum(self.wts, self.tau)

    def sample(self) -> pd.DataFrame:
        """The retained sample: DataFrame[id, weight, adjusted_weight]
        in canonical (priority desc) order."""
        return pd.DataFrame(
            {
                "id": list(self.ids),
                "weight": self.wts,
                "adjusted_weight": self.adjusted_weights(),
            }
        )

    def total_estimate(self) -> float:
        """Unbiased estimate of the stream's total weight (exact in the
        exact regime)."""
        return float(np.sum(self.adjusted_weights()))

    def subset_sum(self, member) -> float:
        """Unbiased estimate of sum(w) over the subset selected by
        ``member``: either a boolean mask aligned with :meth:`sample`
        order or a vectorizable predicate over the id strings. The
        subset must be defined independently of which items got
        sampled (DLT's condition — any id-derived predicate is)."""
        if callable(member):
            mask = np.fromiter(
                (bool(member(i)) for i in self.ids), dtype=bool,
                count=self.ids.size,
            )
        else:
            mask = np.asarray(member, dtype=bool)
            if mask.size != self.ids.size:
                raise ValueError("mask must align with sample()")
        return float(np.sum(self.adjusted_weights()[mask]))


__all__ = ["PrioritySample"]
