"""Vectorized 64-bit hashing for sketch updates.

One base hash per value (pandas' vectorized SipHash-flavored
``hash_pandas_object`` with a fixed key → deterministic across runs,
processes, and partitions), then cheap splitmix64 rounds to derive the
k independent hash functions HLL/count-min/Bloom/MinHash need — all in
numpy uint64 arithmetic, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "tgdigest_spark_0123456789abcdef"[:16]

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def base_hash(values) -> np.ndarray:
    """values (any dtype, incl. strings) → uint64 hashes, nulls dropped."""
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    mask = s.notna().to_numpy()
    h = pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()
    return h[mask]


def base_hash_full(values) -> tuple[np.ndarray, np.ndarray]:
    """Like :func:`base_hash` but row-aligned: returns (hashes for ALL
    rows, not-null mask) so callers that carry parallel arrays (group
    codes) can drop nulls themselves without re-hashing per group —
    the per-call overhead of hash_pandas_object is exactly what the
    bulk tiny-group paths exist to amortize."""
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    mask = s.notna().to_numpy()
    h = pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()
    return h, mask


def splitmix64(x: np.ndarray) -> np.ndarray:
    """One splitmix64 finalization round (vectorized, uint64)."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _MIX1
        z = (z ^ (z >> np.uint64(27))) * _MIX2
        return z ^ (z >> np.uint64(31))


def hash_k(h: np.ndarray, k: int) -> np.ndarray:
    """Derive k hash streams from base hashes: shape (k, n) uint64.

    Uses h_i = h1 + i*h2 (Kirsch–Mitzenmacher double hashing) with h2
    from an extra splitmix round — standard, index-independent.
    """
    h1 = h
    h2 = splitmix64(h) | np.uint64(1)  # odd → full-period
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return (h1[None, :] + i * h2[None, :]).astype(np.uint64)
