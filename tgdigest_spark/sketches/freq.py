"""Misra-Gries frequent-items sketch (deterministic heavy hitters).

From scratch, after the published algorithm line: Misra & Gries,
"Finding repeated elements" (Sci. Comput. Program. 1982); merge rule
and mergeability proof from Agarwal, Cormode, Huang, Phillips, Wei &
Yi, "Mergeable summaries" (PODS 2012 / TODS 2013) — combine counter
maps, then subtract the (k+1)-th largest count from every counter and
drop the non-positives. SpaceSaving (Metwally et al. 2005) is the
isomorphic variant; MG is kept for its one-sided error.

Why carry this next to count-min: count-min answers point frequency
queries for KNOWN probe items (over-estimates, needs a candidate
source); MG carries its own candidate set with DETERMINISTIC one-sided
bounds — est(x) <= true(x) <= est(x) + err, with err tracked exactly
per sketch and err <= n/(k+1) always. That makes the classic two-pass
"sketch candidates, then exact-verify" heavy-hitter pipeline provable:
any item with true frequency > n/(k+1) is GUARANTEED to survive in the
counter map, so a follow-up exact count over the <= k candidates
(broadcast semi-join, one more scan) returns the exact phi-heavy-hitter
set with no false negatives. See api.guaranteed_heavy_hitters.

Reference anchor: tgdigest's exact per-metric counts feeding top-k
(/root/reference/src/post.rs:76-90).

Merge algebra: counter VALUES are merge-tree-dependent (like t-digest),
but the published bound is preserved under ARBITRARY merge trees
(Mergeable summaries, Thm 1) — property-tested here against shuffled
partition permutations at bound level, and the tracked ``err`` makes
the sandwich est <= true <= est + err hold for every tree.

Vectorization: batch updates count the batch with pandas
``value_counts`` (vectorized) and touch Python only per DISTINCT item
(bounded by batch distinct, and by <= 2k+batch-distinct after shrink)
— never per row.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import Sketch


class FrequentItems(Sketch):
    MAGIC = b"MGF1"

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counts: dict[str, int] = {}
        self.n = 0  # total weight ingested (exact, never decremented)
        self.err = 0  # cumulative decrement — max undercount of any item

    # -- core protocol --------------------------------------------------
    def update(self, values, counts=None) -> "FrequentItems":
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        mask = s.notna().to_numpy()
        sv = s[mask].astype(str)
        if len(sv) == 0:
            return self
        if counts is None:
            vc = sv.value_counts()  # vectorized; index = distinct items
        else:
            w = np.asarray(counts, dtype=np.int64)[mask]
            # Negative weights would silently corrupt n and the tracked
            # err, voiding the one-sided est <= true <= est + err
            # guarantee that guaranteed_heavy_hitters' exactness proof
            # rests on (r5 advice). Zero weights carry no information
            # but would squat a counter slot — drop them.
            if (w < 0).any():
                raise ValueError("negative weights are not allowed")
            if (w == 0).any():
                nz = w != 0
                sv, w = sv[nz], w[nz]
                if len(sv) == 0:
                    return self
            vc = pd.Series(w).groupby(sv.to_numpy(), sort=False).sum()
        items, cnts = vc.index.to_numpy(), vc.to_numpy(dtype=np.int64)
        d = self.counts
        for it, c in zip(items, cnts):
            d[it] = d.get(it, 0) + int(c)
        self.n += int(cnts.sum())
        self._shrink()
        return self

    def merge(self, other: "FrequentItems") -> "FrequentItems":
        if other.k != self.k:
            raise ValueError("k mismatch")
        d = self.counts
        for it, c in other.counts.items():
            d[it] = d.get(it, 0) + c
        self.n += other.n
        self.err += other.err
        self._shrink()
        return self

    def _shrink(self) -> None:
        """Decrement step: if more than k counters, subtract the
        (k+1)-th largest count from all and drop the non-positives
        (Mergeable summaries merge rule — one numpy partition pass)."""
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(self.counts))
        # (k+1)-th largest == index len-k-1 of the ascending partition
        t = int(np.partition(vals, len(vals) - self.k - 1)[
            len(vals) - self.k - 1])
        self.counts = {it: c - t for it, c in self.counts.items() if c > t}
        self.err += t

    # -- queries --------------------------------------------------------
    def estimate(self, item: str) -> int:
        """Lower bound on true count; true <= estimate + self.err."""
        return self.counts.get(item, 0)

    def items(self) -> list[tuple[str, int]]:
        """(item, est) pairs, est descending then item asc (stable)."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))

    def err_bound(self) -> int:
        """Tracked exact max-undercount; always <= n/(k+1)."""
        return self.err

    # -- serialization --------------------------------------------------
    def serialize(self) -> bytes:
        """Header + int64 counts + int32 byte-lengths + utf-8 payload
        (length-prefixed — items may contain any codepoint)."""
        items = [it.encode("utf-8") for it in self.counts.keys()]
        raw = b"".join(items)
        lens = np.array([len(b) for b in items], dtype=np.int32)
        cnts = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(items))
        head = struct.pack("<4sHIqqIQ", self.MAGIC, self.VERSION, self.k,
                           self.n, self.err, len(items), len(raw))
        return head + cnts.tobytes() + lens.tobytes() + raw

    @classmethod
    def deserialize(cls, data: bytes) -> "FrequentItems":
        (k, n, err, n_items, raw_len), off = cls._check_header(data, "IqqIQ")
        sk = cls(k)
        sk.n, sk.err = int(n), int(err)
        cnts = np.frombuffer(data, dtype=np.int64, count=n_items, offset=off)
        off += 8 * n_items
        lens = np.frombuffer(data, dtype=np.int32, count=n_items, offset=off)
        off += 4 * n_items
        raw = data[off: off + raw_len]
        ends = np.cumsum(lens)
        starts = ends - lens
        sk.counts = {
            raw[s:e].decode("utf-8"): int(c)
            for s, e, c in zip(starts, ends, cnts)
        }
        return sk
