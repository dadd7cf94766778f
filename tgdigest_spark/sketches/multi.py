"""MultiSketch: fan one update stream to several sketches in ONE scan.

The planner-facing questions about a prospective shuffle key — how
many rows, how many distinct keys, how big is the self-join / max
reducer, who are the heavy keys — are each answered by a different
sketch (COUNT, HLL, CountSketch/AMS, Misra-Gries). Asking them one at
a time costs one full scan apiece; at 100 TB the scan IS the cost.
MultiSketch wraps an ordered list of child sketches and delegates
update/merge/serialize to each, so the whole profile rides a single
pass through the data (one sketch_column call, one blob tree-merge).

Pure composition — no new estimation theory; each child keeps its own
published bounds. Children must be independent of each other (they
are: each hashes the raw values itself).

Serialization: standard header (child count + total weight) followed
by length-prefixed child blobs; children self-identify via their own
MAGIC on deserialize, checked against the expected factory order.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .base import Sketch


class MultiSketch(Sketch):
    MAGIC = b"MSK1"

    def __init__(self, children: list[Sketch]):
        if not children:
            raise ValueError("need at least one child sketch")
        self.children = list(children)
        self.n = 0  # non-null values ingested (exact)

    # -- core protocol ----------------------------------------------------
    def update(self, values) -> "MultiSketch":
        s = values if isinstance(values, pd.Series) else pd.Series(values)
        self.n += int(s.notna().sum())
        for c in self.children:
            c.update(s)
        return self

    def merge(self, other: "MultiSketch") -> "MultiSketch":
        if len(other.children) != len(self.children):
            raise ValueError("child count mismatch")
        for mine, theirs in zip(self.children, other.children):
            if type(mine) is not type(theirs):
                raise ValueError(
                    f"child type mismatch: {type(mine).__name__} vs "
                    f"{type(theirs).__name__}"
                )
            mine.merge(theirs)
        self.n += other.n
        return self

    # -- serialization ----------------------------------------------------
    def serialize(self) -> bytes:
        blobs = [c.serialize() for c in self.children]
        head = self._header(("I", len(blobs)), ("q", self.n))
        lens = np.array([len(b) for b in blobs], dtype=np.int64)
        return head + lens.tobytes() + b"".join(blobs)

    @classmethod
    def deserialize(cls, data: bytes) -> "MultiSketch":
        """Child blobs are dispatched by MAGIC over the known registry —
        same one-argument protocol as every other sketch."""
        (n_children, n), off = cls._check_header(data, "Iq")
        lens = np.frombuffer(data, dtype=np.int64, count=n_children,
                             offset=off)
        off += 8 * n_children
        from . import BY_MAGIC as registry  # deferred: avoids cycle
        children = []
        for ln in lens:
            blob = data[off: off + int(ln)]
            off += int(ln)
            t = registry.get(bytes(blob[:4]))
            if t is None:
                raise ValueError(f"unknown child magic {blob[:4]!r}")
            children.append(t.deserialize(blob))
        sk = cls(children)
        sk.n = int(n)
        return sk
