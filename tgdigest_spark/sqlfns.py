"""SQL surface for the sketch library.

:func:`register_sketch_sql` registers the mergeable sketches as plain
SQL functions, so every surface the DataFrame API offers is reachable
from ``spark.sql`` — including RE-AGGREGATION of persisted blob tables::

    register_sketch_sql(spark)                  # default prefix "tg_"
    spark.sql('''
        SELECT event_type, tg_hll_estimate(CAST(user_id AS STRING)) AS u
        FROM events GROUP BY event_type
    ''')
    # nightly leaves (sources/sketch_table.py) re-aggregated in SQL:
    spark.sql('''
        SELECT event_type, tg_blob_distinct(tg_merge(sketch)) AS users
        FROM day_leaves GROUP BY event_type
    ''')

Scale notes (the honest contract):

- The **value-level aggregates** (``tg_hll_sketch`` / ``tg_hll_estimate``
  / ``tg_quantile`` / ...) are grouped-agg pandas UDFs: Spark performs
  NO partial aggregation for them — every group's raw values shuffle to
  one task. They are the SQL *convenience* path; the scale path for
  10^12-row builds is :func:`tgdigest_spark.agg.sketch_by_key` (map-side
  combine, one blob shuffle) or a persisted sketch table.
- The **blob-level verbs** (``tg_merge`` aggregate + ``tg_blob_*``
  scalars) ARE scale-safe: they ship kilobyte blobs, never fact rows,
  so ``GROUP BY k`` + ``tg_merge(sketch)`` over a leaf table shuffles
  min(groups, partitions) blobs exactly like
  :func:`tgdigest_spark.agg.merge_blobs_by_key`.
- Results are identical to the DataFrame API: register-max sketches
  (HLL / Bloom / CM / KMV / DDSketch) are BIT-exact under any merge
  tree, rank sketches (t-digest / KLL) agree within their published
  bounds (and KLL extraction is bit-exact for the same item multiset).

Reference anchor: /root/reference/src/digest.rs exposes its queries
through one typed API; the SQL registration is the equivalent "every
query a user runs today" surface for SQL-first callers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from .sketches import (
    BY_MAGIC as _BY_MAGIC,
)
from .sketches import (
    HLL,
    KLL,
    Bloom,
    CountMin,
    DDSketch,
    TDigest,
)

# Default parameters for the value-level SQL builders. SQL functions
# cannot carry Python constructor args; callers needing other settings
# use the DataFrame API (sketch_by_key / sketch_column) which takes a
# factory. Defaults match the library-wide ones.
_HLL_P = 14
_TDIGEST_DELTA = 200
_KLL_K = 200
_DD_ALPHA = 0.01
_BLOOM_BITS = 1 << 20
_BLOOM_K = 7


def sketch_from_blob(blob: bytes):
    """Deserialize any library blob by its 4-byte MAGIC."""
    t = _BY_MAGIC.get(bytes(blob[:4]))
    if t is None:
        raise ValueError(f"unknown sketch magic {bytes(blob[:4])!r}")
    return t.deserialize(bytes(blob))


def _clean(v: pd.Series) -> pd.Series:
    return v.dropna()


def _scalar_lit(s: pd.Series, name: str) -> float:
    """Extract a literal argument passed as a repeated column."""
    u = s.dropna().unique()
    if len(u) != 1:
        raise ValueError(f"{name} must be a single literal per group")
    return float(u[0])


def _blob_cache_map(blobs: pd.Series) -> dict:
    """One deserialization per DISTINCT blob in the batch — scalar blob
    UDFs typically see the same broadcast blob repeated per row."""
    out: dict = {}
    for b in blobs:
        if b is not None:
            key = bytes(b)
            if key not in out:
                out[key] = sketch_from_blob(key)
    return out


def register_sketch_sql(spark: SparkSession, prefix: str = "tg_") -> list:
    """Register the sketch SQL functions on ``spark``; returns the list
    of registered names. Idempotent (re-registering replaces)."""

    # ----- value-level aggregates (convenience path; see module doc) --
    @pandas_udf("binary")
    def hll_sketch(v: pd.Series) -> bytes:
        return HLL(_HLL_P).update(_clean(v)).serialize()

    @pandas_udf("double")
    def hll_estimate(v: pd.Series) -> float:
        return HLL(_HLL_P).update(_clean(v)).estimate()

    @pandas_udf("binary")
    def tdigest_sketch(v: pd.Series) -> bytes:
        return TDigest(_TDIGEST_DELTA).update(_clean(v)).serialize()

    @pandas_udf("double")
    def td_quantile(v: pd.Series, q: pd.Series) -> float:
        qq = _scalar_lit(q, "q")
        return float(TDigest(_TDIGEST_DELTA).update(_clean(v)).quantile(qq))

    @pandas_udf("double")
    def kll_quantile(v: pd.Series, q: pd.Series) -> float:
        qq = _scalar_lit(q, "q")
        return float(KLL(_KLL_K).update(_clean(v)).quantile(qq))

    @pandas_udf("double")
    def dd_quantile(v: pd.Series, q: pd.Series) -> float:
        qq = _scalar_lit(q, "q")
        return float(DDSketch(_DD_ALPHA).update(_clean(v)).quantile(qq))

    @pandas_udf("binary")
    def bloom_sketch(v: pd.Series) -> bytes:
        return Bloom(_BLOOM_BITS, _BLOOM_K).update(_clean(v)).serialize()

    # ----- blob-level verbs (scale-safe re-aggregation) ---------------
    @pandas_udf("binary")
    def blob_merge(blobs: pd.Series) -> bytes:
        sks = [sketch_from_blob(b) for b in blobs if b is not None]
        if not sks:
            return None
        acc = sks[0]
        for s in sks[1:]:
            acc = acc.merge(s)
        return acc.serialize()

    @pandas_udf("double")
    def blob_distinct(blobs: pd.Series) -> pd.Series:
        cache = _blob_cache_map(blobs)
        return pd.Series(
            [
                np.nan if b is None else cache[bytes(b)].estimate()
                for b in blobs
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def blob_quantile(blobs: pd.Series, q: pd.Series) -> pd.Series:
        cache = _blob_cache_map(blobs)
        out = []
        for b, qq in zip(blobs, q):
            if b is None or qq is None:
                out.append(np.nan)
            else:
                out.append(float(cache[bytes(b)].quantile(float(qq))))
        return pd.Series(out, dtype="float64")

    @pandas_udf("boolean")
    def bloom_contains(blobs: pd.Series, items: pd.Series) -> pd.Series:
        cache = _blob_cache_map(blobs)
        out = []
        for b, it in zip(blobs, items):
            if b is None or it is None:
                out.append(None)
            else:
                out.append(bool(cache[bytes(b)].contains([it])[0]))
        return pd.Series(out, dtype="object")

    fns = {
        "hll_sketch": hll_sketch,
        "hll_estimate": hll_estimate,
        "tdigest_sketch": tdigest_sketch,
        "quantile": td_quantile,
        "kll_quantile": kll_quantile,
        "dd_quantile": dd_quantile,
        "bloom_sketch": bloom_sketch,
        "merge": blob_merge,
        "blob_distinct": blob_distinct,
        "blob_quantile": blob_quantile,
        "bloom_contains": bloom_contains,
    }
    names = []
    for name, fn in fns.items():
        full = f"{prefix}{name}"
        spark.udf.register(full, fn)
        names.append(full)
    return names
