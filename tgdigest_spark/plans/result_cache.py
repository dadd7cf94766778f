"""Content-addressed query-result cache (§3.2 parity).

The reference caches rendered videos keyed by a hash of the rendered
content (FxHash of the HTML, main.rs:1064-1082): same inputs → same
key → serve the cached artifact. Generalized: a DataFrame result is
cached keyed by the hash of its ANALYZED LOGICAL PLAN (query shape +
literals + source paths). Same query against the same sources hits the
parquet artifact and skips execution entirely.

Plan-string hashing is conservative-correct for immutable sources
(time-partitioned transcript history); for mutable sources compose the
key with a snapshot/version id — the checkpoint manifest supplies one.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame


def _normalize_plan(plan: str) -> str:
    """Map auto-assigned expression ids (#123, vary per session) to
    sequential tokens in first-occurrence order. Order-preserving — NOT
    a collapse to one token: in a self-join, same-named columns from the
    two sides differ only by expr id, and collapsing them would give two
    semantically different plans the same fingerprint (stale results)."""
    import re

    ids: dict[str, str] = {}

    def repl(m) -> str:
        tok = m.group(0)
        if tok not in ids:
            ids[tok] = f"#e{len(ids)}"
        return ids[tok]

    return re.sub(r"#\d+", repl, plan)


def plan_fingerprint(df: DataFrame) -> str:
    """Stable hash of the analyzed plan (expr ids normalized out)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return hashlib.sha256(_normalize_plan(plan).encode()).hexdigest()[:20]


class ResultCache:
    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _paths(self, key: str) -> tuple[str, str]:
        return (
            os.path.join(self.dir, f"{key}.parquet"),
            os.path.join(self.dir, f"{key}.meta.json"),
        )

    def get_or_compute(self, df: DataFrame, key_extra: str = "") -> DataFrame:
        """Return the cached result for df's plan, computing on miss."""
        spark = df.sparkSession
        key = plan_fingerprint(df)
        if key_extra:
            key = hashlib.sha256((key + key_extra).encode()).hexdigest()[:20]
        data_path, meta_path = self._paths(key)
        if os.path.exists(meta_path):
            return spark.read.parquet(data_path)
        if os.path.exists(data_path):
            # stale artifact from a crash between data write and meta
            # commit — os.replace cannot overwrite a non-empty dir
            import shutil

            shutil.rmtree(data_path)
        tmp = data_path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        os.replace(tmp, data_path)
        with open(meta_path, "w") as f:
            json.dump(
                {"key": key, "created": time.time(), "schema": df.schema.json()},
                f,
            )
        return spark.read.parquet(data_path)

    def contains(self, df: DataFrame, key_extra: str = "") -> bool:
        key = plan_fingerprint(df)
        if key_extra:
            key = hashlib.sha256((key + key_extra).encode()).hexdigest()[:20]
        return os.path.exists(self._paths(key)[1])
