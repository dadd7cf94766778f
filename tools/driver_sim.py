"""Full-registry driver simulation — the in-repo artifact the driver's
correctness gate cannot produce (it checks only registry[0:50]).

Runs EVERY ``__spark_entry__.queries()`` entry under a DEFAULT
SparkSession (no UTC pin, default shuffle partitions — deliberately
NOT the pytest fixture session, so session-config assumptions surface)
against its DuckDB oracle at sf0.01, and writes one JSON file mirroring
the driver's CORRECTNESS schema (rows/schema/hash match per query).

Usage::

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01] \
        [--out DRIVERSIM_r05.json]

The value hash follows the driver convention: columns sorted by name,
rows sorted by stringified values, float columns compared bit-for-bit.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if not len(pdf):
        return pdf
    key = pdf.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return pdf.iloc[
        np.argsort(key.to_numpy(), kind="stable")
    ].reset_index(drop=True)


def _value_hash(pdf: pd.DataFrame) -> str:
    norm = _normalize(pdf)
    h = hashlib.sha256()
    for col in norm.columns:
        vals = norm[col]
        if pd.api.types.is_float_dtype(vals):
            h.update(vals.astype("float64").to_numpy().tobytes())
        else:
            h.update("\x1f".join(vals.astype(str)).encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to run (default: all; "
        "gate_window still reflects the FULL registry position)",
    )
    ap.add_argument(
        "--tz",
        default=None,
        help="set spark.sql.session.timeZone (and DuckDB TimeZone) to "
        "this zone — the full-registry timezone sweep (r5 verdict #3): "
        "every query must stay oracle-green under a non-UTC session",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # DEFAULT session on purpose: no UTC pin, stock shuffle partitions
    builder = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
    )
    if args.tz:
        builder = builder.config("spark.sql.session.timeZone", args.tz)
    spark = builder.getOrCreate()
    con = duckdb.connect()
    if args.tz:
        con.execute(f"SET TimeZone = '{args.tz}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        if only is not None and name not in only:
            continue
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "gate_window": i < 50,
        }
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
            row["spark_rows"] = int(len(sdf))
            sql = oracles.get(name)
            if sql is None:
                row["rows_match"] = bool(len(sdf) > 0)
                row["err"] = "no_oracle"
            else:
                odf = con.execute(sql).df()
                row["oracle_rows"] = int(len(odf))
                row["rows_match"] = bool(len(sdf) == len(odf))
                row["schema_match"] = bool(
                    sorted(sdf.columns) == sorted(odf.columns)
                )
                row["hash_match"] = bool(
                    _value_hash(sdf) == _value_hash(odf)
                )
        except Exception as e:  # noqa: BLE001 — record, keep going
            row["err"] = f"{type(e).__name__}: {e}"[:400]
        results[name] = row
        status = (
            "PASS"
            if row["hash_match"]
            or (row["err"] == "no_oracle" and row["rows_match"])
            else "FAIL"
        )
        print(f"[{i + 1:2d}/{len(qs)}] {status} {name}", flush=True)

    spark.stop()
    n_pass = sum(
        1
        for r in results.values()
        if r["hash_match"] or (r["err"] == "no_oracle" and r["rows_match"])
    )
    out_path = args.out or "DRIVERSIM.json"
    payload = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_pass": n_pass,
        "wall_s": round(time.time() - t0, 1),
        "session": (
            f"timeZone={args.tz}, stock shuffle partitions"
            if args.tz
            else "default (no UTC pin, stock shuffle partitions)"
        ),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"{n_pass}/{len(results)} pass → {out_path}")
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
