"""Mimic the driver's correctness gate: every queries() entry vs its
oracle_sql() on DuckDB at sf0.01 — row count, column names, and exact
(order-insensitive) value equality. Floats must match bit-for-bit, which
is the same strictness as the driver's value hash.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if not len(pdf):
        return pdf
    # stringify for a stable total order incl. None/NaN
    key = pdf.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return pdf.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64").to_numpy()
            bv = bv.astype("float64").to_numpy()
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            assert eq.all(), f"{name}.{col}: float mismatch at {np.flatnonzero(~eq)[:5]}"
        elif pd.api.types.is_datetime64_any_dtype(av) or pd.api.types.is_datetime64_any_dtype(bv):
            assert (
                pd.to_datetime(av).to_numpy() == pd.to_datetime(bv).to_numpy()
            ).all(), f"{name}.{col}: timestamp mismatch"
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), (
                f"{name}.{col}: value mismatch"
            )


def all_query_names():
    from tgdigest_spark.driver_queries import REGISTRY  # noqa: PLC0415

    return sorted(REGISTRY)


@pytest.mark.parametrize("name", all_query_names())
def test_query_vs_oracle(spark, sf01_dir, name):
    from tgdigest_spark.driver_queries import REGISTRY

    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf01_dir).toPandas()
    assert len(sdf) >= 0
    if sql is None:
        assert len(sdf) > 0, f"{name}: rows-only check found empty result"
        return
    con = _duck(sf01_dir)
    odf = con.execute(sql).df()
    _compare(sdf, odf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
