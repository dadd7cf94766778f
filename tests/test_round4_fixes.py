"""Round-4 review-fix pins: the adversarial inputs the fixes exist for.

- Oracle whitespace classes are spelled explicitly ([ \\t\\n\\x0B\\f\\r])
  because Java \\s includes vertical tab and RE2's does not — a \\x0B
  document must tokenize identically in Spark and DuckDB.
- sequence_pack_stats' utilization flag excludes oversized singleton
  bins (a 10x-budget doc is not a packing defect) — the gate row must
  stay all-TRUE and oracle-exact on a corpus WITH oversized docs.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def _mini_sf(tmp_path, texts):
    """A throwaway sf dir holding only a documents table."""
    d = tmp_path / "sf_mini"
    d.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).df()


def test_vertical_tab_tokenizes_identically(spark, tmp_path):
    """text_stats over a corpus containing \\x0B: Spark's Java \\s+ and
    the oracle's explicit class must split it the same way (RE2's \\s
    would not)."""
    from tests.test_driver_contract import _compare
    from tgdigest_spark.driver_queries import REGISTRY

    texts = [
        "the quick\x0bbrown fox",  # \x0B must separate tokens
        "plain text with ordinary spaces only",
        "tabs\tand\nnewlines\fand\rreturns",
        "",
    ]
    sf = _mini_sf(tmp_path, texts)
    fn, sql = REGISTRY["text_stats"]
    sdf = fn(spark, sf).toPandas()
    odf = _oracle(sf, sql)
    _compare(sdf, odf, "text_stats_x0b")
    # and the split really happened on \x0B (4 tokens, not 3)
    row = sdf.set_index("doc_id").loc[0]
    assert row["token_cnt"] == 4


def test_sequence_pack_gate_survives_oversized_docs(spark, tmp_path):
    """A 10x-budget doc lands in a singleton oversized bin; the
    utilization and capacity flags must stay TRUE (and the row
    oracle-exact) instead of tripping on the oversized bin's ratio."""
    from tests.test_driver_contract import _compare
    from tgdigest_spark.driver_queries import REGISTRY

    big = " ".join(f"tok{i}" for i in range(2600))  # 2600 tokens >> 256
    small = ["few words here"] * 6
    sf = _mini_sf(tmp_path, [big, *small])
    fn, sql = REGISTRY["sequence_pack_stats"]
    sdf = fn(spark, sf).toPandas()
    _compare(sdf, _oracle(sf, sql), "sequence_pack_oversized")
    r = sdf.iloc[0]
    assert r["n_oversized_bins"] == 1
    assert bool(r["capacity_ok"]) and bool(r["utilization_in_range"])
    assert bool(r["packed_once_ok"]) and bool(r["bin_count_ge_lower_bound"])


def test_minhash_gate_uses_exact_band_semantics(spark, tmp_path):
    """The banding-theorem flag is only a guarantee without the
    hot-bucket cap: a large cluster of identical docs (every bucket
    shared) must still surface all its >=0.9 pairs in the gate row."""
    from tests.test_driver_contract import _compare
    from tgdigest_spark.driver_queries import REGISTRY

    # 40 identical docs -> C(40,2)=780 exact pairs at J=1.0; with a
    # small cap these buckets would be dropped wholesale
    texts = ["alpha beta gamma delta epsilon zeta eta theta"] * 40 + [
        "completely different content words entirely here now"
    ]
    sf = _mini_sf(tmp_path, texts)
    fn, sql = REGISTRY["minhash_lsh_neardup"]
    sdf = fn(spark, sf).toPandas()
    _compare(sdf, _oracle(sf, sql), "minhash_gate_cluster")
    r = sdf.iloc[0]
    assert r["n_exact_pairs_09"] == 780
    assert bool(r["high_pairs_all_candidates"])
