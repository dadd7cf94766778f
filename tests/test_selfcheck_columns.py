"""Assert the invariants the sketch-family driver rows' guarantee
flags promise, at a DIFFERENT scale than the oracle gate.

Since round 4 these rows are oracle-exact: they emit exact anchors +
boolean within-bound flags, and the DuckDB oracle pins the flags to
literal TRUE at sf0.01. These tests re-assert the flags at sf0.001 (a
regime with much smaller groups), so a flag that only accidentally
holds at the gate scale still fails here:

- count-min (global + grouped): est_ge_exact (structural
  one-sidedness) and overcount_within_bound (eps*N);
- grouped/global HLL: within-bound at 6x the published
  1.04/sqrt(2^p) standard error;
- t-digest/KLL rows: rank-accuracy flags;
- winnowing: missing_guaranteed_pairs == 0 (every exact
  (window+k-1)-token passage pair is winnowed — checked against the
  UNCAPPED sample run, see passage_overlap_summary);
- sequence packing: capacity_ok and packed_once_ok both hold.
"""

from __future__ import annotations

import pytest


def _row(spark, sf_dir, name):
    from tgdigest_spark.driver_queries import queries

    return queries()[name](spark, sf_dir).collect()


_FLAG_QUERIES = {
    "sketch_cm_heavy_hitters": ["est_ge_exact", "overcount_within_bound"],
    "sketch_grouped_cm": ["est_ge_exact", "overcount_within_bound"],
    "sketch_grouped_hll": ["within_bound"],
    "sketch_hll_distinct": ["hll_within_bound", "hllpp_within_bound"],
    "sketch_grouped_tdigest": ["p50_rank_ok", "p95_rank_ok"],
    "sketch_grouped_kll": ["p50_rank_ok", "p95_rank_ok"],
    "sketch_bloom_membership": ["no_false_negatives", "surplus_within_fpr"],
    "minhash_lsh_neardup": ["high_pairs_all_candidates", "est_within_bound"],
    "simhash_summary": ["identical_pairs_found_at_zero", "bands_nested"],
    "embedding_neardup_lsh": ["neardup_recall_ok"],
    "ann_lsh_recall": ["mean_recall_ok"],
    "ann_ivf_recall": ["mean_recall_ok"],
}


@pytest.mark.parametrize("name", sorted(_FLAG_QUERIES))
def test_guarantee_flags_hold_at_sf0001(spark, sf001_dir, name):
    rows = _row(spark, sf001_dir, name)
    assert rows
    for r in rows:
        for flag in _FLAG_QUERIES[name]:
            assert r[flag] is True, (name, flag, r)


def test_winnowing_guarantee_column_is_zero(spark, sf001_dir):
    (r,) = _row(spark, sf001_dir, "passage_overlap_summary")
    assert r["missing_guaranteed_pairs"] == 0
    assert r["sample_exact_passage_pairs"] >= 0


def test_sequence_pack_flags_hold(spark, sf001_dir):
    (r,) = _row(spark, sf001_dir, "sequence_pack_stats")
    assert r["capacity_ok"] is True
    assert r["packed_once_ok"] is True
    assert r["utilization_in_range"] is True
    assert r["bin_count_ge_lower_bound"] is True
    assert r["n_oversized_bins"] >= 0


@pytest.mark.parametrize(
    "name", ["sketch_tdigest_quantiles", "sketch_kll_quantiles"]
)
def test_global_quantile_rank_flags_hold(spark, sf001_dir, name):
    (r,) = _row(spark, sf001_dir, name)
    assert r["p50_rank_ok"] is True
    assert r["p95_rank_ok"] is True
    assert r["p99_rank_ok"] is True
    # anchors are real exact percentiles, not placeholders
    assert r["exact_p50"] <= r["exact_p95"] <= r["exact_p99"]
