"""Assert the invariants the no_oracle driver rows' self-check columns
promise.

The rows-only driver queries carry machine-checkable columns (exact
anchors, one-sided errors, guarantee flags); the driver gate only
verifies the rows are non-empty, so these tests are where the columns'
documented invariants are actually enforced:

- count-min (global + grouped): est >= exact for every probed item;
- grouped HLL: relative error within a multiple of the published
  1.04/sqrt(2^p) standard error;
- winnowing: missing_guaranteed_pairs == 0 (every exact
  (window+k-1)-token passage pair is winnowed — checked against the
  UNCAPPED sample run, see passage_overlap_summary);
- sequence packing: capacity_ok and packed_once_ok both hold;
- t-digest/KLL global rows: the max_abs_err column equals the real
  estimate-vs-exact gap and stays within a generous quantile-accuracy
  envelope for delta=200/k=200.
"""

from __future__ import annotations

import math

import pytest


def _row(spark, sf_dir, name):
    from tgdigest_spark.driver_queries import queries

    return queries()[name](spark, sf_dir).collect()


def test_cm_rows_are_one_sided(spark, sf001_dir):
    for r in _row(spark, sf001_dir, "sketch_cm_heavy_hitters"):
        assert r["overcount"] >= 0
        assert r["est_count"] == r["exact_count"] + r["overcount"]


def test_grouped_cm_rows_are_one_sided(spark, sf001_dir):
    rows = _row(spark, sf001_dir, "sketch_grouped_cm")
    assert rows
    for r in rows:
        assert r["overcount"] >= 0
        assert r["est_count"] >= r["exact_count"]


def test_grouped_hll_rel_err_bounded(spark, sf001_dir):
    # p=14 → std err 1.04/sqrt(2^14) ≈ 0.81%; allow 6σ (small groups
    # at sf0.001 land in the near-exact sparse regime anyway)
    bound = 6 * 1.04 / math.sqrt(2**14)
    rows = _row(spark, sf001_dir, "sketch_grouped_hll")
    assert rows
    for r in rows:
        assert r["rel_err"] <= bound, (r["event_type"], r["rel_err"])


def test_winnowing_guarantee_column_is_zero(spark, sf001_dir):
    (r,) = _row(spark, sf001_dir, "passage_overlap_summary")
    assert r["missing_guaranteed_pairs"] == 0
    assert r["sample_exact_passage_pairs"] >= 0


def test_sequence_pack_flags_hold(spark, sf001_dir):
    (r,) = _row(spark, sf001_dir, "sequence_pack_stats")
    assert r["capacity_ok"] is True
    assert r["packed_once_ok"] is True
    assert r["n_oversized_bins"] >= 0
    assert 0.0 < r["utilization"] <= 1.0


@pytest.mark.parametrize(
    "name", ["sketch_tdigest_quantiles", "sketch_kll_quantiles"]
)
def test_global_quantile_rows_carry_true_error(spark, sf001_dir, name):
    (r,) = _row(spark, sf001_dir, name)
    gap = max(
        abs(r["p50"] - r["exact_p50"]), abs(r["p99"] - r["exact_p99"])
    )
    # max_abs_err is computed over p50/p95/p99 so it dominates the
    # two-anchor gap; it must also be a sane magnitude for
    # delta=200/k=200 on this distribution (exact p99 scale)
    assert r["max_abs_err"] >= gap - 1e-9
    assert r["max_abs_err"] <= 0.1 * max(abs(r["exact_p99"]), 1.0)
