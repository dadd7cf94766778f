"""jaccard_prefix_join: exact parity with the brute-force shingle join
above threshold (the AllPairs completeness theorem, pinned), plus edge
thresholds and the candidate-reduction sanity check."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

WORDS = [f"w{i}" for i in range(60)]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(17)
    rows = []
    for d in range(120):
        toks = list(rng.choice(WORDS, size=rng.integers(15, 40)))
        rows.append((d, " ".join(toks)))
    # inject near-dups: copies with small perturbations + exact dups
    base = rows[3][1].split()
    for j, d in enumerate(range(200, 206)):
        t = list(base)
        for _ in range(j):  # j perturbations → decreasing similarity
            t[int(rng.integers(0, len(t)))] = str(rng.choice(WORDS))
        rows.append((d, " ".join(t)))
    rows.append((300, rows[5][1]))  # exact duplicate
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df_out):
    return {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in df_out.collect()
    }


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_prefix_join_equals_brute_force(spark, corpus, threshold):
    from tgdigest_spark.operators.dedup_text import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    out = jaccard_prefix_join(corpus, threshold=threshold)
    release = out.release_cache
    got = _pairs(out)
    release()
    brute = ngram_jaccard_pairs(corpus, min_jaccard=threshold)
    want = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in brute.collect()
        if r["jaccard"] >= threshold - 1e-12
    }
    assert got == want
    if threshold <= 0.5:
        assert got  # the injected near-dups must actually appear


def test_prefix_join_exact_dup_at_t1(spark, corpus):
    from tgdigest_spark.operators.dedup_text import jaccard_prefix_join

    out = jaccard_prefix_join(corpus, threshold=1.0)
    release = out.release_cache
    got = _pairs(out)
    release()
    assert (5, 300) in got and got[(5, 300)] == 1.0


def test_prefix_join_rejects_bad_threshold(spark, corpus):
    from tgdigest_spark.operators.dedup_text import jaccard_prefix_join

    with pytest.raises(ValueError):
        jaccard_prefix_join(corpus, threshold=0.0)
