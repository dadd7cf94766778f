"""Text deduplication family for training-data pipelines.

Five tiers, each a standard large-corpus technique:

* exact           — content-hash groupBy (driver_queries.exact_dedup_docs)
* n-gram Jaccard  — exact pairwise set similarity (explode + equi-join);
                    the oracle for the approximate tiers
* MinHash + LSH   — Broder-style minhash signatures, banded LSH
                    bucketing; candidate pairs via equi-join on
                    (band, band_hash) — never a cross join
* SimHash         — Charikar 64-bit fingerprints; near-dup = small
                    Hamming distance; candidates via 16-bit bands
* embedding cosine— see operators/similarity.py

Vectorization: signatures are computed batch-at-a-time inside
``mapInPandas`` — all tokens of a batch are flattened into one numpy
array, hashed once (pandas' vectorized hasher), shingled with uint64
mixing, and reduced per-document with ``np.minimum.reduceat`` /
``np.add.reduceat``. No per-token or per-document Python in the hot
loop.

Scale notes: the LSH join shuffles (doc_id, band_hash) pairs only —
`num_perm * 8`-byte signatures stay columnar; candidate verification
joins signatures for candidate pairs only. Skewed buckets (a band hash
shared by thousands of near-identical docs) are the classic hazard:
``max_bucket`` caps them (dropping a bucket loses candidates only
within an already-huge duplicate cluster, which stays connected through
its other bands).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sketches.hashing import splitmix64

_P61 = np.uint64((1 << 61) - 1)


def _token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All docs' token hashes flattened + doc offsets (vectorized)."""
    tokens = texts.fillna("").str.split()
    counts = tokens.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = pd.Series(
        np.concatenate([np.asarray(t, dtype=object) for t in tokens])
        if counts.sum()
        else np.empty(0, dtype=object)
    )
    h = pd.util.hash_pandas_object(
        flat, index=False, hash_key="tgdigest_minhash"
    ).to_numpy()
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return h, offsets, counts


def _shingle_hashes(
    h: np.ndarray, offsets: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """k-token shingle hashes per doc from flattened token hashes.

    Shingle hash = mix chain over a sliding window; windows crossing doc
    boundaries are dropped. Docs with < k tokens contribute their full
    (short) token sequence as one shingle so they are not empty.
    """
    n = h.size
    if n == 0:
        return h, offsets, counts
    # token's doc index — windows must never absorb the NEXT doc's
    # tokens (a short doc's shingle would otherwise depend on its batch
    # neighbor: nondeterministic across partitionings)
    doc_of = np.repeat(np.arange(counts.size), counts)
    with np.errstate(over="ignore"):
        acc = h.copy()
        for i in range(1, k):
            nxt = np.zeros_like(h)
            same_doc = doc_of[i:] == doc_of[: n - i]
            nxt[: n - i][same_doc] = h[i:][same_doc]
            acc = splitmix64(acc ^ (nxt * np.uint64(0x9E3779B97F4A7C15)))
    sh_counts = np.maximum(counts - k + 1, np.minimum(counts, 1)).astype(np.int64)
    # keep shingles whose index within their doc < that doc's shingle count
    pos_in_doc = np.arange(n) - np.repeat(offsets, counts)
    keep = pos_in_doc < np.repeat(sh_counts, counts)
    sh = acc[keep]
    sh_offsets = np.concatenate(([0], np.cumsum(sh_counts)[:-1]))
    return sh, sh_offsets, sh_counts


def _minhash_matrix(
    sh: np.ndarray, sh_offsets: np.ndarray, num_perm: int, seed: int = 7
) -> np.ndarray:
    """(num_perm, n_docs) minhash signature matrix via reduceat."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _P61, size=num_perm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = a[:, None] * sh[None, :] + b[:, None]
    return np.minimum.reduceat(m, sh_offsets, axis=1)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    shingle_k: int = 3,
) -> DataFrame:
    """→ DataFrame[id_col, sig: array<long>] (uint64 minhashes viewed as
    int64; empty docs get an empty signature and never pair).

    Output assembles straight into an Arrow ListArray (offsets + one
    flat int64 buffer) via ``mapInArrow`` — the previous pandas form
    built a Python list of ``num_perm`` ints per doc (round-7, guide
    §4.2). Hash values are unchanged, so signatures are bit-identical.
    """
    import pyarrow as pa

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("sig", ArrayType(LongType()), False),
        ]
    )

    def build(batches) -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            h, off, cnt = _token_hashes(rb.column(1).to_pandas())
            sh, soff, scnt = _shingle_hashes(h, off, cnt, shingle_k)
            sig_lens = np.where(scnt > 0, num_perm, 0).astype(np.int64)
            offsets = np.concatenate(([0], np.cumsum(sig_lens)))
            if sh.size:
                # reduceat ONLY over non-empty docs' offsets (all strictly
                # < sh.size; the last segment extends to the array end),
                # then scatter back. Clipping offsets instead would fold
                # the final shingle out of the last non-empty doc whenever
                # the batch ends with empty docs — making a doc's
                # signature depend on its batch neighbors.
                nz = np.flatnonzero(scnt > 0)
                sig = _minhash_matrix(sh, soff[nz], num_perm).astype(np.int64)
                values = np.ascontiguousarray(sig.T).reshape(-1)
            else:
                values = np.empty(0, dtype=np.int64)
            arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(values, type=pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), arr], names=[id_col, "sig"]
            )

    return df.select(id_col, text_col).mapInArrow(build, schema=schema)


def lsh_bands(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 32, rows: int = 4
) -> DataFrame:
    """signature → (id, band, band_hash) rows; band_hash mixes the
    band's ``rows`` minhash values."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("band", LongType(), False),
            StructField("band_hash", LongType(), False),
        ]
    )

    import pyarrow as pa

    def explode(batches) -> "Iterator[pa.RecordBatch]":
        # Arrow-native: gather each kept doc's first bands*rows minhash
        # components straight from the ListArray's flat values buffer
        # (round-7 — the pandas form re-built a Python list per doc).
        # Band hashes are the same mix over the same values.
        for rb in batches:
            if not rb.num_rows:
                continue
            ids_all = rb.column(0).to_numpy(zero_copy_only=False)
            lc = rb.column(1)
            if lc.null_count:  # defensive: sigs are never null upstream
                pl = lc.to_pylist()
                lc = pa.array(
                    [x if x is not None else [] for x in pl],
                    type=pa.list_(pa.int64()),
                )
            widths = np.diff(lc.offsets.to_numpy(zero_copy_only=False))
            keep = widths >= bands * rows
            if not keep.any():
                continue
            flat = lc.flatten().to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.cumsum(widths)))[:-1]
            kidx = np.flatnonzero(keep)
            take = (
                starts[kidx][:, None] + np.arange(bands * rows)[None, :]
            ).reshape(-1)
            sig = (
                flat[take]
                .astype(np.uint64)
                .reshape(kidx.size, bands, rows)
            )
            acc = sig[:, :, 0]
            with np.errstate(over="ignore"):
                for r in range(1, rows):
                    acc = splitmix64(acc ^ sig[:, :, r])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids_all[kidx], bands), type=pa.int64()),
                    pa.array(
                        np.tile(np.arange(bands, dtype=np.int64), kidx.size),
                        type=pa.int64(),
                    ),
                    pa.array(
                        acc.reshape(-1).astype(np.int64), type=pa.int64()
                    ),
                ],
                names=[id_col, "band", "band_hash"],
            )

    return sigs.mapInArrow(explode, schema=schema)


def minhash_agreement_expr(sig_a: str = "sig_a", sig_b: str = "sig_b"):
    """Fraction of equal minhash components between two signature
    columns — the unbiased Jaccard estimator shared by the batch and
    incremental dedup paths (one definition; empty-signature guard
    included)."""
    return F.when(
        F.size(sig_a) > 0,
        F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v))
        / F.size(sig_a),
    ).otherwise(F.lit(0.0))


def _segments_pairs(
    flat: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment unique + upper-triangle pair generation, vectorized
    across every segment at once (round-7; the LSH bucket-pair hot
    path). ``flat`` holds all segments' int64 ids concatenated;
    ``offsets`` (len = n_segments + 1) bounds them. Returns
    (id_a, id_b) with id_a < id_b — elementwise the same pair multiset
    as per-segment ``np.unique`` + ``np.triu_indices`` (property-pinned
    in tests against that reference).

    One lexsort orders (segment, id); consecutive-duplicate masking
    dedups within segments; pair generation batches segments by their
    deduped SIZE so each distinct size pays a single (k, s) gather +
    one ``triu_indices`` — no per-bucket Python."""
    n_seg = offsets.size - 1
    if flat.size == 0 or n_seg == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    seg = np.repeat(np.arange(n_seg, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((flat, seg))
    s_seg, s_ids = seg[order], flat[order]
    keep = np.r_[True, (s_seg[1:] != s_seg[:-1]) | (s_ids[1:] != s_ids[:-1])]
    d_seg, d_ids = s_seg[keep], s_ids[keep]
    sizes = np.bincount(d_seg, minlength=n_seg)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    live = sizes >= 2
    if not live.any():
        e = np.empty(0, dtype=np.int64)
        return e, e
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s in np.unique(sizes[live]):
        idx = np.flatnonzero(sizes == s)
        gat = (starts[idx][:, None] + np.arange(s)[None, :]).reshape(-1)
        mat = d_ids[gat].reshape(idx.size, s)
        iu = np.triu_indices(s, k=1)
        out_a.append(mat[:, iu[0]].reshape(-1))
        out_b.append(mat[:, iu[1]].reshape(-1))
    return np.concatenate(out_a), np.concatenate(out_b)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    precomputed_sigs: DataFrame | None = None,
    broadcast_pairs: bool = True,
) -> DataFrame:
    """→ DataFrame[id_a, id_b, est_jaccard] — near-dup candidates.

    est_jaccard = fraction of equal minhash components (unbiased
    estimator of true Jaccard). Pairs are generated ONLY within LSH
    buckets (equi-join on (band, band_hash)); giant buckets are capped.

    ``precomputed_sigs``: pass an already-computed (and ideally
    persisted) ``minhash_signatures`` frame to skip the compute-dense
    hashing stage — the incremental path computes signatures once and
    reuses them here. The caller then owns that frame's lifecycle
    (``release_cache`` becomes a no-op).

    ``broadcast_pairs`` (round-7 optimization, guide §3.1): the rescore
    join attaches both signatures to each candidate pair. With the
    default shuffled join, Catalyst plans SortMergeJoin and ships the
    WHOLE signature table (num_perm longs per doc) through TWO
    exchanges before AQE can see that the pair side is tiny — measured
    at sf1.0: 2 x 52 MB signature shuffles for a 0.7 MB pair frame.
    Broadcasting the pair side streams the persisted signatures in
    place: zero signature shuffle, identical rows (inner equi-join).
    The candidate set after banding + the ``max_bucket`` cap +
    distinct() is the near-duplicate frontier, orders of magnitude
    smaller than the corpus; callers whose candidate volume exceeds
    broadcast capacity (~100M pairs) pass False to fall back to the
    shuffled join.
    """
    if bands * rows > num_perm:
        bands = num_perm // rows  # fit banding to the signature length
    caller_owns_sigs = precomputed_sigs is not None
    if caller_owns_sigs:
        sigs = precomputed_sigs
    else:
        sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_k)
        sigs = sigs.persist()
    bands_df = lsh_bands(sigs, id_col, bands, rows)

    # ONE shuffle: bucket members collected per (band, band_hash); pairs
    # generated inside the bucket with numpy combinations. Oversized
    # buckets are dropped (see module docstring) — this caps both memory
    # and the quadratic pair fan-out in one place.
    buckets = (
        bands_df.groupBy("band", "band_hash")
        .agg(F.collect_list(id_col).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )

    pair_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
        ]
    )

    import pyarrow as pa

    def bucket_pairs(batches) -> "Iterator[pa.RecordBatch]":
        # vectorized across ALL buckets of the batch (round-7): the
        # previous form looped bucket-by-bucket in Python doing one
        # np.unique + triu per bucket; _segments_pairs does one lexsort
        # + a per-distinct-size gather over the ListArray's flat buffer
        # (measured 8x on 300k small buckets). Same pair set.
        for rb in batches:
            if not rb.num_rows:
                continue
            lc = rb.column(0)
            if lc.null_count:  # defensive: collect_list never yields null
                pl = lc.to_pylist()
                lc = pa.array(
                    [x if x is not None else [] for x in pl],
                    type=pa.list_(pa.int64()),
                )
            offsets = lc.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            offsets = offsets - offsets[0]
            flat = lc.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            id_a, id_b = _segments_pairs(flat, offsets)
            if id_a.size:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(id_a, type=pa.int64()),
                        pa.array(id_b, type=pa.int64()),
                    ],
                    names=["id_a", "id_b"],
                )

    pairs = (
        buckets.select("ids")  # band/band_hash are dead past this point
        .mapInArrow(bucket_pairs, schema=pair_schema)
        .distinct()
    )

    sig_a = sigs.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")
    )
    sig_b = sigs.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")
    )
    if broadcast_pairs:
        # pair side broadcast: signatures are streamed from the persisted
        # frame on both joins — no signature exchange, no SMJ sort. The
        # second broadcast carries (pair, sig_a): still |pairs|-bounded.
        enriched = sig_a.join(F.broadcast(pairs), "id_a")
        joined = sig_b.join(F.broadcast(enriched), "id_b")
    else:
        joined = pairs.join(sig_a, "id_a").join(sig_b, "id_b")

    est = minhash_agreement_expr()
    out = joined.select("id_a", "id_b", est.cast("double").alias("est_jaccard"))
    # The signatures frame is consumed three times (bands + both sides of
    # the verification join), so it stays persisted until the caller's
    # final action. Long-lived sessions calling this repeatedly should
    # release the executor storage afterwards via this handle. NOTE:
    # capture the handle BEFORE transforming — DataFrame transformations
    # return new objects that do not carry the attribute.
    out.release_cache = (
        (lambda: None) if caller_owns_sigs else (lambda: sigs.unpersist())
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ DataFrame[id_col, simhash: long] — Charikar 64-bit fingerprint
    over token hashes (bit-majority vote, batch-vectorized)."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("simhash", LongType(), True),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h, off, cnt = _token_hashes(pdf[text_col])
            empty_doc = cnt == 0
            packed = np.zeros(len(pdf), dtype=np.uint64)
            if h.size:
                bits = (
                    (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.int32)
                signs = 2 * bits - 1  # (n_tokens, 64)
                # reduceat ONLY over non-empty docs' offsets (same
                # batch-composition hazard as minhash_signatures: a
                # clipped offset truncates the last token's contribution
                # to the last non-empty doc's fingerprint), then scatter.
                nz = np.flatnonzero(cnt > 0)
                sums = np.add.reduceat(signs, off[nz], axis=0)
                fp = (sums > 0).astype(np.uint64)
                packed_nz = np.zeros(len(nz), dtype=np.uint64)
                with np.errstate(over="ignore"):
                    for bit in range(64):
                        packed_nz |= fp[:, bit] << np.uint64(bit)
                packed[nz] = packed_nz
            # token-less docs get a NULL fingerprint: they are not
            # "similar" to each other, and a shared 0 would put every
            # empty doc in one LSH bucket (quadratic pair blowup).
            # Build the nullable column as an IntegerArray directly —
            # assigning pd.NA into an int64 column upcasts through
            # float64 and silently truncates the low ~11 bits.
            arr = pd.array(packed.astype(np.int64), dtype="Int64")
            arr[np.flatnonzero(empty_doc)] = pd.NA
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "simhash": arr}
            )

    return df.select(id_col, text_col).mapInPandas(build, schema=schema)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """→ DataFrame[id_a, id_b, hamming] — pairs within Hamming distance.

    Candidates via 4x16-bit bands (a pair within distance 3 is
    guaranteed to agree on >=1 band; larger distances probabilistically).
    Same capped-bucket topology as ``lsh_candidate_pairs``: ONE shuffle
    groups (band, band_val) members and pairs are generated inside the
    bucket with numpy.

    ``max_bucket=None`` (default) is EXACT band semantics — every bucket
    member pairs. At corpus scale, set a cap: at 10^9 docs the expected
    band bucket holds N/65,536 docs, so an uncapped bucket emits ~d^2
    rows per hot bucket. A capped bucket is SAMPLED, not dropped: a
    deterministic content-hash rank keeps ``max_bucket`` members (the
    row_number runs BEFORE collect_list, so the hot bucket's member
    array never materializes either), bounding fan-out at
    max_bucket^2/2 per bucket while a giant duplicate cluster stays
    discoverable through its sampled pairs and, transitively, through
    its other bands.
    """
    sigs = (
        simhash_signatures(df, id_col, text_col)
        .where(F.col("simhash").isNotNull())
        .persist()
    )
    banded = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        id_col,
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.band_val").alias("band_val"),
    )

    if max_bucket is not None:
        # deterministic within-bucket sample: rank members by a content
        # hash (id tiebreak) and keep the first max_bucket. The window's
        # hash-partition on (band, band_val) satisfies the groupBy's
        # distribution requirement, so this adds a sort, not a second
        # shuffle — and the oversized bucket is trimmed before
        # collect_list ever builds an array.
        from pyspark.sql import Window

        w = Window.partitionBy("band", "band_val").orderBy(
            F.xxhash64(F.col(id_col), F.col("simhash")), F.col(id_col)
        )
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    buckets = (
        banded.groupBy("band", "band_val")
        .agg(
            F.collect_list(F.struct(F.col(id_col).alias("id"), "simhash")).alias(
                "members"
            )
        )
        .where(F.size("members") >= 2)
    )

    pair_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("hamming", LongType(), False),
        ]
    )

    def bucket_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        outs: list[pd.DataFrame] = []
        for pdf in batches:
            for members in pdf["members"]:
                n = len(members)
                ids = np.fromiter(
                    (m["id"] for m in members), dtype=np.int64, count=n
                )
                shs = np.fromiter(
                    (m["simhash"] for m in members), dtype=np.int64, count=n
                ).astype(np.uint64)
                # a doc_id fed twice (upstream double-ingest) would pair
                # with itself as (x, x, 0); dedup like lsh's np.unique
                ids, first = np.unique(ids, return_index=True)
                shs = shs[first]
                n = ids.size
                if n < 2:
                    continue
                iu = np.triu_indices(n, k=1)
                x = shs[iu[0]] ^ shs[iu[1]]
                ham = (
                    np.unpackbits(x[:, None].view(np.uint8), axis=1)
                    .sum(axis=1)
                    .astype(np.int64)
                )
                keep = ham <= max_hamming
                if not keep.any():
                    continue
                a, b = ids[iu[0]][keep], ids[iu[1]][keep]
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(a, b),
                            "id_b": np.maximum(a, b),
                            "hamming": ham[keep],
                        }
                    )
                )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    out = (
        buckets.mapInPandas(bucket_pairs, schema=pair_schema)
        .distinct()
        .select("id_a", "id_b", "hamming")
    )
    out.release_cache = lambda: sigs.unpersist()  # see lsh_candidate_pairs
    return out


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (oracle tier)
# ---------------------------------------------------------------------------

def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): k-token rolling hashes, then the minimum hash of each
    ``window`` consecutive shingles (rightmost minimum on ties), made
    distinct per doc.

    Guarantee: two documents sharing any passage of at least
    ``window + k - 1`` tokens share at least one fingerprint — this is
    PASSAGE-level overlap detection (quotes, boilerplate, copied
    spans), complementary to whole-doc tiers (minhash/simhash find
    mostly-duplicate documents; winnowing finds shared substrings
    inside otherwise-different documents).

    → DataFrame[id_col, fp: long]. Vectorized: token/shingle hashing is
    the shared batch machinery; the sliding-window minimum runs as one
    ``sliding_window_view().min`` per doc segment (numpy, no per-token
    Python).
    """
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("fp", LongType(), False),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            if not len(pdf):
                continue
            h, off, cnt = _token_hashes(pdf[text_col])
            sh, soff, scnt = _shingle_hashes(h, off, cnt, k)
            ids_out: list[np.ndarray] = []
            fps_out: list[np.ndarray] = []
            doc_ids = pdf[id_col].to_numpy()
            for i in np.flatnonzero(scnt > 0):
                seg = sh[soff[i] : soff[i] + scnt[i]]
                if seg.size <= window:
                    fps = np.unique(seg.min(keepdims=True))
                else:
                    mins = sliding_window_view(seg, window).min(axis=1)
                    fps = np.unique(mins)
                ids_out.append(np.full(fps.size, doc_ids[i], dtype=np.int64))
                fps_out.append(fps.astype(np.int64))
            if ids_out:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids_out),
                        "fp": np.concatenate(fps_out),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(build, schema=schema)


def passage_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 8,
    min_shared: int = 2,
    max_df: int | None = 1000,
) -> DataFrame:
    """→ DataFrame[id_a, id_b, shared_fps] — doc pairs sharing
    winnowing fingerprints (candidate copied passages).

    Same scale discipline as the other dedup tiers: fingerprints whose
    document frequency exceeds ``max_df`` are dropped before the
    self-join (a boilerplate string present in d docs would emit d^2
    rows), and pairs come from ONE equi-join on fp.
    """
    # persisted: the df-cap aggregate and BOTH self-join sides consume
    # it (the id_a/id_b aliasing defeats ReuseExchange) — same
    # convention as lsh_candidate_pairs' signature cache.
    fps = winnow_fingerprints(df, id_col, text_col, k, window).persist()
    pruned = fps
    if max_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("fp")
        )
        pruned = fps.join(hot, "fp", "left_anti")
    a = pruned.select(F.col(id_col).alias("id_a"), "fp")
    b = pruned.select(F.col(id_col).alias("id_b"), "fp")
    out = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
    out.release_cache = lambda: fps.unpersist()  # capture BEFORE transforming
    return out


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """→ DataFrame[id, shingle]: distinct k-token shingles per doc,
    built-ins only (tokenize → sliding window via transform over an
    index array → explode distinct). Docs with < k tokens contribute
    their full token run as one shingle."""
    # coalesce: size(split(NULL)) is -1 → sequence(0, -2) would emit a
    # DESCENDING index array (Spark infers step -1) and junk shingles
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n_sh = F.greatest(F.size(toks) - F.lit(k - 1), F.least(F.size(toks), F.lit(1)))
    idx = F.sequence(F.lit(0), n_sh - 1)
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(
            "\x1f", F.slice(toks, i + 1, k)
        ),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(shingles)).alias("shingle"),
        )
        .where(F.col("shingle") != "")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_overlap: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: drop corpus docs whose k-token-shingle
    overlap with the benchmark's global shingle set exceeds
    ``max_overlap`` (fraction of the DOC's distinct shingles that appear
    anywhere in the benchmark) — the standard eval-leakage filter for
    training corpora.

    Scale shape: the benchmark shingle set is DISTINCT'd once and
    broadcast into ONE left join that flags hits, so the corpus is
    shingled once and aggregated once (shingle count + hit count in the
    same groupBy); docs with no shingles pass through. Returns the
    CLEAN corpus rows.
    """
    corpus_sh = _exploded_shingles(corpus, id_col, text_col, k)
    bench_sh = (
        _exploded_shingles(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    flagged = corpus_sh.join(bench_sh, "shingle", "left")
    per_doc = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
    )
    contaminated = per_doc.where(
        F.col("n_hit").cast("double") / F.col("n_sh").cast("double")
        > F.lit(max_overlap)
    ).select(F.col("id").alias(id_col))
    return corpus.join(contaminated, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_jaccard: float = 0.0,
    top_n: int | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact k-token-shingle Jaccard for all pairs sharing >=1 shingle.

    Built-ins only: tokenize → sliding shingles via transform over
    index array → explode distinct → self-equi-join on shingle →
    inter/union arithmetic. The exact oracle for minhash estimates.

    ``max_df`` is the production switch for corpus scale: a shingle
    shared by d documents emits d^2 join rows, so one hot trigram makes
    the self-join quadratic. With ``max_df`` set, shingles whose
    document frequency exceeds it are dropped from BOTH the intersection
    and the per-doc sizes (standard df-capping: Jaccard over the
    remaining, discriminative shingle space). Default ``None`` keeps the
    exact-oracle semantics bit-for-bit.
    """
    exploded = _exploded_shingles(df, id_col, text_col, k)
    release = None
    if max_df is not None:
        # the exploded shingle set feeds 4 consumers on this path (hot
        # aggregate, anti-join probe, sizes, both join sides) — persist
        # so the tokenize+shingle subtree runs once, not ~5x.
        exploded = exploded.persist()
        release = exploded.unpersist
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("shingle")
        )
        exploded = exploded.join(hot, "shingle", "left_anti")
    sizes = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    if top_n is not None:
        out = out.orderBy(F.desc("jaccard"), "id_a", "id_b").limit(top_n)
    if release is not None:
        out.release_cache = release  # same contract as lsh/simhash pairs
    return out


def jaccard_prefix_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All doc pairs with shingle-Jaccard >= ``threshold``, EXACTLY —
    via prefix filtering (Bayardo, Ma & Srikant, WWW 2007; the
    AllPairs/PPJoin family), not an LSH approximation.

    The scale trick: order each doc's shingles by GLOBAL rarity
    (document frequency ascending); if Jaccard(x, y) >= t then x and y
    must share a shingle inside each one's first
    ``|x| - ceil(t·|x|) + 1`` shingles (else the <= |x|-p remaining
    overlap can't reach the required intersection). So the self-join
    runs on PREFIXES only — for t=0.5 roughly the rarest half of each
    doc — and rare-first ordering makes those join keys the most
    selective ones. A length filter (|y| >= t·|x|) prunes further;
    candidates are then verified with one JVM-side
    ``array_intersect`` against the full shingle sets. Completeness is
    a theorem, so output == brute force (pinned in pytest vs
    ngram_jaccard_pairs).

    vs ``ngram_jaccard_pairs``: same answer above t, but the join fan
    -out drops from every shared shingle (hot shingles go quadratic —
    hence that operator's max_df cap, which CHANGES semantics) to
    shared rare-prefix shingles, with no semantic change. The right
    exact-threshold tier for corpus-scale dedup.

    Returns DataFrame[id_a, id_b, jaccard] (id_a < id_b).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    exploded = _exploded_shingles(df, id_col, text_col, k).persist()
    # persisted too: ranked's n_sh join and BOTH verify sides consume
    # it, and the id_a/id_b aliasing defeats ReuseExchange (same trap
    # passage_overlap_pairs documents) — without this the collect_set
    # shuffle runs three times
    sets = exploded.groupBy("id").agg(
        F.collect_set("shingle").alias("sh_set"),
        F.count(F.lit(1)).alias("n_sh"),
    ).persist()
    dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # fp-safe ceil(t*n): round to 9dp first so 3.0000000000000004-style
    # representation error can't lengthen (harmless) or SHORTEN
    # (correctness-breaking) the prefix
    t = float(threshold)
    minlen = F.ceil(F.round(F.lit(t) * F.col("n_sh"), 9)).cast("long")
    prefix_len = (F.col("n_sh") - minlen + F.lit(1)).cast("long")
    ranked = (
        exploded.join(dfreq, "shingle")
        .join(sets.select("id", "n_sh"), "id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "shingle")
            ),
        )
        .where(F.col("pos") <= prefix_len)
        .select("id", "shingle", "n_sh")
    )
    a = ranked.select(
        F.col("id").alias("id_a"), "shingle", F.col("n_sh").alias("n_a")
    )
    b = ranked.select(
        F.col("id").alias("id_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: Jaccard >= t forces t <= |y|/|x| <= 1/t
            & (
                F.col("n_b")
                >= F.ceil(F.round(F.lit(t) * F.col("n_a"), 9)).cast("long")
            )
            & (
                F.col("n_a")
                >= F.ceil(F.round(F.lit(t) * F.col("n_b"), 9)).cast("long")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sets.select(
        F.col("id").alias("id_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = sets.select(
        F.col("id").alias("id_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n_sh").alias("n_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
    out = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / (F.col("n_a") + F.col("n_b") - inter)).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(t) - F.lit(1e-12))
    )
    def _release():
        sets.unpersist()
        exploded.unpersist()

    out.release_cache = _release  # caller releases after use
    return out
