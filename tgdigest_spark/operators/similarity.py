"""Similarity search over embedding columns (array<float>).

Two tiers:

* ``cosine_topk`` — exact brute-force top-k per query. The scoring is a
  vectorized pandas UDF (one numpy matmul per Arrow batch); ranking is
  a window top-k (Catalyst: WindowGroupLimit, no full sort). Baseline
  and oracle for the approximate tier.
* ``ann_lsh_topk`` — random-hyperplane LSH (Charikar): b-bit signatures
  via one matmul, candidates = equi-join on signature bucket (optionally
  multi-probe over all 1-bit flips), exact re-rank within candidates.
  At 100 TB the bucket join shuffles only (id, bucket) pairs; the
  embedding matrix never cross-joins.

Normalization note: queries are broadcast inside the UDF closure
(numpy array, KBs for k-NN workloads); for very large query sets use
``ann_lsh_topk`` whose probe side is a DataFrame join, not a closure.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def cosine_expr(va, vb):
    """Cosine similarity of two array columns as a pure built-in
    expression (sequential double fold — whole-stage codegen, no UDF).
    The JVM-side twin of the numpy rescore kernels below; driver-query
    oracles compare it against DuckDB's list_cosine_similarity."""
    va = F.col(va) if isinstance(va, str) else va
    vb = F.col(vb) if isinstance(vb, str) else vb
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (norm(va) * norm(vb))


def _scores_schema() -> StructType:
    return StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("vec_id", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )


def _list_matrix(lc) -> np.ndarray:
    """(n, d) float64 matrix straight from an Arrow ``list<float>``
    array: one contiguous values-buffer reshape instead of a Python
    list object per row (round-7, guide §4.2 — the ``.tolist()`` object
    path dominated every embedding stage's profile). Falls back to the
    object path for ragged or null rows; float32→float64 widening is
    exact either way, so downstream scores are bit-identical."""
    widths = np.diff(lc.offsets.to_numpy(zero_copy_only=False))
    if (
        lc.null_count == 0
        and widths.size
        and (widths == widths[0]).all()
        and widths[0] > 0
    ):
        flat = lc.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(widths), int(widths[0])).astype(
            np.float64, copy=False
        )
    return np.array(lc.to_pylist(), dtype=np.float64)


def _maybe_coalesce_small(
    df: DataFrame, target: int | None = None, threshold_bytes: int = 64 << 20
) -> DataFrame:
    """Bound the task count for SMALL scans feeding a Python stage.

    Each mapInArrow/mapInPandas evaluation costs a fixed per-task
    runner setup (measured ~5–8 ms serialized, §4 of the round-7
    notes); a few-MB embedding table split into 32+ files pays 32
    launches to do microseconds of matmul each. When the plan is a
    plain file scan whose TOTAL size is under ``threshold_bytes`` (and
    only then — remote/unstatable files or big inputs pass through
    untouched), coalesce to ``target`` read groups. Row content and
    downstream results are unchanged; this only merges scan splits.
    """
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover — Connect / non-scan plans
        return df
    try:
        cap = max(2, df.sparkSession.sparkContext.defaultParallelism // 4)
    except Exception:  # pragma: no cover
        cap = 8
    if not files or len(files) <= 2:
        return df
    import os
    from urllib.parse import unquote, urlparse

    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return df
        try:
            total += os.path.getsize(unquote(u.path))
        except OSError:
            return df
        if total >= threshold_bytes:
            return df
    if target is None:
        # size-derived read groups (~4 MB of parquet each): a 5 MB
        # table gets 2 tasks instead of cores/4 — measured 0.43→0.30 s
        # on the ANN rescore, the difference being pure per-task runner
        # setup; bigger (but still <64 MB) inputs keep cores/4
        target = max(2, min(cap, -(-total // (4 << 20))))
    if len(files) <= target:
        return df
    return df.coalesce(target)


def _local_frame(spark, pdf: pd.DataFrame, schema: str):
    """Small driver-local frame via the Arrow pandas path: a plain
    ``createDataFrame(list_of_rows)`` scatters k rows over
    defaultParallelism Python-RDD slices (measured: a 32-task no-op
    Python job); the Arrow path yields a handful of JVM-only tasks."""
    return spark.createDataFrame(pdf, schema).coalesce(1)


def cosine_scores(
    embeddings: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, vector) cosine scores — one matmul per Arrow batch.

    ``mapInArrow`` (round-7, guide §4.2): the embedding column arrives
    as one contiguous Arrow list<float> buffer, reshaped straight into
    the (batch, dim) matrix — the previous pandas form materialized a
    Python list object per row (``.tolist()``) before the matmul, which
    dominated the stage (profile: 8.3 core-s run, 0.6 core-s JVM CPU).
    float32→float64 widening and the matmul are unchanged, so scores
    are bit-identical."""
    import pyarrow as pa

    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qids = np.asarray(query_ids, dtype=np.int64)

    def score(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            m = _list_matrix(rb.column(1))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = mn @ qn.T  # (batch, n_queries)
            nq = sims.shape[1]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.tile(qids, n), type=pa.int64()),
                    pa.array(np.repeat(ids, nq), type=pa.int64()),
                    pa.array(sims.reshape(-1), type=pa.float64()),
                ],
                names=["query_id", "vec_id", "cosine"],
            )

    return _maybe_coalesce_small(
        embeddings.select(id_col, vec_col)
    ).mapInArrow(score, schema=_scores_schema())


def cosine_topk(
    embeddings: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
    **kw,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity."""
    scores = cosine_scores(embeddings, queries, query_ids, **kw)
    if exclude_self:
        scores = scores.where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# LSH tier
# ---------------------------------------------------------------------------

def _pack_buckets(m: np.ndarray, planes: np.ndarray, n_bits: int, n_tables: int) -> np.ndarray:
    """(n, n_tables) int64 bucket ids; table t uses planes[:, t*b:(t+1)*b]
    and its id is offset by t<<n_bits so tables never collide."""
    proj = m @ planes  # (n, n_tables*n_bits)
    bits = (proj > 0).astype(np.int64).reshape(len(m), n_tables, n_bits)
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    bucket = (bits * weights).sum(axis=2)  # (n, n_tables)
    return bucket + (np.arange(n_tables, dtype=np.int64) << n_bits)


def _planes(dim: int, n_bits: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(dim, n_tables * n_bits))


def hyperplane_buckets(
    embeddings: DataFrame,
    n_bits: int = 16,
    n_tables: int = 1,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ DataFrame[id, bucket] — one row per (vector, table): sign
    pattern under n_bits random hyperplanes, table-offset packed."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("bucket", LongType(), False),
        ]
    )
    cache: dict[int, np.ndarray] = {}

    def planes_for(d: int) -> np.ndarray:
        if d not in cache:
            cache[d] = _planes(d, n_bits, n_tables, seed)
        return cache[d]

    import pyarrow as pa

    def bucketize(batches) -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            if not rb.num_rows:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            m = _list_matrix(rb.column(1))
            bucket = _pack_buckets(m, planes_for(m.shape[1]), n_bits, n_tables)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, n_tables), type=pa.int64()),
                    pa.array(bucket.reshape(-1), type=pa.int64()),
                ],
                names=[id_col, "bucket"],
            )

    return _maybe_coalesce_small(
        embeddings.select(id_col, vec_col)
    ).mapInArrow(bucketize, schema=schema)


def _flip_neighbors(bucket: int, n_bits: int) -> list[int]:
    return [bucket] + [bucket ^ (1 << b) for b in range(n_bits)]


def _rescore_topk(
    emb_cand: DataFrame,
    query_ids: np.ndarray,
    qn: np.ndarray,
    k: int,
    id_col: str,
) -> DataFrame:
    """Exact cosine re-rank of a (query_id, id, vec) candidate frame +
    window top-k — the shared tail of the LSH and IVF tiers (previously
    two identical inline copies). Arrow-native batch decode
    (:func:`_list_matrix`); scores bit-identical to the pandas form."""
    import pyarrow as pa

    qid_to_row = {int(qid): i for i, qid in enumerate(query_ids)}

    def rescore(batches) -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            if not rb.num_rows:
                continue
            qid = rb.column(0).to_numpy(zero_copy_only=False)
            ids = rb.column(1).to_numpy(zero_copy_only=False)
            m = _list_matrix(rb.column(2))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            qrows = np.array([qid_to_row[int(x)] for x in qid])
            sims = np.einsum("ij,ij->i", mn, qn[qrows])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(qid, type=pa.int64()),
                    pa.array(ids, type=pa.int64()),
                    pa.array(sims, type=pa.float64()),
                ],
                names=["query_id", "vec_id", "cosine"],
            )

    scores = emb_cand.mapInArrow(rescore, schema=_scores_schema())
    scores = scores.where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF tier — coarse k-means quantizer + probed exact re-rank
# ---------------------------------------------------------------------------

def train_coarse_centroids(
    embeddings: DataFrame,
    n_lists: int = 64,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 29,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
) -> np.ndarray:
    """Driver-side Lloyd iterations on a bounded sample (normalized →
    spherical k-means). Sample size, not table size, bounds the cost.

    For large/clustered tables set ``sample_fraction`` so that
    fraction * N ≈ sample_rows: the per-row Bernoulli filter draws from
    ALL partitions before the limit truncates, avoiding first-partition
    bias (a bare limit on a table sorted by source/time would train
    centroids on the earliest data only)."""
    src = embeddings.select(vec_col)
    if sample_fraction < 1.0:
        src = src.where(F.rand(seed) < sample_fraction)
    pdf = src.limit(sample_rows).toPandas()
    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ DataFrame[id, list_id]: nearest coarse centroid per vector
    (one matmul per Arrow batch; centroids ship in the closure)."""
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("list_id", LongType(), False),
        ]
    )
    cent = centroids

    import pyarrow as pa

    def assign(batches) -> "Iterator[pa.RecordBatch]":
        for rb in batches:
            if not rb.num_rows:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            m = _list_matrix(rb.column(1))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            lists = (mn @ cent.T).argmax(axis=1).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(lists, type=pa.int64())],
                names=[id_col, "list_id"],
            )

    return _maybe_coalesce_small(
        embeddings.select(id_col, vec_col)
    ).mapInArrow(assign, schema=schema)


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 8,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: candidates = vectors in each query's
    n_probe nearest lists, exact cosine re-rank within candidates.

    Cost ~ N * (n_probe / n_lists) per query instead of N; recall
    tunable via n_probe. Pass pre-trained ``centroids`` to amortize
    training across query batches.
    """
    if centroids is None:
        centroids = train_coarse_centroids(embeddings, n_lists, vec_col=vec_col)
    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    sims = qn @ centroids.T  # (nq, n_lists)
    probe = np.argsort(-sims, axis=1)[:, : min(n_probe, centroids.shape[0])]

    spark = embeddings.sparkSession
    probes = _local_frame(
        spark,
        pd.DataFrame(
            {
                "query_id": np.repeat(
                    np.asarray(query_ids, dtype=np.int64), probe.shape[1]
                ),
                "list_id": probe.reshape(-1).astype(np.int64),
            }
        ),
        "query_id long, list_id long",
    )

    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    cand = (
        assigned.join(F.broadcast(probes), "list_id")
        .select("query_id", id_col)
        .distinct()
    )
    emb_cand = embeddings.join(cand, id_col).select("query_id", id_col, vec_col)
    return _rescore_topk(emb_cand, query_ids, qn, k, id_col)


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_bits: int = 12,
    n_tables: int = 8,
    seed: int = 13,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table LSH candidates + exact re-rank.

    Candidate set = vectors sharing a bucket with the query in ANY of
    the ``n_tables`` independent hash tables (plus all 1-bit flips when
    ``multiprobe``). Recall rises with tables/probes; cost stays
    ~ candidates * n_queries instead of N * n_queries.
    """
    q = np.asarray(queries, dtype=np.float64)
    planes = _planes(q.shape[1], n_bits, n_tables, seed)
    qbuckets = _pack_buckets(q, planes, n_bits, n_tables)  # (nq, n_tables)

    spark = embeddings.sparkSession
    probe_rows = []
    table_mask = (1 << n_bits) - 1
    for qi, qid in enumerate(np.asarray(query_ids, dtype=np.int64)):
        for t in range(n_tables):
            qb = int(qbuckets[qi, t])
            base, offset = qb & table_mask, qb & ~table_mask
            locals_ = _flip_neighbors(base, n_bits) if multiprobe else [base]
            probe_rows.extend((int(qid), offset | b) for b in locals_)
    probes = _local_frame(
        spark,
        pd.DataFrame(probe_rows, columns=["query_id", "bucket"]),
        "query_id long, bucket long",
    )

    buckets_df = hyperplane_buckets(
        embeddings,
        n_bits=n_bits,
        n_tables=n_tables,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
    cand = (
        buckets_df.join(F.broadcast(probes), "bucket")
        .select("query_id", id_col)
        .distinct()
    )
    emb_cand = embeddings.join(cand, id_col).select(
        "query_id", id_col, vec_col
    )

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return _rescore_topk(emb_cand, query_ids, qn, k, id_col)
