"""Near-dup pair list → duplicate clusters → canonical survivors.

After MinHash/SimHash/cosine candidate generation, deduplication needs
connected components: if A~B and B~C, {A,B,C} is one cluster and one
representative survives. Implemented as alternating large-star /
small-star (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round
rewires edges toward component minima and provably converges in
O(log² n) rounds (≈log n in practice) on ANY graph shape — including
the long chained-near-dup paths (A~B~C~…~Z) where plain min-label
propagation needs O(diameter) rounds and would abort at corpus scale.

    large-star(u): attach every neighbor w > u to m = min(Γ(u) ∪ {u})
    small-star(u): attach u and every smaller neighbor to their min

Fixpoint = a forest of stars whose centers are component minima.

Scale: only the EDGE LIST is iterated (near-dup pairs, tiny vs the
corpus); each operator is a groupBy + join over the canonical
(hi, lo)-directed edge set; the corpus joins in once at the end
(left-anti vs losers in :func:`dedup_survivors`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over canonical (a>b)-directed edges.

    For each node u: m = min(Γ(u) ∪ {u}); emit (w, m) for every
    neighbor w > u. Output stays (larger, smaller)-directed because
    m <= u < w.
    """
    nbrs = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = nbrs.groupBy("a").agg(
        F.least(F.min("b"), F.col("a")).alias("m")
    )
    return (
        nbrs.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over canonical (a>b)-directed edges.

    For each node u over its SMALLER neighbors Γ⁻(u): m = min(Γ⁻(u));
    emit (u, m) and (w, m) for every w ∈ Γ⁻(u) \\ {m}. Output again
    (larger, smaller)-directed (m is the minimum).
    """
    mins = edges.groupBy("a").agg(F.min("b").alias("m"))
    rewired = (
        edges.join(mins, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    centers = mins.select(F.col("a"), F.col("m").alias("b"))
    return rewired.union(centers).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges → DataFrame[id, component] (component = min id reachable).

    Alternates large-star/small-star until the edge set is stable
    (the proven fixpoint: a star forest rooted at component minima),
    asserting on non-convergence within ``max_iter`` alternating rounds
    — O(log² n) suffices for any graph, so 30 rounds covers graphs far
    beyond 10^9 nodes (vs the previous min-label propagation, which
    needed O(diameter) rounds and aborted on long near-dup chains).

    Lineage is truncated every round. Local default:
    ``localCheckpoint`` (executor-local storage — fast, but a lost
    executor loses the blocks). On a real cluster pass
    ``checkpoint_dir`` (HDFS/S3/DBFS path) to use reliable
    ``checkpoint`` storage instead.

    The returned DataFrame carries ``cc_rounds`` (alternating rounds to
    converge) — read it before transforming the frame (Python
    attributes don't survive DataFrame transformations).
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda d: d.checkpoint(eager=True)  # noqa: E731
    else:
        _ckpt = lambda d: d.localCheckpoint(eager=True)  # noqa: E731

    raw = pairs.select(F.col(id_a).alias("x"), F.col(id_b).alias("y"))
    # one materialization of the (possibly expensive) upstream pair
    # pipeline; everything below iterates checkpointed KB-scale frames
    nodes = _ckpt(
        raw.select(F.col("x").alias("id"))
        .union(raw.select(F.col("y").alias("id")))
        .distinct()
    )
    edges = _ckpt(
        raw.where(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b")
        )
        .distinct()
    )

    n_edges = edges.count()
    rounds = 0
    while n_edges:
        rounds += 1
        if rounds > max_iter:
            raise RuntimeError(
                f"components did not converge in {max_iter} rounds"
            )
        new_edges = _ckpt(_small_star(_large_star(edges)))
        n_new = new_edges.count()
        # fixpoint test: |new| == |old| and new ⊆ old ⇒ sets equal
        # (subtract = set semantics; exceptAll would be bag semantics)
        if (
            n_new == n_edges
            and new_edges.subtract(edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        edges, n_edges = new_edges, n_new

    # star forest: (a → component b); roots and isolated nodes label
    # themselves. The groupBy-min is belt-and-braces: at the proven
    # fixpoint each node has exactly one outgoing edge, so min is a
    # pass-through.
    labels = (
        nodes.join(
            edges.groupBy(F.col("a").alias("id")).agg(
                F.min("b").alias("comp")
            ),
            "id",
            "left",
        )
        .select("id", F.coalesce("comp", "id").alias("component"))
    )
    labels.cc_rounds = rounds
    return labels


def dedup_survivors(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (min id) per duplicate cluster.

    Docs never appearing in a pair pass through untouched (they're not
    in the edge list at all — no join amplification).
    """
    comp = connected_components(pairs)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return corpus.join(losers, id_col, "left_anti")
