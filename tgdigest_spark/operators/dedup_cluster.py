"""Near-dup pair list → duplicate clusters → canonical survivors.

After MinHash/SimHash/cosine candidate generation, deduplication needs
connected components: if A~B and B~C, {A,B,C} is one cluster and one
representative survives. Implemented as iterative min-label
propagation (the standard large-graph Spark pattern — "hash-to-min"):

    label(v) ← min(label(v), min(label(u) for u adjacent))

repeated until fixpoint. Each round is one join + one aggregation over
the edge list; rounds needed = graph diameter in label-hops — O(log n)
for the short chains duplicate clusters form (clusters are near-cliques
via LSH, so usually 1-2 rounds).

Scale: only the EDGE LIST is iterated (near-dup pairs, tiny vs the
corpus); the corpus joins in once at the end (left-anti vs losers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges → DataFrame[id, component] (component = min id reachable).

    Converges when no label changes; asserts on non-convergence within
    max_iter (duplicate clusters are near-cliques, 1-3 rounds typical).

    Lineage is truncated every round. Local default:
    ``localCheckpoint`` (executor-local storage — fast, but a lost
    executor loses the blocks). On a real cluster pass
    ``checkpoint_dir`` (HDFS/S3/DBFS path) to use reliable
    ``checkpoint`` storage instead.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        _ckpt = lambda d: d.checkpoint(eager=True)  # noqa: E731
    else:
        _ckpt = lambda d: d.localCheckpoint(eager=True)  # noqa: E731
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
    )
    # initial label = min neighbor (incl. self)
    labels = edges.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("label")
    ).select(F.col("a").alias("id"), "label")

    edges = edges.persist()
    labels = _ckpt(labels)
    for _ in range(max_iter):
        # propagate: my new label = min(my label, labels of my neighbors)
        neighbor_labels = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_labels, labels.id == neighbor_labels.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        # truncate lineage every round: without this the plan doubles
        # per iteration and the changed-count action recomputes the
        # whole history
        new_labels = _ckpt(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    edges.unpersist()
    return labels.withColumnRenamed("label", "component")


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
