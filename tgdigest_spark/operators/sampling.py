"""Dataset splitting / sampling for training-data pipelines.

Two tiers, both shuffle-free over the fact rows:

* ``assign_splits`` — thresholds over a per-row CONTENT hash
  (``xxhash64(key, seed)``): O(1) per row, no window, the 100-TB
  default. Proportions are exact only in expectation. A content hash —
  not ``rand(seed)`` — because Spark seeds rand per PARTITION and
  consumes it in row order, so a rand-based split silently reshuffles
  whenever the physical layout changes (compaction, AQE, cluster size):
  the opposite of an auditable freeze.
* ``assign_splits_exact`` — deterministic stratified split with EXACT
  per-stratum proportions: rows are ordered inside each stratum by a
  content hash (md5 of the id — a seedless, engine-portable shuffle)
  and cut at cumulative weight boundaries via one window. Costs one
  hash-partition shuffle on the stratum key; fully SQL-expressible, so
  the driver oracle hash-verifies it (driver_queries
  train_val_split_counts).

Reproducibility contract: both assignments are pure functions of
(row key, ``seed``) — re-running on the same table, under any physical
layout, yields the same split, which is what makes a training-data
freeze auditable. NULL keys are rejected (xxhash64 ignores NULL inputs,
so every null-key row would silently land in one split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _boundaries(weights: dict[str, float]) -> list[tuple[str, float]]:
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    acc = 0.0
    out = []
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {name!r}")
        # round the running boundary: fp accumulation makes
        # 0.9 + 0.05 = 0.9500000000000001, which would pull the row
        # sitting exactly on the 0.95 cut into the wrong split (and
        # diverge from any SQL mirror written with literal 0.95)
        acc = round(acc + w / total, 12)
        out.append((name, acc))
    out[-1] = (out[-1][0], 1.0 + 1e-9)  # fp-safe last boundary
    return out


def _case(frac: Column, bounds: list[tuple[str, float]]) -> Column:
    out = None
    for name, b in bounds:
        cond = frac < F.lit(b)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    return out.otherwise(F.lit(bounds[-1][0])).alias("split")


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    key: str | Column = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Hash split: adds ``split_col`` from thresholds over
    ``xxhash64(key, seed)`` — a pure function of the row's ``key``, so
    the assignment survives repartitioning, compaction, and re-runs."""
    bounds = _boundaries(weights)
    key_col = F.col(key) if isinstance(key, str) else key
    denom = 1 << 20
    frac = (
        F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(denom)).cast("double")
        / F.lit(float(denom))
    )
    # xxhash64 IGNORES null inputs (hash degenerates to hash(seed)):
    # every null-key row would land in one split — fail loudly instead.
    frac = F.when(
        key_col.isNull(),
        F.raise_error(
            F.lit("assign_splits: null split key (fill or filter first)")
        ).cast("double"),
    ).otherwise(frac)
    return df.withColumn(split_col, _case(frac, bounds).alias(split_col))


def assign_splits_exact(
    df: DataFrame,
    weights: dict[str, float],
    by: str | Column,
    shuffle_key: Column,
    split_col: str = "split",
) -> DataFrame:
    """Exact stratified split.

    Within each ``by`` stratum, rows are ordered by ``shuffle_key`` (use
    a content hash, e.g. ``F.md5(id.cast('string'))``, so the order is a
    deterministic pseudo-shuffle) and assigned by cumulative position
    ``(row_number - 1) / stratum_count`` against the weight boundaries —
    every stratum lands within 1 row of its exact proportion.
    """
    bounds = _boundaries(weights)
    by_col = F.col(by) if isinstance(by, str) else by
    w = Window.partitionBy(by_col).orderBy(shuffle_key)
    frac = (
        (F.row_number().over(w) - F.lit(1)).cast("double")
        / F.count(F.lit(1)).over(Window.partitionBy(by_col)).cast("double")
    )
    return df.withColumn(split_col, _case(frac, bounds).alias(split_col))


def stratified_sample(
    df: DataFrame,
    by: str | Column,
    n: int,
    shuffle_key: Column,
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Deterministic exactly-N-per-stratum sample.

    Keeps the first ``n`` rows of each ``by`` stratum under the
    ``shuffle_key`` ordering (use a content hash, e.g.
    ``F.md5(id.cast('string'))``, for a deterministic, seedless,
    engine-portable pseudo-shuffle; pass ``tiebreak`` — typically the id
    — to pin the order when shuffle_key collides). Strata smaller than
    ``n`` pass through whole.

    Fully SQL-expressible (one window), so the driver oracle
    hash-verifies the SELECTION, not just the counts
    (driver_queries.stratified_sample_counts). Scale: one
    hash-partition shuffle on the stratum key; Spark plans the rank
    filter as WindowGroupLimit, so each task keeps a top-n heap instead
    of fully sorting its strata.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    by_col = F.col(by) if isinstance(by, str) else by
    order = [shuffle_key]
    if tiebreak is not None:
        order.append(F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak)
    w = Window.partitionBy(by_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str = "token_cnt",
    budget: int = 2048,
    id_col: str = "doc_id",
    group_col: str | Column | None = None,
    n_groups: int = 1024,
    oversize: str = "error",
    bin_col: str = "bin",
) -> DataFrame:
    """Greedy context-window bin packing: assign each doc to a bin whose
    total ``token_col`` never exceeds ``budget``.

    Packing granularity is a GROUP (first-fit-decreasing is inherently
    sequential, so it runs per group inside ``applyInPandas``):

    * ``group_col=None`` — docs are bucketed by a content hash of
      ``id_col`` into ``n_groups`` groups. At 100 TB this bounds each
      packing task to ~corpus/n_groups docs; raise ``n_groups`` to keep
      groups executor-sized. Deterministic under any physical layout.
    * or pass an explicit grouping column (e.g. the train/val split, a
      date) to keep bins from crossing that boundary.

    Within a group: best-fit-decreasing (sort by tokens desc, id asc;
    place each doc into the fullest bin that still has room, else open
    a new bin) — the classic 11/9·OPT+1 offline heuristic family,
    O(n log n) via a bisect-maintained residual list. Bin ids are
    globally unique strings ``"{group}_{local_bin}"`` (collision-free
    for any group value type).

    ``oversize``: 'error' (default) raises on any doc with
    ``token_col > budget`` (keeps the no-bin-exceeds-budget invariant
    strict); 'singleton' gives each oversized doc its own bin and
    marks it in the ``oversized`` output column.

    Returns the input columns + ``bin_col`` (string) + ``oversized``
    (boolean). Every input row appears exactly once.
    """
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    if oversize not in ("error", "singleton"):
        raise ValueError("oversize must be 'error' or 'singleton'")
    if budget <= 0:
        raise ValueError("budget must be positive")

    if group_col is None:
        grp = F.pmod(
            F.xxhash64(F.col(id_col), F.lit(0x5EED)), F.lit(n_groups)
        )
    else:
        grp = F.col(group_col) if isinstance(group_col, str) else group_col
    work = df.withColumn("_grp", grp.cast("string"))
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField(bin_col, StringType(), False),
            StructField("oversized", BooleanType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = pdf["_grp"].iloc[0]
        toks = pdf[token_col].to_numpy()
        if oversize == "error" and (toks > budget).any():
            bad = pdf.loc[toks > budget, id_col].iloc[0]
            raise ValueError(
                f"pack_sequences: doc {bad!r} exceeds budget {budget} "
                f"(use oversize='singleton')"
            )
        order = np.lexsort((pdf[id_col].to_numpy(), -toks))
        import bisect

        n_bins = 0
        res: list[int] = []  # open-bin residuals, ascending
        res_bin: list[int] = []  # bin index parallel to res
        assign = np.empty(len(pdf), dtype=np.int64)
        overs = np.zeros(len(pdf), dtype=bool)
        for idx in order:
            t = int(toks[idx])
            if t > budget:  # oversize == 'singleton'
                assign[idx] = n_bins
                overs[idx] = True
                n_bins += 1  # full bin: never enters the residual list
                continue
            i = bisect.bisect_left(res, t)  # tightest bin with room
            if i < len(res):
                r, b = res.pop(i), res_bin.pop(i)
                r -= t
                j = bisect.bisect_left(res, r)
                res.insert(j, r)
                res_bin.insert(j, b)
                assign[idx] = b
            else:
                assign[idx] = n_bins
                j = bisect.bisect_left(res, budget - t)
                res.insert(j, budget - t)
                res_bin.insert(j, n_bins)
                n_bins += 1
        out = pdf.drop(columns=["_grp"]).copy()
        out[bin_col] = [f"{g}_{a}" for a in assign]
        out["oversized"] = overs
        return out

    return work.groupBy("_grp").applyInPandas(pack, schema=out_schema)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: str | Column,
    key: str | Column,
    by: str | Column | None = None,
    seed: str = "",
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): keep the ``n`` rows with the smallest
    exponential rank ``-ln(u) / weight``, where ``u`` is a uniform
    derived from a CONTENT hash of ``key`` (+ ``seed``) — so inclusion
    probability is proportional to weight, yet the draw is a pure
    function of (row key, seed): reproducible under any physical
    layout, re-runnable, auditable (same contract as assign_splits).

    Use: quality-weighted corpus selection ("sample 1M docs ∝ quality
    score"), temperature-style source rebalancing.

    ``by``: optional stratum — n rows PER stratum via one windowed
    top-n (WindowGroupLimit: each task keeps an n-heap, shuffle moves
    ~n rows per task per stratum). Without ``by`` the global top-n is a
    TakeOrdered (orderBy + limit) — no single-partition window.

    Rows with NULL or non-positive weight are excluded (they have no
    well-defined inclusion probability). The rank is ROUNDED to 6
    decimals and tie-broken by ``tiebreak`` (pass the id): ranking on a
    raw transcendental double is not reproducible across engines (ulp
    differences between libm implementations) — same convention as the
    cross-engine cosine ranking. 6dp (not 9) leaves ~10 orders of
    magnitude between a double's ulp and the nearest rounding boundary,
    so a ±1-ulp libm difference cannot flip a rounded digit in
    practice; the ties 6dp creates fall to the deterministic tiebreak,
    and selection stays weight-proportional (the rank is still a
    continuous function of the weight). Fully SQL-expressible →
    DuckDB-oracle verifiable (driver_queries.weighted_sample_docs).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w_col = F.col(weight) if isinstance(weight, str) else weight
    k_col = F.col(key) if isinstance(key, str) else key
    # ONE definition of the cross-engine uniform (hash_uniform) — the
    # 13-hex-char/conv/+1 convention must not fork within this module
    u = hash_uniform(k_col, seed)
    rank = F.round(-F.log(u) / w_col.cast("double"), 6)
    out = df.where(w_col.isNotNull() & (w_col > 0)).withColumn(
        "_wrank", rank
    )
    order = [F.col("_wrank")]
    if tiebreak is not None:
        order.append(F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak)
    if by is None:
        return out.orderBy(*order).limit(n).drop("_wrank")
    by_col = F.col(by) if isinstance(by, str) else by
    win = Window.partitionBy(by_col).orderBy(*order)
    return (
        out.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= n)
        .drop("_rn", "_wrank")
    )


def hash_uniform(key: str | Column, seed: str = "") -> Column:
    """Deterministic uniform in (0, 1] from a CONTENT hash of ``key``
    (+ ``seed``): first 13 md5 hex chars = 52 bits, exactly
    representable in a double, so Spark's ``conv(...)+1.0`` and an
    oracle's integer ``v+1`` agree bit-for-bit across engines (the
    convention established by :func:`weighted_sample`; DuckDB mirror:
    ``('0x' || substring(md5(...), 1, 13))::BIGINT``)."""
    k_col = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", k_col.cast("string"), F.lit(seed))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13))


def rebalance_sources(
    df: DataFrame,
    source: str,
    key: str,
    target_weights: dict[str, float] | None = None,
    temperature: float | None = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic source/domain rebalancing by downsampling — the
    corpus-mixing step of an LLM data pipeline ("flatten the web crawl,
    keep all of the books", GPT-3 / Pile style).

    Exactly one of:

    * ``target_weights``: {source: weight} — the kept corpus's source
      proportions follow the weights (sources absent from the dict are
      dropped);
    * ``temperature``: T — weights ∝ n_s^(1/T) of the observed counts:
      T=1 keeps the natural distribution, T→∞ approaches uniform
      across sources, the standard multinomial-temperature rebalance.

    Only DOWNSAMPLING: the largest source relative to its weight is
    kept whole (scale = min_s n_s/w_s) and every other source keeps
    the fraction that lands proportions on target IN EXPECTATION. The
    draw is a pure function of (row key, seed) via :func:`hash_uniform`
    — layout-independent, re-runnable, auditable, like every sampler in
    this module. Keep probabilities are ROUNDED to 6dp (the
    cross-engine convention: sub-ulp float differences between engines
    cannot flip a rounded digit) so the selection is DuckDB-oracle
    verifiable (driver_queries.rebalance_sources_docs).

    Scale shape: one tiny counts aggregate (|sources| rows to the
    driver) + a broadcast map join + a per-row hash filter — no
    shuffle of the fact rows, no window. NULL-source rows are dropped
    (they belong to no mixture component).
    """
    if (target_weights is None) == (temperature is None):
        raise ValueError("pass exactly one of target_weights / temperature")
    df = df.where(F.col(source).isNotNull())
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return df.withColumn("_keep_p", F.lit(0.0)).drop("_keep_p").limit(0)
    if temperature is not None:
        if temperature <= 0:
            raise ValueError("temperature must be positive")
        weights = {
            s: float(n) ** (1.0 / float(temperature)) for s, n in counts.items()
        }
    else:
        weights = {
            s: float(w)
            for s, w in target_weights.items()
            if s in counts and w > 0
        }
        if not weights:
            return df.limit(0)
    # largest source relative to its weight is kept whole; everything
    # else downsampled proportionally
    scale = min(counts[s] / w for s, w in weights.items())
    p_keep = {
        s: round(w * scale / counts[s], 6) for s, w in weights.items()
    }
    mapping = F.create_map(
        *[x for s, p in sorted(p_keep.items()) for x in (F.lit(s), F.lit(p))]
    )
    u = hash_uniform(key, seed)
    # u is in (0, 1], so the comparison must be INCLUSIVE: with strict
    # <, a row whose uniform lands exactly on 1.0 would be dropped even
    # from a p_keep=1.0 source, contradicting the largest-source-kept-
    # whole / T=1-keeps-everything contract (oracle mirrors <=)
    return df.where(u <= mapping[F.col(source)])


def shuffle_for_training(
    df: DataFrame,
    key: str | Column,
    seed: str = "",
    n_shards: int = 64,
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic, layout-independent corpus shuffle for epoch
    streaming: assign each row to a shard and a within-shard position
    from two independent content-hash uniforms, then repartition by
    shard and sort within partitions — a write-ready randomized
    training order WITHOUT a global sort (the classic epoch-shuffle
    layout: readers stream shards in any order, each shard internally
    pre-shuffled).

    Like every sampler in this module the order is a pure function of
    (row key, seed): change ``seed`` per epoch for a fresh
    permutation; re-running on the same table under any physical
    layout reproduces the identical order (auditable). One shuffle (by
    shard), no SinglePartition anywhere. The logical order (shard,
    then the ordering uniform, then key) is SQL-expressible →
    DuckDB-oracle verified per-shard via an order digest
    (driver_queries.training_shuffle_digest).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    k_col = F.col(key) if isinstance(key, str) else key
    u_shard = hash_uniform(k_col, seed + "|shard")
    u_order = hash_uniform(k_col, seed + "|order")
    shard = F.least(
        F.floor(u_shard * F.lit(n_shards)), F.lit(n_shards - 1)
    ).cast("int")
    return (
        df.withColumn(shard_col, shard)
        .withColumn("_ord", u_order)
        .repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, "_ord", k_col)
        .drop("_ord")
    )


def select_until_budget(
    df: DataFrame,
    order_col: str | Column,
    amount: str | Column,
    budget,
    descending: bool = True,
    tiebreak: str | Column | None = None,
    n_bins: int = 256,
    out_col: str = "cum_amount",
) -> DataFrame:
    """Distributed EXACT running-sum cutoff: walk rows in
    (``order_col``, ``tiebreak``) order and keep every row whose
    cumulative ``amount`` stays <= ``budget`` — "take the
    highest-quality documents until the token budget is spent".

    The naive plan (global ``Window.orderBy`` cumsum, the reference's
    A8 shape in driver_queries.running_sum_cutoff) funnels the whole
    table through ONE partition. This operator keeps the identical
    semantics at ~one pass over the input:

    1. bin rows by VALUE RANGES of the order key — boundaries come
       from a BOUNDED sample (the head of each scan task, quantiled
       by one approx_percentile over <= tasks x 4096 values; each
       sampling task short-circuits after its first Arrow batch, so
       this costs ~a row-group read per task, not a scan). A bad
       split only unbalances bins, never changes the answer, so both
       the sample's layout-dependence and its skew are harmless;
    2. ONE full scan computes each row's bin and the frame is
       localCheckpoint-ed, so the two consumers below reuse it
       instead of re-reading the source;
    3. per-bin decimal sums (a map-side-partial agg shuffling ~n_bins
       rows per task) to the driver, prefix them, broadcast each
       bin's starting offset back, and one window PARTITIONED BY BIN
       (the single full-row shuffle) adds the exact within-bin cumsum
       to the offset; rows filter on ``offset + cum <= budget``.

    Equal order-key values always share a bin, so the bin walk is a
    refinement of the total order. Sums are exact decimal (fp
    associativity would make the cutoff layout-dependent); the output
    column is cast to double at the end. Rows with NULL amount are
    excluded. Fully SQL-expressible → DuckDB oracle
    (driver_queries.budget_cutoff_docs). The checkpoint blocks are
    freed by the context cleaner when the result is garbage-collected
    (same convention as the dedup operators).
    """
    from decimal import Decimal

    o = F.col(order_col) if isinstance(order_col, str) else order_col
    a = (F.col(amount) if isinstance(amount, str) else amount).cast(
        "decimal(30,6)"
    )
    base = df.where(a.isNotNull()).withColumn("_amt", a)
    probe = "_budget_probe"
    base = base.withColumn(probe, o.cast("double"))

    def _task_heads(batches):
        for pdf in batches:
            # STRIDED sample across the whole first batch, not its
            # contiguous head: on a near-single-task input sorted by
            # the order key, 4096 contiguous rows cover only a narrow
            # value range, collapsing the boundaries so most rows land
            # in one bin and the final window degenerates toward the
            # single-partition shape this operator exists to avoid
            # (answer unchanged — bins only balance the work)
            # ceil division: floor would degenerate to a contiguous
            # head for batches under 8192 rows and always drop the tail
            step = max(1, -(-len(pdf) // 4096))
            yield pdf.iloc[::step].head(4096)
            return  # short-circuit: the scan stops after one batch

    sampled = (
        base.select(probe)
        .where(F.col(probe).isNotNull())
        .mapInPandas(_task_heads, schema=f"{probe} double")
    )
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = sorted(set(sampled.stat.approxQuantile(probe, qs, 0.001)))
    # bin id increases along the WALK order (bin 0 is walked first):
    # count of ascending boundaries below the key, flipped for
    # descending walks — built as a BALANCED binary-search CASE tree
    # (depth log2 B). A flat 255-deep WHEN chain trips Catalyst's
    # optimizer iteration budget, and a higher-order size(filter(...))
    # with an outer column reference mis-resolves under column pruning
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND), so neither alternative
    # survives contact with real plans. Rows with equal keys take the
    # same branch → same bin; a NULL key counts no boundaries (walked
    # last on a descending walk, matching desc()'s nulls-last).
    def _count_below(bs: list[float], base: int):
        if not bs:
            return F.lit(base)
        mid = len(bs) // 2
        return F.when(
            F.col(probe) > F.lit(bs[mid]),
            _count_below(bs[mid + 1 :], base + mid + 1),
        ).otherwise(_count_below(bs[:mid], base))

    bin_expr = _count_below([float(x) for x in bounds], 0)
    if descending:
        bin_expr = F.lit(len(bounds)) - bin_expr
    # ONE pass over the input: pin the binned frame — the stats agg
    # (map-side partial, shuffles ~n_bins rows per task) and the final
    # window (the one real row shuffle, by _bin) both consume the
    # checkpoint instead of re-scanning the source. NB localCheckpoint
    # does NOT carry partitioning metadata, so pre-shuffling by _bin
    # here would just add a second full shuffle — checkpoint the
    # narrow scan output and let the window do the single exchange.
    binned = base.withColumn("_bin", bin_expr).localCheckpoint(eager=True)
    stats = {
        int(r["_bin"]): (r["s"], r["mn"])
        for r in binned.groupBy("_bin")
        .agg(F.sum("_amt").alias("s"), F.min("_amt").alias("mn"))
        .collect()
    }
    # bin pruning (offsets[b] > budget ⇒ whole bin out) relies on the
    # running sum being MONOTONE — negative amounts break that and
    # would silently diverge from the naive global-window semantics
    if any(mn < 0 for _, mn in stats.values()):
        raise ValueError(
            "select_until_budget requires non-negative amounts: the "
            "running-sum cutoff is only monotone (and bin pruning only "
            "sound) without negative contributions"
        )
    sums = {b: s for b, (s, _) in stats.items()}
    offsets, acc = {}, Decimal(0)
    budget_d = Decimal(str(budget))
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    keep_bins = [b for b in sorted(sums) if offsets[b] <= budget_d]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(b, offsets[b]) for b in keep_bins],
            "_bin int, _off decimal(30,6)",
        )
    )
    order = [o.desc() if descending else o.asc()]
    if tiebreak is not None:
        order.append(
            F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        )
    w = (
        Window.partitionBy("_bin")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.col("_off") + F.sum("_amt").over(w)).cast("decimal(30,6)")
    return (
        binned.join(off_df, "_bin")
        .withColumn("_cum", cum)
        .where(F.col("_cum") <= F.lit(budget_d))
        .withColumn(out_col, F.col("_cum").cast("double"))
        .drop("_bin", "_amt", "_off", "_cum", probe)
    )
