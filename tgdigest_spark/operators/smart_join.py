"""Sketch-advised equi-join: profile both key columns in one map-side
pass each, then pick and EXECUTE the join strategy — broadcast, plain
shuffle, or a hot/cold-split salted join.

This closes the loop the planner sketches open: :func:`tgdigest_spark.
api.key_profile` answers "how many rows / distinct keys / how hot is
the hottest key" and the AGMS inner product answers "how big is the
join output" — :func:`plan_equijoin` asks both questions from the SAME
two scans (the profile MultiSketch already carries the Count-Sketch),
and :func:`smart_equijoin` acts on the answer:

- **broadcast**: one side is small enough → no shuffle of the big side
  at all (`F.broadcast`, BroadcastHashJoin).
- **salted**: a key is hot enough that one reducer would receive more
  than ``hot_factor`` × the uniform share of rows → the hot keys' rows
  are salted into ``replication`` sub-keys on the heavy side and the
  other side's hot rows are replicated across the salt space; the cold
  remainder joins plain. Output rows are IDENTICAL to the plain join
  (the hot/cold key partition is disjoint and exhaustive over non-null
  keys; inner joins never match null keys).
- **shuffle**: neither condition → plain sort-merge/shuffled-hash join,
  Catalyst + AQE as usual.

At 100 TB the wrong choice here is the difference between a job and an
outage: a 20 %-share key sends 20 TB to one reducer; a missed broadcast
shuffles 100 TB to co-locate 50 MB. Both misses are invisible at test
scale — which is exactly why the decision is driven by the mergeable
sketches (published bounds, one narrow pass, no shuffle) instead of by
``df.count()``-style full materializations or hand-tuned hints.

Estimates vs guarantees: the PLAN is approximate (HLL ±1 %, MG one-sided
bounds, AGMS median-of-rows); the JOIN RESULT is exact under every
strategy — the driver gate checks the result against a plain-SQL oracle
while pytest pins the strategy selection and the hot/cold parity.

Known limitation — two-sided hot keys: salting spreads the SALTED
side's hot rows over R reducers, but the replicated side's hot rows
still arrive whole at every sub-key, so a key hot on BOTH sides keeps
the lighter side's mass per reducer. That case is output-dominated
anyway (|A_k|·|B_k| pairs — ``est_output_rows`` exposes the blowup
before execution); the escalation is a 2-D block grid (split both
sides, join block pairs), the same topology ``api.py`` already uses
for the KMV overlap matrix, at the cost of R_a·R_b replication.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["plan_equijoin", "smart_equijoin"]

_SALT = "_tg_salt"


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's own size estimate for the frame's optimized logical
    plan (file-size based for scans) — the SAME signal
    ``spark.sql.autoBroadcastJoinThreshold`` consults. None when the
    JVM internals are unreachable (e.g. Spark Connect)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def _auto_broadcast_bytes(spark) -> int:
    """Parse spark.sql.autoBroadcastJoinThreshold (supports the b/k/m/g
    suffixes Spark accepts); -1 (disabled) maps to 0."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[: -len(suf)], m
            break
    try:
        val = int(raw) * mult
    except ValueError:
        return 10 << 20
    return max(val, 0)


def plan_equijoin(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    broadcast_rows: int = 1_000_000,
    broadcast_bytes: int | None = None,
    hot_factor: float = 2.0,
    max_replication: int = 64,
    partitions: int | None = None,
    sample_fraction: float = 1.0,
    sketch_a=None,
    sketch_b=None,
    p: int = 14,
    depth: int = 5,
    width: int = 8192,
    mg_k: int = 256,
) -> dict:
    """Profile both join keys (ONE map-side scan per input, no shuffle
    of either) and decide the strategy. Returns::

        {strategy: "broadcast_a"|"broadcast_b"|"salted"|"shuffle",
         est_output_rows,              # AGMS inner product
         profile_a, profile_b,         # key_profile dicts
         hot_keys, replication,        # salted-path parameters
         salt_side,                    # salted plans only: "a"|"b"
         partitions, reasons,
         hints: {bloom_prune: bool}}   # always present

    Broadcast eligibility uses TWO signals, either qualifies:
    ``broadcast_rows`` (profiled row count; default 1M rows ~ a
    dimension that still fits executor memory comfortably) and
    Catalyst's own optimized-plan size estimate vs
    ``spark.sql.autoBroadcastJoinThreshold`` — the exact signal
    Catalyst itself would use, so the planner never salts a join
    Catalyst was going to broadcast anyway. Pass ``broadcast_bytes``
    to override the session threshold (0 disables the byte signal —
    how the driver gate and pytest force the salted path on test-scale
    dims that would really be broadcast).

    Hot keys come from each side's Misra-Gries candidates: key k is hot
    when its one-sided UPPER bound (est + err, never an undercount)
    exceeds ``hot_factor`` × the uniform per-reducer share n/P on its
    side. MG guarantees no false negatives above n/(mg_k+1), so with
    default mg_k=256 any key above ~0.4 % of rows is considered —
    far below the 2×-uniform threshold at any realistic P.

    ``replication`` sizes the salt space so the hottest salted key's
    per-reducer slice shrinks back to ~the uniform share, capped at
    ``max_replication`` (each unit of R duplicates the OTHER side's hot
    rows once — R is a broadcast-style amplification, so it must stay
    bounded).

    ``sample_fraction`` < 1 profiles a deterministic Bernoulli sample
    of the LARGER side (by Catalyst's byte estimate; ties/unknown →
    side a) instead of its full rows, cutting the Arrow/Python profile
    cost there by ~1/fraction (the joinstress leg measured the
    full-input profile at ~2x the join itself on 40M+20M rows). The
    smaller side is always profiled exactly: sampling BOTH sides makes
    the AGMS output estimate collapse when a dominant key's few
    small-side rows are dropped — measured as a 31% underestimate at
    fraction=0.2 on a 30%-hot-key input — while one-sided sampling
    keeps it unbiased with binomial concentration over the many
    sampled rows. The skew decision is scale-free under sampling
    (hot-key upper bound and uniform share both scale by the
    fraction); the sampled side's row count and the output estimate
    are rescaled by 1/f. Keep the fraction >= ~0.05 so a 2x-uniform
    hot key's sampling error stays negligible. The returned profile
    dicts are of what was scanned (raw, unscaled); decision fields are
    scaled.

    ``sketch_a`` / ``sketch_b``: a PRECOMPUTED profile MultiSketch for
    that side (the :func:`tgdigest_spark.api.key_profile_sketch`
    shape), e.g. merged from a persisted day-grain profile table
    maintained by the leaf-stream/nightly jobs — planning then costs
    ZERO scans of that input. The two Count-Sketch children must share
    (depth, width) or the AGMS inner product raises. A precomputed
    sketch is never sampled or rescaled: it is trusted as a full-input
    profile."""
    from ..api import key_profile_sketch, profile_from_sketch

    if partitions is None:
        partitions = int(
            df_a.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    if not (0.0 < sample_fraction <= 1.0):
        raise ValueError("sample_fraction must be in (0, 1]")
    bytes_a = _plan_size_bytes(df_a)
    bytes_b = _plan_size_bytes(df_b)
    scale_a = scale_b = 1.0
    prof_in_a, prof_in_b = df_a, df_b
    if sample_fraction < 1.0:
        # sample ONLY the larger side; if that side is precomputed,
        # sample nothing — falling through to the smaller side would
        # reintroduce the dominant-key estimate collapse one-sided
        # sampling exists to avoid, for zero cost benefit
        sample_b = (
            bytes_a is not None
            and bytes_b is not None
            and bytes_b > bytes_a
        )
        if sample_b:
            if sketch_b is None:
                prof_in_b = df_b.sample(sample_fraction, seed=9173)
                scale_b = 1.0 / sample_fraction
        elif sketch_a is None:
            prof_in_a = df_a.sample(sample_fraction, seed=9173)
            scale_a = 1.0 / sample_fraction
    sk_a = (
        sketch_a
        if sketch_a is not None
        else key_profile_sketch(prof_in_a, key_a, p, depth, width, mg_k)
    )
    sk_b = (
        sketch_b
        if sketch_b is not None
        else key_profile_sketch(prof_in_b, key_b, p, depth, width, mg_k)
    )
    if sketch_a is not None:
        scale_a = 1.0
    if sketch_b is not None:
        scale_b = 1.0
    from ..sketches.multi import MultiSketch

    for sk, tag in ((sk_a, "a"), (sk_b, "b")):
        if not isinstance(sk, MultiSketch) or len(sk.children) != 3:
            raise ValueError(
                f"sketch_{tag} must be a key_profile_sketch-shaped "
                f"MultiSketch (HLL, CountSketch, FrequentItems)"
            )
    prof_a = profile_from_sketch(sk_a)
    prof_b = profile_from_sketch(sk_b)
    cs_a, cs_b = sk_a.children[1], sk_b.children[1]
    mg_a, mg_b = sk_a.children[2], sk_b.children[2]
    est_out = int(cs_a.inner_product(cs_b) * scale_a * scale_b)

    reasons: list[str] = []
    n_a = int(prof_a["n_rows"] * scale_a)
    n_b = int(prof_b["n_rows"] * scale_b)

    # -- broadcast: the smaller side, if it qualifies by rows OR by
    # Catalyst's own byte estimate (a row threshold alone second-guesses
    # Catalyst: the first joinstress run had the planner salt a join
    # whose dim compressed under autoBroadcastJoinThreshold, so every
    # branch ran as BHJ anyway and the salt was pure overhead) ----------
    auto_bc = (
        _auto_broadcast_bytes(df_a.sparkSession)
        if broadcast_bytes is None
        else broadcast_bytes
    )
    # test BOTH sides on both signals (a row-smaller side can be
    # byte-bigger and vice versa — wide vs narrow rows); among the
    # qualifying sides broadcast the row-smaller one
    fitting = []
    for n, tag, by in ((n_a, "a", bytes_a), (n_b, "b", bytes_b)):
        fits_rows = n <= broadcast_rows
        fits_bytes = by is not None and 0 < by <= auto_bc
        if fits_rows or fits_bytes:
            fitting.append((n, tag, by, fits_rows))
    if fitting:
        small_n, small_tag, small_bytes, fits_rows = min(fitting)
        why = (
            f"~{small_n} rows <= broadcast_rows={broadcast_rows}"
            if fits_rows
            else f"Catalyst stats ~{small_bytes}B <= "
            f"autoBroadcastJoinThreshold={auto_bc}B"
        )
        reasons.append(
            f"side {small_tag}: {why} — broadcast it, zero shuffle of "
            f"the big side"
        )
        return {
            "strategy": f"broadcast_{small_tag}",
            "est_output_rows": est_out,
            "profile_a": prof_a,
            "profile_b": prof_b,
            "hot_keys": [],
            "replication": 1,
            "partitions": partitions,
            "reasons": reasons,
            # known-False, not absent: broadcast never shuffles the
            # fact, so there is nothing for a runtime filter to save
            "hints": {"bloom_prune": False},
        }

    # -- hot keys: MG upper bounds vs the uniform reducer share ----------
    # (ratio computed in the SAMPLE domain — ub and share both scale by
    # the fraction, so the test is identical to the full-input one)
    hot: dict[str, float] = {}
    worst_ratio = 1.0
    hot_mass = {"a": 0.0, "b": 0.0}  # scaled hot-row upper bounds
    for mg, prof, sc, tag in (
        (mg_a, prof_a, scale_a, "a"),
        (mg_b, prof_b, scale_b, "b"),
    ):
        n = prof["n_rows"]
        if n == 0:
            continue
        share = n / partitions
        for item, est in mg.items():
            ub = est + mg.err
            if ub > hot_factor * share:
                hot[item] = max(hot.get(item, 0.0), ub / share)
                worst_ratio = max(worst_ratio, ub / share)
                hot_mass[tag] += ub * sc
                reasons.append(
                    f"key {item!r} on side {tag}: <= {int(ub * sc)} "
                    f"rows is {ub / share:.1f}x the uniform reducer "
                    f"share {share * sc:.0f}"
                )
    if hot:
        repl = min(max_replication, max(2, math.ceil(worst_ratio)))
        # salt the side that actually CARRIES the hot rows (its rows
        # spread over the sub-keys; the other side's hot rows are
        # replicated) — salting the light side would leave the heavy
        # side's per-reducer input unchanged while multiplying it by R
        salt_side = "a" if hot_mass["a"] >= hot_mass["b"] else "b"
        reasons.append(
            f"salting {len(hot)} hot key(s) on side {salt_side} "
            f"(hot mass a~{int(hot_mass['a'])} vs "
            f"b~{int(hot_mass['b'])}) over {repl} sub-keys; "
            f"cold remainder joins plain"
        )
        return {
            "strategy": "salted",
            "est_output_rows": est_out,
            "profile_a": prof_a,
            "profile_b": prof_b,
            "hot_keys": sorted(hot),
            "replication": repl,
            "salt_side": salt_side,
            "partitions": partitions,
            "reasons": reasons,
            "hints": _prune_hint(est_out, n_a, n_b, reasons),
        }

    reasons.append(
        "no side broadcastable and no key above the hot threshold: "
        "plain shuffle join (AQE handles residual imbalance)"
    )
    return {
        "strategy": "shuffle",
        "est_output_rows": est_out,
        "profile_a": prof_a,
        "profile_b": prof_b,
        "hot_keys": [],
        "replication": 1,
        "partitions": partitions,
        "reasons": reasons,
        "hints": _prune_hint(est_out, n_a, n_b, reasons),
    }


def _prune_hint(est_out: int, n_a: int, n_b: int,
                reasons: list[str]) -> dict:
    """Selective-join hint for the two SHUFFLING strategies: when the
    AGMS output estimate is far below the bigger input, most of that
    input's rows have no match and a dim-side Bloom below the shuffle
    (:func:`tgdigest_spark.api.bloom_prune_join`) removes them before
    they move — the runtime-filter rule, driven by the same profile
    scans. Broadcast plans never shuffle the fact, so no hint there."""
    big = max(n_a, n_b)
    selective = big > 0 and est_out < 0.5 * big
    if selective:
        reasons.append(
            f"est output {est_out} << bigger input {big}: a dim-side "
            f"Bloom below the shuffle prunes non-matching fact rows "
            f"(api.bloom_prune_join)"
        )
    return {"bloom_prune": selective}


def _salt_expr(df: DataFrame, repl: int) -> Column:
    """Deterministic content-derived salt in [0, repl): xxhash64 over
    every column (retry/speculation-safe, unlike rand()); duplicate
    rows share a salt, which only costs salt-balance, not correctness."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.lit(0x7367)),
        F.lit(repl),
    ).cast("int")


def smart_equijoin(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    plan: dict | None = None,
    how: str = "inner",
    **plan_kwargs,
) -> DataFrame:
    """Equi-join executed under the :func:`plan_equijoin` decision.
    Output rows are exactly ``df_a JOIN df_b ON key_a = key_b`` with
    the given ``how`` under every strategy; only the physical topology
    differs.

    Pass a precomputed ``plan`` to reuse the profile scans (and to log
    or assert on the decision); otherwise one is computed here.

    ``how`` ∈ {"inner", "left_semi", "left_anti"} (Spark's
    leftsemi/semi/leftanti/anti aliases accepted). Outer joins are
    rejected: the salted path partitions the key space into hot/cold
    by value, and null keys — which never equi-match — fall out of
    both branches, which would silently drop outer-side rows. (Inner
    drops them by definition; semi keeps a left row only when a match
    EXISTS, so null-key rows are correctly dropped too; ANTI must keep
    them, so the anti cold branch routes null keys with a null-safe
    predicate.)

    ``left_semi`` / ``left_anti`` (the two decontamination-join
    shapes: keep fact rows whose key appears / does NOT appear in a
    benchmark set) first shrink
    ``df_b`` to its DISTINCT NON-NULL KEYS — semi only needs key
    existence on the right, so duplicates never reach a shuffle, the
    deduped side is usually broadcastable, and any surviving skew can
    only live on the left (a fresh plan is computed over the deduped
    side unless the caller supplies one built the same way). A
    ``broadcast_a`` decision is executed as a plain semi join —
    Spark's LeftSemi broadcast builds on the right side only. Cost
    note: the dedup is a hash aggregate whose shuffle is bounded by
    the distinct keys per partition (map-side partial dedup), and when
    the plan is computed internally it executes once for the profile
    scan and once in the join — pre-dedupe and persist the right side
    (or pass ``sketch_b``) to pay it once.

    For ``inner``, column names must be disjoint across the two inputs
    (the hot/cold union would otherwise produce ambiguous columns);
    rename before joining. ``left_semi`` output carries only the left
    side's columns, so same-named keys (the common decontamination
    shape) are fine."""
    aliases = {"leftsemi": "left_semi", "semi": "left_semi",
               "leftanti": "left_anti", "anti": "left_anti"}
    how = aliases.get(how, how)
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(
            f"how={how!r} unsupported (inner / left_semi / left_anti "
            f"only — outer joins would drop null-key rows across the "
            f"hot/cold split)"
        )
    if how == "inner":  # semi/anti output carries no right-side columns
        overlap = set(df_a.columns) & set(df_b.columns)
        if overlap:
            raise ValueError(
                f"column names must be disjoint across the join inputs; "
                f"shared: {sorted(overlap)} — rename before joining"
            )
    if _SALT in df_a.columns or _SALT in df_b.columns:
        raise ValueError(f"{_SALT!r} is reserved")
    if how in ("left_semi", "left_anti"):
        # existence joins only need the right side's distinct non-null
        # keys: duplicates never reach a shuffle
        df_b = (
            df_b.select(key_b)
            .where(F.col(key_b).isNotNull())
            .distinct()
        )
    if plan is None:
        plan = plan_equijoin(df_a, key_a, df_b, key_b, **plan_kwargs)
    cond = df_a[key_a] == df_b[key_b]
    strat = plan["strategy"]
    if strat == "broadcast_a":
        if how != "inner":  # LeftSemi/LeftAnti BHJ build right-side only
            return df_a.join(df_b, cond, how)
        return F.broadcast(df_a).join(df_b, cond, how)
    if strat == "broadcast_b":
        return df_a.join(F.broadcast(df_b), cond, how)
    if strat == "shuffle":
        return df_a.join(df_b, cond, how)
    if strat != "salted":
        raise ValueError(f"unknown strategy {strat!r}")

    hot = plan["hot_keys"]
    repl = int(plan["replication"])
    # hot keys were profiled as strings (key_profile casts); compare in
    # the string domain so the membership test matches the profile
    ka_s = F.col(key_a).cast("string")
    kb_s = F.col(key_b).cast("string")
    # ANTI keeps null-key left rows (they match nothing): route them
    # through the cold branch with a null-safe predicate — inner/semi
    # drop them anyway, so the plain ~isin (null -> filtered) is right
    a_cold_pred = (
        ~F.coalesce(ka_s.isin(hot), F.lit(False))
        if how == "left_anti"
        else ~ka_s.isin(hot)
    )
    a_cold = df_a.where(a_cold_pred)
    b_cold = df_b.where(~kb_s.isin(hot))
    cold = a_cold.join(b_cold, a_cold[key_a] == b_cold[key_b], how)

    # salt the hot-mass-carrying side's rows, replicate the other
    # side's across the salt space: every hot pair meets at exactly
    # one sub-key (plan["salt_side"], default "a" for hand-built
    # plans). Semi/anti joins keep LEFT rows, so side a is always the
    # salted left there — with the right side deduped to distinct
    # keys, it is also the only side that can carry hot mass. Anti
    # correctness under the split: a hot left row is dropped iff its
    # key exists in the replicated right, which holds at its own salt
    # exactly when the key exists at all.
    a_hot = df_a.where(ka_s.isin(hot))
    b_hot = df_b.where(kb_s.isin(hot))
    if how in ("left_semi", "left_anti") or plan.get("salt_side", "a") == "a":
        salted, salted_key = a_hot, key_a
        repl_df, repl_key = b_hot, key_b
    else:
        salted, salted_key = b_hot, key_b
        repl_df, repl_key = a_hot, key_a
    salted = salted.withColumn(_SALT, _salt_expr(salted, repl))
    replicated = repl_df.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
    )
    joined = salted.join(
        replicated,
        (salted[salted_key] == replicated[repl_key])
        & (salted[_SALT] == replicated[_SALT]),
        how,
    ).drop(salted[_SALT])
    if how == "inner":  # semi/anti output carries left columns only
        joined = joined.drop(replicated[_SALT])
    return cold.unionByName(joined)
