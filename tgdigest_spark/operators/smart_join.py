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
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["plan_equijoin", "smart_equijoin"]

_SALT = "_tg_salt"


def plan_equijoin(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    broadcast_rows: int = 1_000_000,
    hot_factor: float = 2.0,
    max_replication: int = 64,
    partitions: int | None = None,
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
         partitions, reasons}

    ``broadcast_rows`` is a row-count threshold, not bytes — callers
    who know row width can scale it; the default 1M rows is ~the size
    where a dimension still fits executor memory comfortably.

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
    bounded)."""
    from ..api import key_profile_sketch, profile_from_sketch

    if partitions is None:
        partitions = int(
            df_a.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    sk_a = key_profile_sketch(df_a, key_a, p, depth, width, mg_k)
    sk_b = key_profile_sketch(df_b, key_b, p, depth, width, mg_k)
    prof_a = profile_from_sketch(sk_a)
    prof_b = profile_from_sketch(sk_b)
    cs_a, cs_b = sk_a.children[1], sk_b.children[1]
    mg_a, mg_b = sk_a.children[2], sk_b.children[2]
    est_out = cs_a.inner_product(cs_b)

    reasons: list[str] = []
    n_a, n_b = prof_a["n_rows"], prof_b["n_rows"]

    # -- broadcast: the smaller side, if it qualifies --------------------
    small_n, small_tag = min((n_a, "a"), (n_b, "b"))
    if small_n <= broadcast_rows:
        reasons.append(
            f"side {small_tag} has ~{small_n} rows <= broadcast_rows="
            f"{broadcast_rows}: broadcast it, zero shuffle of the big side"
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
        }

    # -- hot keys: MG upper bounds vs the uniform reducer share ----------
    hot: dict[str, float] = {}
    worst_ratio = 1.0
    for mg, n, tag in ((mg_a, n_a, "a"), (mg_b, n_b, "b")):
        if n == 0:
            continue
        share = n / partitions
        for item, est in mg.items():
            ub = est + mg.err
            if ub > hot_factor * share:
                hot[item] = max(hot.get(item, 0.0), ub / share)
                worst_ratio = max(worst_ratio, ub / share)
                reasons.append(
                    f"key {item!r} on side {tag}: <= {ub} rows is "
                    f"{ub / share:.1f}x the uniform reducer share "
                    f"{share:.0f}"
                )
    if hot:
        repl = min(max_replication, max(2, math.ceil(worst_ratio)))
        reasons.append(
            f"salting {len(hot)} hot key(s) over {repl} sub-keys; "
            f"cold remainder joins plain"
        )
        return {
            "strategy": "salted",
            "est_output_rows": est_out,
            "profile_a": prof_a,
            "profile_b": prof_b,
            "hot_keys": sorted(hot),
            "replication": repl,
            "partitions": partitions,
            "reasons": reasons,
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
    }


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
    **plan_kwargs,
) -> DataFrame:
    """INNER equi-join executed under the :func:`plan_equijoin`
    decision. Output rows are exactly ``df_a JOIN df_b ON key_a =
    key_b`` under every strategy; only the physical topology differs.

    Pass a precomputed ``plan`` to reuse the profile scans (and to log
    or assert on the decision); otherwise one is computed here.

    Inner joins only: the salted path partitions the key space into
    hot/cold by value, and null keys — which never equi-match — fall
    out of both branches, which would silently drop outer-side rows if
    outer semantics were allowed. Column names must be disjoint across
    the two inputs (the hot/cold union would otherwise produce
    ambiguous columns); rename before joining."""
    overlap = set(df_a.columns) & set(df_b.columns)
    if overlap:
        raise ValueError(
            f"column names must be disjoint across the join inputs; "
            f"shared: {sorted(overlap)} — rename before joining"
        )
    if _SALT in df_a.columns or _SALT in df_b.columns:
        raise ValueError(f"{_SALT!r} is reserved")
    if plan is None:
        plan = plan_equijoin(df_a, key_a, df_b, key_b, **plan_kwargs)
    cond = df_a[key_a] == df_b[key_b]
    strat = plan["strategy"]
    if strat == "broadcast_a":
        return F.broadcast(df_a).join(df_b, cond, "inner")
    if strat == "broadcast_b":
        return df_a.join(F.broadcast(df_b), cond, "inner")
    if strat == "shuffle":
        return df_a.join(df_b, cond, "inner")
    if strat != "salted":
        raise ValueError(f"unknown strategy {strat!r}")

    hot = plan["hot_keys"]
    repl = int(plan["replication"])
    # hot keys were profiled as strings (key_profile casts); compare in
    # the string domain so the membership test matches the profile
    ka_s = F.col(key_a).cast("string")
    kb_s = F.col(key_b).cast("string")
    a_cold = df_a.where(~ka_s.isin(hot))
    b_cold = df_b.where(~kb_s.isin(hot))
    cold = a_cold.join(b_cold, a_cold[key_a] == b_cold[key_b], "inner")

    # salt the A side's hot rows, replicate the B side's across the
    # salt space: every (a, b) hot pair meets at exactly one sub-key
    a_hot = df_a.where(ka_s.isin(hot))
    b_hot = df_b.where(kb_s.isin(hot))
    a_salted = a_hot.withColumn(_SALT, _salt_expr(a_hot, repl))
    b_repl = b_hot.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
    )
    hot_join = (
        a_salted.join(
            b_repl,
            (a_salted[key_a] == b_repl[key_b])
            & (a_salted[_SALT] == b_repl[_SALT]),
            "inner",
        )
        .drop(a_salted[_SALT])
        .drop(b_repl[_SALT])
    )
    return cold.unionByName(hot_join)
