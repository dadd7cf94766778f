"""Text analysis for training-data pipelines — built-ins only.

Every function here returns Column expressions composed from
pyspark.sql.functions (whole-stage codegen, zero Python), so each has a
1:1 SQL mirror for the DuckDB oracle (driver_queries).

* token_count      — \\S+ token counting (whitespace tokenizer)
* char_classes     — alpha/digit/punct/space counts
* quality_score    — composite [0,1] score from length, alpha ratio,
                     stopword hit ratio, mean word length sanity
* lang_id          — tiny stopword-list heuristic (en/de/fr/es + und)
* fingerprint      — 64-bit content fingerprint of normalized text
                     (xxhash64 of lowercased, whitespace-collapsed text)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "ist", "nicht"],
    "fr": ["le", "et", "les", "est", "que"],
    "es": ["el", "que", "los", "es", "una"],
}


def token_count(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))  # size(NULL) would be -1
    return F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0)).alias("token_cnt")


#: GPT-2-style pretokenizer pattern, simplified to the subset where
#: Java regex (Spark) and RE2 (DuckDB oracle) agree exactly: the
#: original's `\s+(?!\S)` lookahead is dropped (RE2 has no lookaround)
#: and the whitespace class is spelled out because `\s` itself
#: DIVERGES between the engines (Java \s includes vertical tab \x0B,
#: RE2's does not — a \x0B in the corpus would flip the oracle hash).
#: Alternation order matters and is identical in both engines
#: (leftmost-first): contractions, then space+letters, space+digits,
#: space+punctuation-run, whitespace-run.
_WS = " \\t\\n\\x0B\\f\\r"
BPE_PATTERN = (
    rf"'(?:s|t|re|ve|m|ll|d)| ?\p{{L}}+| ?\p{{N}}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+|[{_WS}]+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish pretoken count — the budget-estimation token counter a
    training pipeline runs corpus-wide (whitespace counting undercounts
    punctuation-heavy text badly; real BPE merges only subdivide these
    pretokens, so this upper-bounds merged-token granularity)."""
    t = F.coalesce(text, F.lit(""))
    return F.regexp_count(t, F.lit(BPE_PATTERN)).alias("bpe_token_cnt")


def alpha_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0)).alias("alpha_ratio")


def _stop_hits(text: Column, words: list[str]) -> Column:
    # coalesce: size(split(NULL)) is -1, which would push ratios negative
    toks = F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(toks, arr))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Distinct stopwords present / list size (set semantics — cheap and
    SQL-mirrorable)."""
    hits = _stop_hits(text, STOPWORDS[lang])
    return (hits / F.lit(len(STOPWORDS[lang]))).alias("stopword_ratio")


def mean_word_len(text: Column) -> Column:
    # sum of \S+ token lengths == count of non-whitespace chars, so this
    # stays in pure string built-ins (no array aggregation)
    n = token_count(text)
    nonws = F.length(F.regexp_replace(text, r"\s", ""))
    return (
        F.when(n > 0, nonws.cast("double") / n).otherwise(F.lit(0.0))
    ).alias("mean_word_len")


def quality_score(text: Column) -> Column:
    """Composite [0,1]: rewards sane length, letters, stopwords, and
    word lengths in [2, 12] — the usual cheap pre-filters before
    training-data inclusion."""
    # NULL text scores 0 everywhere (least() would otherwise skip the
    # null operand and give a perfect length score)
    t = F.coalesce(text, F.lit(""))
    n = F.length(t).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha = alpha_ratio(t)
    stop = stopword_ratio(t, "en")
    mwl = mean_word_len(t)
    mwl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        (len_score + alpha + F.least(stop * 2.0, F.lit(1.0)) + mwl_score) / 4.0
    ).alias("quality")


def lang_id(text: Column) -> Column:
    """argmax of per-language distinct-stopword hits; 'und' when all 0.

    Deterministic tie-break: language order en > de > fr > es.
    """
    hits = {lang: _stop_hits(text, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr.alias("lang_pred")


def fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of normalized text (case-folded,
    whitespace-collapsed) — the exact-dedup key at scale."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm).alias("fingerprint")


#: PII patterns — kept RE2-compatible (no lookaround) so the DuckDB
#: oracle can mirror them verbatim and executor-side Java regex agrees.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}\b",
}


def scrub_pii(text: Column) -> Column:
    """Redact emails / IPv4s / international phone numbers to
    ``[EMAIL]`` / ``[IP]`` / ``[PHONE]`` — the standard pre-training
    redaction pass, pure regexp_replace chain (codegen, no UDF).
    Order matters: emails first so their host parts aren't half-eaten
    by the IP pattern."""
    out = F.regexp_replace(text, PII_PATTERNS["email"], "[EMAIL]")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "[IP]")
    out = F.regexp_replace(out, PII_PATTERNS["phone"], "[PHONE]")
    return out.alias("scrubbed")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (regexp_count built-in)."""
    return {
        kind: F.regexp_count(text, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }


def repetition_stats(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Gopher-style repetition signals per doc: token count, distinct
    tokens, type-token ratio, and the most-frequent-token fraction.
    Shape: explode → count per (doc, token) → per-doc max/sum — the
    standard two-aggregation plan (first agg is map-side combinable;
    no window over raw tokens). Shingle-less docs get 0-token rows."""
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("tok"),
    ).where(F.col("tok") != "")
    per_tok = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    stats = per_tok.groupBy("id").agg(
        F.sum("c").alias("token_cnt"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.max("c").alias("max_tok"),
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("token_cnt", F.lit(0)).alias("token_cnt"),
            F.coalesce("distinct_tokens", F.lit(0)).alias("distinct_tokens"),
            F.when(
                F.col("token_cnt") > 0,
                F.col("distinct_tokens").cast("double")
                / F.col("token_cnt").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("ttr"),
            F.when(
                F.col("token_cnt") > 0,
                F.col("max_tok").cast("double")
                / F.col("token_cnt").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("max_token_frac"),
        )
    )


def repetition_filter(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_frac: float = 0.2,
    min_ttr: float = 0.2,
    min_tokens: int = 1,
):
    """Keep docs below the repetition thresholds. Token-less docs are
    exempt from the ratio conjuncts (their ttr/frac are defined as 0) —
    they survive iff ``min_tokens`` is 0."""
    from pyspark.sql import functions as F

    stats = repetition_stats(df, id_col, text_col)
    keep = stats.where(
        (F.col("token_cnt") >= min_tokens)
        & (
            (F.col("token_cnt") == 0)
            | (
                (F.col("max_token_frac") <= max_token_frac)
                & (F.col("ttr") >= min_ttr)
            )
        )
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
):
    """Split each document's token sequence into overlapping
    fixed-budget chunks — the context-window preprocessing step every
    training pipeline runs before packing/tokenization.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + max_tokens)``
    with ``stride = max_tokens - overlap``; the final chunk may be
    shorter, every token is covered at least once, and consecutive
    chunks share exactly ``overlap`` tokens (when a next chunk
    exists). Token = whitespace run (Java ``\\s+``, the engine-wide
    convention). Output: one row per chunk —
    ``(id, chunk_idx, chunk_text, chunk_tokens)``; a token-less
    (empty / whitespace-only) doc yields a single empty chunk with
    ``chunk_tokens = 0`` (it is not silently dropped, and it does not
    over-count as one token in downstream budgets).

    Scale shape: pure built-in expressions (split / sequence /
    posexplode / slice / array_join) — whole-stage codegen, no UDF, no
    shuffle; fan-out ≈ n_tokens/stride per doc. Fully SQL-expressible
    (DuckDB list_slice/list_transform) → oracle-exact
    (driver_queries.chunk_docs_digest).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not (0 <= overlap < max_tokens):
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # drop empty split artifacts: split('') yields [''] and Spark trim
    # strips only 0x20, so an empty / whitespace-only doc (or stray
    # leading/trailing tabs) would otherwise report phantom tokens and
    # over-count in downstream token budgets. Filtering '' out of the
    # split handles every case uniformly (interior empties cannot
    # occur with a \\s+ separator); oracle mirrors with list_filter.
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    n = F.size(toks)
    # number of stride-starts needed so the last chunk reaches token n:
    # 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(max_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunk = F.slice(
        F.col("_toks"), F.col("_ci") * F.lit(stride) + 1, max_tokens
    )
    return (
        df.select(
            id_col,
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("_ci"),
        )
        .select(
            id_col,
            F.col("_ci").alias("chunk_idx"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("chunk_tokens"),
        )
    )


def annotate(df, text_col: str = "text"):
    """Attach the full analysis column set to a documents DataFrame."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t),
        alpha_ratio(t),
        quality_score(t),
        lang_id(t),
        fingerprint(t),
    )
