"""JSONL transcripts source/sink — the interchange format of
training-data pipelines (one JSON object per line, gzip-friendly).

Reading ALWAYS passes an explicit schema: schema inference triggers an
extra full pass over the data (a 100-TB no-go) and silently widens
types on dirty rows. Corrupt lines land in a `_corrupt` column
(PERMISSIVE mode) instead of failing the job or being dropped
invisibly — a pipeline must be able to COUNT what it rejected.

The parquet layout (sources/transcripts.py) remains the performance
home: JSONL is the ingest/egress edge, `jsonl_to_table` is the
one-pass conversion into the partitioned, sorted layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .transcripts import TRANSCRIPTS_SCHEMA, write_transcripts_table

_CORRUPT = "_corrupt"


def read_transcripts_jsonl(spark, path: str) -> DataFrame:
    """JSONL → typed transcript rows + `_corrupt` (raw line for rows
    that failed to parse; NULL otherwise)."""
    schema = f"{TRANSCRIPTS_SCHEMA}, {_CORRUPT} string"
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the _corrupt column, quarantined raw lines).

    Persists the parsed frame: Spark refuses to answer queries that
    reference ONLY the internal corrupt-record column from a raw JSON
    scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both outputs consume
    the same parse anyway. Long-lived sessions should release the cache
    afterwards via ``clean.release_cache()`` (captured before further
    transformations — unpersist() on a DERIVED frame does not release
    the parent's storage)."""
    df = df.persist()
    clean = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.where(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
    clean.release_cache = lambda: df.unpersist()
    return clean, bad


def jsonl_to_table(spark, jsonl_path: str, table_path: str) -> dict:
    """One-pass ingest: JSONL → partitioned/sorted parquet layout.
    Returns {'rows': n, 'corrupt': m} so the caller can alert on m."""
    raw = read_transcripts_jsonl(spark, jsonl_path)
    clean, bad = split_corrupt(raw)  # persists the parse
    release = clean.release_cache
    n_bad = bad.count()
    write_transcripts_table(clean, table_path)
    n = spark.read.parquet(table_path).count()
    release()
    return {"rows": int(n), "corrupt": int(n_bad)}


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Egress: DataFrame → JSONL (optionally gzip'd), e.g. the cleaned
    corpus handed to a tokenizer."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
