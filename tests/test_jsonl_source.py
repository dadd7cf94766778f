"""JSONL source/sink: explicit-schema read, corrupt-line quarantine,
round-trip into the partitioned layout and back out."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from tgdigest_spark.sources.jsonl import (
    jsonl_to_table,
    read_transcripts_jsonl,
    split_corrupt,
    write_jsonl,
)


def _write_jsonl_file(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_quarantines_corrupt_lines(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    _write_jsonl_file(
        p,
        [
            '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,"ts":"2024-01-01T00:00:00"}',
            '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"hello","tool":"search","ts":"2024-01-01T00:00:05"}',
            "{this is not json",
            '{"conv_id":"c2","turn_idx":0,"role":"user","text":"x","tool":null,"ts":"2024-01-02T10:00:00"}',
        ],
    )
    raw = read_transcripts_jsonl(spark, p)
    clean, bad = split_corrupt(raw)
    assert clean.count() == 3
    assert bad.count() == 1
    assert "{this is not json" in bad.collect()[0]["_corrupt"]
    row = clean.where(F.col("turn_idx") == 1).collect()[0]
    assert row["role"] == "assistant" and row["tool"] == "search"


def test_jsonl_to_table_roundtrip(spark, tmp_path):
    p = str(tmp_path / "in2.jsonl")
    lines = [
        f'{{"conv_id":"c{i % 3}","turn_idx":{i},"role":"user",'
        f'"text":"turn {i}","tool":null,'
        f'"ts":"2024-01-{(i % 5) + 1:02d}T00:00:{i % 60:02d}"}}'
        for i in range(50)
    ]
    _write_jsonl_file(p, lines + ["not json at all"])
    out = str(tmp_path / "tbl")
    stats = jsonl_to_table(spark, p, out)
    assert stats == {"rows": 50, "corrupt": 1}
    # layout contract: day-partitioned dirs
    assert any(d.startswith("ts_day=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == 50
    # per-turn text equality under stable ordering (input_hint invariant)
    texts = [
        r["text"]
        for r in back.orderBy("conv_id", "turn_idx").select("text").collect()
    ]
    assert texts == [
        f"turn {i}"
        for i in sorted(range(50), key=lambda i: (f"c{i % 3}", i))
    ]


def test_write_jsonl_egress(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "clean text"), (2, "more text")], "doc_id long, text string"
    )
    out = str(tmp_path / "egress")
    write_jsonl(df, out, compression="gzip")
    parts = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert parts
    payload = "".join(
        gzip.open(os.path.join(out, p), "rt").read() for p in parts
    )
    assert '"text":"clean text"' in payload
    back = spark.read.schema("doc_id long, text string").json(out)
    assert {r["doc_id"] for r in back.collect()} == {1, 2}
