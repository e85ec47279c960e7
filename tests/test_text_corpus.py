"""JSONL corpus ingest (sources/text_corpus.py): declared-schema reads,
corrupt-line quarantine, and the sharded-export round trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.sources.text_corpus import (
    CORRUPT_COL,
    read_jsonl_corpus,
    split_corrupt,
)

SCHEMA = "doc_id long, text string, lang string"

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "line\\nwith\\tescapes \\"q\\"", "lang": "de"}',
    '{"doc_id": 3, "text": "ünïcödé 中文", "lang": "fr"}',
]
BAD = [
    '{"doc_id": 4, "text": "truncated...',
    "not json at all",
]


def _write(tmp_path, lines, name="part-0.json"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(tmp_path)


def test_failfast_reads_clean_corpus(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    out = read_jsonl_corpus(spark, path, SCHEMA).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert out[1]["text"] == 'line\nwith\tescapes "q"'  # escapes round-trip
    assert out[2]["text"] == "ünïcödé 中文"  # encoding round-trips


def test_failfast_aborts_on_corrupt_line(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    with pytest.raises(Exception):
        read_jsonl_corpus(spark, path, SCHEMA).collect()


def test_permissive_quarantines_corrupt_lines(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    df = read_jsonl_corpus(spark, path, SCHEMA, mode="PERMISSIVE")
    assert CORRUPT_COL in df.columns
    good, bad = split_corrupt(df)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2, 3]
    raw_bad = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert raw_bad == sorted(BAD)  # raw lines preserved for quarantine
    assert CORRUPT_COL not in good.columns
    # the one-scan cache is generation-owned (r6 advice: 2-tuple API,
    # cachereg releases it): a second call or an explicit release drops
    # the blocks, so repeated PERMISSIVE cycles can't accumulate storage
    from sqlbackuphistoryetl_spark.extensions import cachereg

    live = cachereg._LIVE.get("text_corpus.split_corrupt", [])
    assert len(live) == 1 and live[0].is_cached
    pinned = live[0]
    cachereg.release_caches("text_corpus.split_corrupt")
    assert not cachereg._LIVE.get("text_corpus.split_corrupt")
    assert not pinned.is_cached


def test_split_corrupt_requires_permissive(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    with pytest.raises(ValueError):
        split_corrupt(read_jsonl_corpus(spark, path, SCHEMA))


def test_sharded_export_roundtrip(spark, tmp_path):
    """write_sharded_jsonl → read_jsonl_corpus is lossless and the
    shard partition column surfaces from the directory layout."""
    from sqlbackuphistoryetl_spark.extensions.sharding import (
        write_sharded_jsonl,
    )

    rows = [(i, f"doc {i} body", "en") for i in range(25)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out_dir = str(tmp_path / "shards")
    n_shards = write_sharded_jsonl(docs, out_dir, ["doc_id"], shard_size=10)
    assert n_shards == 3
    back = read_jsonl_corpus(
        spark, out_dir, SCHEMA + ", ordinal long"
    )
    got = back.orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"], r["lang"]) for r in got] == rows
    assert [r["ordinal"] for r in got] == list(range(25))  # stable order
    assert "shard" in back.columns  # partition discovery supplies it
    assert back.filter(F.col("shard") == 0).count() == 10


def test_split_sentences(spark):
    from sqlbackuphistoryetl_spark.functions.textfns import split_sentences

    docs = spark.createDataFrame(
        [
            (1, "First one. Second!  Third?! trailing tail"),
            (2, "no terminal punctuation at all"),
            (3, "..."),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = split_sentences(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sentence"]))
    assert [s for _, s in sorted(by_doc[1])] == [
        "First one.", "Second!", "Third?!", "trailing tail",
    ]
    assert by_doc[2] == [(0, "no terminal punctuation at all")]
    assert by_doc[3] == [(0, "...")]  # bare punctuation is one run
    assert 4 not in by_doc and 5 not in by_doc  # empty/NULL: no rows
    assert all(r["n_chars"] == len(r["sentence"]) for r in rows)
