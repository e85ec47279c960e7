"""Feature-hashed text embeddings (extensions/similarity.py:
embed_hashed_text, r12): md5 bucketing/sign parity with a from-scratch
reference, zero/empty handling, bigram toggle, vector-stack bridge."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.similarity import (
    embed_hashed_text,
    semdedup_prune,
)


def _ref(text, dim, bigrams=True):
    ws = text.split()
    grams = list(ws)
    if bigrams:
        grams += [" ".join(p) for p in zip(ws, ws[1:])]
    v = [0] * dim
    for g in grams:
        h = hashlib.md5(g.encode()).hexdigest()
        v[int(h[:8], 16) % dim] += 1 if h[8] in "01234567" else -1
    ss = sum(x * x for x in v)
    return [x / math.sqrt(ss) if ss else 0.0 for x in v], len(grams)


ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat"),
    (3, "a completely different document about spark shuffles"),
    (4, ""),
    (5, None),
]


def _out(spark, dim=16, **kw):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in embed_hashed_text(df, dim=dim, **kw).collect()
    }


def test_parity_with_reference(spark):
    got = _out(spark, dim=16)
    for doc_id, text in ROWS[:3]:
        vec, n = _ref(text, 16)
        assert got[doc_id]["n_grams"] == n
        assert list(got[doc_id]["embedding"]) == vec  # bit-exact


def test_identical_text_identical_vector(spark):
    got = _out(spark)
    assert list(got[1]["embedding"]) == list(got[2]["embedding"])
    assert list(got[1]["embedding"]) != list(got[3]["embedding"])


def test_empty_and_null_text_zero_vector(spark):
    got = _out(spark)
    for d in (4, 5):
        assert got[d]["n_grams"] == 0
        assert list(got[d]["embedding"]) == [0.0] * 16


def test_unit_norm(spark):
    got = _out(spark, dim=32)
    ss = sum(x * x for x in got[1]["embedding"])
    assert abs(ss - 1.0) < 1e-12


def test_bigram_toggle(spark):
    got = _out(spark, include_bigrams=False)
    vec, n = _ref(ROWS[0][1], 16, bigrams=False)
    assert got[1]["n_grams"] == n == 6
    assert list(got[1]["embedding"]) == vec


def test_dim_validation(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError):
        embed_hashed_text(df, dim=1)


def test_bridges_into_semdedup(spark):
    """End-to-end: text -> hashed vectors -> semdedup_prune. The two
    identical docs land in one cell and the higher id is pruned."""
    df = spark.createDataFrame(ROWS[:3], "doc_id long, text string")
    emb = embed_hashed_text(df, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    out = {r["vec_id"]: r for r in
           semdedup_prune(emb, k_clusters=2, threshold=0.9).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False  # exact duplicate of 1, higher id
    assert out[3]["keep"] is True
