"""End-to-end curation pipeline (plans/curation_pipeline.py): the
composed operators produce a monotone funnel with each stage's known
effect visible on a corpus with planted defects."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.plans.curation_pipeline import curate_corpus


def _corpus(spark):
    """sf0.001 documents with planted defects: one exact dup, one
    boilerplate header on every doc, one absurd-length outlier."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.select(
        "doc_id", "lang", "source",
        F.concat(F.lit("SHARED HEADER\n"), F.col("text")).alias("text"),
    )
    dup = base.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "lang", "source", "text"
    )
    outlier = spark.createDataFrame(
        [(200000, "en", "web", "SHARED HEADER\n" + "word " * 5000)],
        ["doc_id", "lang", "source", "text"],
    )
    return base.unionByName(dup).unionByName(outlier)


def test_pipeline_funnel_monotone_and_effective(spark):
    docs, spans, rep = curate_corpus(
        _corpus(spark), per_source_cap=1000, temperature_target=10_000
    )
    c = rep.stage_counts
    # monotone funnel
    order = ["input", "exact_dedup", "near_dedup", "boilerplate",
             "outlier_trim", "source_cap", "temperature"]
    for a, b in zip(order, order[1:]):
        assert c[b] <= c[a], (a, b, c)
    # planted exact dup gone (min-id survivor keeps doc 3)
    assert c["exact_dedup"] == c["input"] - 1
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert 100000 not in ids
    # the 5000-token outlier was trimmed
    assert 200000 not in ids
    # boilerplate header stripped from every surviving doc
    assert docs.filter(F.col("text").contains("SHARED HEADER")).count() == 0
    # split column present and packing covers the train split's tokens
    assert set(r["split"] for r in docs.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    n_train_tok = docs.filter(F.col("split") == "train").agg(
        F.sum("n_tok")).first()[0]
    span_tok = spans.agg(F.sum("slice_tokens")).first()[0]
    assert span_tok == n_train_tok
    assert c["packed_spans"] == spans.count()


def test_pipeline_no_report_skips_counts(spark):
    docs, spans, rep = curate_corpus(_corpus(spark), report=False)
    assert rep.stage_counts == {}
    assert docs.count() > 0
