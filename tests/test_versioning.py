"""Corpus snapshot diff (extensions.versioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.versioning import (
    corpus_diff,
    diff_summary,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestCorpusDiff:
    def test_all_four_statuses(self, spark):
        old = _snap(spark, [(1, "a"), (2, "b"), (3, "c")])
        new = _snap(spark, [(2, "b"), (3, "c2"), (4, "d")])
        got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
        assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}

    def test_md5_sides_null_correctly(self, spark):
        old = _snap(spark, [(1, "a")])
        new = _snap(spark, [(2, "b")])
        rows = {r.doc_id: r for r in corpus_diff(old, new).collect()}
        assert rows[1].new_md5 is None and rows[1].old_md5 is not None
        assert rows[2].old_md5 is None and rows[2].new_md5 is not None

    def test_multi_column_fingerprint(self, spark):
        old = spark.createDataFrame([(1, "a", "en")], ["doc_id", "text", "lang"])
        new = spark.createDataFrame([(1, "a", "de")], ["doc_id", "text", "lang"])
        rows = corpus_diff(old, new, content_cols=["text", "lang"]).collect()
        assert rows[0].status == "changed"

    def test_summary_counts(self, spark):
        old = _snap(spark, [(1, "a"), (2, "b"), (3, "c")])
        new = _snap(spark, [(2, "b"), (3, "c2"), (4, "d"), (5, "e")])
        got = {
            r.status: r.n_docs
            for r in diff_summary(corpus_diff(old, new)).collect()
        }
        assert got == {"removed": 1, "unchanged": 1, "changed": 1, "added": 2}

    def test_single_keyed_join_no_python(self, spark):
        import contextlib
        import io

        old = _snap(spark, [(i, f"t{i}") for i in range(30)])
        new = _snap(spark, [(i, f"t{i}") for i in range(5, 35)])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            corpus_diff(old, new).explain("formatted")
        plan = buf.getvalue()
        assert plan.count("Join FullOuter") == 1
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_empty_sides(self, spark):
        empty = spark.createDataFrame([], "doc_id long, text string")
        old = _snap(spark, [(1, "a")])
        assert [r.status for r in corpus_diff(old, empty).collect()] == ["removed"]
        assert [r.status for r in corpus_diff(empty, old).collect()] == ["added"]
