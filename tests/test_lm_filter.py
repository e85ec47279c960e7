"""Unit tests for the CCNet-style bigram-LM perplexity filter
(extensions/lm_filter.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.lm_filter import (
    _MICRO,
    ccnet_bucket,
    ccnet_perplexity_buckets,
    pmi_collocations,
    score_nll,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


CORPUS = [
    (1, "the cat sat", "en"),
    (2, "the cat ran", "en"),
    (3, "zx qq zz", "en"),
    (4, "solo", "en"),
    (5, "le chat", "fr"),
]
# vocab: the cat sat ran zx qq zz solo le chat -> 10 distinct
V = 10


def _u(c1, c12):
    return round(math.log((c1 + V) / (c12 + 1)) * _MICRO)


class TestTrainScore:
    def test_counts_and_vocab(self, spark):
        c12, c1, v = train_bigram_lm(_docs(spark, CORPUS))
        assert v == V
        pairs = {(r["w1"], r["w2"]): r["c12"] for r in c12.collect()}
        assert pairs[("the", "cat")] == 2
        assert pairs[("cat", "sat")] == 1
        assert ("sat", "the") not in pairs  # bigrams never cross docs
        ctx = {r["w1"]: r["c1"] for r in c1.collect()}
        assert ctx == {"the": 2, "cat": 2, "zx": 1, "qq": 1, "le": 1}

    def test_nll_matches_hand_math(self, spark):
        df = _docs(spark, CORPUS)
        c12, c1, v = train_bigram_lm(df)
        got = {
            r["doc_id"]: r
            for r in score_nll(df, c12, c1, v, keep_cols=["lang"]).collect()
        }
        exp1 = _u(2, 2) + _u(2, 1)  # (the,cat) + (cat,sat)
        assert got[1]["nll_u"] == exp1
        assert got[1]["nll"] == exp1 / (2 * _MICRO)
        assert got[1]["n_bigrams"] == 2

    def test_short_doc_is_null_scored(self, spark):
        df = _docs(spark, CORPUS)
        c12, c1, v = train_bigram_lm(df)
        r = {
            x["doc_id"]: x for x in score_nll(df, c12, c1, v).collect()
        }[4]
        assert (r["n_bigrams"], r["nll_u"], r["nll"]) == (0, 0, None)

    def test_null_keep_col_keeps_score(self, spark):
        """r6 advice regression: a doc with a NULL keep column (lang)
        must keep its real score — the join-back keys on the doc id
        only, so NULL lang can't null-match it into n_bigrams = 0."""
        df = spark.createDataFrame(
            [(1, "the cat sat", None), (2, "the cat sat", "en")],
            "doc_id long, text string, lang string",
        )
        c12, c1, v = train_bigram_lm(df)
        got = {
            r["doc_id"]: r
            for r in score_nll(df, c12, c1, v, keep_cols=["lang"]).collect()
        }
        assert got[1]["lang"] is None
        assert got[1]["n_bigrams"] == 2
        assert got[1]["nll_u"] == got[2]["nll_u"] != 0

    def test_oov_scores_as_unseen(self, spark):
        train = _docs(spark, CORPUS)
        c12, c1, v = train_bigram_lm(train)
        test = _docs(spark, [(9, "totally novel words", "en")])
        r = score_nll(test, c12, c1, v).collect()[0]
        # both bigrams unseen, both contexts unseen: ln((0+V)/(0+1))
        assert r["nll_u"] == 2 * round(math.log(V) * _MICRO)

    def test_min_count_prunes_bigrams(self, spark):
        df = _docs(spark, CORPUS)
        c12, c1, v = train_bigram_lm(df, min_count=2)
        assert {(r["w1"], r["w2"]) for r in c12.collect()} == {("the", "cat")}
        # pruned pair (cat, sat) now scores as unseen: c12 -> 0
        got = {
            r["doc_id"]: r["nll_u"]
            for r in score_nll(df, c12, c1, v).collect()
        }
        assert got[1] == _u(2, 2) + _u(2, 0)


class TestBuckets:
    def test_head_middle_tail_per_lang(self, spark):
        out = {
            r["doc_id"]: (r["bucket"], r["bucket_name"])
            for r in ccnet_perplexity_buckets(_docs(spark, CORPUS)).collect()
        }
        # en has 4 docs -> ANSI ntile sizes the tiles 2,1,1 (extras to
        # the FIRST tiles): fluent 1,2 share head, 3 middle, unscorable
        # 4 tail; fr has one doc -> head
        assert out[1] == (1, "head")
        assert out[2] == (1, "head")
        assert out[3] == (2, "middle")
        assert out[4] == (3, "tail")
        assert out[5] == (1, "head")

    def test_bucket_window_is_per_language_not_global(self, spark):
        df = _docs(spark, CORPUS)
        c12, c1, v = train_bigram_lm(df)
        scored = score_nll(df, c12, c1, v, keep_cols=["lang"])
        plan = (
            ccnet_bucket(scored)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange SinglePartition" not in plan
        assert "BatchEvalPython" not in plan

    def test_pipeline_plan_no_cartesian_no_python(self, spark):
        plan = (
            ccnet_perplexity_buckets(_docs(spark, CORPUS))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


class TestPMICollocations:
    def test_hand_computed_pmi(self, spark):
        import math

        docs = _docs(spark, [(1, "a b", "en"), (2, "a b", "en"), (3, "a c a b", "en")])
        out = {
            (r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"], r["pmi_u"])
            for r in pmi_collocations(docs, min_count=1, k=10).collect()
        }
        # unigrams a:4 b:3 c:1 (N=8); bigrams (a,b):3 (a,c):1 (c,a):1 (B=5)
        assert out[("a", "b")][:3] == (3, 4, 3)
        assert out[("a", "b")][3] == round(math.log((3 * 8 * 8) / (5 * 4 * 3)) * 1e6)
        assert out[("a", "c")][3] == round(math.log((1 * 8 * 8) / (5 * 4 * 1)) * 1e6)
        assert out[("c", "a")][3] == round(math.log((1 * 8 * 8) / (5 * 1 * 4)) * 1e6)

    def test_min_count_prunes_hapax(self, spark):
        docs = _docs(spark, [(1, "a b", "en"), (2, "a b", "en"), (3, "a c a b", "en")])
        pairs = {
            (r["w1"], r["w2"])
            for r in pmi_collocations(docs, min_count=2, k=10).collect()
        }
        assert pairs == {("a", "b")}

    def test_topk_cut_is_deterministic(self, spark):
        # x y and p q are symmetric — identical pmi; tie-break on (w1, w2)
        docs = _docs(spark, [(1, "x y", "en"), (2, "p q", "en"), (3, "x y", "en"), (4, "p q", "en")])
        top = pmi_collocations(docs, min_count=1, k=1).collect()
        assert (top[0]["w1"], top[0]["w2"]) == ("p", "q")

    def test_ranking_favors_exclusive_pairs(self, spark):
        # "v w" always co-occur; "a" pairs with many partners
        docs = _docs(spark, [(1, "v w", "en"), (2, "v w", "en"), (3, "v w", "en"), (4, "a b a c a d a e", "en")])
        rows = pmi_collocations(docs, min_count=1, k=20).collect()
        ranks = {(r["w1"], r["w2"]): i for i, r in enumerate(rows)}
        assert ranks[("v", "w")] < min(
            rank for pair, rank in ranks.items() if "a" in pair
        )

    def test_plan_no_cartesian_no_python(self, spark):
        docs = _docs(spark, [(1, "a b c", "en"), (2, "b c d", "en")])
        plan = (
            pmi_collocations(docs, min_count=1, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "TakeOrderedAndProject" in plan
