"""Unigram-LM Viterbi segmentation (r9): global optimality vs greedy,
tie-breaks, UNK handling, corpus assembly, encoded-state contract."""

from __future__ import annotations

from sqlbackuphistoryetl_spark.extensions.unigram import (
    unigram_segment_corpus,
    viterbi_segment_word,
)


class TestWordLevel:
    def test_viterbi_beats_greedy(self):
        # greedy longest-first takes 'ab' (cost 1) then pays 'c' (10);
        # Viterbi finds a (3) + bc (2)
        vocab = {"ab": 1, "c": 10, "a": 3, "bc": 2, "b": 9}
        pieces, cost, enc = viterbi_segment_word("abc", vocab)
        assert pieces == ["a", "bc"]
        assert cost == 5
        assert enc == 5 * 1024 + 2

    def test_unique_min_and_count_tiebreak(self):
        # two cost-4 paths: a+b (2 pieces) vs ab (1 piece) — fewer
        # pieces wins because count rides the encoded integer
        vocab = {"a": 2, "b": 2, "ab": 4}
        pieces, cost, enc = viterbi_segment_word("ab", vocab)
        assert pieces == ["ab"] and cost == 4 and enc == 4 * 1024 + 1

    def test_same_cost_same_count_prefers_short_last_piece(self):
        # xy via x+y (3+3) vs xy' hmm: construct: 'aa' with a:3, aa:6
        vocab = {"a": 3, "aa": 6}
        pieces, _, enc = viterbi_segment_word("aa", vocab)
        # both are cost 6; aa = 1 piece beats a+a = 2 pieces
        assert pieces == ["aa"]
        # force a genuine (cost, count) tie: impossible to have equal
        # count with different last piece at len 2; cover len 3:
        vocab = {"a": 2, "aa": 4, "aaa": 6}
        pieces, _, _ = viterbi_segment_word("aaa", vocab)
        assert pieces == ["aaa"]

    def test_unk_characters(self):
        vocab = {"a": 3}
        pieces, cost, _ = viterbi_segment_word("axa", vocab)
        assert pieces == ["a", "x", "a"]
        assert cost == 3 + 20 + 3
        assert viterbi_segment_word("", vocab)[0] == ["[UNK]"]
        assert viterbi_segment_word("z" * 500, vocab)[0] == ["[UNK]"]

    def test_mixed_unk_inside_vocab_run(self):
        vocab = {"th": 1, "e": 1}
        pieces, cost, _ = viterbi_segment_word("th3e", vocab)
        assert pieces == ["th", "3", "e"] and cost == 1 + 20 + 1


class TestCorpus:
    VOCAB = {"th": 3, "he": 3, "an": 4, "a": 6, "t": 6, "h": 7,
             "e": 5, "s": 6, "o": 6, "i": 6, "n": 6, "d": 7}

    def test_assembly_and_totals(self, spark):
        docs = spark.createDataFrame(
            [(1, "the than"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r
               for r in unigram_segment_corpus(docs, self.VOCAB).collect()}
        # 'the': th+e (8) beats t+he (9) and t+h+e (18)
        assert out[1]["tokens"][:2] == ["th", "e"]
        # 'than': th+an (7) beats t+h+a+n and th+a+n
        assert out[1]["tokens"][2:] == ["th", "an"]
        w1 = viterbi_segment_word("the", self.VOCAB)
        w2 = viterbi_segment_word("than", self.VOCAB)
        assert out[1]["total_cost"] == w1[1] + w2[1]
        assert out[1]["encoded_total"] == w1[2] + w2[2]
        assert out[1]["n_tokens"] == 4
        for k in (2, 3):
            assert out[k]["tokens"] == [] and out[k]["encoded_total"] == 0

    def test_python_stage_is_distinct_words_only(self, spark):
        import pyspark.sql.classic.dataframe as D

        seen = []
        orig = D.DataFrame.mapInPandas

        def spy(self, func, schema, **kw):
            seen.append([f.name for f in self.schema.fields])
            return orig(self, func, schema, **kw)

        D.DataFrame.mapInPandas = spy
        try:
            docs = spark.createDataFrame(
                [(1, "the the than")], "doc_id long, text string"
            )
            unigram_segment_corpus(docs, self.VOCAB).collect()
        finally:
            D.DataFrame.mapInPandas = orig
        assert seen == [["word"]]
