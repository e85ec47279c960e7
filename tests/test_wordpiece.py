"""WordPiece greedy longest-match tokenizer (r9): word-level algorithm
parity with the published BERT behavior, corpus assembly, edge rows."""

from __future__ import annotations

from sqlbackuphistoryetl_spark.extensions.wordpiece import (
    wordpiece_segment_corpus,
    wordpiece_tokenize_word,
)

VOCAB = {
    "un", "##aff", "##able", "##want", "##ed",
    "the", "a", "##a", "want", "##s",
}


class TestWordLevel:
    def test_published_bert_example(self):
        # the canonical example from the BERT repo docs
        assert wordpiece_tokenize_word("unwanted", VOCAB) == [
            "un", "##want", "##ed",
        ]

    def test_longest_match_wins(self):
        v = {"ab", "a", "##b", "##bc", "##c"}
        # greedy takes 'ab' then '##c', never 'a'+'##bc'
        assert wordpiece_tokenize_word("abc", v) == ["ab", "##c"]

    def test_whole_word_unk_on_any_failure(self):
        # 'x' never matches -> the WHOLE word is [UNK], not a partial list
        assert wordpiece_tokenize_word("unx", VOCAB) == ["[UNK]"]
        assert wordpiece_tokenize_word("", VOCAB) == ["[UNK]"]

    def test_long_word_guard(self):
        assert wordpiece_tokenize_word("a" * 500, VOCAB) == ["[UNK]"]
        assert wordpiece_tokenize_word("a" * 3, {"a", "##a"}, max_chars=3) == [
            "a", "##a", "##a",
        ]

    def test_continuation_requires_prefix(self):
        # '##s' exists but bare 's' doesn't: word-initial 's' fails
        assert wordpiece_tokenize_word("s", VOCAB) == ["[UNK]"]
        assert wordpiece_tokenize_word("wants", VOCAB) == ["want", "##s"]


class TestCorpus:
    def test_assembly_order_and_edges(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the unwanted a"),
                (2, ""),
                (3, None),
                (4, "zzz the"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in wordpiece_segment_corpus(docs, VOCAB).collect()
        }
        assert out[1]["tokens"] == ["the", "un", "##want", "##ed", "a"]
        assert out[1]["n_tokens"] == 5
        assert out[2]["tokens"] == [] and out[2]["n_tokens"] == 0
        assert out[3]["tokens"] == [] and out[3]["n_tokens"] == 0
        assert out[4]["tokens"] == ["[UNK]", "the"]

    def test_lowercase_pretokenizer(self, spark):
        docs = spark.createDataFrame(
            [(1, "The UNWANTED!")], "doc_id long, text string"
        )
        out = wordpiece_segment_corpus(
            docs, VOCAB, word_pattern=r"[a-z]+", lowercase=True
        ).collect()[0]
        assert out["tokens"] == ["the", "un", "##want", "##ed"]

    def test_python_stage_is_distinct_words_only(self, spark):
        # the corpus never moves through Python: mapInPandas input is
        # the distinct-word frame
        import pyspark.sql.classic.dataframe as D

        seen = []
        orig = D.DataFrame.mapInPandas

        def spy(self, func, schema, **kw):
            seen.append([f.name for f in self.schema.fields])
            return orig(self, func, schema, **kw)

        D.DataFrame.mapInPandas = spy
        try:
            docs = spark.createDataFrame(
                [(1, "a a a the the")], "doc_id long, text string"
            )
            wordpiece_segment_corpus(docs, VOCAB).collect()
        finally:
            D.DataFrame.mapInPandas = orig
        assert seen == [["word"]]  # only the distinct-word column


def test_oracle_mirrors_long_word_guard():
    """r9 advice: the engine collapses words over 200 chars to a
    whole-word [UNK]; the recursive-CTE oracles must agree, or any
    future fixture with a 200+ char [a-z]+ run hash-mismatches even
    though both sides are 'correct'. The oracle substitutes a single
    out-of-vocab char, which takes the same failure branch."""
    import hashlib
    import re

    import duckdb

    import __spark_entry__ as E
    from sqlbackuphistoryetl_spark.extensions.unigram import (
        viterbi_segment_word,
    )
    from sqlbackuphistoryetl_spark.extensions.wordpiece import (
        wordpiece_tokenize_word,
    )

    text = "the " + "a" * 250 + " than"
    vocab = set(E.WORDPIECE_GATE_VOCAB)
    con = duckdb.connect()
    con.execute(
        "create table documents as select 1 as doc_id, ? as text", [text]
    )
    wp = con.execute(E.WORDPIECE_SQL).fetchall()[0]
    uni = con.execute(E.UNIGRAM_SQL).fetchall()[0]

    toks = []
    n_tok = tot_cost = tot_enc = 0
    for w in re.findall(r"[a-z]+", text.lower()):
        toks += wordpiece_tokenize_word(w, vocab)
        _p, _c, enc = viterbi_segment_word(w, E.UNIGRAM_GATE_VOCAB)
        n_tok += enc % 1024
        tot_cost += enc // 1024
        tot_enc += enc
    md5 = hashlib.md5("\x1e".join(toks).encode()).hexdigest()
    assert (len(toks), md5) == (wp[1], wp[2])
    assert (n_tok, tot_cost, tot_enc) == tuple(uni[1:])
