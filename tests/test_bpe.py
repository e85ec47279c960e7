"""Distributed BPE tokenizer vs a pure-Python reference implementation.

The reference below is the textbook Sennrich et al. (2016) algorithm on
a word-frequency dict: count adjacent symbol pairs (occurrence-weighted,
overlapping), merge the argmax pair greedily left-to-right
non-overlapping, repeat. The Spark fit/segment must reproduce it
EXACTLY — merges in order, segmentations per word, ids stable.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.bpe import (
    END,
    bpe_decode_corpus,
    bpe_encode_corpus,
    bpe_fit,
    bpe_segment_corpus,
    bpe_vocab_table,
    initial_vocab,
    pair_counts_from_vocab,
)


def ref_vocab(texts):
    wc = Counter(w for t in texts for w in t.split())
    return {w: (c, list(w) + [END]) for w, c in wc.items()}


def ref_pair_counts(vocab):
    pc = Counter()
    for c, syms in vocab.values():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += c
    return pc


def ref_apply_merge(syms, lhs, rhs):
    out = []
    for x in syms:
        if out and out[-1] == lhs and x == rhs:
            out[-1] = lhs + rhs
        else:
            out.append(x)
    return out


def ref_fit(texts, n_merges, min_pair_count=2):
    vocab = ref_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pc = ref_pair_counts(vocab)
        eligible = [(n, p) for p, n in pc.items() if n >= min_pair_count]
        if not eligible:
            break
        # argmax with (lhs, rhs) tie-break, matching the Spark orderBy
        best = max(n for n, _ in eligible)
        lhs, rhs = sorted(p for n, p in eligible if n == best)[0]
        merges.append((lhs, rhs))
        vocab = {
            w: (c, ref_apply_merge(s, lhs, rhs))
            for w, (c, s) in vocab.items()
        }
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


CORPUS = [
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest",
]


class TestBPEFit:
    def test_merges_match_reference(self, spark):
        got = bpe_fit(_docs(spark, CORPUS), n_merges=8)
        want, _ = ref_fit(CORPUS, 8)
        assert got == want

    def test_initial_pair_counts_match_gate_machinery(self, spark):
        """initial_vocab + pair_counts_from_vocab must equal the
        oracle-gated textfns.bpe_pair_counts numbers bit-for-bit."""
        from sqlbackuphistoryetl_spark.functions.textfns import bpe_pair_counts

        docs = _docs(spark, CORPUS)
        via_vocab = {
            (r["lhs"], r["rhs"]): r["pair_count"]
            for r in pair_counts_from_vocab(initial_vocab(docs)).collect()
        }
        via_gate = {
            (r["lhs"], r["rhs"]): r["pair_count"]
            for r in bpe_pair_counts(docs, k=1000).collect()
        }
        assert via_vocab == via_gate

    def test_early_stop_on_min_pair_count(self, spark):
        # every word unique, every pair count 1 -> no merge at min 2
        assert bpe_fit(_docs(spark, ["ab cd ef"]), n_merges=5) == []

    def test_deterministic_across_runs(self, spark):
        a = bpe_fit(_docs(spark, CORPUS), n_merges=5)
        b = bpe_fit(_docs(spark, CORPUS), n_merges=5)
        assert a == b


class TestBPESegment:
    def test_segmentation_matches_reference(self, spark):
        docs = _docs(spark, CORPUS)
        merges, ref_v = ref_fit(CORPUS, 8)
        got = {
            r["doc_id"]: r["tokens"]
            for r in bpe_segment_corpus(docs, merges).collect()
        }
        for i, text in enumerate(CORPUS):
            want = [t for w in text.split() for t in ref_v[w][1]]
            assert got[i] == want, (i, got[i], want)

    def test_roundtrip_reconstructs_text(self, spark):
        docs = _docs(spark, CORPUS)
        merges = bpe_fit(docs, n_merges=6)
        for r in bpe_segment_corpus(docs, merges).collect():
            rebuilt = "".join(r["tokens"]).replace(END, " ").strip()
            assert rebuilt == CORPUS[r["doc_id"]]

    def test_zero_merges_is_character_segmentation(self, spark):
        docs = _docs(spark, ["ab c"])
        rows = bpe_segment_corpus(docs, []).collect()
        assert rows[0]["tokens"] == ["a", "b", END, "c", END]
        assert rows[0]["n_tokens"] == 5

    def test_segment_plan_has_no_python(self, spark):
        docs = _docs(spark, CORPUS)
        plan = (
            bpe_segment_corpus(docs, [("l", "o"), ("lo", "w")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEval" not in plan


class TestBPEEncode:
    def test_ids_are_dense_stable_and_decodable(self, spark):
        docs = _docs(spark, CORPUS)
        merges = bpe_fit(docs, n_merges=6)
        tbl = {r["token"]: r["token_id"] for r in bpe_vocab_table(docs, merges).collect()}
        # dense 0..n-1, merge products first in merge order
        assert sorted(tbl.values()) == list(range(len(tbl)))
        for i, (lhs, rhs) in enumerate(merges):
            assert tbl[lhs + rhs] == i
        inv = {v: k for k, v in tbl.items()}
        seg = {r["doc_id"]: r["tokens"] for r in bpe_segment_corpus(docs, merges).collect()}
        for r in bpe_encode_corpus(docs, merges).collect():
            assert [inv[i] for i in r["token_ids"]] == seg[r["doc_id"]]
            assert r["n_tokens"] == len(r["token_ids"])

    def test_extending_merges_keeps_existing_ids(self, spark):
        docs = _docs(spark, CORPUS)
        m6 = bpe_fit(docs, n_merges=6)
        m4 = m6[:4]
        t4 = {r["token"]: r["token_id"] for r in bpe_vocab_table(docs, m4).collect()}
        t6 = {r["token"]: r["token_id"] for r in bpe_vocab_table(docs, m6).collect()}
        for i, (lhs, rhs) in enumerate(m4):
            assert t4[lhs + rhs] == t6[lhs + rhs] == i


def test_fit_rejects_negative_merges(spark):
    with pytest.raises(ValueError):
        bpe_fit(None, -1)  # validated before touching the frame


class TestPackedIdExport:
    def test_id_streams_slice_and_concat_correctly(self, spark):
        from sqlbackuphistoryetl_spark.extensions.packing import (
            materialize_id_sequences,
            pack_sequences,
        )

        docs = _docs(spark, CORPUS)
        merges = bpe_fit(docs, n_merges=6)
        enc = bpe_encode_corpus(docs, merges)
        spans = pack_sequences(enc, "n_tokens", ["doc_id"], seq_len=7)
        seqs = {
            r["seq_id"]: r["seq_ids"]
            for r in materialize_id_sequences(spans, enc).collect()
        }
        # reference: concat all docs' ids in doc order, chunk by 7
        ids = {r["doc_id"]: r["token_ids"] for r in enc.collect()}
        stream = [t for d in sorted(ids) for t in ids[d]]
        want = {
            i: stream[i * 7 : (i + 1) * 7]
            for i in range((len(stream) + 6) // 7)
        }
        assert seqs == want
        # every sequence but the tail is exactly seq_len
        for i, s in seqs.items():
            if i < len(seqs) - 1:
                assert len(s) == 7


def test_fit_resume_equals_full_fit(spark):
    """Fitting 4 merges then resuming for 4 more must equal one 8-merge
    fit — the incremental-extension contract."""
    docs = _docs(spark, CORPUS)
    full = bpe_fit(docs, n_merges=8)
    first = bpe_fit(docs, n_merges=4)
    resumed = bpe_fit(docs, n_merges=4, initial_merges=first)
    assert resumed == full


class TestReviewRegressions:
    def test_duplicate_merge_products_get_one_id(self, spark):
        """Distinct merge RULES minting the same product string (e.g.
        (ab,c) and (a,bc) → 'abc') must not duplicate vocab rows or fan
        out the encode join."""
        docs = _docs(spark, ["abc abc"])
        merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc")]
        tbl = bpe_vocab_table(docs, merges).collect()
        tokens = [r["token"] for r in tbl]
        assert len(tokens) == len(set(tokens))  # no duplicate token rows
        seg = {r["doc_id"]: r["tokens"] for r in bpe_segment_corpus(docs, merges).collect()}
        enc = {r["doc_id"]: r for r in bpe_encode_corpus(docs, merges).collect()}
        assert enc[0]["n_tokens"] == len(seg[0])  # no fan-out
        inv = {r["token_id"]: r["token"] for r in tbl}
        assert [inv[i] for i in enc[0]["token_ids"]] == seg[0]

    def test_empty_and_whitespace_docs_survive(self, spark):
        docs = _docs(spark, ["ab ab", "", "   "])
        merges = bpe_fit(docs, n_merges=2)
        seg = {r["doc_id"]: (r["tokens"], r["n_tokens"])
               for r in bpe_segment_corpus(docs, merges).collect()}
        enc = {r["doc_id"]: (r["token_ids"], r["n_tokens"])
               for r in bpe_encode_corpus(docs, merges).collect()}
        assert set(seg) == set(enc) == {0, 1, 2}
        assert seg[1] == ([], 0) and seg[2] == ([], 0)
        assert enc[1] == ([], 0) and enc[2] == ([], 0)


class TestBPEDecode:
    """bpe_decode_corpus (r6 verdict task 2): the id→text inverse."""

    def test_decode_inverts_encode_whitespace_normalized(self, spark):
        texts = CORPUS + ["  leading and   inner\twhitespace ", "", "   "]
        docs = _docs(spark, texts)
        merges = bpe_fit(docs, n_merges=6)
        enc = bpe_encode_corpus(docs, merges)
        vocab = bpe_vocab_table(docs, merges)
        got = {r["doc_id"]: r["text"]
               for r in bpe_decode_corpus(enc, vocab).collect()}
        assert got == {i: " ".join(t.split()) for i, t in enumerate(texts)}

    def test_decode_is_map_side_no_corpus_shuffle(self, spark):
        """The id→token map folds to ONE row and cross-joins broadcast:
        the corpus side must see no Exchange keyed on it (zero corpus
        shuffles) and no Python evaluation."""
        docs = _docs(spark, CORPUS)
        merges = [("l", "o"), ("lo", "w")]
        dec = bpe_decode_corpus(
            bpe_encode_corpus(docs, merges), bpe_vocab_table(docs, merges)
        )
        plan = dec._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan

    def test_unknown_token_id_raises(self, spark):
        docs = _docs(spark, CORPUS)
        merges = [("l", "o")]
        vocab = bpe_vocab_table(docs, merges)
        # over-range, NEGATIVE (r7 review: Spark resolves negative array
        # indexes from the END — must raise, never silently decode the
        # wrong token), and huge (must not become an ANSI cast overflow)
        for bad in ([999_999], [-5], [-1], [10**12]):
            bogus = spark.createDataFrame(
                [(0, bad)], "doc_id long, token_ids array<bigint>"
            )
            with pytest.raises(Exception, match="not in vocab table"):
                bpe_decode_corpus(bogus, vocab).collect()

    def test_sparse_vocab_table_falls_back_to_map(self, spark):
        """A caller-supplied NON-dense table (ids with a hole) must
        still decode correctly through the map path."""
        vocab = spark.createDataFrame(
            [("ab", 0), ("c</w>", 7)], "token string, token_id long"
        )
        enc = spark.createDataFrame(
            [(1, [0, 7])], "doc_id long, token_ids array<bigint>"
        )
        got = bpe_decode_corpus(enc, vocab).collect()
        assert got[0]["text"] == "abc"

    def test_custom_end_marker_roundtrip(self, spark):
        """Adversarial text containing the default marker round-trips
        under a corpus-safe end marker."""
        texts = ["a</w>b a</w>b c", "c c c"]
        docs = _docs(spark, texts)
        merges = bpe_fit(docs, n_merges=3, end_marker="\x00w")
        enc = bpe_encode_corpus(docs, merges, end_marker="\x00w")
        vocab = bpe_vocab_table(docs, merges, end_marker="\x00w")
        got = {r["doc_id"]: r["text"]
               for r in bpe_decode_corpus(enc, vocab, end_marker="\x00w").collect()}
        assert got == {i: " ".join(t.split()) for i, t in enumerate(texts)}


class TestBPEFertility:
    def test_fertility_sums_match_reference(self, spark):
        from sqlbackuphistoryetl_spark.extensions.bpe import bpe_fertility

        texts = [("en", "low low lower"), ("en", "newest widest"),
                 ("de", "low low low low")]
        docs = spark.createDataFrame(
            [(i, lang, t) for i, (lang, t) in enumerate(texts)],
            "doc_id long, lang string, text string",
        )
        merges, ref_v = ref_fit([t for _, t in texts], 4)
        got = {r["lang"]: r for r in bpe_fertility(docs, merges).collect()}
        import collections

        want = collections.defaultdict(lambda: [0, 0, 0, 0])
        for lang, t in texts:
            w = want[lang]
            w[0] += 1
            w[1] += len(t.split())
            w[2] += sum(len(ref_v[x][1]) for x in t.split())
            w[3] += sum(len(x) for x in t.split())
        for lang, (nd, nw, nt, nc) in want.items():
            r = got[lang]
            assert (r["n_docs"], r["total_words"], r["total_tokens"],
                    r["total_chars"]) == (nd, nw, nt, nc), lang
