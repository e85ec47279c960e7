"""Byte-level (GPT-2-form) BPE: pretokenization, byte-symbol mapping,
fit/segment through the shared merge machinery, lossless decode
roundtrip incl. non-ASCII byte fallback (r11, extensions/bpe.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.bpe import (
    GPT2_PRETOKEN_RE,
    bpe_decode_bytes,
    bpe_fit_bytes,
    bpe_segment_corpus_bytes,
    byte_initial_vocab,
    bytes_to_unicode,
)


def _pretokens_py(s: str) -> list[str]:
    # Python re mirrors Java for this pattern (lookahead supported);
    # \p{L}/\p{N} translated to the unicode-aware classes
    pat = (
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
    )
    return re.findall(pat, s)


class TestByteTable:
    def test_bijection_and_known_glyphs(self):
        t = bytes_to_unicode()
        assert len(t) == 256 and len(set(t)) == 256
        assert t[0x20] == "Ġ"  # Ġ
        assert t[0x0A] == "Ċ"  # Ċ
        assert t[ord("A")] == "A" and t[ord("z")] == "z"
        # every mapped char is "printable" (not a control/space)
        assert all(not c.isspace() and c.isprintable() for c in t)


class TestPretokenizeAndVocab:
    def test_pretokens_cover_text_exactly(self, spark):
        s = "Hello  world, it's 2025!\nnew line"
        df = spark.createDataFrame([(1, s)], ["doc_id", "text"])
        toks = df.select(
            F.regexp_extract_all(
                "text", F.lit(GPT2_PRETOKEN_RE), F.lit(0)
            ).alias("t")
        ).collect()[0]["t"]
        assert "".join(toks) == s
        # the lookahead leaves the last space attached to 'world'
        assert " world" in toks and "'s" in toks

    def test_byte_syms_ascii_and_multibyte(self, spark):
        df = spark.createDataFrame([(1, "aé")], ["doc_id", "text"])
        rows = byte_initial_vocab(df).collect()
        syms = {r["word"]: r["syms"] for r in rows}["aé"]
        t = bytes_to_unicode()
        # é = UTF-8 0xC3 0xA9 → two byte symbols after 'a'
        assert syms == ["a", t[0xC3], t[0xA9]]


class TestFitSegmentDecode:
    def _docs(self, spark):
        rows = [
            (1, "the theme the"),
            (2, "the other theme"),
            (3, "breathe the air"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_fit_learns_space_prefixed_merges(self, spark):
        merges = bpe_fit_bytes(self._docs(spark), 4)
        assert len(merges) == 4
        flat = ["".join(m) for m in merges]
        # 'Ġthe'-family merges dominate this corpus
        assert any("Ġ" in f or f in ("th", "he", "the") for f in flat)

    def test_segment_tokens_concat_to_mapped_text(self, spark):
        docs = self._docs(spark)
        merges = [("t", "h"), ("th", "e"), ("Ġ", "the")]
        seg = bpe_segment_corpus_bytes(docs, merges)
        t = bytes_to_unicode()
        for r in seg.join(docs, "doc_id").collect():
            mapped = "".join(
                t[b] for b in r["text"].encode("utf-8")
            )
            assert "".join(r["tokens"]) == mapped
            assert r["n_tokens"] == len(r["tokens"])

    @pytest.mark.parametrize(
        "text",
        [
            "plain ascii only",
            "café naïve résumé",
            "emoji \U0001f600 and CJK 漢字 mix",
            "tabs\tand\nnewlines  double  spaces",
            "",
        ],
    )
    def test_roundtrip_lossless(self, spark, text):
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        merges = bpe_fit_bytes(
            spark.createDataFrame(
                [(1, "the quick brown fox")], ["doc_id", "text"]
            ),
            3,
        )
        seg = bpe_segment_corpus_bytes(docs, merges)
        out = bpe_decode_bytes(seg).collect()[0]["text"]
        assert out == (text if text else "")

    def test_decode_plan_is_jvm_only(self, spark):
        import contextlib
        import io

        docs = spark.range(1).select(
            F.col("id").alias("doc_id"), F.lit("x y").alias("text")
        )
        seg = bpe_segment_corpus_bytes(docs, [])
        df = bpe_decode_bytes(seg)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "Python" not in plan and "BatchEval" not in plan

    def test_python_reference_parity_pretokens(self, spark):
        s = "it's the  end,  isn't it? 42 times"
        df = spark.createDataFrame([(1, s)], ["doc_id", "text"])
        jtoks = df.select(
            F.regexp_extract_all(
                "text", F.lit(GPT2_PRETOKEN_RE), F.lit(0)
            ).alias("t")
        ).collect()[0]["t"]
        assert jtoks == _pretokens_py(s)

    def test_empty_doc_survives_with_empty_tokens(self, spark):
        docs = spark.createDataFrame(
            [(1, "some text"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        seg = bpe_segment_corpus_bytes(docs, [])
        got = {r["doc_id"]: r["n_tokens"] for r in seg.collect()}
        assert got[2] == 0 and got[3] == 0 and got[1] > 0
