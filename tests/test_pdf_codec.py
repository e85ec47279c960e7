"""PDF triage + text extraction (r10): object scan, FlateDecode,
text-operator walk, hostile inputs, Spark integration."""

from __future__ import annotations

import random
import zlib

import pytest

from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
    MAX_STREAM_BYTES,
    PDFError,
    build_pdf,
    extract_text,
    is_pdf,
    pdf_info,
)


class TestRoundTrips:
    @pytest.mark.parametrize("compress", [False, True])
    def test_multi_page(self, compress):
        pages = [
            ["Hello world", "line two"],
            ["Page (2) with \\ escapes", "and ) parens ("],
            [],
        ]
        blob = build_pdf(pages, compress=compress)
        assert is_pdf(blob)
        info = pdf_info(blob)
        assert (info.version, info.n_pages, info.encrypted) == ("1.4", 3, False)
        assert info.has_xref
        got = extract_text(blob)
        assert got == ["\n".join(p) for p in pages]

    def test_empty_and_unicode_fallback(self):
        blob = build_pdf([["caf\xe9 r\xe9sum\xe9"]])  # latin-1 range
        assert extract_text(blob) == ["caf\xe9 r\xe9sum\xe9"]


class TestOperators:
    def test_octal_and_hex_strings(self):
        content = b"BT (\\110i\\041) Tj 0 -14 Td <48656C6C6F> Tj ET"
        blob = _pdf_with_raw_content(content)
        assert extract_text(blob) == ["Hi!\nHello"]

    def test_tj_array_and_quote_ops(self):
        content = (
            b"BT [(Wor) -120 (ld)] TJ (next) ' (quoted) \" ET"
        )
        blob = _pdf_with_raw_content(content)
        assert extract_text(blob) == ["World\nnext\nquoted"]

    def test_positioning_ops_break_lines(self):
        content = b"BT (a) Tj 1 0 0 1 72 700 Tm (b) Tj T* (c) Tj ET"
        blob = _pdf_with_raw_content(content)
        assert extract_text(blob) == ["a\nb\nc"]


def _pdf_with_raw_content(content: bytes) -> bytes:
    """A build_pdf document whose first content stream is replaced by
    raw operators (uncompressed fixtures only)."""
    blob = build_pdf([["placeholder"]])
    start = blob.index(b"stream\n") + 7
    end = blob.index(b"\nendstream")
    old = blob[start:end]
    head_at = blob.index(b"/Length %d" % len(old))
    out = blob.replace(
        b"/Length %d" % len(old), b"/Length %d" % len(content)
    ).replace(old, content)
    return out


class TestHostile:
    def test_encrypted_raises_and_info_flags(self):
        blob = build_pdf([["secret"]])
        enc = blob.replace(
            b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
        )
        assert pdf_info(enc).encrypted
        with pytest.raises(PDFError, match="encrypted"):
            extract_text(enc)

    def test_not_pdf(self):
        assert not is_pdf(b"%PDX-1.4")
        with pytest.raises(PDFError):
            pdf_info(b"plain text")

    def test_lying_length_resyncs_on_endstream(self):
        blob = build_pdf([["resync me"]])
        # inflate the declared /Length far past the real stream: the
        # scanner must fall back to the endstream search, not explode
        import re

        bad = re.sub(rb"/Length (\d+)", b"/Length 999999", blob, count=1)
        info = pdf_info(bad)
        assert info.n_pages == 1  # objects still found

    def test_flate_bomb_is_bounded(self):
        import sqlbackuphistoryetl_spark.extensions.pdf_codec as pc

        bomb = zlib.compress(b"\0" * (1 << 22), 9)
        content_obj = (
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(bomb)
            + bomb + b"\nendstream"
        )
        blob = _replace_first_stream_obj(build_pdf([["x"]]), content_obj)
        orig = pc.MAX_STREAM_BYTES
        pc.MAX_STREAM_BYTES = 1 << 20
        try:
            with pytest.raises(PDFError, match="inflates past"):
                extract_text(blob)
        finally:
            pc.MAX_STREAM_BYTES = orig

    def test_mutation_corpus_terminates(self):
        rng = random.Random(0xFDF)
        base = build_pdf([["alpha", "beta"], ["gamma"]], compress=True)
        for i in range(200):
            raw = bytearray(base)
            if i % 3 == 0:
                raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
            elif i % 3 == 1:
                raw = raw[: rng.randrange(6, len(raw))]
            else:
                p = rng.randrange(len(raw) - 8)
                raw[p : p + 8] = bytes(rng.randrange(256) for _ in range(8))
            try:
                if is_pdf(bytes(raw)):
                    pdf_info(bytes(raw))
                    extract_text(bytes(raw))
            except PDFError:
                pass


def _replace_first_stream_obj(blob: bytes, new_obj_body: bytes) -> bytes:
    import re

    m = re.search(rb"4 0 obj\n(.*?)\nendobj\n", blob, re.S)
    return blob[: m.start(1)] + new_obj_body + blob[m.end(1):]


def test_spark_extract_and_media_info(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import (
        extract_pdf_text,
        media_info,
    )

    ok = build_pdf([["doc one text"], ["page 2"]], compress=True)
    enc = build_pdf([["x"]]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    rows = [
        (1, ok, "application/pdf"),
        (2, enc, "application/pdf"),
        (3, b"not a pdf at all", "application/pdf"),
        (4, None, "application/pdf"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r for r in extract_pdf_text(df).collect()}
    assert (out[1]["n_pages"], out[1]["text"], out[1]["status"]) == (
        2, "doc one text\fpage 2", "ok")
    assert out[2]["status"] == "encrypted" and out[2]["text"] is None
    assert out[3]["status"] == "not_pdf"
    assert out[4]["status"] == "not_pdf"
    mi = {r["doc_id"]: r for r in media_info(df).collect()}
    assert (mi[1]["format"], mi[1]["n_frames"]) == ("pdf", 2)
