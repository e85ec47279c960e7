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


class TestScannedPdf:
    """r10: embedded-image extraction — the scanned-document path
    that routes DCTDecode to jpeg_codec and CCITTFaxDecode to ccitt."""

    def _fixture(self):
        import random as _r

        from sqlbackuphistoryetl_spark.extensions import ccitt
        from sqlbackuphistoryetl_spark.extensions.jpeg_codec import (
            QUANT_FLAT8,
            encode_jpeg,
        )
        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            build_scanned_pdf,
        )

        rng = _r.Random(2)
        rows = [bytes(rng.randrange(2) for _ in range(16))
                for _ in range(7)]
        g4 = ccitt.encode_g4(rows, 16)
        px = bytes([66] * 64)
        jp = encode_jpeg(px, 8, 8, 1, quant_luma=QUANT_FLAT8)
        blob = build_scanned_pdf([
            {"width": 16, "height": 7, "filter": "CCITTFaxDecode",
             "data": g4, "k": -1},
            {"width": 8, "height": 8, "filter": "DCTDecode", "data": jp},
        ])
        return blob, rows, px

    def test_extract_and_decode(self):
        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            decode_pdf_image,
            extract_images,
        )

        blob, rows, px = self._fixture()
        imgs = extract_images(blob)
        assert [(i.filter, i.width, i.height) for i in imgs] == [
            ("CCITTFaxDecode", 16, 7), ("DCTDecode", 8, 8)]
        fax = decode_pdf_image(imgs[0])
        # fax-black = luminance 0, regardless of BlackIs1
        assert fax.pixels == bytes(
            0 if v else 255 for r in rows for v in r)
        assert decode_pdf_image(imgs[1]).pixels == px

    def test_text_pdfs_have_zero_images(self):
        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            extract_images,
        )

        assert extract_images(build_pdf([["just text"]])) == []

    def test_unknown_filter_tagged_and_gated(self):
        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            decode_pdf_image,
            extract_images,
        )

        blob = (b"%PDF-1.4\n1 0 obj\n"
                b"<< /Subtype /Image /Width 4 /Height 4 "
                b"/Filter /JBIG2Decode /Length 4 >>\nstream\n\x00\x01\x02\x03"
                b"\nendstream\nendobj\n%%EOF\n")
        imgs = extract_images(blob)
        assert imgs[0].filter == "JBIG2Decode"
        with pytest.raises(PDFError, match="unsupported image filter"):
            decode_pdf_image(imgs[0])

    def test_pixel_budget(self):
        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            PdfImage,
            decode_pdf_image,
        )

        with pytest.raises(PDFError, match="budget"):
            decode_pdf_image(
                PdfImage(1, 1 << 16, 1 << 16, "DCTDecode", b""))

    def test_spark_operator(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            extract_pdf_image_features,
        )

        blob, rows, px = self._fixture()
        n_black = sum(v for r in rows for v in r)
        n = 16 * 7
        df = spark.createDataFrame(
            [(1, blob, "application/pdf"),
             (2, build_pdf([["text only"]]), "application/pdf"),
             (3, b"nope", "application/pdf")],
            ["doc_id", "payload", "content_type"],
        )
        out = {r["doc_id"]: r
               for r in extract_pdf_image_features(df).collect()}
        assert (out[1]["n_images"], out[1]["filter"], out[1]["width"],
                out[1]["height"]) == (2, "CCITTFaxDecode", 16, 7)
        assert out[1]["mean_lum"] == (255 * (n - n_black)) // n
        assert (out[1]["min_lum"], out[1]["max_lum"]) == (0, 255)
        assert out[2]["n_images"] == 0
        assert out[3]["n_images"] is None
