"""r11 PDF paths: object streams + xref streams (the modern-producer
layout), the full transport-filter chain (LZW/AHx/A85/RunLength +
predictors), ToUnicode CMaps, /Contents arrays, and the stream-keyword
boundary fix from the r10 advice."""

from __future__ import annotations

import zlib

import pytest

from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
    PDFError,
    _apply_cmap,
    _decode_one,
    _objects,
    _parse_cmap,
    _parse_filters,
    _scan_objects,
    _undo_predictor,
    build_pdf,
    extract_text,
    parse_xref_stream,
    pdf_info,
)

PAGES = [["Hello world", "line two"], ["second page", "more text"]]
WANT = ["Hello world\nline two", "second page\nmore text"]


class TestStreamKeywordBoundary:
    """r10 advice: the old guard raised 'stream without endstream' on
    any object whose dict/strings contained the bare substring."""

    def _pdf_with(self, body: bytes) -> bytes:
        return (
            b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj\n"
            b"2 0 obj\n<< /Type /Page /Contents 3 0 R >>\nendobj\n"
        )

    def test_name_containing_stream_substring(self):
        objs = _scan_objects(self._pdf_with(b"<< /Mystream 4 >>"))
        assert 1 in objs and 2 in objs

    def test_literal_string_containing_stream(self):
        objs = _scan_objects(self._pdf_with(b"<< /T (a stream here) >>"))
        assert 1 in objs and 2 in objs

    def test_real_stream_still_skipped(self):
        body = (
            b"<< /Length 11 >>\nstream\nBT (x) Tj\nET\nendstream"
        )
        objs = _scan_objects(self._pdf_with(body))
        assert b"stream" in objs[1]


class TestTransportFilters:
    @pytest.mark.parametrize("filt", ["flate", "lzw", "ahx", "a85", "rl"])
    def test_content_filter_round_trip(self, filt):
        blob = build_pdf(PAGES, content_filter=filt)
        assert extract_text(blob) == WANT

    def test_decode_one_runlength(self):
        enc = b"\x02abc" + bytes([254]) + b"z" + b"\x80"
        assert _decode_one(enc, "RunLengthDecode", {}) == b"abc" + b"z" * 3

    def test_decode_one_ascii85_with_z(self):
        import base64

        raw = b"\x00\x00\x00\x00hello world"
        enc = base64.a85encode(raw).replace(b"!!!!!", b"z") + b"~>"
        assert _decode_one(enc, "ASCII85Decode", {}) == raw

    def test_filter_chain_array(self):
        # [/ASCIIHexDecode /FlateDecode]: hex-armored deflate
        inner = zlib.compress(b"payload bytes", 6)
        head = b"<< /Filter [/ASCIIHexDecode /FlateDecode] >>"
        names, parms = _parse_filters(head)
        assert names == ["ASCIIHexDecode", "FlateDecode"]
        data = inner.hex().encode() + b">"
        step1 = _decode_one(data, names[0], parms[0])
        assert _decode_one(step1, names[1], parms[1]) == b"payload bytes"

    def test_lzw_early_change_zero_parm_parsed(self):
        head = (
            b"<< /Filter /LZWDecode /DecodeParms << /EarlyChange 0 >> >>"
        )
        names, parms = _parse_filters(head)
        assert names == ["LZWDecode"]
        assert parms[0]["EarlyChange"] == 0

    def test_predictor_png_up(self):
        # two rows of 4 bytes under PNG Up (type 2)
        row1, row2 = b"\x01\x02\x03\x04", b"\x05\x06\x07\x08"
        filtered = (
            b"\x02" + row1
            + b"\x02" + bytes((b - a) & 0xFF for a, b in zip(row1, row2))
        )
        out = _undo_predictor(
            filtered, {"Predictor": 12, "Columns": 4}
        )
        assert out == row1 + row2

    def test_predictor_tiff_horizontal(self):
        raw = b"\x0a\x05\x01\x02"  # diffs
        out = _undo_predictor(raw, {"Predictor": 2, "Columns": 4})
        assert out == b"\x0a\x0f\x10\x12"

    def test_predictor_misaligned_raises(self):
        with pytest.raises(PDFError):
            _undo_predictor(b"\x00" * 7, {"Predictor": 12, "Columns": 4})


class TestObjectStreams:
    def test_compressed_layout_round_trip(self):
        blob = build_pdf(PAGES, compress_objects=True, compress=True)
        assert blob.startswith(b"%PDF-1.5")
        assert b"/Type /ObjStm" in blob and b"/Type /XRef" in blob
        assert b"trailer" not in blob
        # the direct scan alone must NOT see the page dicts...
        direct = _scan_objects(blob)
        in_direct = sum(
            1 for b in direct.values() if b.startswith(b"<< /Type /Page ")
        )
        assert in_direct == 0
        # ...but the expanded map does, and extraction works
        assert extract_text(blob) == WANT
        info = pdf_info(blob)
        assert info.n_pages == 2

    def test_objstm_with_tounicode_and_filters(self):
        blob = build_pdf(
            PAGES,
            compress_objects=True,
            content_filter="lzw",
            tounicode=[(0x61, 0x7A, 0x0041)],  # a-z -> A-Z
        )
        # the CMap maps lowercase a-z up; uppercase/space pass through
        def up(s: str) -> str:
            return "".join(
                c.upper() if "a" <= c <= "z" else c for c in s
            )

        assert extract_text(blob) == [
            up("Hello world") + "\n" + up("line two"),
            up("second page") + "\n" + up("more text"),
        ]

    def test_xref_stream_entries_accurate(self):
        blob = build_pdf(PAGES, compress_objects=True)
        objects = _objects(blob)
        xref_num = max(
            n
            for n, b in objects.items()
            if b.lstrip().startswith(b"<< /Type /XRef")
        )
        entries = parse_xref_stream(objects[xref_num], objects)
        # every type-1 entry's offset points at "N 0 obj"
        for objnum, (t, f2, f3) in entries.items():
            if t == 1:
                assert blob[f2:].startswith(b"%d 0 obj" % objnum)
            elif t == 2:
                assert b"/Type /ObjStm" in _objects(blob)[f2]
        # the page dicts are type-2 (compressed)
        page_nums = [
            n
            for n, b in objects.items()
            if b.startswith(b"<< /Type /Page ")
        ]
        assert page_nums and all(entries[n][0] == 2 for n in page_nums)

    def test_malformed_objstm_raises(self):
        data = zlib.compress(b"1 0 ", 6)
        blob = (
            b"%PDF-1.5\n5 0 obj\n<< /Type /ObjStm /N 3 /First 20 "
            b"/Filter /FlateDecode /Length " + str(len(data)).encode()
            + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
        )
        with pytest.raises(PDFError):
            _objects(blob)


class TestToUnicode:
    def test_parse_cmap_bfchar_and_ranges(self):
        cmap = (
            b"begincodespacerange\n<00> <ff>\nendcodespacerange\n"
            b"2 beginbfchar\n<41> <0391>\n<42> <03B2>\nendbfchar\n"
            b"1 beginbfrange\n<61> <63> <0041>\nendbfrange\n"
            b"1 beginbfrange\n<64> <66> [<0058> <0059> <005A>]\n"
            b"endbfrange\n"
        )
        code_len, mp = _parse_cmap(cmap)
        assert code_len == 1
        assert mp[0x41] == "Α" and mp[0x42] == "β"
        assert mp[0x61] == "A" and mp[0x63] == "C"
        assert mp[0x64] == "X" and mp[0x66] == "Z"

    def test_overflowing_incrementing_bfrange_widens_not_crashes(self):
        """r12 (ADVICE): a hostile bfrange whose dst overflows its
        declared width (<00> <ff> <ffff>) must not escape as
        OverflowError — the dst width widens so base+i always packs."""
        cmap = (
            b"begincodespacerange\n<00> <ff>\nendcodespacerange\n"
            b"1 beginbfrange\n<00> <ff> <ffff>\nendbfrange\n"
        )
        code_len, mp = _parse_cmap(cmap)
        assert code_len == 1
        assert mp[0x00] == "￿"  # in-width entries keep 2 bytes
        # past the declared width: widened to 2 UTF-16BE units
        assert len(mp[0x01].encode("utf-16-be")) == 4
        assert len(mp) == 256

    def test_two_byte_codes(self):
        cmap = (
            b"begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            b"1 beginbfchar\n<0045> <0046>\nendbfchar\n"
        )
        code_len, mp = _parse_cmap(cmap)
        assert code_len == 2
        assert _apply_cmap(b"\x00\x45", 2, mp) == "F"

    def test_unmapped_codes_fall_back_latin1(self):
        assert _apply_cmap(b"xy", 1, {ord("x"): "Q"}) == "Qy"

    def test_extract_text_applies_tounicode(self):
        blob = build_pdf(
            [["abc xyz", "MiXeD case"]],
            tounicode=[(0x61, 0x7A, 0x0041)],
        )
        assert extract_text(blob) == ["ABC XYZ\nMIXED CASE"]

    def test_no_tounicode_unchanged(self):
        blob = build_pdf([["abc"]])
        assert extract_text(blob) == ["abc"]


class TestContentsArray:
    def test_contents_array_joins_streams(self):
        s1, s2 = b"BT (part one) Tj ET", b"BT (part two) Tj ET"
        blob = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(s1)).encode()
            + b" >>\nstream\n" + s1 + b"\nendstream\nendobj\n"
            b"5 0 obj\n<< /Length " + str(len(s2)).encode()
            + b" >>\nstream\n" + s2 + b"\nendstream\nendobj\n"
        )
        assert extract_text(blob) == ["part one\npart two"]


class TestGatedImageCodecs:
    """JBIG2/JPX stay gated (COVERAGE.md r11 decision: the MQ coder's
    47-row table is unverifiable here — the arithmetic-JPEG argument).
    The verifiable part is the gating itself: filter names surface
    verbatim through extract_images and the decode raises by name."""

    def test_jbig2_and_jpx_tagged_and_gated(self):
        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            build_scanned_pdf,
            decode_pdf_image,
            extract_images,
        )

        blob = build_scanned_pdf(
            [
                {"width": 8, "height": 8, "filter": "JBIG2Decode",
                 "data": b"\x97JB2\r\n\x1a\n" + b"\x00" * 16},
                {"width": 4, "height": 4, "filter": "JPXDecode",
                 "data": b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 8},
            ]
        )
        imgs = extract_images(blob)
        assert [i.filter for i in imgs] == ["JBIG2Decode", "JPXDecode"]
        for img in imgs:
            with pytest.raises(PDFError) as ei:
                decode_pdf_image(img)
            assert img.filter in str(ei.value)

    def test_transport_prefix_still_surfaces_codec_name(self):
        # [/ASCIIHexDecode /JBIG2Decode]: the hex armor decodes, the
        # codec name and the DE-ARMORED payload surface for triage
        import re

        from sqlbackuphistoryetl_spark.extensions.pdf_codec import (
            build_scanned_pdf,
            extract_images,
        )

        raw = b"\x97JB2\r\n\x1a\n" + b"\x01\x02\x03\x04"
        blob = build_scanned_pdf(
            [{"width": 8, "height": 8, "filter": "JBIG2Decode",
              "data": raw}]
        )
        armored = blob.replace(
            b"/Filter /JBIG2Decode ",
            b"/Filter [/ASCIIHexDecode /JBIG2Decode] ",
        ).replace(raw, raw.hex().encode("ascii") + b">")
        armored = re.sub(
            rb"/Length \d+ >>\nstream\n" + re.escape(
                raw.hex().encode("ascii") + b">"),
            b"/Length %d >>\nstream\n" % (len(raw) * 2 + 1)
            + raw.hex().encode("ascii") + b">",
            armored,
        )
        imgs = extract_images(armored)
        assert len(imgs) == 1
        assert imgs[0].filter == "JBIG2Decode"
        assert imgs[0].data == raw
