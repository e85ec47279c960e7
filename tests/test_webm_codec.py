"""WebM/Matroska EBML header triage (r11): varint arithmetic, field
parsing, unknown-size segments, budgets, gated decode, media_info
dispatch."""

from __future__ import annotations

import pytest

from sqlbackuphistoryetl_spark.extensions.webm_codec import (
    MAX_ELEMENTS,
    WebMError,
    _read_id,
    _read_size,
    _vint,
    build_webm,
    decode_webm_frames,
    is_webm,
    parse_webm,
)


class TestVarints:
    def test_vint_round_trip(self):
        for n in (0, 1, 126, 127, 128, 16382, 16383, 1 << 20, 1 << 48):
            enc = _vint(n)
            size, pos = _read_size(enc, 0, len(enc))
            assert size == n and pos == len(enc)

    def test_unknown_size_is_none(self):
        assert _read_size(b"\xff", 0, 1) == (None, 1)
        assert _read_size(b"\x7f\xff", 0, 2) == (None, 2)

    def test_id_keeps_marker_bits(self):
        eid, pos = _read_id(b"\x1a\x45\xdf\xa3", 0, 4)
        assert eid == 0x1A45DFA3 and pos == 4
        eid, pos = _read_id(b"\xae\x00", 0, 2)
        assert eid == 0xAE and pos == 1

    def test_zero_first_byte_raises(self):
        with pytest.raises(WebMError):
            _read_id(b"\x00\x01\x02\x03\x04", 0, 5)


class TestParse:
    def test_full_fixture_round_trip(self):
        blob = build_webm(
            1280, 720, 2, 48000, bit_depth=24, duration_ms=90_000
        )
        assert is_webm(blob)
        info = parse_webm(blob)
        assert info.doc_type == "webm"
        assert (info.width, info.height) == (1280, 720)
        assert info.video_codec == "V_VP9"
        assert (info.channels, info.sample_rate, info.bit_depth) == (
            2, 48000, 24,
        )
        assert info.audio_codec == "A_OPUS"
        assert info.n_tracks == 2
        assert info.duration_ms == 90_000

    def test_matroska_doctype(self):
        info = parse_webm(
            build_webm(64, 48, 1, 8000, doc_type="matroska",
                       video_codec="V_MPEG4/ISO/AVC")
        )
        assert info.doc_type == "matroska"
        assert info.video_codec == "V_MPEG4/ISO/AVC"

    def test_unknown_segment_size_streaming_layout(self):
        blob = build_webm(320, 240, 1, 16000, unknown_segment_size=True)
        info = parse_webm(blob)
        assert (info.width, info.height) == (320, 240)
        assert info.sample_rate == 16000

    def test_cluster_bytes_never_parsed(self):
        # hostile cluster content: valid-looking EBML garbage inside
        blob = build_webm(
            16, 16, 1, 8000, cluster_bytes=b"\x1a\x45\xdf\xa3" * 200
        )
        info = parse_webm(blob)
        assert info.width == 16  # walk untouched by cluster payload

    def test_not_ebml_raises(self):
        with pytest.raises(WebMError):
            parse_webm(b"RIFF....")

    def test_element_budget(self):
        # a flood of tiny valid elements at top level after the header
        flood = b"\xec\x80" * (MAX_ELEMENTS + 10)  # Void elements
        blob = build_webm(8, 8, 1, 8000) + flood
        with pytest.raises(WebMError):
            parse_webm(blob)

    def test_truncated_raises(self):
        blob = build_webm(8, 8, 1, 8000)
        with pytest.raises(WebMError):
            parse_webm(blob[: len(blob) // 3])

    def test_oversize_element_raises(self):
        # EBML magic + size varint claiming more than the buffer holds
        blob = b"\x1a\x45\xdf\xa3" + _vint(1 << 30) + b"\x00" * 8
        with pytest.raises(WebMError):
            parse_webm(blob)

    def test_decode_is_gated(self):
        with pytest.raises(WebMError) as ei:
            decode_webm_frames(build_webm(8, 8, 1, 8000))
        assert "gated" in str(ei.value) and "V_VP9" in str(ei.value)


def test_media_info_dispatch(spark):
    from pyspark.sql import functions as F

    from sqlbackuphistoryetl_spark.extensions.multimodal import media_info

    rows = [
        (1, build_webm(640, 360, 2, 44100)),
        (2, build_webm(100, 50, 1, 8000, doc_type="matroska")),
        (3, build_webm(8, 8, 1, 8000)[:10]),  # truncated → unknown
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in media_info(df).collect()}
    assert got[1]["format"] == "webm"
    assert (got[1]["width"], got[1]["height"]) == (640, 360)
    assert (got[1]["channels"], got[1]["sample_rate"]) == (2, 44100)
    assert got[2]["format"] == "mkv"
    assert got[3]["format"] == "unknown"
