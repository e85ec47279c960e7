"""CCITT fax codings (r10): T.4 Modified Huffman + T.6 Group 4 MMR —
spec vectors, round trips, TIFF integration, corruption/termination."""

from __future__ import annotations

import random
import struct

import pytest

from sqlbackuphistoryetl_spark.extensions import ccitt
from sqlbackuphistoryetl_spark.extensions.ccitt import (
    CCITTError,
    _BitWriter,
    _pack_bits_row,
    _write_run,
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)
from sqlbackuphistoryetl_spark.extensions.tiff_codec import (
    COMP_CCITT_MH,
    COMP_G3,
    COMP_G4,
    TIFFError,
    UnsupportedTIFF,
    decode_tiff,
    encode_tiff,
    probe_tiff,
)


def _rows(w, h, p=0.3, seed=1):
    rng = random.Random(seed)
    return [bytes(1 if rng.random() < p else 0 for _ in range(w))
            for _ in range(h)]


def _packed(rows):
    return b"".join(_pack_bits_row(r) for r in rows)


class TestSpecVectors:
    """Pin table VALUES against ITU T.4/T.6, not just self-consistency
    — a transcription error would round-trip cleanly and still decode
    real-world files wrong."""

    @pytest.mark.parametrize(
        "table,run,expect_bits",
        [
            ("white", 0, "00110101"), ("white", 2, "0111"),
            ("white", 4, "1011"), ("white", 63, "00110100"),
            ("white", 64, "11011"), ("white", 1728, "010011011"),
            ("black", 0, "0000110111"), ("black", 1, "010"),
            ("black", 2, "11"), ("black", 3, "10"),
            ("black", 63, "000001100111"), ("black", 64, "0000001111"),
            ("black", 1728, "0000001100101"),
            ("white", 2560, "000000011111"),  # shared extended make-up
        ],
    )
    def test_t4_code_values(self, table, run, expect_bits):
        enc = ccitt._WHITE_ENC if table == "white" else ccitt._BLACK_ENC
        v, n = enc[run]
        assert n == len(expect_bits)
        assert v == int(expect_bits, 2)

    def test_mode_code_values(self):
        # T.6 table 4: V0=1, VR1=011, VL1=010, H=001, P=0001
        assert ccitt._MODE_ENC["V0"] == (1, 1)
        assert ccitt._MODE_ENC["VR1"] == (0b011, 3)
        assert ccitt._MODE_ENC["VL1"] == (0b010, 3)
        assert ccitt._MODE_ENC["H"] == (0b001, 3)
        assert ccitt._MODE_ENC["P"] == (0b0001, 4)

    def test_mh_known_stream(self):
        # one row, width 12: 4 white, 2 black, 6 white
        # = '1011' + '11' + '1110' → 0b1011111110 padded = 0xBF 0x80
        rows = [bytes([0] * 4 + [1] * 2 + [0] * 6)]
        assert encode_mh(rows, 12) == b"\xbf\x80"
        assert decode_mh(b"\xbf\x80", 12, 1) == _pack_bits_row(rows[0])


class TestRoundTrips:
    @pytest.mark.parametrize("w,h", [(1, 1), (8, 3), (13, 7), (100, 20),
                                     (64, 1), (257, 9)])
    def test_mh(self, w, h):
        rows = _rows(w, h, seed=w * h)
        assert decode_mh(encode_mh(rows, w), w, h) == _packed(rows)

    @pytest.mark.parametrize("p", [0.02, 0.3, 0.7, 0.98])
    @pytest.mark.parametrize("w,h", [(13, 7), (100, 30), (64, 1)])
    def test_g4(self, w, h, p):
        rows = _rows(w, h, p, seed=int(p * 100) + w)
        assert decode_g4(encode_g4(rows, w), w, h) == _packed(rows)

    def test_long_runs_hit_extended_makeups(self):
        rows = [bytes([0] * 2000 + [1] * 1500 + [0] * 100)] * 3
        w = 3600
        assert decode_mh(encode_mh(rows, w), w, 3) == _packed(rows)
        assert decode_g4(encode_g4(rows, w), w, 3) == _packed(rows)

    def test_g4_structured_content(self):
        # text-like structure: vertical+pass modes dominate
        w, h = 200, 50
        rows = []
        for y in range(h):
            row = bytearray(w)
            for x in range(w):
                row[x] = 1 if (x // 7 + y // 5) % 2 else 0
            rows.append(bytes(row))
        assert decode_g4(encode_g4(rows, w), w, h) == _packed(rows)


class TestTiffIntegration:
    @pytest.mark.parametrize("comp", [COMP_CCITT_MH, COMP_G4])
    @pytest.mark.parametrize("pm", [0, 1])
    def test_strip_round_trip(self, comp, pm):
        rng = random.Random(comp + pm)
        w, h = 41, 17
        vals = bytes(1 if rng.random() < 0.4 else 0 for _ in range(w * h))
        blob = encode_tiff(vals, w, h, 1, compression=comp, bits=1,
                           photometric=pm, rows_per_strip=5)
        assert probe_tiff(blob)
        img = decode_tiff(blob)
        if pm == 0:  # WhiteIsZero fax convention
            want = bytes(255 if v == 0 else 0 for v in vals)
        else:
            want = bytes(v * 255 for v in vals)
        assert img.pixels == want

    @pytest.mark.parametrize("comp", [COMP_CCITT_MH, COMP_G4])
    def test_tiled_round_trip(self, comp):
        rng = random.Random(9)
        w, h = 30, 22
        vals = bytes(1 if rng.random() < 0.5 else 0 for _ in range(w * h))
        blob = encode_tiff(vals, w, h, 1, compression=comp, bits=1,
                           tile=(16, 8))
        assert decode_tiff(blob).pixels == bytes(v * 255 for v in vals)

    def test_mislabeled_coding_is_corrupt_not_crash(self):
        # MH data labeled compression 3: G3 decode finds no EOL/valid
        # stream -> classified corrupt, never an escape or a hang
        blob = bytearray(encode_tiff(bytes(16), 4, 4, 1, bits=1,
                                     compression=COMP_CCITT_MH))
        pat = struct.pack("<HHIHH", 259, 3, 1, COMP_CCITT_MH, 0)
        at = bytes(blob).index(pat)
        struct.pack_into("<HHIHH", blob, at, 259, 3, 1, COMP_G3, 0)
        with pytest.raises(TIFFError):
            decode_tiff(bytes(blob))
        # probe is header-only: a plausible header probes True; only
        # decode detects the stream mismatch (same contract as a
        # corrupt LZW strip)
        assert probe_tiff(bytes(blob))

    def test_jpeg_in_tiff_stays_gated(self):
        blob = bytearray(encode_tiff(bytes(16), 4, 4, 1, bits=1,
                                     compression=COMP_CCITT_MH))
        pat = struct.pack("<HHIHH", 259, 3, 1, COMP_CCITT_MH, 0)
        at = bytes(blob).index(pat)
        struct.pack_into("<HHIHH", blob, at, 259, 3, 1, 7, 0)  # JPEG
        with pytest.raises(UnsupportedTIFF, match="compression"):
            decode_tiff(bytes(blob))
        assert not probe_tiff(bytes(blob))

    def test_ccitt_on_non_bilevel_is_corrupt(self):
        blob = bytearray(encode_tiff(bytes(range(16)), 4, 4, 1))
        pat = struct.pack("<HHIHH", 259, 3, 1, 1, 0)
        at = bytes(blob).index(pat)
        struct.pack_into("<HHIHH", blob, at, 259, 3, 1, COMP_G4, 0)
        with pytest.raises(TIFFError, match="non-bilevel"):
            decode_tiff(bytes(blob))

    def test_encoder_rejects_ccitt_non_bilevel(self):
        with pytest.raises(ValueError, match="bilevel"):
            encode_tiff(bytes(range(16)), 4, 4, 1, compression=COMP_G4)


class TestHostile:
    def test_corrupt_streams_raise_ccitt_error(self):
        with pytest.raises(CCITTError):
            decode_mh(b"\x00\x00\x00\x00\x00\x00", 64, 2)
        with pytest.raises(CCITTError):
            decode_g4(b"", 10, 1)

    def test_run_cannot_exceed_row(self):
        # encode a 2560-run code into a 10-wide row
        wr = _BitWriter()
        _write_run(wr, ccitt._WHITE_ENC, 2560)
        _write_run(wr, ccitt._WHITE_ENC, 0)
        with pytest.raises(CCITTError, match="exceeds row width"):
            decode_mh(wr.bytes(), 10, 1)

    def test_mutation_corpus_terminates(self):
        rng = random.Random(0xCC17)
        rows = _rows(50, 20, seed=2)
        for comp_enc, dec in [
            (encode_mh(rows, 50), lambda b: decode_mh(b, 50, 20)),
            (encode_g4(rows, 50), lambda b: decode_g4(b, 50, 20)),
        ]:
            for i in range(150):
                raw = bytearray(comp_enc)
                mode = i % 3
                if mode == 0:
                    raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
                elif mode == 1:
                    raw = raw[: rng.randrange(1, len(raw))]
                else:
                    raw += bytes(rng.randrange(256) for _ in range(8))
                try:
                    dec(bytes(raw))
                except CCITTError:
                    pass


def test_spark_dispatch_g4(spark):
    """A G4 fax TIFF decodes through the full multimodal chain."""
    from sqlbackuphistoryetl_spark.extensions.multimodal import (
        image_quality,
        media_info,
    )

    rng = random.Random(3)
    w, h = 64, 16
    vals = bytes(1 if rng.random() < 0.3 else 0 for _ in range(w * h))
    blob = encode_tiff(vals, w, h, 1, compression=COMP_G4, bits=1,
                       photometric=0)
    df = spark.createDataFrame(
        [(1, blob, "image/tiff")], ["doc_id", "payload", "content_type"]
    )
    mi = media_info(df).collect()[0]
    assert (mi["format"], mi["width"], mi["height"], mi["bit_depth"]) == (
        "tiff", w, h, 1)
    q = image_quality(df).collect()[0]
    n_black = sum(vals)
    # WhiteIsZero: black pixels decode to 0, white to 255
    assert q["decoder"] == "tiff-baseline"
    assert q["mean_lum"] == (255 * (w * h - n_black)) // (w * h)
    assert (q["min_lum"], q["max_lum"]) == (0, 255)


class TestG3:
    """T.4 Group 3 proper (TIFF Compression 3, r10): EOL framing,
    1-D/2-D tag bits, byte-aligned EOLs, K-parameter mixing."""

    @pytest.mark.parametrize("two_d", [False, True])
    @pytest.mark.parametrize("aligned", [False, True])
    def test_round_trips(self, two_d, aligned):
        from sqlbackuphistoryetl_spark.extensions.ccitt import (
            decode_g3,
            encode_g3,
        )

        rows = _rows(41, 17, seed=int(two_d) * 2 + int(aligned))
        enc = encode_g3(rows, 41, two_d=two_d, aligned=aligned)
        assert decode_g3(enc, 41, 17, two_d=two_d,
                         aligned=aligned) == _packed(rows)

    def test_2d_mode_mixes_1d_rows_by_k(self):
        from sqlbackuphistoryetl_spark.extensions.ccitt import (
            decode_g3,
            encode_g3,
        )

        rows = _rows(64, 12, seed=9)
        # k=4: a 1-D row at least every 4th row, all decodable
        enc = encode_g3(rows, 64, two_d=True, k=4)
        assert decode_g3(enc, 64, 12, two_d=True) == _packed(rows)

    def test_missing_leading_eol_tolerated(self):
        from sqlbackuphistoryetl_spark.extensions.ccitt import (
            _BitWriter,
            _encode_1d_row,
            decode_g3,
        )

        rows = _rows(16, 2, seed=3)
        wr = _BitWriter()
        _encode_1d_row(wr, rows[0], 16)  # row 0 without its EOL
        wr.write(1, 12)  # EOL
        _encode_1d_row(wr, rows[1], 16)
        assert decode_g3(wr.bytes(), 16, 2) == _packed(rows)

    def test_tiff_compression_3_round_trip(self):
        rng = random.Random(77)
        for t4 in (0, 1, 4, 5):
            vals = bytes(1 if rng.random() < 0.4 else 0
                         for _ in range(41 * 17))
            blob = encode_tiff(vals, 41, 17, 1, compression=COMP_G3,
                               bits=1, t4_options=t4, rows_per_strip=6)
            assert probe_tiff(blob)
            assert decode_tiff(blob).pixels == bytes(v * 255 for v in vals)

    def test_t4_uncompressed_mode_gated(self):
        blob = bytearray(encode_tiff(bytes(16), 4, 4, 1,
                                     compression=COMP_G3, bits=1,
                                     t4_options=1))
        pat = struct.pack("<HHII", 292, 4, 1, 1)
        at = bytes(blob).index(pat)
        struct.pack_into("<HHII", blob, at, 292, 4, 1, 3)  # bit1 set
        with pytest.raises(UnsupportedTIFF, match="uncompressed"):
            decode_tiff(bytes(blob))
        assert not probe_tiff(bytes(blob))

    def test_g3_mutation_corpus(self):
        from sqlbackuphistoryetl_spark.extensions.ccitt import decode_g3

        rng = random.Random(0x63)
        rows = _rows(50, 20, seed=5)
        from sqlbackuphistoryetl_spark.extensions.ccitt import encode_g3

        base = encode_g3(rows, 50, two_d=True)
        for i in range(150):
            raw = bytearray(base)
            if i % 2:
                raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
            else:
                raw = raw[: rng.randrange(1, len(raw))]
            try:
                decode_g3(bytes(raw), 50, 20, two_d=True)
            except CCITTError:
                pass
