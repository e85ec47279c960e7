"""Stdlib PNG codec (r6 verdict task 6) — decode against hand-built
fixtures (independent of the module's own encoder), every scanline
filter, palette expansion, round trips, and the real-pixel featurize
path through the Arrow plumbing."""

from __future__ import annotations

import struct
import zlib

import pytest

from sqlbackuphistoryetl_spark.extensions.multimodal import (
    decode_and_featurize,
    decode_image,
    extract_payload_metadata,
    resize_image,
)
from sqlbackuphistoryetl_spark.extensions.png_codec import (
    PNG_SIGNATURE,
    DecodedImage,
    PNGError,
    UnsupportedPNG,
    decode_png,
    encode_png,
    grid_features,
    is_png,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png(width, height, color_type, raw_scanlines, extra=b"", bit_depth=8,
         interlace=0):
    """Hand-assembled PNG, independent of encode_png."""
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
                       interlace)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


class TestDecode:
    def test_grayscale_filter_none(self):
        # 3x2 grayscale, filter 0 rows
        raw = b"\x00\x0a\x14\x1e" + b"\x00\x28\x32\x3c"
        img = decode_png(_png(3, 2, 0, raw))
        assert (img.width, img.height, img.channels) == (3, 2, 1)
        assert img.pixels == bytes([10, 20, 30, 40, 50, 60])

    def test_rgb_filter_sub(self):
        # 2x1 RGB, filter 1 (Sub): second pixel stored as delta to first
        # pixels: (10,20,30), (15,25,35) -> deltas (5,5,5)
        raw = b"\x01" + bytes([10, 20, 30, 5, 5, 5])
        img = decode_png(_png(2, 1, 2, raw))
        assert img.pixels == bytes([10, 20, 30, 15, 25, 35])

    def test_filter_up(self):
        # 2x2 gray, row0 filter 0 = [100, 200]; row1 filter 2 (Up) with
        # deltas [10, 56] -> [110, 0] (mod 256)
        raw = b"\x00" + bytes([100, 200]) + b"\x02" + bytes([10, 56])
        img = decode_png(_png(2, 2, 0, raw))
        assert img.pixels == bytes([100, 200, 110, 0])

    def test_filter_average(self):
        # 2x2 gray. row0 filter 0 = [10, 20].
        # row1 filter 3: recon[x] = raw + (left + up)//2
        #   x0: left=0 up=10 -> raw 5 + 5 = 10
        #   x1: left=10 up=20 -> raw 7 + 15 = 22
        raw = b"\x00" + bytes([10, 20]) + b"\x03" + bytes([5, 7])
        img = decode_png(_png(2, 2, 0, raw))
        assert img.pixels == bytes([10, 20, 10, 22])

    def test_filter_paeth(self):
        # 2x2 gray. row0 = [1, 9]. row1 filter 4:
        #   x0: a=0 b=1 c=0 -> paeth=1 (pa=|p-a| with p=1: pa=1,pb=0 -> b)
        #   raw 4 -> 5
        #   x1: a=5 b=9 c=1 -> p=13, pa=8 pb=4 pc=12 -> b=9; raw 1 -> 10
        raw = b"\x00" + bytes([1, 9]) + b"\x04" + bytes([4, 1])
        img = decode_png(_png(2, 2, 0, raw))
        assert img.pixels == bytes([1, 9, 5, 10])

    def test_palette_expands_to_rgb(self):
        plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
        raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([1, 0])
        img = decode_png(_png(2, 2, 3, raw, extra=plte))
        assert img.channels == 3
        assert img.pixels == bytes(
            [255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 0]
        )

    def test_rgba_roundtrip_through_encoder(self):
        import random

        rnd = random.Random(42)
        for channels in (1, 2, 3, 4):
            w, h = 7, 5
            px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
            img = decode_png(encode_png(px, w, h, channels))
            assert (img.width, img.height, img.channels) == (w, h, channels)
            assert img.pixels == px

    def test_bad_signature_and_crc(self):
        with pytest.raises(PNGError):
            decode_png(b"not a png at all")
        good = _png(1, 1, 0, b"\x00\x7f")
        corrupted = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]
        with pytest.raises(PNGError):
            decode_png(corrupted)

    def test_illegal_ihdr_combinations_are_stream_errors(self):
        # every legal IHDR form decodes since r9; the illegal
        # depth/color-type combinations are malformed streams
        with pytest.raises(PNGError):  # 16-bit palette is malformed
            decode_png(_png(1, 1, 3, b"\x00\x00\x00", bit_depth=16))
        with pytest.raises(PNGError):  # sub-byte RGB is malformed
            decode_png(_png(1, 1, 2, b"\x00\x0f", bit_depth=4))
        with pytest.raises(PNGError):  # depth 3 does not exist
            decode_png(_png(1, 1, 0, b"\x00\x0f", bit_depth=3))

    def test_16bit_reduces_to_high_byte(self):
        img = decode_png(_png(1, 1, 0, b"\x00\xab\xcd", bit_depth=16))
        assert img.pixels == b"\xab"
        # RGB 16-bit, 2x1: 6 samples of 2 bytes each per row
        row = b"\x00" + bytes(
            [0x11, 0x99, 0x22, 0x88, 0x33, 0x77, 0x44, 0x66, 0x55, 0x01, 0x66, 0x02]
        )
        img = decode_png(_png(2, 1, 2, row, bit_depth=16))
        assert img.pixels == bytes([0x11, 0x22, 0x33, 0x44, 0x55, 0x66])

    def test_adam7_matches_sequential(self):
        # reference interlacer: extract each Adam7 pass, filter 0
        from sqlbackuphistoryetl_spark.extensions.png_codec import (
            _adam7_passes,
        )

        import random

        rng = random.Random(13)
        for w, h, ct in [(8, 8, 0), (9, 7, 2), (3, 5, 0), (1, 1, 0),
                         (2, 2, 6), (16, 4, 4)]:
            bpp = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
            px = bytes(rng.randrange(256) for _ in range(w * h * bpp))
            raw = bytearray()
            for xs, ys, xstep, ystep, subw, subh in _adam7_passes(w, h):
                for ry in range(subh):
                    raw.append(0)  # filter none
                    y = ys + ry * ystep
                    for rx in range(subw):
                        x = xs + rx * xstep
                        o = (y * w + x) * bpp
                        raw += px[o : o + bpp]
            img = decode_png(_png(w, h, ct, bytes(raw), interlace=1))
            assert (img.width, img.height, img.channels) == (w, h, bpp)
            assert img.pixels == px, (w, h, ct)

    def test_adam7_16bit_combined(self):
        # 2x2 gray 16-bit interlaced: passes 1 (1px), 6 (1px), 7 (2px)
        from sqlbackuphistoryetl_spark.extensions.png_codec import (
            _adam7_passes,
        )

        px16 = {  # (x, y) -> 2-byte sample
            (0, 0): b"\xaa\x01", (1, 0): b"\xbb\x02",
            (0, 1): b"\xcc\x03", (1, 1): b"\xdd\x04",
        }
        raw = bytearray()
        for xs, ys, xstep, ystep, subw, subh in _adam7_passes(2, 2):
            for ry in range(subh):
                raw.append(0)
                y = ys + ry * ystep
                for rx in range(subw):
                    raw += px16[(xs + rx * xstep, y)]
        img = decode_png(_png(2, 2, 0, bytes(raw), bit_depth=16, interlace=1))
        assert img.pixels == bytes([0xAA, 0xBB, 0xCC, 0xDD])

    def test_is_png(self):
        assert is_png(_png(1, 1, 0, b"\x00\x7f"))
        assert not is_png(b"plain text")
        assert not is_png(None)


class TestResizeAndFeatures:
    def test_resize_nearest_downsamples(self):
        # 4x4 gray quadrants -> 2x2 picks the top-left of each quadrant
        px = bytes(
            [0, 0, 100, 100,
             0, 0, 100, 100,
             200, 200, 50, 50,
             200, 200, 50, 50]
        )
        img = DecodedImage(4, 4, 1, px)
        out = resize_nearest(img, 2, 2)
        assert out.pixels == bytes([0, 100, 200, 50])

    def test_grid_features_hand_math(self):
        # 4 gray pixels, 2 blocks: means (10+30)/2=20, (50+70)/2=60
        img = DecodedImage(2, 2, 1, bytes([10, 30, 50, 70]))
        f = grid_features(img, 2)
        assert f == [20 / 127.5 - 1.0, 60 / 127.5 - 1.0]

    def test_grid_features_rgb_luminance_ignores_alpha(self):
        img = DecodedImage(1, 1, 4, bytes([30, 60, 90, 255]))
        f = grid_features(img, 1)
        assert f == [60 / 127.5 - 1.0]  # (30+60+90)//3, alpha excluded


class TestMultimodalIntegration:
    def test_decode_image_png_real_other_stubbed(self):
        img = decode_image(encode_png(bytes([7, 8, 9]), 3, 1, 1))
        assert img.pixels == bytes([7, 8, 9])
        # formats with no codec stay behind the stub gate; a CORRUPT
        # stream of an implemented format (JPEG since r8) raises that
        # codec's malformed error instead, like corrupt PNG does
        with pytest.raises(NotImplementedError):
            decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
        from sqlbackuphistoryetl_spark.extensions.jpeg_codec import JPEGError

        with pytest.raises(JPEGError):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")

    def test_resize_image_png_roundtrip(self):
        src = encode_png(bytes(range(16)), 4, 4, 1)
        out = decode_png(resize_image(src, 2, 2))
        assert (out.width, out.height) == (2, 2)
        assert out.pixels == bytes([0, 2, 8, 10])

    def test_featurize_real_png_vs_fake(self, spark):
        png1 = encode_png(bytes([10, 30, 50, 70]), 2, 2, 1)
        png2 = encode_png(bytes([10, 30, 50, 70]), 2, 2, 1)
        df = spark.createDataFrame(
            [
                (1, bytearray(png1), "image/png"),
                (2, bytearray(b"not an image"), "application/octet-stream"),
                (3, bytearray(png2), "image/png"),
            ],
            "doc_id long, payload binary, content_type string",
        )
        got = {
            r["doc_id"]: r for r in decode_and_featurize(df, feature_dim=2).collect()
        }
        assert got[1]["decoder"] == "png-zlib"
        assert got[2]["decoder"] == "fake-sha256"
        # real-pixel features: block luminance means, hand-computed
        assert got[1]["feature"] == pytest.approx(
            [20 / 127.5 - 1.0, 60 / 127.5 - 1.0]
        )
        # determinism: identical payloads -> identical features
        assert got[1]["feature"] == got[3]["feature"]
        assert len(got[2]["feature"]) == 2

    def test_metadata_marks_png_decodable(self, spark):
        png = encode_png(bytes([1]), 1, 1, 1)
        df = spark.createDataFrame(
            [
                (1, bytearray(png), "image/png"),
                (2, bytearray(b"\xff\xd8jpeg"), "image/jpeg"),
                (3, bytearray(b"hello"), "text/plain"),
            ],
            "doc_id long, payload binary, content_type string",
        )
        got = {
            r["doc_id"]: r["decode_status"]
            for r in extract_payload_metadata(df).collect()
        }
        assert got == {1: "ok", 2: "stubbed", 3: "ok"}


class TestHostilePayloads:
    """Round-7 review fixes: bombs, corrupt bodies, header probe."""

    def test_decompression_bomb_is_rejected_cheaply(self):
        # 1 KB payload declaring 100000x100000 grayscale: must raise
        # BEFORE materializing the declared gigabytes
        import time

        raw = zlib.compress(b"\x00" * 10_000)
        bomb = _png(100_000, 100_000, 0, b"")  # dims only; IDAT below
        bomb = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", raw)
            + _chunk(b"IEND", b"")
        )
        t0 = time.perf_counter()
        with pytest.raises(UnsupportedPNG, match="decode budget"):
            decode_png(bomb)
        assert time.perf_counter() - t0 < 1.0

    def test_overlong_idat_is_rejected(self):
        # 1x1 gray declares 2 raw bytes; IDAT inflates to far more
        over = zlib.compress(b"\x00\x7f" + b"\xab" * 1000)
        bad = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", over)
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(PNGError, match="past the declared size"):
            decode_png(bad)

    def test_probe_png_matches_decodability(self):
        from sqlbackuphistoryetl_spark.extensions.png_codec import probe_png

        good = encode_png(bytes([1, 2, 3]), 3, 1, 1)
        assert probe_png(good)
        assert not probe_png(b"not png")
        assert not probe_png(None)
        # 16-bit and Adam7 probe True since r8, sub-byte since r9;
        # illegal combinations and bad interlace methods stay rejected
        assert probe_png(_png(1, 1, 0, b"\x00\x00\x7f", bit_depth=16))
        assert probe_png(_png(1, 1, 0, b"\x00\x7f", interlace=1))
        assert probe_png(_png(1, 1, 0, b"\x00\x0f", bit_depth=4))
        assert not probe_png(_png(1, 1, 3, b"\x00\x00\x00", bit_depth=16))
        assert not probe_png(_png(1, 1, 2, b"\x00\x0f", bit_depth=4))
        assert not probe_png(_png(1, 1, 0, b"\x00\x0f", bit_depth=3))
        assert not probe_png(_png(1, 1, 0, b"\x00\x7f", interlace=2))
        # over-budget dims probe False without touching IDAT
        huge = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 99_999, 99_999, 8, 6, 0, 0, 0))
        )
        assert not probe_png(huge)

    def test_corrupt_png_falls_back_to_fake_in_featurize(self, spark):
        # valid signature + IHDR, corrupt IDAT: the job must NOT die —
        # the row takes the sha256-fake path with its decoder recorded
        corrupt = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", b"\x01\x02definitely not zlib")
            + _chunk(b"IEND", b"")
        )
        good = encode_png(bytes([10, 30, 50, 70]), 2, 2, 1)
        df = spark.createDataFrame(
            [(1, bytearray(corrupt), "image/png"),
             (2, bytearray(good), "image/png")],
            "doc_id long, payload binary, content_type string",
        )
        got = {r["doc_id"]: r["decoder"]
               for r in decode_and_featurize(df, feature_dim=2).collect()}
        assert got == {1: "fake-sha256", 2: "png-zlib"}

    def test_metadata_probe_not_just_signature(self, spark):
        # an over-budget PNG passes is_png but decode_image can't take
        # it: metadata must say 'stubbed', not 'ok' (16-bit / Adam7
        # decode since r8, sub-byte since r9 — all report 'ok')
        bomb = (
            PNG_SIGNATURE
            + _chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", 60_000, 60_000, 8, 6, 0, 0, 0),
            )
            + _chunk(b"IDAT", b"\x00")
            + _chunk(b"IEND", b"")
        )
        four = _png(1, 1, 0, b"\x00\x0f", bit_depth=4)
        sixteen = _png(1, 1, 0, b"\x00\x00\x7f", bit_depth=16)
        df = spark.createDataFrame(
            [(1, bytearray(bomb), "image/png"),
             (2, bytearray(sixteen), "image/png"),
             (3, bytearray(four), "image/png")],
            "doc_id long, payload binary, content_type string",
        )
        got = {r["doc_id"]: r["decode_status"]
               for r in extract_payload_metadata(df).collect()}
        assert got == {1: "stubbed", 2: "ok", 3: "ok"}


class TestSubByte:
    """1/2/4-bit packed PNG (r9): MSB-first within each byte, rows
    padded to byte edges, filters run on the packed BYTES (bpp=1);
    gray samples scale by 255/85/17, palette indexes unpack raw."""

    def test_1bit_gray(self):
        # 10x2: row bits 1010101010 -> 0xAA 0x80, 0101010101 -> 0x55 0x40
        raw = b"\x00\xaa\x80" + b"\x00\x55\x40"
        img = decode_png(_png(10, 2, 0, raw, bit_depth=1))
        assert (img.width, img.height, img.channels) == (10, 2, 1)
        assert img.pixels == bytes(
            [255, 0] * 5 + [0, 255] * 5
        )

    def test_2bit_gray_scaling(self):
        # 5x1: samples 0,1,2,3,2 -> packed 00 01 10 11 | 10 000000
        raw = b"\x00" + bytes([0b00011011, 0b10000000])
        img = decode_png(_png(5, 1, 0, raw, bit_depth=2))
        assert img.pixels == bytes([0, 85, 170, 255, 170])

    def test_4bit_gray_scaling_and_odd_width(self):
        # 3x2: padding nibble after the 3rd sample of each row
        raw = b"\x00" + bytes([0x0F, 0x70]) + b"\x00" + bytes([0xA3, 0xC0])
        img = decode_png(_png(3, 2, 0, raw, bit_depth=4))
        assert img.pixels == bytes(
            [0 * 17, 15 * 17, 7 * 17, 10 * 17, 3 * 17, 12 * 17]
        )

    def test_4bit_palette(self):
        plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
        # 3x1 indexes 2,0,1 -> packed 0x20 0x10
        raw = b"\x00" + bytes([0x20, 0x10])
        img = decode_png(_png(3, 1, 3, raw, extra=plte, bit_depth=4))
        assert img.channels == 3
        assert img.pixels == bytes([0, 0, 255, 255, 0, 0, 0, 255, 0])

    def test_1bit_palette_index_out_of_range(self):
        plte = _chunk(b"PLTE", bytes([1, 2, 3]))  # one entry
        raw = b"\x00\x40"  # index 1 at x=1
        with pytest.raises(PNGError, match="palette index"):
            decode_png(_png(2, 1, 3, raw, extra=plte, bit_depth=1))

    def test_filters_run_on_packed_bytes(self):
        # 16x2 1-bit: stride is 2 bytes. Row 0 filter 0 = A5 3C; row 1
        # filter 1 (Sub, bpp=1): out[x] = row[x] + out[x-1]; row 2
        # filter 2 (Up): out = row + prev row's bytes
        r0 = bytes([0xA5, 0x3C])
        r1_out = bytes([0x0F, 0x4E])
        r1 = bytes([0x0F, (0x4E - 0x0F) & 0xFF])
        r2_out = bytes([0xF0, 0x81])
        r2 = bytes([(0xF0 - 0x0F) & 0xFF, (0x81 - 0x4E) & 0xFF])
        raw = b"\x00" + r0 + b"\x01" + r1 + b"\x02" + r2
        img = decode_png(_png(16, 3, 0, raw, bit_depth=1))
        want = bytearray()
        for rowbytes in (r0, r1_out, r2_out):
            for byte in rowbytes:
                for bit in range(7, -1, -1):
                    want.append(255 if (byte >> bit) & 1 else 0)
        assert img.pixels == bytes(want)

    def test_adam7_sub_byte_matches_sequential(self):
        # reference interlacer packing each pass's rows sub-byte
        from sqlbackuphistoryetl_spark.extensions.png_codec import (
            _adam7_passes,
        )
        import random

        rng = random.Random(29)
        for w, h, depth in [(8, 8, 1), (9, 7, 2), (5, 3, 4), (1, 1, 1),
                            (16, 5, 2), (3, 9, 4)]:
            vals = [rng.randrange(1 << depth) for _ in range(w * h)]
            raw = bytearray()
            for xs, ys, xstep, ystep, subw, subh in _adam7_passes(w, h):
                for ry in range(subh):
                    raw.append(0)  # filter none
                    row = bytearray((subw * depth + 7) // 8)
                    y = ys + ry * ystep
                    for rx in range(subw):
                        v = vals[y * w + (xs + rx * xstep)]
                        shift = 8 - depth - ((rx * depth) & 7)
                        row[(rx * depth) >> 3] |= v << shift
                    raw += row
            img = decode_png(
                _png(w, h, 0, bytes(raw), bit_depth=depth, interlace=1)
            )
            factor = {1: 255, 2: 85, 4: 17}[depth]
            assert img.pixels == bytes(v * factor for v in vals), (w, h, depth)

    def test_encode_roundtrip_sub_byte(self):
        import random

        rng = random.Random(31)
        for depth in (1, 2, 4):
            for w, h in [(1, 1), (7, 3), (16, 2), (9, 9)]:
                vals = bytes(
                    rng.randrange(1 << depth) for _ in range(w * h)
                )
                blob = encode_png(vals, w, h, 1, bit_depth=depth)
                img = decode_png(blob)
                factor = {1: 255, 2: 85, 4: 17}[depth]
                assert img.pixels == bytes(v * factor for v in vals)

    def test_encode_guards(self):
        with pytest.raises(ValueError, match="bits"):
            encode_png(bytes([4]), 1, 1, 1, bit_depth=2)
        with pytest.raises(ValueError, match="grayscale"):
            encode_png(bytes(3), 1, 1, 3, bit_depth=4)
        with pytest.raises(ValueError, match="bit_depth"):
            encode_png(bytes(1), 1, 1, 1, bit_depth=16)

    def test_multimodal_routes_sub_byte(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            decode_image,
        )

        blob = encode_png(bytes([0, 1, 2, 3, 3, 2, 1, 0]), 4, 2, 1,
                          bit_depth=2)
        img = decode_image(blob)
        assert img.pixels == bytes(
            v * 85 for v in [0, 1, 2, 3, 3, 2, 1, 0]
        )
        df = spark.createDataFrame(
            [(1, bytearray(blob), "image/png")],
            "doc_id long, payload binary, content_type string",
        )
        got = decode_and_featurize(df, feature_dim=2).first()
        assert got["decoder"] == "png-zlib"


class TestImageDHash:
    """Perceptual dHash + banded hamming near-dup join (r7)."""

    def _img_png(self, seed, w=16, h=16, flip=None):
        import random

        rnd = random.Random(seed)
        px = bytearray(rnd.randrange(256) for _ in range(w * h))
        if flip is not None:
            px[flip] ^= 0xFF
        return encode_png(bytes(px), w, h, 1)

    def test_dhash_deterministic_and_locality(self):
        from sqlbackuphistoryetl_spark.extensions.png_codec import (
            decode_png as dec,
            dhash,
        )

        a = dec(self._img_png(1))
        b = dec(self._img_png(1))
        c = dec(self._img_png(2))
        assert dhash(a) == dhash(b)
        # a single flipped pixel moves few bits; a different image many
        near = dec(self._img_png(1, flip=40))
        ham_near = bin(dhash(a) ^ dhash(near)).count("1")
        ham_far = bin(dhash(a) ^ dhash(c)).count("1")
        assert ham_near < ham_far
        assert ham_near <= 6

    def test_image_dhash_rejects_non_64_bit_grids(self, spark):
        # r7 advice: the signed fold + LongType column hold exactly 64
        # bits; an 8x9 grid (72 bits) must fail fast, not overflow at
        # Arrow conversion
        from sqlbackuphistoryetl_spark.extensions.multimodal import image_dhash

        df = spark.createDataFrame([(1, bytearray(b""))], "doc_id long, payload binary")
        with pytest.raises(ValueError, match="64"):
            image_dhash(df, hash_w=8, hash_h=9)
        with pytest.raises(ValueError, match="64"):
            image_dhash(df, hash_w=4, hash_h=8)

    def test_near_dup_banded_join_matches_brute_force(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            image_dhash,
            image_near_dup,
        )
        from sqlbackuphistoryetl_spark.extensions.png_codec import (
            decode_png as dec,
            dhash,
        )

        payloads = {
            1: self._img_png(1),
            2: self._img_png(1),            # exact dup of 1
            3: self._img_png(1, flip=40),   # near dup of 1
            4: self._img_png(9),            # unrelated
            5: b"not an image",              # undecodable -> NULL hash
        }
        df = spark.createDataFrame(
            [(k, bytearray(v)) for k, v in payloads.items()],
            "doc_id long, payload binary",
        )
        hashes = image_dhash(df)
        got_h = {r["doc_id"]: r["dhash"] for r in hashes.collect()}
        assert got_h[5] is None and got_h[1] == got_h[2]

        for t in (0, 3, 6):
            got = sorted(
                (r["id_a"], r["id_b"], r["hamming"])
                for r in image_near_dup(hashes, max_hamming=t).collect()
            )
            # brute force over the decodable payloads
            hs = {
                k: dhash(dec(v))
                for k, v in payloads.items()
                if k != 5
            }

            def _signed(x):
                return x - (1 << 64) if x >= 1 << 63 else x

            want = sorted(
                (a, b, bin(hs[a] ^ hs[b]).count("1"))
                for a in hs
                for b in hs
                if a < b and bin(hs[a] ^ hs[b]).count("1") <= t
            )
            assert got == want, (t, got, want)

    def test_near_dup_plan_is_banded_not_cartesian(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            image_near_dup,
        )

        hashes = spark.createDataFrame(
            [(i, i * 7919) for i in range(20)], "doc_id long, dhash long"
        )
        plan = (
            image_near_dup(hashes, max_hamming=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "PythonUDF" not in plan  # verify is JVM bit_count
