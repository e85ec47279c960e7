"""Property fuzz for the PNG and WAV codecs (r7 verdict task 8) —
the PassJoin-fuzz doctrine applied to the container family:

- PNG decode is exercised against an INDEPENDENT reference encoder
  written here (random filter type per scanline across all five spec
  filters, every color type incl. palette), so a decoder filter/bpp
  bug can't be masked by the module encoder's filter-0-only output.
- Encoders are pinned deterministic: encode(decode(encode(x))) is
  byte-identical to encode(x).
- A mutation corpus (bit flips, truncations, CRC/length corruption,
  declared-size bombs) asserts decode always terminates quickly with
  the codec's own error types — never an uncaught exception, never a
  hang, never a silent giant allocation.

Together with the JPEG and AVI sweeps in test_jpeg_codec.py /
test_avi_codec.py this puts > 2,000 adversarial/random cases on the
codec family per test run.
"""

from __future__ import annotations

import random
import struct
import time
import zlib

import pytest

from sqlbackuphistoryetl_spark.extensions.png_codec import (
    PNG_SIGNATURE,
    PNGError,
    UnsupportedPNG,
    decode_png,
    encode_png,
)
from sqlbackuphistoryetl_spark.extensions.wav_codec import (
    DecodedAudio,
    UnsupportedWAV,
    WAVError,
    decode_wav,
    encode_wav,
    probe_wav,
)

# ------------------------------------------------------------------ PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _ref_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int,
    filters: list[int],
    plte: bytes | None = None,
) -> bytes:
    """Reference encoder independent of the module's: applies the
    GIVEN filter type to each scanline (spec §6 forward direction)."""
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = width * bpp
    raw = bytearray()
    for y in range(height):
        f = filters[y]
        raw.append(f)
        row = pixels[y * stride : (y + 1) * stride]
        prior = pixels[(y - 1) * stride : y * stride] if y else b"\x00" * stride
        for x in range(stride):
            cur = row[x]
            left = row[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - left
            elif f == 2:
                v = cur - up
            elif f == 3:
                v = cur - ((left + up) >> 1)
            else:
                v = cur - _paeth(left, up, ul)
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def _ref_png_interlaced(
    pixels: bytes, width: int, height: int, color_type: int,
    rng: random.Random,
) -> bytes:
    """Adam7 reference interlacer (random filter per pass scanline)."""
    from sqlbackuphistoryetl_spark.extensions.png_codec import _adam7_passes

    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = bytearray()
    for xs, ys, xstep, ystep, subw, subh in _adam7_passes(width, height):
        # extract the pass sub-image, then filter it like a standalone
        # image (spec: filters reference the previous line of the PASS)
        sub = bytearray()
        for ry in range(subh):
            y = ys + ry * ystep
            for rx in range(subw):
                x = xs + rx * xstep
                o = (y * width + x) * bpp
                sub += pixels[o : o + bpp]
        filters = [rng.randrange(5) for _ in range(subh)]
        stride = subw * bpp
        for ry in range(subh):
            f = filters[ry]
            raw.append(f)
            row = sub[ry * stride : (ry + 1) * stride]
            prior = sub[(ry - 1) * stride : ry * stride] if ry else b"\x00" * stride
            for x in range(stride):
                cur = row[x]
                left = row[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if f == 0:
                    v = cur
                elif f == 1:
                    v = cur - left
                elif f == 2:
                    v = cur - up
                elif f == 3:
                    v = cur - ((left + up) >> 1)
                else:
                    v = cur - _paeth(left, up, ul)
                raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _pack_row(vals: list[int], depth: int) -> bytearray:
    row = bytearray((len(vals) * depth + 7) // 8)
    for x, v in enumerate(vals):
        shift = 8 - depth - ((x * depth) & 7)
        row[(x * depth) >> 3] |= v << shift
    return row


def _ref_png_sub_byte(
    vals: list[int],
    width: int,
    height: int,
    depth: int,
    color_type: int,
    filters: list[int],
    plte: bytes | None = None,
) -> bytes:
    """Reference sub-byte encoder: pack rows MSB-first, then apply the
    GIVEN filter to the packed BYTES with bpp=1 (spec §6 + §7.2)."""
    packed = [
        _pack_row(vals[y * width : (y + 1) * width], depth)
        for y in range(height)
    ]
    stride = len(packed[0])
    raw = bytearray()
    for y in range(height):
        f = filters[y]
        raw.append(f)
        row = packed[y]
        prior = packed[y - 1] if y else b"\x00" * stride
        for x in range(stride):
            cur = row[x]
            left = row[x - 1] if x >= 1 else 0
            up = prior[x]
            ul = prior[x - 1] if x >= 1 else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - left
            elif f == 2:
                v = cur - up
            elif f == 3:
                v = cur - ((left + up) >> 1)
            else:
                v = cur - _paeth(left, up, ul)
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


class TestPNGFuzz:
    def test_interlaced_vs_reference_all_filters(self):
        rng = random.Random(777)
        for trial in range(120):
            color_type = rng.choice([0, 2, 4, 6])
            bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
            w = rng.randrange(1, 14)
            h = rng.randrange(1, 14)
            px = bytes(rng.randrange(256) for _ in range(w * h * bpp))
            blob = _ref_png_interlaced(px, w, h, color_type, rng)
            img = decode_png(blob)
            assert (img.width, img.height, img.channels) == (w, h, bpp)
            assert img.pixels == px, (trial, color_type, w, h)

    def test_decoder_vs_reference_encoder_all_filters_and_types(self):
        rng = random.Random(1234)
        for trial in range(250):
            color_type = rng.choice([0, 2, 3, 4, 6])
            bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
            w = rng.randrange(1, 13)
            h = rng.randrange(1, 13)
            filters = [rng.randrange(5) for _ in range(h)]
            if color_type == 3:
                n_pal = rng.randrange(1, 17)
                plte = bytes(rng.randrange(256) for _ in range(3 * n_pal))
                px = bytes(rng.randrange(n_pal) for _ in range(w * h))
                expected = b"".join(
                    plte[3 * i : 3 * i + 3] for i in px
                )
                exp_channels = 3
            else:
                plte = None
                px = bytes(rng.randrange(256) for _ in range(w * h * bpp))
                expected = px
                exp_channels = bpp
            blob = _ref_png(px, w, h, color_type, filters, plte)
            img = decode_png(blob)
            ctx = (trial, color_type, w, h, filters)
            assert (img.width, img.height, img.channels) == (
                w, h, exp_channels,
            ), ctx
            assert img.pixels == expected, ctx

    def test_sub_byte_vs_reference_all_filters(self):
        # r9: 1/2/4-bit gray + palette, every filter type, odd widths
        # (byte-padding bits), against an independent packed encoder
        rng = random.Random(909)
        for trial in range(150):
            depth = rng.choice([1, 2, 4])
            color_type = rng.choice([0, 3])
            w = rng.randrange(1, 20)
            h = rng.randrange(1, 12)
            filters = [rng.randrange(5) for _ in range(h)]
            if color_type == 3:
                n_pal = rng.randrange(1, (1 << depth) + 1)
                plte = bytes(rng.randrange(256) for _ in range(3 * n_pal))
                vals = [rng.randrange(n_pal) for _ in range(w * h)]
                expected = b"".join(plte[3 * i : 3 * i + 3] for i in vals)
                exp_channels = 3
            else:
                plte = None
                vals = [rng.randrange(1 << depth) for _ in range(w * h)]
                factor = {1: 255, 2: 85, 4: 17}[depth]
                expected = bytes(v * factor for v in vals)
                exp_channels = 1
            blob = _ref_png_sub_byte(
                vals, w, h, depth, color_type, filters, plte
            )
            img = decode_png(blob)
            ctx = (trial, depth, color_type, w, h, filters)
            assert (img.width, img.height, img.channels) == (
                w, h, exp_channels,
            ), ctx
            assert img.pixels == expected, ctx

    def test_sub_byte_mutation_corpus(self):
        rng = random.Random(9321)
        base = encode_png(
            bytes(rng.randrange(4) for _ in range(18 * 11)), 18, 11, 1,
            bit_depth=2,
        )
        for _ in range(200):
            buf = bytearray(base)
            for _ in range(rng.randrange(1, 5)):
                buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            if rng.random() < 0.3:
                buf = buf[: rng.randrange(8, len(buf))]
            try:
                decode_png(bytes(buf))
            except (PNGError, UnsupportedPNG):
                pass

    def test_encode_is_deterministic_fixed_point(self):
        rng = random.Random(77)
        for _ in range(50):
            c = rng.choice([1, 2, 3, 4])
            w, h = rng.randrange(1, 10), rng.randrange(1, 10)
            px = bytes(rng.randrange(256) for _ in range(w * h * c))
            one = encode_png(px, w, h, c)
            img = decode_png(one)
            two = encode_png(img.pixels, img.width, img.height, img.channels)
            assert one == two  # encode∘decode is the identity on streams

    def test_mutation_corpus_terminates_with_codec_errors(self):
        rng = random.Random(4321)
        base = encode_png(bytes(range(256)) * 3, 16, 16, 3)
        t0 = time.perf_counter()
        for trial in range(400):
            buf = bytearray(base)
            kind = rng.randrange(4)
            if kind == 0:  # random bit flips
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            elif kind == 1:  # truncation
                buf = buf[: rng.randrange(8, len(buf))]
            elif kind == 2:  # declared-dimension bomb in IHDR
                buf[16:24] = struct.pack(">II", 1 << 24, 1 << 24)
            else:  # chunk length corruption
                pos = rng.randrange(8, len(buf) - 4)
                buf[pos : pos + 4] = struct.pack(
                    ">I", rng.randrange(1 << 31)
                )
            try:
                decode_png(bytes(buf))
            except (PNGError, UnsupportedPNG):
                pass
        # 400 hostile decodes must stay trivially fast (no quadratic
        # scans, no giant allocations before the guards fire)
        assert time.perf_counter() - t0 < 20.0

    def test_idat_bomb_is_bounded(self):
        # honest 4x4 header, IDAT that inflates to 100 MB: the
        # expected-size-bounded decompress must reject it fast
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        bomb = zlib.compress(b"\x00" * (100 * 1024 * 1024), 9)
        blob = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", bomb)
            + _chunk(b"IEND", b"")
        )
        t0 = time.perf_counter()
        with pytest.raises(PNGError):
            decode_png(blob)
        assert time.perf_counter() - t0 < 1.0


# ------------------------------------------------------------------ WAV


class TestWAVFuzz:
    def test_random_roundtrips_byte_exact(self):
        rng = random.Random(99)
        for trial in range(250):
            channels = rng.randrange(1, 4)
            n_frames = rng.randrange(0, 200)
            rate = rng.choice([8000, 16000, 44100, 48000])
            samples = [
                rng.randrange(-32768, 32768) for _ in range(n_frames * channels)
            ]
            audio = DecodedAudio(rate, channels, samples)
            blob = encode_wav(audio)
            assert probe_wav(blob), trial
            back = decode_wav(blob)
            assert (back.sample_rate, back.channels) == (rate, channels)
            assert list(back.samples) == samples, trial
            # encoder fixed point: re-encoding the decode is identical
            assert encode_wav(back) == blob, trial

    def test_mutation_corpus_terminates_with_codec_errors(self):
        rng = random.Random(2024)
        base = encode_wav(
            DecodedAudio(8000, 2, [rng.randrange(-1000, 1000) for _ in range(256)])
        )
        t0 = time.perf_counter()
        for trial in range(400):
            buf = bytearray(base)
            kind = rng.randrange(4)
            if kind == 0:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            elif kind == 1:
                buf = buf[: rng.randrange(4, len(buf))]
            elif kind == 2:  # declared-size bomb in a chunk length
                pos = rng.choice([4, 16, 40])
                if pos + 4 <= len(buf):
                    buf[pos : pos + 4] = struct.pack(
                        "<I", rng.randrange(1 << 31)
                    )
            else:  # fmt field scramble
                if len(buf) > 30:
                    buf[20 : 22] = struct.pack("<H", rng.randrange(1 << 16))
            ok = probe_wav(bytes(buf))
            try:
                decoded = decode_wav(bytes(buf))
                # the probe may only say False when decode ALSO fails;
                # a decodable stream must always probe True
                assert ok, trial
                assert decoded.channels >= 1
            except (WAVError, UnsupportedWAV):
                assert not ok, trial
        assert time.perf_counter() - t0 < 10.0
