"""GIF codec: LZW round-trips, interlace, transparency, animation
compositing/disposal, budgets, probe mirroring, mutation fuzz.

Pure-Python tests — no Spark session. The encoder is the fixture
builder (same strategy as test_jpeg_codec / test_png_codec): GIF is
palette-lossless, so decode(encode(x)) must reproduce x EXACTLY,
which pins the LZW bit order, code-width growth, table reset, the
deinterlacer and the compositor all at once.
"""

from __future__ import annotations

import random
import struct

import pytest

from sqlbackuphistoryetl_spark.extensions.gif_codec import (
    GIF87A,
    GIFError,
    MAX_FRAMES,
    MAX_PIXELS,
    UnsupportedGIF,
    decode_gif,
    decode_gif_frames_at,
    encode_gif,
    encode_gif_indexed,
    is_gif,
    probe_gif,
)

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # R G B gray


def _rgb_of(img, x, y):
    o = (y * img.width + x) * img.channels
    return img.pixels[o : o + 3]


class TestRoundTrip:
    def test_gray_exact(self):
        px = bytes(range(64))
        img = decode_gif(encode_gif(px, 8, 8, 1))
        assert (img.width, img.height, img.channels) == (8, 8, 3)
        # gray g encodes as (g,g,g)
        assert all(
            img.pixels[3 * p] == px[p]
            and img.pixels[3 * p + 1] == px[p]
            and img.pixels[3 * p + 2] == px[p]
            for p in range(64)
        )

    def test_rgb_exact(self):
        rng = random.Random(1)
        # 100 distinct-ish colors over a 10x10 canvas: palette exact
        px = bytes(rng.randrange(256) for _ in range(10 * 10 * 3))
        img = decode_gif(encode_gif(px, 10, 10, 3))
        assert (img.channels, img.pixels) == (3, px)

    def test_rgba_binary_alpha(self):
        # 2x2: one transparent pixel -> 4-channel decode, alpha 0 there
        px = bytes(
            [255, 0, 0, 255] + [0, 255, 0, 255] + [0, 0, 255, 255] + [7, 7, 7, 0]
        )
        img = decode_gif(encode_gif(px, 2, 2, 4))
        assert img.channels == 4
        assert img.pixels[3::4] == bytes([255, 255, 255, 0])
        assert img.pixels[:3] == bytes([255, 0, 0])

    def test_too_many_colors_raises(self):
        px = bytes(
            (i % 256, (i // 256) % 256, 0)[c] for i in range(300) for c in range(3)
        )
        with pytest.raises(GIFError, match="distinct colors"):
            encode_gif(px, 30, 10, 3)

    def test_property_random_rasters(self):
        # every palette size band, geometry and index distribution:
        # decode(encode(x)) == x exactly, across the code-width
        # growth boundaries (2->3->...->8 bit palettes)
        rng = random.Random(42)
        for trial in range(40):
            w = rng.randrange(1, 33)
            h = rng.randrange(1, 33)
            npal = rng.choice([2, 3, 4, 5, 16, 17, 64, 128, 255, 256])
            pal = bytes(rng.randrange(256) for _ in range(3 * npal))
            idx = bytes(rng.randrange(npal) for _ in range(w * h))
            blob = encode_gif_indexed(w, h, pal, [{"indices": idx}])
            assert probe_gif(blob), trial
            _, picked = decode_gif_frames_at(blob)
            img = picked[0][1]
            for p in rng.sample(range(w * h), min(20, w * h)):
                assert img.pixels[4 * p : 4 * p + 3] == pal[
                    3 * idx[p] : 3 * idx[p] + 3
                ], (trial, p)

    def test_lzw_table_fill_and_reset(self):
        # a large high-entropy raster pushes the LZW table to 4096
        # (12-bit codes) forcing the encoder's clear/reset path and the
        # decoder's width cap — exact recovery proves both
        rng = random.Random(7)
        w = h = 128
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        pal = bytes(b for i in range(256) for b in (i, 255 - i, i ^ 0x5A))
        blob = encode_gif_indexed(w, h, pal, [{"indices": idx}])
        _, picked = decode_gif_frames_at(blob)
        img = picked[0][1]
        assert all(
            img.pixels[4 * p : 4 * p + 3] == pal[3 * idx[p] : 3 * idx[p] + 3]
            for p in range(0, w * h, 97)
        )


class TestStructure:
    def test_interlaced_equals_sequential(self):
        rng = random.Random(3)
        for h in (1, 2, 4, 5, 8, 13):
            idx = bytes(rng.randrange(4) for _ in range(9 * h))
            seq = encode_gif_indexed(9, h, PAL4, [{"indices": idx}])
            inter = encode_gif_indexed(
                9, h, PAL4, [{"indices": idx, "interlace": True}]
            )
            assert decode_gif(seq).pixels == decode_gif(inter).pixels, h

    def test_local_color_table_wins(self):
        # same indices, global table says red-first, local says blue-first
        lct = bytes([0, 0, 255, 255, 0, 0])
        blob = encode_gif_indexed(
            2, 1, PAL4, [{"indices": bytes([0, 1]), "lct": lct}]
        )
        img = decode_gif(blob)
        assert _rgb_of(img, 0, 0) == bytes([0, 0, 255])
        assert _rgb_of(img, 1, 0) == bytes([255, 0, 0])

    def test_gif87a_accepted(self):
        blob = encode_gif_indexed(
            2, 2, PAL4, [{"indices": bytes([0, 1, 2, 3])}], version=GIF87A
        )
        assert is_gif(blob) and probe_gif(blob)
        info, _ = decode_gif_frames_at(blob)
        assert info.version == "87a"

    def test_sub_rectangle_frame_leaves_border_transparent(self):
        blob = encode_gif_indexed(
            4,
            4,
            PAL4,
            [{"left": 1, "top": 1, "width": 2, "height": 2,
              "indices": bytes([0, 1, 2, 3])}],
        )
        img = decode_gif(blob)
        assert img.channels == 4
        assert img.pixels[3] == 0  # (0,0) untouched
        assert img.pixels[(1 * 4 + 1) * 4 + 3] == 255  # (1,1) painted

    def test_comment_and_application_extensions_skipped(self):
        blob = bytearray(encode_gif_indexed(2, 1, PAL4, [{"indices": b"\x00\x01"}]))
        # splice a comment and an application extension before the
        # image descriptor (first 0x2C after the 13+GCT header)
        at = blob.index(0x2C, 13)
        ext = bytes([0x21, 0xFE, 3]) + b"hi!" + bytes([0]) + bytes(
            [0x21, 0xFF, 11]
        ) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
        spliced = bytes(blob[:at]) + ext + bytes(blob[at:])
        assert probe_gif(spliced)
        assert decode_gif(spliced).pixels == decode_gif(bytes(blob)).pixels


class TestAnimation:
    def test_disposal_none_accumulates(self):
        # frame 0 paints the whole canvas gray; frame 1 paints a 1x1
        # red dot top-left; sampled canvases must accumulate
        frames = [
            {"indices": bytes([3] * 4)},
            {"left": 0, "top": 0, "width": 1, "height": 1,
             "indices": bytes([0])},
        ]
        _, picked = decode_gif_frames_at(encode_gif_indexed(2, 2, PAL4, frames))
        assert [i for i, _ in picked] == [0, 1]
        assert _rgb_of(picked[0][1], 0, 0) == bytes([9, 9, 9])
        assert _rgb_of(picked[1][1], 0, 0) == bytes([255, 0, 0])
        assert _rgb_of(picked[1][1], 1, 1) == bytes([9, 9, 9])  # kept

    def test_disposal_background_clears_rect(self):
        frames = [
            {"indices": bytes([3] * 4), "disposal": 2},
            {"left": 1, "top": 1, "width": 1, "height": 1,
             "indices": bytes([1])},
        ]
        _, picked = decode_gif_frames_at(encode_gif_indexed(2, 2, PAL4, frames))
        f1 = picked[1][1]
        assert f1.pixels[3] == 0  # (0,0) cleared to transparent
        assert _rgb_of(f1, 1, 1) == bytes([0, 255, 0])

    def test_disposal_previous_restores(self):
        frames = [
            {"indices": bytes([0] * 4)},                      # all red
            {"indices": bytes([2] * 4), "disposal": 3},       # all blue, restore
            {"left": 0, "top": 0, "width": 1, "height": 1,
             "indices": bytes([1])},                          # green dot
        ]
        _, picked = decode_gif_frames_at(encode_gif_indexed(2, 2, PAL4, frames))
        assert _rgb_of(picked[1][1], 1, 1) == bytes([0, 0, 255])
        f2 = picked[2][1]
        assert _rgb_of(f2, 0, 0) == bytes([0, 255, 0])
        assert _rgb_of(f2, 1, 1) == bytes([255, 0, 0])  # restored, not blue

    def test_frame_transparency_keeps_underlying(self):
        frames = [
            {"indices": bytes([0, 1, 2, 3])},
            {"indices": bytes([3, 3, 1, 1]), "transparent": 3},
        ]
        _, picked = decode_gif_frames_at(encode_gif_indexed(2, 2, PAL4, frames))
        f1 = picked[1][1]
        assert _rgb_of(f1, 0, 0) == bytes([255, 0, 0])  # kept from frame 0
        assert _rgb_of(f1, 0, 1) == bytes([0, 255, 0])  # painted

    def test_stride_sampling(self):
        frames = [{"indices": bytes([i % 4] * 4)} for i in range(7)]
        info, picked = decode_gif_frames_at(
            encode_gif_indexed(2, 2, PAL4, frames), stride=3
        )
        assert info.n_frames == 7
        assert [i for i, _ in picked] == [0, 3, 6]
        # stride still composites every frame: canvas 3 shows frame 3
        assert _rgb_of(picked[1][1], 0, 0) == bytes([9, 9, 9])

    def test_decode_gif_ignores_later_corrupt_frames(self):
        base = encode_gif_indexed(2, 2, PAL4, [{"indices": bytes([0, 1, 2, 3])}])
        # append a structurally-valid second frame whose LZW content is
        # garbage (all-ones codes are out of table range), then the
        # trailer: decode_gif only entropy-decodes frame 0, so it must
        # succeed; the animation walk must raise
        bad_frame = (
            bytes([0x2C])
            + struct.pack("<HHHH", 0, 0, 2, 2)
            + bytes([0])  # no LCT, no interlace
            + bytes([2])  # LZW min code size
            + bytes([2, 0xFF, 0xFF, 0])  # one 2-byte sub-block + term
        )
        blob = base[:-1] + bad_frame + b"\x3b"
        assert decode_gif(blob).pixels  # frame 0 decodes fine
        with pytest.raises(GIFError):
            decode_gif_frames_at(blob)


class TestGatesAndCorrupt:
    def test_canvas_over_budget_unsupported_and_probe_mirrors(self):
        blob = bytearray(encode_gif_indexed(8, 8, PAL4, [{"indices": bytes(64)}]))
        struct.pack_into("<HH", blob, 6, 60000, 60000)
        with pytest.raises(UnsupportedGIF, match="pixel budget"):
            decode_gif(bytes(blob))
        assert not probe_gif(bytes(blob))

    def test_frame_count_budget(self):
        frames = [{"left": 0, "top": 0, "width": 1, "height": 1,
                   "indices": b"\x00"}] * 5
        blob = encode_gif_indexed(2, 2, PAL4, frames)
        with pytest.raises(UnsupportedGIF, match="frames"):
            decode_gif_frames_at(blob, max_frames=4)
        assert probe_gif(blob)  # default budgets: fine

    def test_total_pixel_budget(self):
        frames = [{"indices": bytes(16)}] * 3
        blob = encode_gif_indexed(4, 4, PAL4, frames)
        with pytest.raises(UnsupportedGIF, match="total"):
            decode_gif_frames_at(blob, max_total_pixels=40)

    @pytest.mark.parametrize(
        "mangle,err",
        [
            (lambda b: b[:10], GIFError),                     # truncated header
            (lambda b: b"JIF87a" + b[6:], GIFError),          # bad signature
            (lambda b: b[:-1], GIFError),                     # missing trailer
            (lambda b: b.replace(b"\x2c", b"\x7c", 1), GIFError),  # bad block
        ],
    )
    def test_corrupt_structures_raise(self, mangle, err):
        base = encode_gif_indexed(2, 2, PAL4, [{"indices": bytes([0, 1, 2, 3])}])
        bad = mangle(base)
        with pytest.raises(err):
            decode_gif(bad)
        assert not probe_gif(bad)

    def test_zero_canvas_and_oversized_frame_rect(self):
        base = bytearray(encode_gif_indexed(2, 2, PAL4, [{"indices": bytes(4)}]))
        zero = bytearray(base)
        struct.pack_into("<HH", zero, 6, 0, 2)
        with pytest.raises(GIFError, match="zero"):
            decode_gif(bytes(zero))
        big = bytearray(base)
        at = big.index(0x2C, 13)
        struct.pack_into("<HH", big, at + 5, 3, 3)  # frame w,h > canvas
        with pytest.raises(GIFError, match="exceeds"):
            decode_gif(bytes(big))

    def test_palette_index_out_of_range(self):
        # 2-entry local table but indices reach 3
        blob = encode_gif_indexed(
            2, 2, PAL4,
            [{"indices": bytes([0, 1, 2, 3]), "lct": bytes(6)}],
        )
        with pytest.raises(GIFError, match="palette index"):
            decode_gif(blob)

    def test_probe_none_and_non_gif(self):
        assert not is_gif(None) and not probe_gif(None)
        assert not probe_gif(b"GIF89")
        assert not probe_gif(b"\x89PNG\r\n\x1a\n")


class TestFuzz:
    def test_mutation_corpus_never_hangs_or_escapes(self):
        # bit-flip / truncation corpus: decode either succeeds or
        # raises the codec's own error types — never an uncaught
        # exception, never a hang (each trial under a deadline)
        rng = random.Random(99)
        base = encode_gif_indexed(
            12, 9, PAL4,
            [
                {"indices": bytes(rng.randrange(4) for _ in range(12 * 9))},
                {"left": 2, "top": 2, "width": 5, "height": 4,
                 "indices": bytes(rng.randrange(4) for _ in range(20)),
                 "disposal": 2, "transparent": 1, "interlace": True},
            ],
        )
        for trial in range(300):
            buf = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            if rng.random() < 0.3:
                buf = buf[: rng.randrange(1, len(buf))]
            self._decode_with_deadline(bytes(buf), trial)
        # systematic truncation sweep
        for cut in range(1, len(base)):
            self._decode_with_deadline(base[:cut], f"cut-{cut}")

    @staticmethod
    def _decode_with_deadline(payload: bytes, tag) -> None:
        import signal

        def _alarm(_sig, _frm):
            raise AssertionError(f"gif decode hung on trial {tag!r}")

        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(5)
        try:
            decode_gif_frames_at(payload)
        except (GIFError, UnsupportedGIF):
            pass
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def test_max_budget_constants_sane(self):
        assert MAX_PIXELS == 1 << 25 and MAX_FRAMES == 1 << 14
