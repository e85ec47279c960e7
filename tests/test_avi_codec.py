"""Stdlib uncompressed-AVI codec (r7 verdict task 5) — encode/decode
round trips (row padding, bottom-up flip, BGR order), the
unsupported-form gating (compressed fourccs, depths, palettes), the
real frame-sampling path through ``multimodal.sample_frames``, and a
mutation-corpus sweep."""

from __future__ import annotations

import random
import struct

import pytest

from sqlbackuphistoryetl_spark.extensions.avi_codec import (
    AVIError,
    UnsupportedAVI,
    decode_avi_frames,
    encode_avi,
    is_avi,
    parse_avi,
    probe_avi,
)
from sqlbackuphistoryetl_spark.extensions.png_codec import DecodedImage


def _frames(n=3, w=5, h=3, seed=1):
    rng = random.Random(seed)
    return [
        DecodedImage(w, h, 3, bytes(rng.randrange(256) for _ in range(w * h * 3)))
        for _ in range(n)
    ]


class TestRoundTrip:
    def test_padded_rows_round_trip_exactly(self):
        # w=5 -> 15-byte rows pad to 16: padding must vanish on decode
        frames = _frames(4, 5, 3)
        back = decode_avi_frames(encode_avi(frames))
        assert len(back) == 4
        for a, b in zip(frames, back):
            assert (b.width, b.height, b.channels) == (5, 3, 3)
            assert a.pixels == b.pixels

    def test_unpadded_rows_round_trip(self):
        frames = _frames(2, 4, 4, seed=2)  # 12-byte rows, no padding
        back = decode_avi_frames(encode_avi(frames))
        assert all(a.pixels == b.pixels for a, b in zip(frames, back))

    def test_single_pixel_frame(self):
        f = [DecodedImage(1, 1, 3, bytes([10, 20, 30]))]
        assert decode_avi_frames(encode_avi(f))[0].pixels == bytes([10, 20, 30])

    def test_bottom_up_and_bgr_actually_tested(self):
        # an asymmetric frame: top row red, bottom row blue. If the
        # decoder forgot the bottom-up flip or the BGR swap, pixels
        # would land reversed.
        px = bytes([255, 0, 0] * 2 + [0, 0, 255] * 2)  # 2x2: red row, blue row
        back = decode_avi_frames(encode_avi([DecodedImage(2, 2, 3, px)]))[0]
        assert back.pixels == px

    def test_top_down_negative_height(self):
        # forge biHeight negative (top-down DIB): decoder must not flip
        frames = _frames(1, 2, 2, seed=3)
        blob = bytearray(encode_avi(frames))
        i = blob.find(b"strf") + 8
        (h,) = struct.unpack("<i", blob[i + 8 : i + 12])
        blob[i + 8 : i + 12] = struct.pack("<i", -h)
        flipped = decode_avi_frames(bytes(blob))[0]
        w = frames[0].width
        rows = [frames[0].pixels[r * w * 3 : (r + 1) * w * 3] for r in range(h)]
        assert flipped.pixels == b"".join(reversed(rows))

    def test_encoder_guards(self):
        with pytest.raises(ValueError):
            encode_avi([])
        with pytest.raises(ValueError):
            encode_avi(_frames(1, 2, 2) + _frames(1, 3, 3))
        with pytest.raises(ValueError):
            encode_avi(_frames(1), fps=0)


class TestGating:
    def test_compressed_fourcc_raises_unsupported(self):
        blob = bytearray(encode_avi(_frames()))
        i = blob.find(b"strf") + 8
        blob[i + 16 : i + 20] = b"cvid"  # cinepak: genuinely gated
        with pytest.raises(UnsupportedAVI, match="cvid"):
            decode_avi_frames(bytes(blob))
        assert not probe_avi(bytes(blob))
        # MJPG fourcc over NON-JPEG frame bytes is malformed, not gated
        blob[i + 16 : i + 20] = b"MJPG"
        with pytest.raises(AVIError, match="MJPEG"):
            decode_avi_frames(bytes(blob))
        assert not probe_avi(bytes(blob))

    def test_remaining_depths_raise_unsupported(self):
        # 8/24/32-bit decode since r9; 16-bit and packed depths stay
        # gated, and a forged 8-bit header WITHOUT a palette is
        # malformed rather than gated
        blob = bytearray(encode_avi(_frames()))
        i = blob.find(b"strf") + 8
        blob[i + 14 : i + 16] = struct.pack("<H", 16)
        with pytest.raises(UnsupportedAVI, match="16-bit"):
            decode_avi_frames(bytes(blob))
        assert not probe_avi(bytes(blob))
        blob[i + 14 : i + 16] = struct.pack("<H", 4)
        with pytest.raises(UnsupportedAVI, match="4-bit"):
            decode_avi_frames(bytes(blob))
        blob[i + 14 : i + 16] = struct.pack("<H", 8)
        with pytest.raises(AVIError, match="palette"):
            decode_avi_frames(bytes(blob))
        assert not probe_avi(bytes(blob))

    def test_declared_size_bomb_guard(self):
        import time

        blob = bytearray(encode_avi(_frames(1, 2, 2)))
        i = blob.find(b"strf") + 8
        blob[i + 4 : i + 12] = struct.pack("<ii", 60000, 60000)
        t0 = time.perf_counter()
        with pytest.raises(UnsupportedAVI, match="budget"):
            decode_avi_frames(bytes(blob))
        assert time.perf_counter() - t0 < 1.0

    def test_malformed_raises_avierror(self):
        with pytest.raises(AVIError):
            decode_avi_frames(b"RIFF\x04\x00\x00\x00AVI ")  # no streams
        with pytest.raises(AVIError):
            parse_avi(b"nonsense")
        assert not is_avi(None) and not is_avi(b"RIFF1234WAVE")
        # short frame chunk: header fine, frame body truncated
        blob = bytearray(encode_avi(_frames(1, 4, 4)))
        j = blob.find(b"00db")
        blob[j + 4 : j + 8] = struct.pack("<I", 8)  # lie: 8-byte frame
        del blob[j + 16 :]  # and actually truncate
        with pytest.raises(AVIError):
            decode_avi_frames(bytes(blob[: j + 16]))

    def test_audio_first_stream_indexing(self):
        # frame chunk ids carry the STREAM index: with an audio strl
        # ahead of the video strl, frames live in 01db, not 00db
        frames = _frames(2, 4, 4, seed=6)
        blob = bytearray(encode_avi(frames))

        def chunk(cid, body):
            return cid + struct.pack("<I", len(body)) + body + (
                b"\x00" if len(body) & 1 else b""
            )

        auds_strh = b"auds" + b"\x00" * 52
        audio_strl = chunk(
            b"LIST", b"strl" + chunk(b"strh", auds_strh) + chunk(b"strf", b"\x00" * 16)
        )
        # splice the audio strl in front of the video strl inside hdrl
        i = bytes(blob).find(b"LIST")
        hdrl_body_start = i + 12  # LIST size 'hdrl'
        j = bytes(blob).find(b"LIST", hdrl_body_start)  # the video strl
        out = bytearray(bytes(blob)[:j]) + audio_strl + bytes(blob)[j:]
        # grow the hdrl LIST and RIFF sizes
        (hdrl_len,) = struct.unpack("<I", out[i + 4 : i + 8])
        out[i + 4 : i + 8] = struct.pack("<I", hdrl_len + len(audio_strl))
        (riff_len,) = struct.unpack("<I", out[4:8])
        out[4:8] = struct.pack("<I", riff_len + len(audio_strl))
        # video is now stream 1: rename its frame chunks
        out = bytearray(bytes(out).replace(b"00db", b"01db"))
        got = decode_avi_frames(bytes(out))
        assert len(got) == 2
        assert all(a.pixels == b.pixels for a, b in zip(frames, got))

    def test_mutation_corpus_never_hangs_or_escapes(self):
        rng = random.Random(77)
        base = encode_avi(_frames(3, 6, 4, seed=8))
        for _ in range(300):
            buf = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            if rng.random() < 0.3:
                buf = buf[: rng.randrange(12, len(buf))]
            try:
                decode_avi_frames(bytes(buf))
            except (AVIError, UnsupportedAVI):
                pass


class TestExtendedDIB:
    """Palettized 8-bit and 32-bit BGRX DIB frames (r9)."""

    def test_pal8_round_trips_exactly(self):
        import random as _r

        rng = _r.Random(41)
        colors = [tuple(rng.randrange(256) for _ in range(3))
                  for _ in range(7)]
        frames = [
            DecodedImage(5, 3, 3, bytes(
                b for _ in range(15) for b in colors[rng.randrange(7)]
            ))
            for _ in range(3)
        ]
        blob = encode_avi(frames, codec="pal8")
        info, _ = parse_avi(blob)
        assert info.bit_count == 8 and info.palette is not None
        assert probe_avi(blob)
        got = decode_avi_frames(blob)
        assert [g.pixels for g in got] == [f.pixels for f in frames]

    def test_rgb32_round_trips_exactly(self):
        frames = _frames(2, 5, 4, seed=9)
        blob = encode_avi(frames, codec="rgb32")
        info, _ = parse_avi(blob)
        assert info.bit_count == 32
        assert probe_avi(blob)
        got = decode_avi_frames(blob)
        assert [g.pixels for g in got] == [f.pixels for f in frames]

    def test_pal8_clr_used_subset_and_index_range(self):
        # 2 palette entries declared via biClrUsed; an index beyond the
        # table is a stream error, not silence
        frames = [DecodedImage(2, 1, 3, bytes([1, 2, 3, 9, 8, 7]))]
        blob = bytearray(encode_avi(frames, codec="pal8"))
        info, raw = parse_avi(bytes(blob))
        assert len(info.palette) == 8  # 2 RGBQUADs
        j = blob.find(b"00db") + 8
        blob[j] = 5  # index past the 2-entry palette
        with pytest.raises(AVIError, match="palette index"):
            decode_avi_frames(bytes(blob))

    def test_pal8_more_than_256_colors_rejected(self):
        px = b"".join(
            bytes((i % 256, i // 256, 7)) for i in range(16 * 17)
        )
        with pytest.raises(ValueError, match="256"):
            encode_avi([DecodedImage(16, 17, 3, px)], codec="pal8")

    def test_extended_dib_mutation_corpus(self):
        rng = random.Random(88)
        for codec in ("pal8", "rgb32"):
            base = encode_avi(_frames(2, 6, 4, seed=10), codec=codec) \
                if codec == "rgb32" else encode_avi(
                    [DecodedImage(6, 4, 3, bytes(
                        b for _ in range(24)
                        for b in [(0, 0, 0), (255, 255, 255)][
                            rng.randrange(2)
                        ]
                    ))],
                    codec="pal8",
                )
            for _ in range(150):
                buf = bytearray(base)
                for _ in range(rng.randrange(1, 4)):
                    buf[rng.randrange(len(buf))] = rng.randrange(256)
                if rng.random() < 0.3:
                    buf = buf[: rng.randrange(12, len(buf))]
                try:
                    decode_avi_frames(bytes(buf))
                except (AVIError, UnsupportedAVI):
                    pass

    def test_sample_frames_decodes_pal8(self, spark):
        from sqlbackuphistoryetl_spark.extensions.multimodal import (
            sample_frames,
        )

        colors = [(10, 20, 30), (200, 100, 50)]
        frames = [
            DecodedImage(4, 4, 3, bytes(
                b for i in range(16) for b in colors[(i + f) % 2]
            ))
            for f in range(4)
        ]
        blob = encode_avi(frames, codec="pal8")
        df = spark.createDataFrame(
            [(1, bytearray(blob), "video/x-msvideo")],
            "doc_id long, payload binary, content_type string",
        )
        out = sample_frames(df, frame_size=48, stride=2).collect()
        got = {r["frame_index"]: bytes(r["frame_bytes"]) for r in out}
        assert set(got) == {0, 2}
        assert all(r["decoder"] == "avi-dib" for r in out)
        assert got[0] == frames[0].pixels and got[2] == frames[2].pixels


class TestMJPEG:
    def test_flat_block_mjpeg_round_trip_exact(self):
        # QUANT_FLAT8 flat 8x8 blocks survive the lossy codec exactly
        # (jpeg_codec's exactness contract), so MJPEG frames round-trip
        # byte-for-byte for these fixtures
        from sqlbackuphistoryetl_spark.extensions.jpeg_codec import QUANT_FLAT8

        # pixel layout: 16 wide = 2 blocks; value a for cols 0-7, b for 8-15
        fixed = []
        for f in range(4):
            row = bytes([40 + f]) * 8 + bytes([90 + f]) * 8
            fixed.append(DecodedImage(16, 8, 1, row * 8))
        blob = encode_avi(fixed, codec="mjpeg", quant_luma=QUANT_FLAT8)
        assert probe_avi(blob)
        info, _ = parse_avi(blob)
        assert info.n_frames == 4
        got = decode_avi_frames(blob)
        for f, img in enumerate(got):
            assert img.channels == 3  # grayscale normalized to RGB
            expect_row = (
                bytes([40 + f]) * 24 + bytes([90 + f]) * 24
            )
            assert bytes(img.pixels) == expect_row * 8

    def test_rgb_mjpeg_lossy_round_trip(self):
        w, h = 16, 16
        px = bytearray(w * h * 3)
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 3
                px[i], px[i + 1], px[i + 2] = min(255, 14 * x), min(255, 14 * y), 120
        frames = [DecodedImage(w, h, 3, bytes(px))] * 3
        blob = encode_avi(frames, codec="mjpeg", quant_luma=[1] * 64)
        got = decode_avi_frames(blob)
        assert len(got) == 3
        diffs = [abs(a - b) for a, b in zip(px, got[0].pixels)]
        assert sum(diffs) / len(diffs) < 8

    def test_progressive_mjpeg_frames(self):
        from sqlbackuphistoryetl_spark.extensions.jpeg_codec import (
            QUANT_FLAT8,
            encode_jpeg,
        )

        # spectral-selection progressive frames DECODE since r8...
        frames = [DecodedImage(8, 8, 1, bytes([55]) * 64)]
        seq = bytearray(encode_avi(frames, codec="mjpeg", quant_luma=QUANT_FLAT8))
        prog_frame = encode_jpeg(
            bytes([55]) * 64, 8, 8, 1, quant_luma=QUANT_FLAT8, progressive=True
        )
        # forging SOF2 onto a sequential frame is MALFORMED, not gated
        j = bytes(seq).find(b"\xff\xc0")
        seq[j + 1] = 0xC2
        with pytest.raises(AVIError, match="MJPEG"):
            decode_avi_frames(bytes(seq))
        assert not probe_avi(bytes(seq))
        # ...successive-approximation frames decode too since r9 (a
        # truncated ladder is a legal preview stream); an ARITHMETIC
        # frame stays gated (assert on the frame-decode hook directly;
        # rebuilding nested RIFF sizes to splice it into a container
        # adds nothing)
        sa = bytearray(prog_frame)
        i = sa.find(b"\xff\xda")
        sa[i + 9] = 0x01  # Al=1: never-refined SA ladder, still legal
        from sqlbackuphistoryetl_spark.extensions import avi_codec

        blob = encode_avi(frames, codec="mjpeg", quant_luma=QUANT_FLAT8)
        info, _ = avi_codec.parse_avi(blob)
        img = avi_codec._decode_frame(bytes(sa), info)
        assert (img.width, img.height) == (8, 8)
        arith = bytearray(prog_frame)
        j = arith.find(b"\xff\xc2")
        arith[j + 1] = 0xC9  # arithmetic sequential: genuinely gated
        with pytest.raises(UnsupportedAVI, match="MJPEG frame"):
            avi_codec._decode_frame(bytes(arith), info)
        # and the real progressive frame decodes through the hook
        img = avi_codec._decode_frame(prog_frame, info)
        assert img.pixels == bytes([55, 55, 55]) * 64

    def test_mjpeg_spark_sampling(self, spark):
        from sqlbackuphistoryetl_spark.extensions.jpeg_codec import QUANT_FLAT8
        from sqlbackuphistoryetl_spark.extensions.multimodal import sample_frames

        fixed = []
        for f in range(6):
            row = bytes([32 + f]) * 8 + bytes([100 + f]) * 8
            fixed.append(DecodedImage(16, 8, 1, row * 8))
        blob = encode_avi(fixed, codec="mjpeg", quant_luma=QUANT_FLAT8)
        df = spark.createDataFrame(
            [(1, bytearray(blob), "video/x-msvideo")],
            "doc_id long, payload binary, content_type string",
        )
        out = sorted(
            sample_frames(df, stride=2).collect(),
            key=lambda r: r["frame_index"],
        )
        assert [r["frame_index"] for r in out] == [0, 2, 4]
        assert all(r["decoder"] == "avi-mjpeg" and r["n_frames"] == 6 for r in out)
        for r in out:
            f = r["frame_index"]
            expect_row = bytes([32 + f]) * 24 + bytes([100 + f]) * 24
            assert bytes(r["frame_bytes"]) == expect_row * 8


class TestSparkFramePath:
    def test_sample_frames_decodes_real_avi(self, spark):
        frames = _frames(6, 4, 4, seed=5)
        blob = encode_avi(frames)
        fake = b"not a video at all, just bytes" * 4
        df = spark.createDataFrame(
            [(1, bytearray(blob), "video/x-msvideo"), (2, bytearray(fake), "video/mp4")],
            "doc_id long, payload binary, content_type string",
        )
        from sqlbackuphistoryetl_spark.extensions.multimodal import sample_frames

        out = sample_frames(df, frame_size=64, stride=2).collect()
        real = sorted(
            (r for r in out if r["doc_id"] == 1), key=lambda r: r["frame_index"]
        )
        assert [r["frame_index"] for r in real] == [0, 2, 4]
        assert all(r["decoder"] == "avi-dib" and r["n_frames"] == 6 for r in real)
        for r in real:
            assert bytes(r["frame_bytes"]) == frames[r["frame_index"]].pixels
        assert all(
            r["decoder"] == "fake-slice" for r in out if r["doc_id"] == 2
        )

    def test_corrupt_avi_falls_back_to_fake(self, spark):
        blob = bytearray(encode_avi(_frames(2, 4, 4)))
        i = blob.find(b"strf") + 8
        blob[i + 16 : i + 20] = b"MJPG"  # compressed: unsupported
        df = spark.createDataFrame(
            [(1, bytearray(bytes(blob)), "video/x-msvideo")],
            "doc_id long, payload binary, content_type string",
        )
        from sqlbackuphistoryetl_spark.extensions.multimodal import sample_frames

        out = sample_frames(df, frame_size=64, stride=2).collect()
        assert out and all(r["decoder"] == "fake-slice" for r in out)
