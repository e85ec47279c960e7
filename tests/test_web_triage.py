"""WebP / MP3 / Ogg header triage (r10): container walks, budgets,
dispatch order, media_info integration."""

from __future__ import annotations

import random
import struct

import pytest

from sqlbackuphistoryetl_spark.extensions import mp3_codec, ogg_codec, webp_codec
from sqlbackuphistoryetl_spark.extensions.mp3_codec import (
    MP3Error,
    build_mp3,
    is_mp3,
    parse_mp3,
)
from sqlbackuphistoryetl_spark.extensions.ogg_codec import (
    OggError,
    build_ogg,
    is_ogg,
    parse_ogg,
)
from sqlbackuphistoryetl_spark.extensions.webp_codec import (
    WebPError,
    build_webp,
    is_webp,
    parse_webp,
)


class TestWebP:
    @pytest.mark.parametrize("form", ["lossy", "lossless", "extended"])
    def test_forms_round_trip(self, form):
        blob = build_webp(form, 320, 240, has_alpha=(form != "lossy"))
        info = parse_webp(blob)
        assert (info.form, info.width, info.height) == (form, 320, 240)
        assert info.has_alpha == (form != "lossy")
        assert info.n_frames == 1

    def test_animation_frames_counted(self):
        blob = build_webp("extended", 64, 64, n_frames=5)
        info = parse_webp(blob)
        assert (info.form, info.n_frames) == ("extended", 5)

    def test_14bit_dimension_edges(self):
        blob = build_webp("lossless", 16383, 1)
        info = parse_webp(blob)
        assert (info.width, info.height) == (16383, 1)

    def test_corrupt(self):
        assert not is_webp(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(WebPError):
            parse_webp(b"RIFF" + struct.pack("<I", 40) + b"WEBP" + b"\x00" * 40)
        bad = bytearray(build_webp("lossy", 10, 10))
        bad[12:16] = b"XXXX"  # unknown chunk only
        with pytest.raises(WebPError):
            parse_webp(bytes(bad))

    def test_mutation_corpus(self):
        rng = random.Random(1)
        base = build_webp("extended", 100, 50, n_frames=3)
        for i in range(200):
            raw = bytearray(base)
            if i % 2:
                raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
            else:
                raw = raw[: rng.randrange(1, len(raw))]
            try:
                info = parse_webp(bytes(raw))
                assert info.width >= 0
            except (WebPError, struct.error):
                pass


class TestMp3:
    def test_cbr_stream(self):
        blob = build_mp3(30, 44100, 128, 2)
        info = parse_mp3(blob)
        assert (info.version, info.channels, info.sample_rate) == ("1", 2, 44100)
        assert (info.bitrate_kbps, info.n_frames, info.n_samples) == (
            128, 30, 30 * 1152)

    def test_id3_skip_and_mono(self):
        blob = build_mp3(7, 32000, 64, 1, id3=True)
        assert is_mp3(blob)
        info = parse_mp3(blob)
        assert (info.channels, info.sample_rate, info.n_frames) == (1, 32000, 7)

    def test_is_mp3_rejects_weak_sync(self):
        # 0xFF prefix alone is not an MP3 (reserved version bits)
        assert not is_mp3(b"\xff\xe8" + b"\x00" * 20)
        assert not is_mp3(b"\xff\xd8\xff\xe0" + b"\x00" * 20)  # JPEG SOI
        with pytest.raises(MP3Error):
            parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 10)

    def test_truncated_tail_counts_whole_frames(self):
        blob = build_mp3(10)
        info = parse_mp3(blob[: len(blob) - 50])  # last frame cut
        assert info.n_frames == 9


class TestOgg:
    @pytest.mark.parametrize("codec", ["opus", "vorbis"])
    def test_ident_and_duration(self, codec):
        blob = build_ogg(codec, 2, 48000, 96000,
                         pre_skip=312 if codec == "opus" else 0)
        info = parse_ogg(blob)
        assert (info.codec, info.channels, info.sample_rate) == (
            codec, 2, 48000)
        assert info.n_samples == 96000  # Opus: granule minus pre-skip

    def test_corrupt(self):
        assert not is_ogg(b"OggX" + b"\x00" * 30)
        with pytest.raises(OggError):
            parse_ogg(b"OggS" + b"\x00" * 30 + b"JUNKJUNK" * 4)

    def test_mutation_corpus(self):
        rng = random.Random(2)
        base = build_ogg("opus", 1, 16000, 8000)
        for i in range(200):
            raw = bytearray(base)
            if i % 2:
                raw[rng.randrange(len(raw))] ^= 1 << rng.randrange(8)
            else:
                raw = raw[: rng.randrange(1, len(raw))]
            try:
                parse_ogg(bytes(raw))
            except (OggError, struct.error):
                pass


def test_media_info_triages_all_three(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import media_info

    rows = [
        (1, build_webp("lossy", 320, 240), "image/webp"),
        (2, build_webp("extended", 64, 32, has_alpha=True, n_frames=4),
         "image/webp"),
        (3, build_mp3(25, 44100, 128, 2), "audio/mpeg"),
        (4, build_ogg("opus", 2, 48000, 96000, pre_skip=312), "audio/ogg"),
        (5, build_ogg("vorbis", 1, 22050, 44100), "audio/ogg"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r for r in media_info(df).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["channels"]) == ("webp", 320, 240, 3)
    assert (out[2]["format"], out[2]["n_frames"], out[2]["channels"]) == (
        "webp", 4, 4)
    assert (out[3]["format"], out[3]["channels"], out[3]["sample_rate"],
            out[3]["n_frames"], out[3]["n_samples"]) == (
        "mp3", 2, 44100, 25, 25 * 1152)
    assert (out[4]["format"], out[4]["channels"], out[4]["sample_rate"],
            out[4]["n_samples"]) == ("ogg", 2, 48000, 96000)
    assert (out[5]["format"], out[5]["channels"], out[5]["sample_rate"],
            out[5]["n_samples"]) == ("ogg", 1, 22050, 44100)
