"""Cross-codec dispatch matrix (r9): every codec's fixture against
every OTHER codec's signature and probe. The multimodal dispatch is a
first-match signature chain, so a magic-byte collision (or a probe
that accepts a foreign container) would silently misroute payloads —
this pins that the seven containers are mutually exclusive."""

from __future__ import annotations

import random

from sqlbackuphistoryetl_spark.extensions import (
    avi_codec,
    bmp_codec,
    flac_codec,
    gif_codec,
    jpeg_codec,
    png_codec,
    tiff_codec,
    wav_codec,
)
from sqlbackuphistoryetl_spark.extensions.png_codec import DecodedImage
from sqlbackuphistoryetl_spark.extensions.wav_codec import DecodedAudio

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def _fixtures():
    rng = random.Random(5)
    px = bytes(rng.randrange(256) for _ in range(8 * 8 * 3))
    gray = bytes(rng.randrange(256) for _ in range(64))
    return {
        "png": png_codec.encode_png(px, 8, 8, 3),
        "jpeg": jpeg_codec.encode_jpeg(gray, 8, 8, 1),
        "gif": gif_codec.encode_gif_indexed(4, 4, PAL4, [{"indices": bytes(16)}]),
        "bmp": bmp_codec.encode_bmp(px, 8, 8),
        "tiff": tiff_codec.encode_tiff(gray, 8, 8, 1),
        "avi": avi_codec.encode_avi([DecodedImage(4, 4, 3, bytes(48))]),
        "wav": wav_codec.encode_wav(DecodedAudio(8000, 1, list(range(-30, 34)))),
        "flac": flac_codec.encode_flac(DecodedAudio(8000, 1, list(range(-30, 34)))),
    }


SIGNATURES = {
    "png": png_codec.is_png,
    "jpeg": jpeg_codec.is_jpeg,
    "gif": gif_codec.is_gif,
    "bmp": bmp_codec.is_bmp,
    "tiff": tiff_codec.is_tiff,
    "avi": avi_codec.is_avi,
    "wav": wav_codec.is_wav,
    "flac": flac_codec.is_flac,
}

PROBES = {
    "png": png_codec.probe_png,
    "jpeg": jpeg_codec.probe_jpeg,
    "gif": gif_codec.probe_gif,
    "bmp": bmp_codec.probe_bmp,
    "tiff": tiff_codec.probe_tiff,
    "avi": avi_codec.probe_avi,
    "wav": wav_codec.probe_wav,
    "flac": flac_codec.probe_flac,
}


def test_signatures_are_mutually_exclusive():
    fixtures = _fixtures()
    for fmt, blob in fixtures.items():
        for other, is_fn in SIGNATURES.items():
            want = other == fmt
            assert is_fn(blob) is want, (fmt, other)


def test_probes_accept_only_their_own_container():
    fixtures = _fixtures()
    for fmt, blob in fixtures.items():
        for other, probe in PROBES.items():
            want = other == fmt
            assert bool(probe(blob)) is want, (fmt, other)


def test_media_info_formats_match(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import media_info

    fixtures = _fixtures()
    rows = [(i, blob, "application/octet-stream")
            for i, blob in enumerate(fixtures.values())]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    got = {r["doc_id"]: r["format"] for r in media_info(df).collect()}
    assert got == dict(enumerate(fixtures.keys()))
