"""media_info: header-only media triage across all seven containers (r9)."""

from __future__ import annotations

from sqlbackuphistoryetl_spark.extensions import (
    avi_codec,
    bmp_codec,
    flac_codec,
    gif_codec,
    jpeg_codec,
    png_codec,
    wav_codec,
)
from sqlbackuphistoryetl_spark.extensions.multimodal import media_info
from sqlbackuphistoryetl_spark.extensions.wav_codec import DecodedAudio

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def _payloads():
    png = png_codec.encode_png(bytes(range(24)), 4, 2, 3)
    jpeg = jpeg_codec.encode_jpeg(bytes(range(64)), 8, 8, 1)
    gif = gif_codec.encode_gif_indexed(
        5, 3, PAL4,
        [{"indices": bytes(15)}, {"indices": bytes(15), "transparent": 1}],
    )
    bmp = bmp_codec.encode_bmp(bytes(range(36)), 3, 4)
    from sqlbackuphistoryetl_spark.extensions.png_codec import DecodedImage

    avi = avi_codec.encode_avi(
        [DecodedImage(4, 4, 3, bytes(48))] * 3
    )
    wav = wav_codec.encode_wav(DecodedAudio(8000, 2, [0, 1] * 50))
    flac = flac_codec.encode_flac(DecodedAudio(16000, 1, list(range(-40, 60))))
    return {
        1: png, 2: jpeg, 3: gif, 4: bmp, 5: avi, 6: wav, 7: flac,
        8: b"\x89PNG\r\n\x1a\nJUNK", 9: None, 10: b"not media at all",
    }


def test_media_info_all_formats(spark):
    rows = [(k, v, "application/octet-stream") for k, v in _payloads().items()]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r for r in media_info(df).collect()}

    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["channels"], out[1]["bit_depth"]) == ("png", 4, 2, 3, 8)
    assert (out[2]["format"], out[2]["width"], out[2]["height"],
            out[2]["channels"]) == ("jpeg", 8, 8, 1)
    assert (out[3]["format"], out[3]["width"], out[3]["height"],
            out[3]["n_frames"], out[3]["channels"]) == ("gif", 5, 3, 2, 3)
    assert (out[4]["format"], out[4]["width"], out[4]["height"],
            out[4]["bit_depth"]) == ("bmp", 3, 4, 24)
    assert (out[5]["format"], out[5]["width"], out[5]["n_frames"]) == ("avi", 4, 3)
    assert (out[6]["format"], out[6]["channels"], out[6]["sample_rate"],
            out[6]["n_samples"], out[6]["bit_depth"]) == ("wav", 2, 8000, 50, 16)
    assert (out[7]["format"], out[7]["channels"], out[7]["sample_rate"],
            out[7]["n_samples"], out[7]["bit_depth"]) == ("flac", 1, 16000, 100, 16)
    # corrupt header / None / unrecognized: triage, never crash
    for k in (8, 9, 10):
        assert out[k]["format"] == "unknown" and out[k]["width"] is None


def test_media_info_avi_lenient_on_gated_fourcc(spark):
    import struct

    from sqlbackuphistoryetl_spark.extensions.png_codec import DecodedImage

    base = bytearray(avi_codec.encode_avi([DecodedImage(4, 4, 3, bytes(48))] * 2))
    # rewrite the strf compression fourcc to XVID: decode gates it,
    # but triage must still report geometry/frame count
    at = bytes(base).index(b"strf")
    struct.pack_into("<4s", base, at + 8 + 16, b"XVID")
    import pytest

    with pytest.raises(avi_codec.UnsupportedAVI):
        avi_codec.parse_avi(bytes(base))
    df = spark.createDataFrame(
        [(1, bytes(base), "video/avi")], ["doc_id", "payload", "content_type"]
    )
    r = media_info(df).collect()[0]
    assert (r["format"], r["width"], r["height"], r["n_frames"]) == ("avi", 4, 4, 2)


def test_media_info_plan_is_map_side(spark):
    import contextlib
    import io

    df = spark.createDataFrame(
        [(1, b"x", "t")], ["doc_id", "payload", "content_type"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        media_info(df).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
