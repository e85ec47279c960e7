"""GIF + BMP routing through the multimodal Spark operators (r9).

The codecs' unit behavior is pinned in test_gif_codec / the bmp tests;
this file pins the DISPATCH: every image operator must recognize the
new signatures, tag its ``decoder`` column, honor the fall-through
doctrine for gated/corrupt payloads, and keep formats stable through
resize re-encode.
"""

from __future__ import annotations

import struct

import pytest

from sqlbackuphistoryetl_spark.extensions import bmp_codec, gif_codec, png_codec
from sqlbackuphistoryetl_spark.extensions.multimodal import (
    decode_and_featurize,
    decode_image,
    extract_payload_metadata,
    image_dhash,
    image_quality,
    resize_image,
    sample_frames,
)

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def _gif(w=8, h=8, seed=5):
    import random

    rng = random.Random(seed)
    idx = bytes(rng.randrange(4) for _ in range(w * h))
    return gif_codec.encode_gif_indexed(w, h, PAL4, [{"indices": idx}])


def _bmp(w=6, h=4, seed=5):
    import random

    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    return bmp_codec.encode_bmp(px, w, h)


def _over_budget_gif():
    blob = bytearray(_gif())
    struct.pack_into("<HH", blob, 6, 60000, 60000)
    return bytes(blob)


def test_decode_image_routes_gif_and_bmp():
    g = decode_image(_gif())
    assert (g.width, g.height, g.channels) == (8, 8, 3)
    b = decode_image(_bmp())
    assert (b.width, b.height, b.channels) == (6, 4, 3)
    with pytest.raises(NotImplementedError, match="pixel budget"):
        decode_image(_over_budget_gif())


def test_resize_stays_in_input_format():
    small_gif = resize_image(_gif(), 4, 4)
    assert gif_codec.is_gif(small_gif)
    assert decode_image(small_gif).width == 4
    small_bmp = resize_image(_bmp(), 3, 2)
    assert bmp_codec.is_bmp(small_bmp)
    assert decode_image(small_bmp).height == 2


def test_dhash_quality_featurize_routing(spark):
    corrupt_gif = _gif()[:20]  # valid signature, truncated body
    rows = [
        (1, _gif(), "image/gif"),
        (2, _bmp(), "image/bmp"),
        (3, corrupt_gif, "image/gif"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])

    dh = {r["doc_id"]: r for r in image_dhash(df).collect()}
    assert dh[1]["decoder"] == "gif-lzw"
    assert dh[2]["decoder"] == "bmp-dib"
    assert dh[3]["dhash"] is None and dh[3]["decoder"] is None
    # the hash must equal the direct codec chain
    expect = png_codec.dhash(gif_codec.decode_gif(_gif()))
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert dh[1]["dhash"] == expect

    iq = {r["doc_id"]: r for r in image_quality(df).collect()}
    assert (iq[1]["width"], iq[1]["height"], iq[1]["decoder"]) == (8, 8, "gif-lzw")
    assert iq[2]["decoder"] == "bmp-dib"
    assert iq[3]["width"] is None

    ft = {r["doc_id"]: r for r in decode_and_featurize(df, feature_dim=8).collect()}
    assert ft[1]["decoder"] == "gif-lzw"
    assert ft[2]["decoder"] == "bmp-dib"
    assert ft[3]["decoder"] == "fake-sha256"  # fall-through doctrine


def test_metadata_probe_mirrors_the_gate(spark):
    rows = [
        (1, _gif(), "image/gif"),
        (2, _over_budget_gif(), "image/gif"),
        (3, _bmp(), "image/bmp"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r["decode_status"] for r in extract_payload_metadata(df).collect()}
    assert out == {1: "ok", 2: "stubbed", 3: "ok"}


def test_sample_frames_routes_animated_gif(spark):
    frames = [{"indices": bytes([i % 4] * 16)} for i in range(5)]
    anim = gif_codec.encode_gif_indexed(4, 4, PAL4, frames)
    df = spark.createDataFrame(
        [(7, anim, "image/gif")], ["doc_id", "payload", "content_type"]
    )
    out = sample_frames(df, stride=2).collect()
    by_idx = {r["frame_index"]: r for r in out}
    assert sorted(by_idx) == [0, 2, 4]
    assert all(r["decoder"] == "gif-lzw" and r["n_frames"] == 5 for r in out)
    # composited canvas 2 = frame 2's flood fill (blue), RGBA
    fb = bytes(by_idx[2]["frame_bytes"])
    assert len(fb) == 4 * 4 * 4
    assert fb[:4] == bytes([0, 0, 255, 255])
    # corrupt GIF falls through to the fake-slice path, not a crash
    df2 = spark.createDataFrame(
        [(8, anim[:15], "image/gif")], ["doc_id", "payload", "content_type"]
    )
    out2 = sample_frames(df2, frame_size=8, stride=1).collect()
    assert out2 and all(r["decoder"] == "fake-slice" for r in out2)


def test_frame_dhash_over_animated_gif_and_avi(spark):
    from sqlbackuphistoryetl_spark.extensions import avi_codec, png_codec
    from sqlbackuphistoryetl_spark.extensions.multimodal import (
        frame_dhash,
        sample_frames,
    )

    # GIF: two distinct composited canvases (RGBA path)
    frames = [
        {"indices": bytes([(x % 4) for x in range(16)])},
        {"indices": bytes([3] * 16)},
    ]
    anim = gif_codec.encode_gif_indexed(4, 4, PAL4, frames)
    # AVI: one RGB frame with a real gradient
    import random

    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(4 * 4 * 3))
    avi = avi_codec.encode_avi([png_codec.DecodedImage(4, 4, 3, px)])
    rows = [
        (1, anim, "image/gif"),
        (2, avi, "video/avi"),
        (3, b"justbytes" * 30, "video/mp4"),  # fake path: NULL dhash
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = frame_dhash(sample_frames(df, stride=1)).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], {})[r["frame_index"]] = r
    # GIF frame 0 hash equals the direct codec chain on the canvas
    _, picked = gif_codec.decode_gif_frames_at(anim, stride=1)
    want = png_codec.dhash(picked[0][1])
    if want >= 1 << 63:
        want -= 1 << 64
    assert by[1][0]["dhash"] == want
    assert by[2][0]["decoder"] == "avi-dib"
    want_avi = png_codec.dhash(png_codec.DecodedImage(4, 4, 3, px))
    if want_avi >= 1 << 63:
        want_avi -= 1 << 64
    assert by[2][0]["dhash"] == want_avi
    assert all(r["dhash"] is None for r in by[3].values())
