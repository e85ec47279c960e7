"""EXIF APP1/TIFF-IFD parsing: round trips both endiannesses, offset
arithmetic, corruption triage, Spark routing (r9)."""

from __future__ import annotations

import struct

from sqlbackuphistoryetl_spark.extensions import jpeg_codec
from sqlbackuphistoryetl_spark.extensions.exif_codec import (
    build_exif_app1,
    parse_exif,
    splice_exif,
)
from sqlbackuphistoryetl_spark.extensions.multimodal import image_exif


def _jpeg_with(app1: bytes) -> bytes:
    return splice_exif(jpeg_codec.encode_jpeg(bytes(64), 8, 8, 1), app1)


class TestRoundTrip:
    def test_both_endiannesses(self):
        for endian in ("<", ">"):
            app1 = build_exif_app1(
                orientation=6,
                datetime="2023:07:14 09:30:00",
                make="ACME",
                model="Snapper 3000",
                pixel_x=4032,
                pixel_y=3024,
                endian=endian,
            )
            e = parse_exif(_jpeg_with(app1))
            assert e.orientation == 6, endian
            assert e.datetime == "2023:07:14 09:30:00"
            assert (e.make, e.model) == ("ACME", "Snapper 3000")
            assert (e.pixel_x, e.pixel_y) == (4032, 3024)

    def test_partial_fields_and_short_ascii(self):
        # 3-byte make fits INLINE in the 4-byte value slot (no offset)
        e = parse_exif(_jpeg_with(build_exif_app1(make="AB", orientation=1)))
        assert e.make == "AB" and e.orientation == 1
        assert e.datetime is None and e.pixel_x is None

    def test_decoder_still_decodes_spliced_jpeg(self):
        blob = _jpeg_with(build_exif_app1(orientation=3))
        img = jpeg_codec.decode_jpeg(blob)
        assert (img.width, img.height) == (8, 8)


class TestTriage:
    def test_no_exif_and_non_jpeg(self):
        assert parse_exif(jpeg_codec.encode_jpeg(bytes(64), 8, 8, 1)).orientation is None
        assert parse_exif(b"\x89PNG\r\n\x1a\n").make is None
        assert parse_exif(b"").orientation is None

    def test_corrupt_exif_degrades_to_empty(self):
        base = build_exif_app1(orientation=6, make="ACME", pixel_x=100)
        for mutate in (
            lambda b: b[:20],                          # truncated TIFF block
            lambda b: b.replace(b"II", b"XX", 1),      # bad byte order
            lambda b: b.replace(struct.pack("<H", 42), b"\x2b\x00", 1),
        ):
            bad = bytearray(mutate(bytes(base)))
            # keep the segment length honest after truncation
            if len(bad) >= 4:
                struct.pack_into(">H", bad, 2, len(bad) - 2)
            e = parse_exif(b"\xff\xd8" + bytes(bad) + b"\xff\xd9")
            assert e.orientation is None and e.make is None

    def test_value_offset_past_block_skips_entry_only(self):
        app1 = bytearray(build_exif_app1(make="LONGMAKER", orientation=6))
        # corrupt the ASCII value offset (points past the block) —
        # make drops, orientation survives
        at = bytes(app1).index(b"LONGMAKER")
        blob = bytes(app1[:at]) + b""  # truncate the tail data
        blob = blob[:2] + struct.pack(">H", len(blob) - 2) + blob[4:]
        e = parse_exif(b"\xff\xd8" + blob + b"\xff\xd9")
        assert e.make is None and e.orientation == 6


def test_spark_routing(spark):
    good = _jpeg_with(build_exif_app1(orientation=8, make="Cam"))
    plain = jpeg_codec.encode_jpeg(bytes(64), 8, 8, 1)
    df = spark.createDataFrame(
        [(1, good, "image/jpeg"), (2, plain, "image/jpeg"), (3, None, "x")],
        ["doc_id", "payload", "content_type"],
    )
    out = {r["doc_id"]: r for r in image_exif(df).collect()}
    assert out[1]["orientation"] == 8 and out[1]["make"] == "Cam"
    assert out[2]["orientation"] is None
    assert out[3]["make"] is None
