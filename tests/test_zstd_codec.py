"""Zstandard raw/RLE frame subset (extensions/zstd_codec.py, RFC
8878, r12): writer conformance, decoder block/frame walk, gating of
compressed blocks, jsonl.zst round trip, hostile-input taxonomy."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlbackuphistoryetl_spark.extensions.zstd_codec import (
    ZSTD_MAGIC,
    UnsupportedZstd,
    ZstdError,
    is_zstd,
    read_jsonl_zst,
    write_jsonl_zst,
    zstd_compress_raw,
    zstd_decompress,
)


def _block(btype: int, size: int, last: int = 1) -> bytes:
    return (last | (btype << 1) | (size << 3)).to_bytes(3, "little")


class TestRoundTrip:
    @pytest.mark.parametrize(
        "n", [0, 1, 255, 256, 65791, 65792, 128 * 1024, 128 * 1024 + 7]
    )
    def test_sizes(self, n):
        data = bytes(i % 251 for i in range(n))
        frame = zstd_compress_raw(data)
        assert frame[:4] == ZSTD_MAGIC
        assert zstd_decompress(frame) == data

    def test_multi_block_boundaries(self):
        data = b"x" * (128 * 1024) + b"TAIL"
        frame = zstd_compress_raw(data)
        # two blocks: a full raw block then the ragged last one
        assert zstd_decompress(frame) == data

    def test_concatenated_frames(self):
        f = zstd_compress_raw(b"alpha") + zstd_compress_raw(b"bravo")
        assert zstd_decompress(f) == b"alphabravo"

    def test_is_zstd(self):
        assert is_zstd(zstd_compress_raw(b"x"))
        assert is_zstd(b"\x50\x2a\x4d\x18" + b"\x00" * 4)  # skippable
        assert not is_zstd(b"PK\x03\x04")
        assert not is_zstd(None)
        assert not is_zstd(b"\x28\xb5")


class TestDecoder:
    def test_rle_block(self):
        frame = ZSTD_MAGIC + bytes([0x20, 9]) + _block(1, 9) + b"Q"
        assert zstd_decompress(frame) == b"Q" * 9

    def test_windowed_header_no_fcs(self):
        # not single-segment: window descriptor present, fcs flag 0
        frame = ZSTD_MAGIC + bytes([0x00, 0x58]) + _block(0, 3) + b"abc"
        assert zstd_decompress(frame) == b"abc"

    def test_skippable_frame_skipped(self):
        skip = b"\x5f\x2a\x4d\x18" + (6).to_bytes(4, "little") + b"IGNORE"
        frame = skip + zstd_compress_raw(b"kept")
        assert zstd_decompress(frame) == b"kept"

    def test_checksum_skipped_not_verified(self):
        frame = (
            ZSTD_MAGIC + bytes([0x24, 2]) + _block(0, 2) + b"ok"
            + b"\xde\xad\xbe\xef"
        )
        assert zstd_decompress(frame) == b"ok"

    def test_compressed_block_gated(self):
        frame = ZSTD_MAGIC + bytes([0x20, 4]) + _block(2, 4) + b"\x00" * 4
        with pytest.raises(UnsupportedZstd):
            zstd_decompress(frame)

    def test_dictionary_frame_gated(self):
        frame = ZSTD_MAGIC + bytes([0x21, 7, 5]) + _block(0, 1) + b"z"
        with pytest.raises(UnsupportedZstd):
            zstd_decompress(frame)

    @pytest.mark.parametrize(
        "blob",
        [
            b"\x28\xb5\x2f",                                   # short magic
            b"BAD!" + b"\x00" * 8,                             # wrong magic
            ZSTD_MAGIC,                                        # no fhd
            ZSTD_MAGIC + bytes([0x28, 1]),                     # reserved bit
            ZSTD_MAGIC + bytes([0x20, 5]) + _block(3, 5),      # reserved type
            ZSTD_MAGIC + bytes([0x20, 5]) + _block(0, 5) + b"ab",  # short raw
            ZSTD_MAGIC + bytes([0x20, 5]) + _block(1, 5),      # short RLE
            ZSTD_MAGIC + bytes([0x24, 1]) + _block(0, 1) + b"x",   # no cksum
            b"\x50\x2a\x4d\x18\xff\xff\xff\xff",               # skip overrun
        ],
    )
    def test_malformed_raises_zstderror(self, blob):
        with pytest.raises(ZstdError):
            zstd_decompress(blob)

    def test_budget(self):
        frame = ZSTD_MAGIC + bytes([0x20, 100]) + _block(1, 100) + b"A"
        assert zstd_decompress(frame) == b"A" * 100
        with pytest.raises(ZstdError):
            zstd_decompress(frame, budget=99)


class TestFrameIter:
    def test_offsets_and_lengths(self):
        from sqlbackuphistoryetl_spark.extensions.zstd_codec import (
            iter_zstd_frames,
        )

        f1, f2 = zstd_compress_raw(b"alpha"), zstd_compress_raw(b"bravo!")
        skip = b"\x50\x2a\x4d\x18" + (3).to_bytes(4, "little") + b"xyz"
        blob = f1 + skip + f2
        got = list(iter_zstd_frames(blob))
        assert got[0] == (0, len(f1), b"alpha")
        # the skippable frame advances the walk but is not yielded
        assert got[1] == (len(f1) + len(skip), len(f2), b"bravo!")
        assert len(got) == 2
        # range-read property: the (offset, length) slice re-decodes
        off, ln, data = got[1]
        assert zstd_decompress(blob[off : off + ln]) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_fuzz_roundtrip(data):
    assert zstd_decompress(zstd_compress_raw(data)) == data


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=256))
def test_fuzz_hostile_never_crashes(blob):
    """Any byte soup either decodes or raises the documented taxonomy
    — never an IndexError/OverflowError escape."""
    try:
        zstd_decompress(blob)
    except (ZstdError, UnsupportedZstd):
        pass


class TestJsonlZst:
    def test_spark_round_trip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, f"text {i} é", i % 3) for i in range(23)],
            "doc_id long, text string, grp int",
        )
        path = str(tmp_path / "corpus")
        summary = write_jsonl_zst(df, path, "doc_id", records_per_shard=10)
        assert [r["n_samples"] for r in summary] == [10, 10, 3]
        back = read_jsonl_zst(
            spark, path, "doc_id long, text string, grp int", fan_out=4
        )
        rows = {r["doc_id"]: r for r in back.collect()}
        assert len(rows) == 23
        assert rows[7]["text"] == "text 7 é" and rows[7]["grp"] == 1


class TestFcsWidths:
    def test_all_four_fcs_arms(self):
        """r13 (ADVICE): n >= 2**32 must take RFC 8878 fcs_flag=3
        (8-byte FCS, fhd 0xE0) instead of raising OverflowError."""
        from sqlbackuphistoryetl_spark.extensions.zstd_codec import _fcs_header

        assert _fcs_header(0) == (0x20, b"\x00")
        assert _fcs_header(255) == (0x20, b"\xff")
        assert _fcs_header(256) == (0x60, b"\x00\x00")
        assert _fcs_header(65536 + 255) == (0x60, b"\xff\xff")
        assert _fcs_header(65536 + 256) == (0xA0, (65536 + 256).to_bytes(4, "little"))
        assert _fcs_header(2**32 - 1) == (0xA0, b"\xff\xff\xff\xff")
        assert _fcs_header(2**32) == (0xE0, (2**32).to_bytes(8, "little"))
        assert _fcs_header(2**33 + 7) == (0xE0, (2**33 + 7).to_bytes(8, "little"))

    def test_8byte_fcs_header_parses(self):
        """The decoder's own _frame_header walks an fcs_flag=3 header."""
        from sqlbackuphistoryetl_spark.extensions.zstd_codec import (
            ZSTD_MAGIC,
            _fcs_header,
            _frame_header,
        )

        fhd, fcs = _fcs_header(2**32)
        blob = ZSTD_MAGIC + bytes([fhd]) + fcs + b"\x01\x00\x00"
        p, checksum = _frame_header(blob, len(ZSTD_MAGIC))
        assert p == len(ZSTD_MAGIC) + 1 + 8
        assert checksum is False
