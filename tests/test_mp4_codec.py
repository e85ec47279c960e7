"""MP4/ISO-BMFF header triage: box walk, both full-box versions,
largesize, truncation tolerance, and the visit budgets (r10)."""

from __future__ import annotations

import random
import struct

import pytest

from sqlbackuphistoryetl_spark.extensions import mp4_codec
from sqlbackuphistoryetl_spark.extensions.mp4_codec import (
    MP4Error,
    build_mp4,
    is_mp4,
    parse_mp4,
)


def _full_fixture(version=0, **kw):
    return build_mp4(
        brand="mp42",
        timescale=1000,
        duration=90_000,  # 90 s
        width=640,
        height=360,
        n_frames=2700,
        video_codec="avc1",
        channels=2,
        sample_rate=48000,
        bit_depth=16,
        n_samples=4_320_000,
        version=version,
        **kw,
    )


@pytest.mark.parametrize("version", [0, 1])
def test_roundtrip_both_fullbox_versions(version):
    info = parse_mp4(_full_fixture(version))
    assert info.brand == "mp42"
    assert info.duration_ms == 90_000
    assert info.n_tracks == 2
    assert (info.width, info.height) == (640, 360)
    assert info.n_frames == 2700
    assert info.video_codec == "avc1"
    assert (info.channels, info.sample_rate, info.bit_depth) == (2, 48000, 16)
    assert info.n_samples == 4_320_000


def test_largesize_mdat():
    info = parse_mp4(_full_fixture(mdat_largesize=True))
    assert (info.width, info.height, info.n_tracks) == (640, 360, 2)


def test_video_only_and_audio_only():
    v = parse_mp4(
        build_mp4(width=320, height=240, n_frames=10, duration=1000)
    )
    assert (v.width, v.height, v.n_frames) == (320, 240, 10)
    assert v.channels is None and v.sample_rate is None
    a = parse_mp4(
        build_mp4(channels=1, sample_rate=16000, bit_depth=16, n_samples=16000)
    )
    assert a.width is None and a.n_frames is None
    assert (a.channels, a.sample_rate, a.n_samples) == (1, 16000, 16000)


def test_is_mp4_signature():
    assert is_mp4(_full_fixture())
    assert not is_mp4(b"\x89PNG\r\n\x1a\n" + bytes(8))
    assert not is_mp4(b"")
    assert not is_mp4(bytes(12))
    with pytest.raises(MP4Error):
        parse_mp4(b"RIFF" + bytes(20))


def test_truncated_mdat_still_triages_metadata():
    """A crawl upload cut mid-mdat keeps every whole box before the
    cut — moov parses normally, only the tail is lost."""
    whole = _full_fixture()
    cut = whole[: len(whole) - 5]  # into the mdat body
    info = parse_mp4(cut)
    assert info.brand == "mp42"
    assert (info.width, info.height) == (640, 360)


def test_cut_before_moov_is_brand_only():
    whole = _full_fixture()
    ftyp_len = struct.unpack(">I", whole[:4])[0]
    info = parse_mp4(whole[: ftyp_len + 4])  # moov header truncated
    assert info.brand == "mp42"
    assert info.width is None and info.n_tracks == 0


def test_mismatched_timescale_gives_null_n_samples():
    """n_samples is only trustworthy when the audio mdhd timescale IS
    the sample rate; a remuxed file with a 1000 Hz media timescale
    must yield NULL, not a 48x-wrong count."""
    raw = bytearray(
        build_mp4(channels=2, sample_rate=48000, n_samples=96000)
    )
    # rewrite the audio mdhd timescale (v0: 8 bytes after verflags)
    at = bytes(raw).index(b"mdhd")
    struct.pack_into(">I", raw, at + 4 + 4 + 8, 1000)
    info = parse_mp4(bytes(raw))
    assert info.sample_rate == 48000 and info.n_samples is None


def test_zero_size_box_runs_to_container_end():
    whole = bytearray(_full_fixture())
    # the trailing mdat box: size 0 = "to end of file" per 14496-12
    pos = bytes(whole).rindex(b"mdat") - 4
    struct.pack_into(">I", whole, pos, 0)
    info = parse_mp4(bytes(whole))
    assert (info.width, info.height) == (640, 360)


def test_box_count_budget_bounds_crafted_headers():
    # a moov stuffed with thousands of empty boxes must stop at the
    # budget and degrade, never spin
    free = struct.pack(">I4s", 8, b"free") * (mp4_codec.MAX_BOXES + 10)
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + bytes(4)
    moov = struct.pack(">I4s", 8 + len(free), b"moov") + free
    info = parse_mp4(ftyp + moov)
    assert info.brand == "isom"  # bounded partial triage, no hang


def test_depth_budget():
    inner = struct.pack(">I4s", 8, b"free")
    for _ in range(mp4_codec.MAX_DEPTH + 2):
        inner = struct.pack(">I4s", 8 + len(inner), b"trak") + inner
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + bytes(4)
    moov = struct.pack(">I4s", 8 + len(inner), b"moov") + inner
    info = parse_mp4(ftyp + moov)  # degrades, bounded
    assert info.brand == "isom"


def test_mutation_corpus_terminates_without_raising():
    """300 mutations (bit flips, truncations, size rewrites) of a
    valid fixture: parse_mp4 must always terminate with either an
    Mp4Info or MP4Error — triage never hangs or leaks another
    exception type."""
    rng = random.Random(0xB0C5)
    base = _full_fixture()
    for i in range(300):
        raw = bytearray(base)
        mode = i % 3
        if mode == 0:  # single bit flip
            p = rng.randrange(len(raw))
            raw[p] ^= 1 << rng.randrange(8)
        elif mode == 1:  # truncate
            raw = raw[: rng.randrange(1, len(raw))]
        else:  # rewrite a random u32 (often a box size)
            p = rng.randrange(len(raw) - 4)
            struct.pack_into(">I", raw, p, rng.randrange(1 << 32))
        try:
            info = parse_mp4(bytes(raw))
            assert info.brand is not None
        except MP4Error:
            pass


def test_media_info_reports_mp4(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import media_info

    rows = [
        (1, _full_fixture(), "video/mp4"),
        (2, build_mp4(channels=1, sample_rate=8000, n_samples=800),
         "audio/mp4"),
        (3, _full_fixture()[:20], "video/mp4"),  # brand-only cut
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r for r in media_info(df).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"],
            out[1]["n_frames"], out[1]["channels"], out[1]["sample_rate"],
            out[1]["n_samples"], out[1]["bit_depth"]) == (
        "mp4", 640, 360, 2700, 2, 48000, 4_320_000, 16)
    assert (out[2]["format"], out[2]["channels"], out[2]["sample_rate"],
            out[2]["n_samples"]) == ("mp4", 1, 8000, 800)
    assert out[3]["format"] == "mp4" and out[3]["width"] is None
