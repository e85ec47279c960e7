"""MP4 / ISO-BMFF header triage — a box walk, never a decode (r10).

MP4 is the dominant video container in crawled data, and the triage
layer (:func:`multimodal.media_info`) is exactly where it belongs
under the perceptual-codec doctrine: H.264/H.265/AAC payloads are
perceptual codecs this engine deliberately does not decode (same
decision as MP3/AAC audio — see BASELINE.md r9), but brand, geometry,
duration, track layout and frame/sample counts all live in plain
big-endian metadata boxes that a stdlib walk reads in O(header bytes).

ISO-BMFF (ISO/IEC 14496-12) structure: a file is a sequence of boxes
``[size:u32][type:4cc][payload]``; ``size == 1`` means a 64-bit
largesize follows the type, ``size == 0`` means "to end of enclosing
container". Container boxes (moov, trak, mdia, minf, stbl) nest
further boxes as their payload; leaf "full boxes" (mvhd, tkhd, mdhd,
stsd, stsz) start with a version byte that switches 32-bit and 64-bit
field layouts — both versions are parsed and fixture-tested here.

Budgets, same doctrine as the image codecs' decompression-bomb
guards: the walk visits at most ``MAX_BOXES`` boxes at most
``MAX_DEPTH`` deep, so a crafted header can't spin an executor.
Corrupt structure raises :class:`MP4Error`; ``media_info`` triages
that as ``'unknown'`` rather than failing a 100 TB pass.

:func:`build_mp4` is the deterministic fixture builder (no binary
fixtures on disk): it emits ftyp + moov(mvhd, video trak, audio trak)
+ mdat with selectable box versions and an optional 64-bit-largesize
mdat, so tests and the driver gate pin the offset arithmetic of both
layouts and the largesize path.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

#: box-walk budgets: headers are small; a million-box moov is an attack
MAX_BOXES = 4096
MAX_DEPTH = 16

#: containers whose payload is itself a box sequence
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class MP4Error(ValueError):
    """Structurally corrupt ISO-BMFF (callers triage as 'unknown')."""


@dataclass
class Mp4Info:
    brand: str
    duration_ms: int | None = None  # movie duration from mvhd
    n_tracks: int = 0
    width: int | None = None  # first video track, from tkhd (16.16)
    height: int | None = None
    n_frames: int | None = None  # video stsz/stz2 sample_count
    video_codec: str | None = None  # stsd entry fourcc, e.g. 'avc1'
    channels: int | None = None  # first audio track, from stsd mp4a
    sample_rate: int | None = None
    bit_depth: int | None = None  # stsd samplesize
    n_samples: int | None = None  # audio mdhd duration, iff its
    # timescale equals the sample rate (the audio-track convention);
    # otherwise None rather than a silently mis-scaled count


def is_mp4(payload: bytes) -> bool:
    """ISO-BMFF signature: the first box is ftyp (every MP4/MOV/3GP
    writer emits it first; QuickTime files without one are triaged by
    their own walkers, not this one)."""
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _u32(buf: bytes, pos: int) -> int:
    return struct.unpack(">I", buf[pos : pos + 4])[0]


def _u64(buf: bytes, pos: int) -> int:
    return struct.unpack(">Q", buf[pos : pos + 8])[0]


class _Walk:
    """Box iterator with the shared visit budget."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.visited = 0

    def boxes(self, start: int, end: int, depth: int = 0):
        """Yield (type, body_start, body_end) across [start, end)."""
        if depth > MAX_DEPTH:
            raise MP4Error(f"box nesting exceeds {MAX_DEPTH}")
        buf, pos = self.buf, start
        while pos + 8 <= end:
            self.visited += 1
            if self.visited > MAX_BOXES:
                raise MP4Error(f"more than {MAX_BOXES} boxes")
            size = _u32(buf, pos)
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    raise MP4Error("truncated largesize header")
                size = _u64(buf, pos + 8)
                hdr = 16
            elif size == 0:  # box runs to the end of its container
                size = end - pos
            if size < hdr or pos + size > end:
                raise MP4Error("box size exceeds container")
            yield btype, pos + hdr, pos + size
            pos += size
        if pos != end:
            raise MP4Error("trailing bytes are not a whole box")


def _full_box(buf: bytes, start: int, end: int) -> tuple[int, int]:
    """(version, first-field offset) of a full box body."""
    if start + 4 > end:
        raise MP4Error("truncated full box")
    return buf[start], start + 4


def _parse_mvhd(buf, start, end):
    ver, p = _full_box(buf, start, end)
    if ver == 1:
        if p + 28 > end:
            raise MP4Error("truncated mvhd v1")
        timescale = _u32(buf, p + 16)
        duration = _u64(buf, p + 20)
    else:
        if p + 16 > end:
            raise MP4Error("truncated mvhd v0")
        timescale = _u32(buf, p + 8)
        duration = _u32(buf, p + 12)
    if timescale == 0:
        raise MP4Error("mvhd timescale 0")
    return duration * 1000 // timescale


def _parse_tkhd(buf, start, end):
    """(width, height) from the 16.16 fixed-point presentation size."""
    ver, p = _full_box(buf, start, end)
    # after ver/flags: v0 = 5*u32 + 8 + 8 + 36 = width at +72;
    # v1 widens creation/modification/duration to u64 → width at +84
    off = p + (84 if ver == 1 else 72)
    if off + 8 > end:
        raise MP4Error("truncated tkhd")
    return _u32(buf, off) >> 16, _u32(buf, off + 4) >> 16


def _parse_mdhd(buf, start, end):
    ver, p = _full_box(buf, start, end)
    if ver == 1:
        if p + 24 > end:
            raise MP4Error("truncated mdhd v1")
        return _u32(buf, p + 16), _u64(buf, p + 20)
    if p + 16 > end:
        raise MP4Error("truncated mdhd v0")
    return _u32(buf, p + 8), _u32(buf, p + 12)


def _parse_hdlr(buf, start, end):
    _, p = _full_box(buf, start, end)
    if p + 8 > end:
        raise MP4Error("truncated hdlr")
    return buf[p + 4 : p + 8]  # handler_type: b'vide' / b'soun' / ...


def _parse_stsd_entry(buf, start, end):
    """(fourcc, entry_body_start, entry_body_end) of the first sample
    description, or None if the table is empty."""
    _, p = _full_box(buf, start, end)
    if p + 4 > end:
        raise MP4Error("truncated stsd")
    if _u32(buf, p) == 0:
        return None
    q = p + 4
    if q + 8 > end:
        raise MP4Error("truncated stsd entry")
    esize = _u32(buf, q)
    fourcc = buf[q + 4 : q + 8]
    if esize < 8 or q + esize > end:
        raise MP4Error("stsd entry size exceeds box")
    return fourcc, q + 8, q + esize


def _parse_stsz_count(buf, start, end):
    _, p = _full_box(buf, start, end)
    if p + 8 > end:
        raise MP4Error("truncated stsz")
    return _u32(buf, p + 4)  # sample_count (field after sample_size)


def _audio_sample_entry(buf, start, end):
    """(channels, bit_depth, sample_rate) from an AudioSampleEntry
    body (after its 8-byte size+fourcc header): 6 reserved + 2
    data_ref_index + 8 reserved, then channelcount u16, samplesize
    u16, 4 predefined/reserved, samplerate as 16.16."""
    if start + 28 > end:
        raise MP4Error("truncated audio sample entry")
    channels = struct.unpack(">H", buf[start + 16 : start + 18])[0]
    bits = struct.unpack(">H", buf[start + 18 : start + 20])[0]
    rate = _u32(buf, start + 24) >> 16
    return channels, bits, rate


def parse_mp4(payload: bytes) -> Mp4Info:
    """Walk the box tree of an ISO-BMFF payload into :class:`Mp4Info`.

    Reads ftyp + the moov metadata tree only; mdat (the entropy-coded
    media itself) is skipped by its size field without being touched,
    which is what keeps this O(header bytes) on a multi-gigabyte
    video. The first video track supplies geometry/frame count, the
    first audio track supplies channels/rate/depth — additional
    tracks only increment ``n_tracks``, matching the one-row-per-
    payload triage schema."""
    if not is_mp4(payload):
        raise MP4Error("not ISO-BMFF (no leading ftyp)")
    walk = _Walk(payload)
    info: Mp4Info | None = None
    moov: tuple[int, int] | None = None
    try:
        for btype, bs, be in walk.boxes(0, len(payload)):
            if btype == b"ftyp":
                if be - bs < 8:
                    raise MP4Error("truncated ftyp")
                info = Mp4Info(brand=payload[bs : bs + 4].decode("latin-1"))
            elif btype == b"moov" and moov is None:
                moov = (bs, be)
    except MP4Error:
        # moov-at-end streaming uploads cut mid-transfer are routine in
        # crawls: whatever whole boxes preceded the cut still triage.
        # (A yielded moov is complete — its size fit the file — so any
        # metadata found below is trustworthy.)
        if info is None:
            raise
    if info is None:
        raise MP4Error("no ftyp box")
    if moov is None:
        return info  # brand-only triage
    try:
        for btype, bs, be in walk.boxes(*moov, depth=1):
            if btype == b"mvhd":
                info.duration_ms = _parse_mvhd(payload, bs, be)
            elif btype == b"trak":
                info.n_tracks += 1
                try:
                    _parse_trak(walk, bs, be, info)
                except MP4Error:
                    pass  # one corrupt track, the others still triage
    except MP4Error:
        pass  # a corrupt subtree degrades to partial triage, bounded
        # by the shared MAX_BOXES/MAX_DEPTH budget either way
    return info


def _parse_trak(walk: _Walk, start: int, end: int, info: Mp4Info) -> None:
    buf = walk.buf
    tkhd_wh = None
    handler = None
    mdhd = None
    stsd = None
    stsz_count = None
    for btype, bs, be in walk.boxes(start, end, depth=2):
        if btype == b"tkhd":
            tkhd_wh = _parse_tkhd(buf, bs, be)
        elif btype == b"mdia":
            for mtype, ms, me in walk.boxes(bs, be, depth=3):
                if mtype == b"mdhd":
                    mdhd = _parse_mdhd(buf, ms, me)
                elif mtype == b"hdlr":
                    handler = _parse_hdlr(buf, ms, me)
                elif mtype == b"minf":
                    for ntype, ns, ne in walk.boxes(ms, me, depth=4):
                        if ntype != b"stbl":
                            continue
                        for stype, ss, se in walk.boxes(ns, ne, depth=5):
                            if stype == b"stsd":
                                stsd = _parse_stsd_entry(buf, ss, se)
                            elif stype == b"stsz":
                                stsz_count = _parse_stsz_count(buf, ss, se)
    if handler == b"vide" and info.width is None:
        if tkhd_wh is not None:
            info.width, info.height = tkhd_wh
        info.n_frames = stsz_count
        if stsd is not None:
            info.video_codec = stsd[0].decode("latin-1")
    elif handler == b"soun" and info.channels is None:
        if stsd is not None:
            fourcc, es, ee = stsd
            info.channels, info.bit_depth, info.sample_rate = (
                _audio_sample_entry(buf, es, ee)
            )
        if (
            mdhd is not None
            and info.sample_rate
            and mdhd[0] == info.sample_rate
        ):
            info.n_samples = mdhd[1]


# ---------------------------------------------------------------------------
# fixture builder


def _box(btype: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I4sQ", 1, btype, 16 + len(payload)) + payload
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3x", version) + payload)


def build_mp4(
    *,
    brand: str = "isom",
    timescale: int = 1000,
    duration: int = 0,
    width: int | None = None,
    height: int | None = None,
    n_frames: int = 0,
    video_codec: str = "avc1",
    channels: int | None = None,
    sample_rate: int = 48000,
    bit_depth: int = 16,
    n_samples: int = 0,
    version: int = 0,
    mdat: bytes = b"\x00" * 8,
    mdat_largesize: bool = False,
) -> bytes:
    """Deterministic minimal-but-valid MP4: ftyp + moov(mvhd [+ video
    trak] [+ audio trak]) + mdat. ``version`` selects the v0 (32-bit)
    or v1 (64-bit) layouts of mvhd/tkhd/mdhd so both parse paths stay
    fixture-tested; ``mdat_largesize`` exercises the 64-bit box-size
    header. The mdat content is an inert stub — this module never
    decodes media, so fixtures don't need real entropy data."""
    if version not in (0, 1):
        raise ValueError("version must be 0 or 1")
    w = struct.pack  # brevity below

    def mvhd() -> bytes:
        t = (
            w(">QQIQ", 0, 0, timescale, duration)
            if version
            else w(">IIII", 0, 0, timescale, duration)
        )
        # rate, volume+reserved, matrix, predefined, next_track_ID
        t += w(">i", 0x00010000) + w(">hH8x", 0x0100, 0)
        t += w(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        t += b"\x00" * 24 + w(">I", 3)
        return _full(b"mvhd", version, t)

    def tkhd(track_id: int, tw: int, th: int) -> bytes:
        t = (
            w(">QQI4xQ", 0, 0, track_id, duration)
            if version
            else w(">III4xI", 0, 0, track_id, duration)
        )
        t += b"\x00" * 8 + w(">hhhH", 0, 0, 0, 0)
        t += w(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        t += w(">II", tw << 16, th << 16)
        return _full(b"tkhd", version, t)

    def mdhd(ts: int, dur: int) -> bytes:
        t = (
            w(">QQIQ", 0, 0, ts, dur)
            if version
            else w(">IIII", 0, 0, ts, dur)
        )
        t += w(">HH", 0x55C4, 0)  # language 'und', predefined
        return _full(b"mdhd", version, t)

    def hdlr(handler: bytes) -> bytes:
        return _full(b"hdlr", 0, w(">4x4s12x", handler) + b"\x00")

    def stbl(entry: bytes, count: int) -> bytes:
        stsd = _full(b"stsd", 0, w(">I", 1) + entry)
        stsz = _full(b"stsz", 0, w(">II", 0, count))
        return _box(b"stbl", stsd + stsz)

    def trak(track_id, tw, th, ts, dur, handler, entry, count) -> bytes:
        minf = _box(b"minf", stbl(entry, count))
        mdia = _box(b"mdia", mdhd(ts, dur) + hdlr(handler) + minf)
        return _box(b"trak", tkhd(track_id, tw, th) + mdia)

    body = mvhd()
    if width is not None and height is not None:
        entry = w(">I4s", 86, video_codec.encode("ascii")) + b"\x00" * 78
        body += trak(
            1, width, height, timescale, duration, b"vide", entry, n_frames
        )
    if channels is not None:
        entry = (
            w(">I4s", 36, b"mp4a")
            + b"\x00" * 8  # reserved + data_ref_index
            + b"\x00" * 8  # reserved
            + w(">HH4x", channels, bit_depth)
            + w(">I", sample_rate << 16)
        )
        body += trak(
            2, 0, 0, sample_rate, n_samples, b"soun", entry, n_samples
        )
    ftyp = _box(b"ftyp", brand.encode("ascii") + w(">I", 0) + b"isom")
    return ftyp + _box(b"moov", body) + _box(b"mdat", mdat, mdat_largesize)
