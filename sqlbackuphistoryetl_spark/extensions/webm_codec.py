"""WebM / Matroska (EBML) header triage — a varint walk, never a
decode (r11).

WebM is the other dominant crawl video container next to MP4, and it
belongs in the same triage tier (:func:`multimodal.media_info`): the
VP8/VP9/AV1/Opus/Vorbis payloads are perceptual codecs this engine
deliberately does not decode (the H.264/AAC decision, BASELINE.md r9),
but docType, duration, track layout, geometry and audio parameters all
live in plain EBML metadata elements a stdlib walk reads in O(header
bytes).

EBML (RFC 8794 + the public Matroska spec) structure: a document is a
sequence of elements ``[ID varint][size varint][payload]`` — the ID
keeps its length-marker bits verbatim (1-4 bytes), the size strips
them (1-8 bytes; an all-ones size means "unknown, runs to the end of
the enclosing scope", which live-streamed Segments use routinely).
Container elements (EBML header, Segment, Info, Tracks, TrackEntry,
Video, Audio) nest further elements; Clusters — the media data — are
skipped wholesale by their size field, never read.

Budgets, same doctrine as the MP4 box walk (mp4_codec.py:36): at most
``MAX_ELEMENTS`` elements at most ``MAX_DEPTH`` deep, so a crafted
header can't spin an executor. Corrupt structure raises
:class:`WebMError`; ``media_info`` triages that as ``'unknown'``.

:func:`build_webm` is the deterministic fixture builder (no binary
fixtures on disk): EBML header + Segment(Info, Tracks(video, audio),
Cluster stub) with minimal-length varints, so tests and the driver
gate pin the ID/size arithmetic, the float fields and the
unknown-size path.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

#: element-walk budgets: headers are small; a million-element file is
#: an attack
MAX_ELEMENTS = 4096
MAX_DEPTH = 8


class WebMError(ValueError):
    """Structurally corrupt EBML (callers triage as 'unknown')."""


@dataclass
class WebmInfo:
    doc_type: str
    duration_ms: int | None = None
    n_tracks: int = 0
    width: int | None = None  # first video track
    height: int | None = None
    video_codec: str | None = None  # e.g. 'V_VP9'
    channels: int | None = None  # first audio track
    sample_rate: int | None = None
    bit_depth: int | None = None
    audio_codec: str | None = None  # e.g. 'A_OPUS'


# element IDs (verbatim, marker bits included — how they appear on disk)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_VIDEO = 0xE0
_AUDIO = 0xE1
_DOCTYPE = 0x4282
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_BIT_DEPTH = 0x6264

_CONTAINERS = {_EBML, _SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO}


def is_webm(payload: bytes) -> bool:
    """EBML magic: every Matroska/WebM file starts with the EBML
    header element ID 0x1A45DFA3."""
    return payload[:4] == b"\x1a\x45\xdf\xa3"


def _read_id(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    """(element ID with marker bits, new pos)."""
    if pos >= end:
        raise WebMError("truncated element ID")
    first = buf[pos]
    for length in range(1, 5):
        if first & (0x80 >> (length - 1)):
            if pos + length > end:
                raise WebMError("truncated element ID")
            return (
                int.from_bytes(buf[pos : pos + length], "big"),
                pos + length,
            )
    raise WebMError("element ID longer than 4 bytes")


def _read_size(buf: bytes, pos: int, end: int) -> tuple[int | None, int]:
    """(payload size or None for unknown-size, new pos)."""
    if pos >= end:
        raise WebMError("truncated size varint")
    first = buf[pos]
    for length in range(1, 9):
        if first & (0x80 >> (length - 1)):
            if pos + length > end:
                raise WebMError("truncated size varint")
            mask = 0xFF >> length
            value = first & mask
            for i in range(1, length):
                value = (value << 8) | buf[pos + i]
            if value == (1 << (7 * length)) - 1:
                return None, pos + length  # all ones: unknown size
            return value, pos + length
    raise WebMError("size varint longer than 8 bytes")


def _uint(buf: bytes) -> int:
    if not 1 <= len(buf) <= 8:
        raise WebMError(f"uint element of {len(buf)} bytes")
    return int.from_bytes(buf, "big")


def _float(buf: bytes) -> float:
    if len(buf) == 4:
        return struct.unpack(">f", buf)[0]
    if len(buf) == 8:
        return struct.unpack(">d", buf)[0]
    raise WebMError(f"float element of {len(buf)} bytes")


class _Walk:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.visited = 0

    def elements(self, start: int, end: int, depth: int = 0):
        """Yield (id, body_start, body_end) across [start, end)."""
        if depth > MAX_DEPTH:
            raise WebMError(f"nesting exceeds {MAX_DEPTH}")
        pos = start
        while pos < end:
            self.visited += 1
            if self.visited > MAX_ELEMENTS:
                raise WebMError(f"more than {MAX_ELEMENTS} elements")
            eid, pos = _read_id(self.buf, pos, end)
            size, pos = _read_size(self.buf, pos, end)
            if size is None:
                # unknown size: the element runs to the end of its
                # scope (streamed Segments) — legal only as the LAST
                # element of the scope by construction
                yield eid, pos, end
                return
            if pos + size > end:
                raise WebMError("element size exceeds its scope")
            yield eid, pos, pos + size
            pos += size


def parse_webm(payload: bytes) -> WebmInfo:
    """Header triage of a Matroska/WebM stream: docType, duration
    (TimestampScale-corrected to ms), track count, first-video
    geometry + codec, first-audio parameters + codec. Clusters are
    skipped by their size field — O(header bytes) regardless of media
    size."""
    if not is_webm(payload):
        raise WebMError("not EBML (no 0x1A45DFA3 magic)")
    walk = _Walk(payload)
    doc_type = "matroska"  # the spec default when DocType is absent
    scale_ns = 1_000_000  # TimestampScale default: 1 ms units
    duration_units: float | None = None
    info = WebmInfo(doc_type)

    def _track_entry(start: int, end: int, depth: int) -> None:
        ttype = None
        codec = None
        fields: dict[str, int | float] = {}
        for eid, s, e in walk.elements(start, end, depth):
            body = payload[s:e]
            if eid == _TRACK_TYPE:
                ttype = _uint(body)
            elif eid == _CODEC_ID:
                codec = body.decode("ascii", "replace").rstrip("\x00")
            elif eid == _VIDEO:
                for vid, vs, ve in walk.elements(s, e, depth + 1):
                    if vid == _PIXEL_WIDTH:
                        fields["w"] = _uint(payload[vs:ve])
                    elif vid == _PIXEL_HEIGHT:
                        fields["h"] = _uint(payload[vs:ve])
            elif eid == _AUDIO:
                for aid, as_, ae in walk.elements(s, e, depth + 1):
                    if aid == _SAMPLING_FREQ:
                        fields["rate"] = _float(payload[as_:ae])
                    elif aid == _CHANNELS:
                        fields["ch"] = _uint(payload[as_:ae])
                    elif aid == _BIT_DEPTH:
                        fields["bits"] = _uint(payload[as_:ae])
        info.n_tracks += 1
        if ttype == 1 and info.width is None:
            info.width = fields.get("w")
            info.height = fields.get("h")
            info.video_codec = codec
        elif ttype == 2 and info.channels is None:
            info.channels = fields.get("ch")
            rate = fields.get("rate")
            info.sample_rate = int(round(rate)) if rate else None
            info.bit_depth = fields.get("bits")
            info.audio_codec = codec

    for eid, s, e in walk.elements(0, len(payload)):
        if eid == _EBML:
            for hid, hs, he in walk.elements(s, e, 1):
                if hid == _DOCTYPE:
                    doc_type = (
                        payload[hs:he].decode("ascii", "replace")
                        .rstrip("\x00")
                    )
        elif eid == _SEGMENT:
            for sid, ss, se in walk.elements(s, e, 1):
                if sid == _INFO:
                    for iid, is_, ie in walk.elements(ss, se, 2):
                        if iid == _TIMESTAMP_SCALE:
                            scale_ns = _uint(payload[is_:ie])
                        elif iid == _DURATION:
                            duration_units = _float(payload[is_:ie])
                elif sid == _TRACKS:
                    for tid, ts, te in walk.elements(ss, se, 2):
                        if tid == _TRACK_ENTRY:
                            _track_entry(ts, te, 3)
                # Clusters and everything else: skipped by size
    info.doc_type = doc_type
    if duration_units is not None and scale_ns > 0:
        info.duration_ms = int(round(duration_units * scale_ns / 1e6))
    return info


def decode_webm_frames(payload: bytes):
    """GATED: the VP8/VP9/AV1 payloads inside Clusters are perceptual
    codecs this engine does not decode (the mp4/H.264 doctrine —
    BASELINE.md r9). Header triage is :func:`parse_webm`."""
    info = parse_webm(payload)
    raise WebMError(
        f"decode of {info.video_codec or 'unknown-codec'} Clusters is "
        f"gated (perceptual codec); use parse_webm for triage"
    )


# ---------------------------------------------------------------- writer


def _vint(n: int) -> bytes:
    """Minimal-length EBML size varint."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is reserved
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise WebMError(f"size {n} too large for a varint")


def _elem(eid: int, payload: bytes) -> bytes:
    nid = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nid, "big") + _vint(len(payload)) + payload


def _uint_bytes(n: int) -> bytes:
    return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")


def build_webm(
    width: int,
    height: int,
    channels: int,
    sample_rate: int,
    bit_depth: int = 16,
    duration_ms: int = 1000,
    doc_type: str = "webm",
    video_codec: str = "V_VP9",
    audio_codec: str = "A_OPUS",
    cluster_bytes: bytes = b"\x00" * 64,
    unknown_segment_size: bool = False,
) -> bytes:
    """Deterministic Matroska/WebM fixture: EBML header (DocType) +
    Segment(Info(TimestampScale 1 ms, Duration), Tracks(video VP9,
    audio Opus), Cluster of opaque bytes the parser must skip).
    ``unknown_segment_size`` writes the Segment with the all-ones
    size varint — the live-streaming layout — pinning the
    runs-to-end path."""
    header = _elem(
        _EBML,
        _elem(0x4286, b"\x01")  # EBMLVersion
        + _elem(0x42F7, b"\x01")  # EBMLReadVersion
        + _elem(0x42F2, b"\x04")  # EBMLMaxIDLength
        + _elem(0x42F3, b"\x08")  # EBMLMaxSizeLength
        + _elem(_DOCTYPE, doc_type.encode("ascii"))
        + _elem(0x4287, b"\x04")  # DocTypeVersion
        + _elem(0x4285, b"\x02"),  # DocTypeReadVersion
    )
    info = _elem(
        _INFO,
        _elem(_TIMESTAMP_SCALE, _uint_bytes(1_000_000))
        + _elem(_DURATION, struct.pack(">d", float(duration_ms))),
    )
    video_track = _elem(
        _TRACK_ENTRY,
        _elem(0xD7, b"\x01")  # TrackNumber
        + _elem(0x73C5, b"\x01")  # TrackUID
        + _elem(_TRACK_TYPE, b"\x01")
        + _elem(_CODEC_ID, video_codec.encode("ascii"))
        + _elem(
            _VIDEO,
            _elem(_PIXEL_WIDTH, _uint_bytes(width))
            + _elem(_PIXEL_HEIGHT, _uint_bytes(height)),
        ),
    )
    audio_track = _elem(
        _TRACK_ENTRY,
        _elem(0xD7, b"\x02")
        + _elem(0x73C5, b"\x02")
        + _elem(_TRACK_TYPE, b"\x02")
        + _elem(_CODEC_ID, audio_codec.encode("ascii"))
        + _elem(
            _AUDIO,
            _elem(_SAMPLING_FREQ, struct.pack(">f", float(sample_rate)))
            + _elem(_CHANNELS, _uint_bytes(channels))
            + _elem(_BIT_DEPTH, _uint_bytes(bit_depth)),
        ),
    )
    cluster = _elem(
        0x1F43B675,
        _elem(0xE7, b"\x00")  # Timestamp
        + _elem(0xA3, b"\x81\x00\x00\x80" + cluster_bytes),  # SimpleBlock
    )
    tracks = _elem(_TRACKS, video_track + audio_track)
    seg_payload = info + tracks + cluster
    if unknown_segment_size:
        segment = (
            _SEGMENT.to_bytes(4, "big") + b"\xff" + seg_payload
        )
    else:
        segment = _elem(_SEGMENT, seg_payload)
    return header + segment
