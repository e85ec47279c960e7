"""Ogg container triage — page walk, never a decode (r10).

Ogg carries Opus and Vorbis, the open-web audio pair. Entropy decode
stays gated (perceptual codecs), but the identification header on the
first page names the codec, channel count and sample rate, and the
LAST page's granule position is the total sample count — everything
duration-based curation needs:

- page: ``OggS`` + version + type + granule(8, LE) + serial(4) +
  seq(4) + crc(4) + n_segments(1) + lacing table; payload follows;
- ``OpusHead``: channels at byte 9, pre-skip u16, ORIGINAL input rate
  u32 (Opus always decodes at 48 kHz; granule positions count 48 kHz
  samples — reported as-is, minus pre-skip);
- ``\\x01vorbis``: channels at byte 11, rate u32 at 12.

Page CRCs are deliberately NOT verified — triage must survive the
truncated/corrupt uploads a crawl is full of; structure errors raise
:class:`OggError` instead. Page count is capped at :data:`MAX_PAGES`.
:func:`build_ogg` writes fixture streams (zeroed CRCs, inert
payloads).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MAX_PAGES = 1 << 16


class OggError(ValueError):
    """Structurally corrupt Ogg stream."""


@dataclass
class OggInfo:
    codec: str  # 'opus' | 'vorbis' | 'unknown'
    channels: int | None
    sample_rate: int | None  # Opus: granule clock is 48000 regardless
    n_samples: int | None  # last granule (Opus: minus pre-skip)


def is_ogg(payload: bytes) -> bool:
    return len(payload) >= 28 and payload[:4] == b"OggS"


def _pages(payload: bytes):
    pos = 0
    n = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise OggError("lost page sync")
        n += 1
        if n > MAX_PAGES:
            raise OggError(f"more than {MAX_PAGES} pages")
        (granule,) = struct.unpack("<q", payload[pos + 6 : pos + 14])
        nsegs = payload[pos + 26]
        lace = payload[pos + 27 : pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise OggError("lacing table truncated")
        size = sum(lace)
        body = payload[pos + 27 + nsegs : pos + 27 + nsegs + size]
        if len(body) < size:
            raise OggError("page payload truncated")
        yield granule, body
        pos += 27 + nsegs + size
    if pos != len(payload):
        raise OggError("trailing bytes are not a whole page")


def parse_ogg(payload: bytes) -> OggInfo:
    if not is_ogg(payload):
        raise OggError("not an Ogg stream")
    codec = "unknown"
    channels = rate = pre_skip = None
    last_granule = None
    first = True
    for granule, body in _pages(payload):
        if first:
            first = False
            if body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                (pre_skip,) = struct.unpack("<H", body[10:12])
                (rate,) = struct.unpack("<I", body[12:16])
            elif body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                (rate,) = struct.unpack("<I", body[12:16])
        if granule >= 0:  # -1 marks a continuation-only page
            last_granule = granule
    n_samples = last_granule
    if codec == "opus" and n_samples is not None and pre_skip:
        n_samples = max(0, n_samples - pre_skip)
    return OggInfo(codec, channels, rate, n_samples)


def build_ogg(
    codec: str,
    channels: int,
    sample_rate: int,
    n_samples: int,
    pre_skip: int = 0,
) -> bytes:
    """Fixture stream: identification page + one data page whose
    granule encodes ``n_samples`` (+ pre_skip for Opus). CRCs zeroed —
    the parser does not verify them (triage leniency, documented)."""
    if codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate) + b"\x00\x00" + b"\x00"
        )
        final_granule = n_samples + pre_skip
    elif codec == "vorbis":
        ident = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", sample_rate) + b"\x00" * 16 + b"\x01"
        )
        final_granule = n_samples
    else:
        raise ValueError("codec must be opus or vorbis")
    return _page(ident, 0, 0, 0x02) + _page(
        b"\x00" * 32, final_granule, 1, 0x04
    )


def _page(body: bytes, granule: int, seq: int, htype: int) -> bytes:
    lace = []
    left = len(body)
    while left >= 255:
        lace.append(255)
        left -= 255
    lace.append(left)
    return (
        b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
        + struct.pack("<I", 1) + struct.pack("<I", seq)
        + struct.pack("<I", 0)  # CRC zeroed (unverified by parse_ogg)
        + bytes([len(lace)]) + bytes(lace) + body
    )
