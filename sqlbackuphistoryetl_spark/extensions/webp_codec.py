"""WebP header triage — RIFF chunk walk, never a decode (r10).

WebP is everywhere in crawled image data. Pixel decode is VP8/VP8L
entropy coding (perceptual-codec territory this engine gates, like
H.264 and MP3), but geometry, alpha, and animation frame count live
in plain chunk headers:

- ``VP8 `` (lossy): 3-byte frame tag, the 0x9D 0x01 0x2A start code,
  then 14-bit width/height;
- ``VP8L`` (lossless): 0x2F signature then width-1/height-1 as 14-bit
  fields of an LSB-first bit stream, plus the alpha flag;
- ``VP8X`` (extended): feature flags (alpha, animation) and the
  24-bit-minus-one canvas size; ``ANMF`` chunks carry the animation
  frames.

Chunk walking is size-bounded (``MAX_CHUNKS``); corrupt structure
raises :class:`WebPError`, which ``media_info`` triages as 'unknown'.
:func:`build_webp` writes all three container forms for fixtures.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

MAX_CHUNKS = 4096


class WebPError(ValueError):
    """Structurally corrupt WebP container."""


@dataclass
class WebPInfo:
    form: str  # 'lossy' | 'lossless' | 'extended'
    width: int
    height: int
    has_alpha: bool
    n_frames: int  # 1 for stills; ANMF count for animations


def is_webp(payload: bytes) -> bool:
    return (
        len(payload) >= 16
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def _chunks(payload: bytes):
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    pos = 12
    n = 0
    while pos + 8 <= end:
        n += 1
        if n > MAX_CHUNKS:
            raise WebPError(f"more than {MAX_CHUNKS} chunks")
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WebPError("chunk truncated")
        yield fourcc, body
        pos += 8 + size + (size & 1)  # chunks pad to even


def parse_webp(payload: bytes) -> WebPInfo:
    if not is_webp(payload):
        raise WebPError("not a WebP (RIFF/WEBP header missing)")
    for fourcc, body in _chunks(payload):
        if fourcc == b"VP8 ":
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise WebPError("VP8 start code missing")
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return WebPInfo("lossy", w, h, False, 1)
        if fourcc == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise WebPError("VP8L signature missing")
            bits = struct.unpack("<I", body[1:5])[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            alpha = bool((bits >> 28) & 1)
            return WebPInfo("lossless", w, h, alpha, 1)
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise WebPError("VP8X truncated")
            flags = body[0]
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            n_frames = 1
            if flags & 0x02:  # animation
                n_frames = sum(
                    1 for fc, _b in _chunks(payload) if fc == b"ANMF"
                )
            return WebPInfo("extended", w, h, bool(flags & 0x10), n_frames)
    raise WebPError("no VP8/VP8L/VP8X chunk")


def build_webp(
    form: str,
    width: int,
    height: int,
    *,
    has_alpha: bool = False,
    n_frames: int = 1,
) -> bytes:
    """Deterministic triage fixture: valid headers, inert payload (no
    entropy data — this module never decodes pixels)."""
    if form == "lossy":
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack(
            "<HH", width & 0x3FFF, height & 0x3FFF
        ) + b"\x00" * 8
        chunk = _chunk(b"VP8 ", body)
    elif form == "lossless":
        bits = (
            (width - 1) & 0x3FFF
            | (((height - 1) & 0x3FFF) << 14)
            | ((1 if has_alpha else 0) << 28)
        )
        chunk = _chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 4)
    elif form == "extended":
        flags = (0x10 if has_alpha else 0) | (0x02 if n_frames > 1 else 0)
        body = bytes([flags, 0, 0, 0]) + (width - 1).to_bytes(
            3, "little"
        ) + (height - 1).to_bytes(3, "little")
        chunk = _chunk(b"VP8X", body)
        if n_frames > 1:
            for _ in range(n_frames):
                chunk += _chunk(b"ANMF", b"\x00" * 16)
    else:
        raise ValueError("form must be lossy/lossless/extended")
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad
