"""MP3 header triage — frame-header walk, never a decode (r10).

MP3 is the dominant crawl audio format. The MDCT/Huffman audio decode
is perceptual-codec territory (the explicit r9 doctrine gating
MP3/AAC), but channel mode, sample rate, bitrate and duration live in
the 4-byte frame headers: sync (11 set bits), MPEG version, layer,
bitrate/samplerate indexes, padding, channel mode. The triage walks
frame to frame by each header's computed length — O(n_frames), capped
at :data:`MAX_FRAMES` — skipping a leading ID3v2 tag by its syncsafe
size. ``n_samples`` is frames x samples-per-frame (1152 for Layer
III/MPEG1, 576 for MPEG2/2.5), which is the real duration for CBR and
VBR alike. :func:`build_mp3` writes deterministic silent CBR frames.
"""

from __future__ import annotations

from dataclasses import dataclass

MAX_FRAMES = 1 << 20  # ~6 hours of MPEG1 Layer III

#: kbit/s by [version_group][bitrate_index]; Layer III only (the MP3
#: layer); index 0 ("free") and 15 are invalid for triage purposes
_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                224, 256, 320, 0]
_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                128, 144, 160, 0]
_RATES = {  # by version bits
    3: [44100, 48000, 32000, 0],  # MPEG1
    2: [22050, 24000, 16000, 0],  # MPEG2
    0: [11025, 12000, 8000, 0],  # MPEG2.5
}


class MP3Error(ValueError):
    """No parseable MP3 frame stream."""


@dataclass
class Mp3Info:
    version: str  # '1' | '2' | '2.5'
    channels: int
    sample_rate: int
    bitrate_kbps: int  # first frame's (CBR rate, or VBR's first)
    n_frames: int
    n_samples: int


def _id3v2_size(payload: bytes) -> int:
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    return 10 + (
        (payload[6] << 21) | (payload[7] << 14)
        | (payload[8] << 7) | payload[9]
    )


def _frame_header(payload: bytes, pos: int):
    """(frame_len, version_bits, channels, rate, kbps) or None."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (b1 >> 1) & 3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    kbps = (_BITRATES_V1 if version == 3 else _BITRATES_V2)[br_idx]
    rate = _RATES[version][sr_idx]
    if kbps == 0 or rate == 0:
        return None
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    spf = 1152 if version == 3 else 576
    frame_len = (spf // 8) * kbps * 1000 // rate + padding
    return frame_len, version, channels, rate, kbps


def is_mp3(payload: bytes) -> bool:
    """ID3v2 tag, or a valid Layer-III frame header at offset 0.
    Deliberately strict (full header validation, not just sync bits):
    this check runs LAST in the media dispatch, and 0xFF-leading
    binary data is common."""
    if len(payload) < 10:
        return False
    if payload[:3] == b"ID3":
        return True
    return _frame_header(payload, 0) is not None


def parse_mp3(payload: bytes) -> Mp3Info:
    pos = _id3v2_size(payload)
    first = _frame_header(payload, pos)
    if first is None:
        raise MP3Error("no valid Layer III frame header")
    _, version, channels, rate, kbps = first
    spf = 1152 if version == 3 else 576
    n = 0
    while n < MAX_FRAMES:
        hdr = _frame_header(payload, pos)
        if hdr is None or pos + hdr[0] > len(payload):
            break  # a cut-off final frame doesn't count as audio
        n += 1
        pos += hdr[0]
    return Mp3Info(
        {3: "1", 2: "2", 0: "2.5"}[version],
        channels, rate, kbps, n, n * spf,
    )


def build_mp3(
    n_frames: int,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    channels: int = 2,
    id3: bool = False,
) -> bytes:
    """Deterministic CBR Layer-III/MPEG1 frame stream with zeroed
    (silent, inert) frame bodies — triage fixtures only."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = _BITRATES_V1.index(bitrate_kbps)
    mode = 3 if channels == 1 else 0
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG1, Layer III, no CRC
        (br_idx << 4) | (sr_idx << 2),
        mode << 6,
    ])
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (frame_len - 4)
    out = b""
    if id3:
        out = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    return out + frame * n_frames
