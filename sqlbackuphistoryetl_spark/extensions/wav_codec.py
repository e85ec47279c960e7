"""Pure-stdlib WAV/PCM audio codec (round 7).

The multimodal layer stubbed audio decoding the same way it stubbed
images; like PNG, the WAV container (RIFF, Microsoft/IBM 1991 — the
format every recorder exports) needs nothing beyond ``struct``: a RIFF
header, an ``fmt `` chunk, and little-endian PCM frames. This module
decodes PCM 16-bit and 8-bit WAV to integer samples and derives the
two deterministic per-block features a training-data pipeline filters
on — mean absolute amplitude and zero-crossing count — plus a 64-bit energy-delta
fingerprint (the classic broadcast-monitoring shape: one bit per
adjacent-block energy comparison, the audio twin of the image dHash),
which feeds the same banded hamming near-dup join.

G.711 companded telephony audio (format tags 7 mu-law / 6 A-law, r8)
also decodes for real: expansion is a pure per-byte table lookup, so
it costs the same as PCM. Perceptual/transform codecs (MP3/AAC/Opus/
FLAC) keep the documented stub gate — they genuinely need external
libraries. Everything here is driver-free pure Python over ``bytes``,
run inside Arrow-batched ``mapInPandas`` workers.
"""

from __future__ import annotations

import struct
import sys
from array import array
from dataclasses import dataclass

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

#: decoded-sample budget (count of int samples) — same
#: decompression-bomb doctrine as png_codec.MAX_SAMPLE_BYTES: a 44-byte
#: header can declare an arbitrarily large data chunk. 2^26 samples =
#: ~25 min of 44.1 kHz mono; raise per call for real archives.
MAX_SAMPLES = 1 << 26


class WAVError(ValueError):
    """Malformed WAV payload."""


class UnsupportedWAV(NotImplementedError):
    """Valid RIFF/WAVE, but a form this codec doesn't implement
    (compressed codecs, 24/32-bit PCM, float PCM)."""


@dataclass
class DecodedAudio:
    sample_rate: int
    channels: int
    #: interleaved, int16 range regardless of source depth. decode_wav
    #: returns a compact ``array('h')`` (2 bytes/sample — a boxed-int
    #: list would cost ~36 bytes/sample, turning the MAX_SAMPLES budget
    #: into gigabytes of worker heap); plain lists are accepted too.
    samples: "array | list[int]"


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and payload[:4] == RIFF_MAGIC
        and payload[8:12] == WAVE_MAGIC
    )


def _ulaw_table() -> list[int]:
    # G.711 mu-law expansion, int16-range convention (max |x| = 32124)
    out = []
    for b in range(256):
        u = ~b & 0xFF
        e = (u >> 4) & 0x07
        m = u & 0x0F
        x = (((m << 3) + 0x84) << e) - 0x84
        out.append(-x if u & 0x80 else x)
    return out


def _alaw_table() -> list[int]:
    # G.711 A-law expansion, int16-range convention (max |x| = 32256).
    # Sign convention is the OPPOSITE of mu-law: after the 0x55 XOR,
    # bit 7 SET means positive (verified byte-for-byte against
    # CPython's audioop.alaw2lin).
    out = []
    for b in range(256):
        a = b ^ 0x55
        e = (a >> 4) & 0x07
        m = a & 0x0F
        x = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
        out.append(x if a & 0x80 else -x)
    return out


ULAW_TABLE = _ulaw_table()
ALAW_TABLE = _alaw_table()

#: WAVE format tags this codec decodes
FORMAT_PCM = 1
FORMAT_ALAW = 6
FORMAT_ULAW = 7
FORMAT_IMA_ADPCM = 0x11

#: IMA/DVI ADPCM tables (IMA ADPCM reference algorithm; identical to
#: the Intel/DVI variant CPython's audioop implements — decode is
#: cross-validated against it in the tests, modulo WAV's
#: low-nibble-first packing vs audioop's high-first)
IMA_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]


def ima_adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state transition: (predictor, index) + 4-bit code
    -> new (predictor, index). Exposed so tests/oracles can replicate
    the recurrence independently of the block walk."""
    step = IMA_STEP_TABLE[idx]
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    pred = pred - delta if nibble & 8 else pred + delta
    pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
    idx += IMA_INDEX_ADJUST[nibble & 7]
    idx = 0 if idx < 0 else (88 if idx > 88 else idx)
    return pred, idx


def encode_ima_adpcm_wav(
    data_nibble_bytes: bytes,
    sample_rate: int = 8000,
    predictor: int = 0,
    step_index: int = 0,
) -> bytes:
    """Wrap raw ADPCM nibble bytes in a mono IMA-ADPCM WAV (format tag
    0x11): one block, the standard 4-byte block header (initial
    predictor int16, step index, reserved), then the caller's data
    bytes — two low-nibble-first codes each. The fixture builder for
    the stateful-decode gate; decode emits the header predictor as
    sample 0 followed by one sample per nibble."""
    if not (-32768 <= predictor <= 32767 and 0 <= step_index <= 88):
        raise ValueError("invalid initial ADPCM state")
    block = struct.pack("<hBB", predictor, step_index, 0) + data_nibble_bytes
    block_align = len(block)
    samples_per_block = 1 + 2 * len(data_nibble_bytes)
    fmt = struct.pack(
        "<HHIIHHHH",
        FORMAT_IMA_ADPCM, 1, sample_rate,
        sample_rate,  # nominal byte rate
        block_align, 4,
        2, samples_per_block,  # cbSize, wSamplesPerBlock
    )
    return (
        RIFF_MAGIC
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(block))
        + WAVE_MAGIC
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(block))
        + block
    )


def encode_g711_wav(
    data: bytes, sample_rate: int = 8000, channels: int = 1,
    law: str = "ulaw",
) -> bytes:
    """Wrap already-G.711-companded bytes in a WAV container (format
    tag 7 mu-law / 6 A-law, 8 bits per sample) — the telephony fixture
    builder; the decode inverse maps each byte through the standard
    expansion table."""
    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    tag = FORMAT_ULAW if law == "ulaw" else FORMAT_ALAW
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    return (
        RIFF_MAGIC
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + WAVE_MAGIC
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def probe_wav(payload: bytes | None, max_samples: int = MAX_SAMPLES) -> bool:
    """True iff :func:`decode_wav` would succeed — a header/chunk-walk
    probe (PCM format, 8/16-bit, fmt+data present, sample budget)
    without touching the sample bytes. The WAV twin of
    :func:`png_codec.probe_png`; `extract_payload_metadata` uses it so
    ``decode_status`` honors its "a real decoder exists" contract."""
    if payload is None or not is_wav(payload):
        return False
    pos, n = 12, len(payload)
    fmt = None
    data_len = None
    data_start = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + clen > n:
            return False  # truncated chunk
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + clen]
        elif cid == b"data":
            data_len = clen
            data_start = pos + 8
        pos += 8 + clen + (clen & 1)
    if fmt is None or len(fmt) < 16 or data_len is None:
        return False
    audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if channels < 1 or sample_rate < 1:
        return False
    if audio_format == FORMAT_IMA_ADPCM:
        ba = _ba
        if channels != 1 or bits != 4 or ba < 5:
            return False
        tails = [min(ba, data_len - p) for p in range(0, data_len, ba)]
        if any(t < 4 for t in tails):
            return False
        if sum(1 + 2 * (t - 4) for t in tails) > max_samples:
            return False
        # per-block state header sanity (decode raises on index > 88)
        return all(
            payload[data_start + p + 2] <= 88
            for p in range(0, data_len, ba)
        )
    if audio_format in (FORMAT_ALAW, FORMAT_ULAW):
        return bits == 8 and data_len <= max_samples
    if audio_format != FORMAT_PCM:
        return False
    if bits == 16:
        return not (data_len & 1) and data_len // 2 <= max_samples
    if bits == 8:
        return data_len <= max_samples
    return False


def decode_wav(payload: bytes, max_samples: int = MAX_SAMPLES) -> DecodedAudio:
    """Decode a PCM WAV payload to interleaved int16-range samples.

    8-bit PCM (unsigned, per the spec) rescales to the int16 range so
    downstream features are depth-independent. Raises :class:`WAVError`
    for malformed containers and :class:`UnsupportedWAV` for
    non-PCM / unimplemented depths or over-budget declared sizes."""
    if not is_wav(payload):
        raise WAVError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise WAVError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16:
        raise WAVError("missing fmt chunk")
    if data is None:
        raise WAVError("missing data chunk")
    audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format not in (
        FORMAT_PCM, FORMAT_ALAW, FORMAT_ULAW, FORMAT_IMA_ADPCM
    ):
        raise UnsupportedWAV(
            f"audio format {audio_format} "
            f"(PCM=1, A-law=6, mu-law=7, IMA ADPCM=17)"
        )
    if channels < 1 or sample_rate < 1:
        raise WAVError("invalid channel count / sample rate")
    if audio_format == FORMAT_IMA_ADPCM:
        # stateful 4-bit codec: per block, a (predictor, step index)
        # header then low-nibble-first codes through ima_adpcm_step
        if channels != 1:
            raise UnsupportedWAV("IMA ADPCM: mono only")
        if bits != 4:
            raise WAVError(f"IMA ADPCM must be 4-bit, fmt says {bits}")
        block_align = _ba
        if block_align < 5:
            raise WAVError("IMA ADPCM block_align below header size")
        est = sum(
            1 + 2 * (min(block_align, len(data) - p) - 4)
            for p in range(0, len(data), block_align)
        )
        if est > max_samples:
            raise UnsupportedWAV(
                f"{est} samples exceed the {max_samples}-sample budget"
            )
        samples = array("h")
        for p in range(0, len(data), block_align):
            block = data[p : p + block_align]
            if len(block) < 4:
                raise WAVError("truncated IMA ADPCM block")
            pred, idx, _rsv = struct.unpack("<hBB", block[:4])
            if idx > 88:
                raise WAVError("IMA ADPCM step index out of range")
            samples.append(pred)
            for b in block[4:]:
                for nib in (b & 0x0F, b >> 4):
                    pred, idx = ima_adpcm_step(pred, idx, nib)
                    samples.append(pred)
        return DecodedAudio(sample_rate, 1, samples)
    if audio_format in (FORMAT_ALAW, FORMAT_ULAW):
        # G.711 companded telephony audio: one byte per sample, each
        # expanded through the standard table to the int16 range
        if bits != 8:
            raise WAVError(f"G.711 must be 8-bit, fmt says {bits}")
        if len(data) > max_samples:
            raise UnsupportedWAV(
                f"{len(data)} samples exceed the {max_samples}-sample budget"
            )
        table = ULAW_TABLE if audio_format == FORMAT_ULAW else ALAW_TABLE
        samples = array("h", (table[b] for b in data))
        return DecodedAudio(sample_rate, channels, samples)
    if bits == 16:
        if len(data) & 1:
            # strict malformed-container doctrine: a 16-bit data chunk
            # with an odd byte length has no valid final sample
            raise WAVError("odd-length data chunk for 16-bit PCM")
        count = len(data) // 2
        if count > max_samples:
            raise UnsupportedWAV(
                f"{count} samples exceed the {max_samples}-sample budget"
            )
        samples = array("h")
        samples.frombytes(data[: count * 2])
        if sys.byteorder == "big":  # WAV PCM is little-endian
            samples.byteswap()
    elif bits == 8:
        if len(data) > max_samples:
            raise UnsupportedWAV(
                f"{len(data)} samples exceed the {max_samples}-sample budget"
            )
        # 8-bit WAV is unsigned centered at 128 → int16 range
        samples = array("h", ((b - 128) * 256 for b in data))
    else:
        raise UnsupportedWAV(f"{bits}-bit PCM not implemented")
    return DecodedAudio(sample_rate, channels, samples)


def encode_wav(audio: DecodedAudio) -> bytes:
    """Minimal PCM-16 WAV encoder — the decode inverse for int16-range
    samples (``decode(encode(a)).samples == a.samples`` exactly)."""
    s = audio.samples
    if not isinstance(s, array):
        s = array("h", s)
    if sys.byteorder == "big":
        s = array("h", s)
        s.byteswap()
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,
        audio.channels,
        audio.sample_rate,
        audio.sample_rate * audio.channels * 2,
        audio.channels * 2,
        16,
    )
    return (
        RIFF_MAGIC
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + WAVE_MAGIC
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def to_mono(audio: DecodedAudio) -> DecodedAudio:
    """Integer channel average (exact, deterministic)."""
    c = audio.channels
    if c == 1:
        return audio
    s = audio.samples
    mono = array(
        "h", (sum(s[i * c : (i + 1) * c]) // c for i in range(len(s) // c))
    )
    return DecodedAudio(audio.sample_rate, 1, mono)


def block_features(
    audio: DecodedAudio, n_blocks: int = 16
) -> list[tuple[int, int]]:
    """``n_blocks`` × (mean |amplitude|, zero crossings) — the two
    classic silence/noise quality signals, as EXACT integers (no
    floats, so features are engine- and batch-order-independent).
    Blocks partition the mono stream contiguously; empty blocks (more
    blocks than samples) repeat the nearest sample."""
    mono = to_mono(audio).samples
    n = len(mono)
    if n == 0:
        return [(0, 0)] * n_blocks
    out = []
    for b in range(n_blocks):
        lo = (b * n) // n_blocks
        hi = ((b + 1) * n) // n_blocks
        if hi <= lo:
            lo = min(lo, n - 1)
            hi = lo + 1
        block = mono[lo:hi]
        mean_abs = sum(abs(x) for x in block) // len(block)
        zc = sum(
            1
            for i in range(1, len(block))
            if (block[i - 1] < 0) != (block[i] < 0)
        )
        out.append((mean_abs, zc))
    return out


def energy_fingerprint(audio: DecodedAudio, n_bits: int = 64) -> int:
    """64-bit energy-delta fingerprint — the audio twin of the image
    dHash (and the core of classic broadcast-monitoring fingerprints):
    split the mono stream into ``n_bits + 1`` contiguous blocks and
    emit one bit per adjacent pair (energy rising). Robust to volume
    scaling direction and mild clipping; two recordings of the same
    content land within a few hamming bits, so the SAME banded hamming
    join as ``multimodal.image_near_dup`` dedups audio."""
    mono = to_mono(audio).samples
    n = len(mono)
    blocks = []
    nb = n_bits + 1
    for b in range(nb):
        lo = (b * n) // nb
        hi = ((b + 1) * n) // nb
        if hi <= lo:
            lo = min(lo, max(n - 1, 0))
            hi = lo + 1
        block = mono[lo:hi] if n else [0]
        blocks.append(sum(x * x for x in block) // len(block))
    bits = 0
    for i in range(n_bits):
        bits = (bits << 1) | (1 if blocks[i + 1] > blocks[i] else 0)
    return bits
