"""Pure-stdlib FLAC codec (r9).

FLAC (xiph.org; RFC 9639) is the dominant lossless audio container in
public speech corpora (LibriSpeech, MLS, People's Speech all ship
FLAC), so a training-data pipeline that gates audio on "WAV-family
only" silently fakes most real speech data. The format is fully
decodable with stdlib bit twiddling — no DSP libraries: a STREAMINFO
metadata block, then frames of per-channel subframes (constant /
verbatim / fixed-order / LPC prediction) whose residuals are
partitioned Rice codes, with optional inter-channel decorrelation
(left/side, right/side, mid/side) and CRC-8/CRC-16 protection.

Doctrine matches the sibling codecs:

- corrupt structure, entropy data, or CRC mismatch raises
  :class:`FLACError` (``ValueError``) — callers fall through;
- forms refused on principle raise :class:`UnsupportedFLAC`
  (``NotImplementedError``): streams whose declared sample count
  exceeds the :data:`MAX_SAMPLES` budget (decompression-bomb guard,
  same constant as ``wav_codec``). Everything else decodes: all
  subframe types, all Rice methods incl. escape partitions, wasted
  bits, every legal bit depth (8/12/16/20/24/32 — normalized to the
  int16 range ``DecodedAudio`` uses), 1-8 channels, both blocking
  strategies.
- decode is BIT-EXACT (FLAC is lossless): when STREAMINFO carries a
  nonzero MD5, the decoded samples are re-hashed and verified, so a
  predictor, Rice, or decorrelation bug fails loudly instead of
  producing plausible noise.

Encode surface (fixture builder for tests and gates):
:func:`encode_flac` writes real streams — constant/verbatim/fixed
subframes with Rice residuals, independent or left-side/right-side/
mid-side stereo, 8/16-bit — and fills in the true MD5, so
``decode(encode(x)) == x`` pins the whole pipeline.

Runs inside the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``; driver-free pure Python over ``bytes``.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

from .wav_codec import MAX_SAMPLES, DecodedAudio

FLAC_MARKER = b"fLaC"

#: frame-header sample-rate code table (code 0 = use STREAMINFO;
#: 12-14 = literal field at header end; 15 = invalid)
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
#: frame-header sample-size code table (0 = STREAMINFO, 3 = reserved)
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class FLACError(ValueError):
    """Structurally or entropy-level corrupt FLAC stream."""


class UnsupportedFLAC(NotImplementedError):
    """Legal FLAC form this codec refuses (over-budget sample count);
    callers fall through to their documented stub path."""


def is_flac(payload: bytes | None) -> bool:
    return payload is not None and payload[:4] == FLAC_MARKER


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16[((c >> 8) ^ b) & 0xFF]
    return c


class _Bits:
    """MSB-first bit reader (FLAC's bit order — the GIF codec's is
    LSB-first; they are deliberately separate)."""

    __slots__ = ("buf", "bitpos")

    def __init__(self, buf: bytes, byte_pos: int = 0):
        self.buf = buf
        self.bitpos = byte_pos * 8

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.buf) * 8:
            raise FLACError("bitstream truncated")
        first = self.bitpos >> 3
        last = (end + 7) >> 3
        window = int.from_bytes(self.buf[first:last], "big")
        val = (window >> ((last * 8) - end)) & ((1 << n) - 1)
        self.bitpos = end
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit."""
        n = 0
        limit = len(self.buf) * 8
        while True:
            if self.bitpos >= limit:
                raise FLACError("bitstream truncated in unary code")
            bit = (self.buf[self.bitpos >> 3] >> (7 - (self.bitpos & 7))) & 1
            self.bitpos += 1
            if bit:
                return n
            n += 1

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        return self.bitpos >> 3


@dataclass
class _StreamInfo:
    min_blocksize: int
    max_blocksize: int
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int
    md5: bytes


def _parse_streaminfo(payload: bytes) -> tuple[_StreamInfo, int]:
    """Parse the marker + metadata chain; returns (info, frame offset)."""
    if payload[:4] != FLAC_MARKER:
        raise FLACError("not a FLAC stream")
    pos = 4
    info: _StreamInfo | None = None
    first = True
    while True:
        if pos + 4 > len(payload):
            raise FLACError("truncated metadata block header")
        head = int.from_bytes(payload[pos : pos + 4], "big")
        last = bool(head >> 31)
        btype = (head >> 24) & 0x7F
        blen = head & 0xFFFFFF
        pos += 4
        if pos + blen > len(payload):
            raise FLACError("truncated metadata block")
        if first:
            if btype != 0:
                raise FLACError("first metadata block must be STREAMINFO")
            if blen < 34:
                raise FLACError("STREAMINFO too short")
            body = payload[pos : pos + 34]
            min_bs, max_bs = struct.unpack_from(">HH", body, 0)
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            info = _StreamInfo(
                min_bs, max_bs, sample_rate, channels, bps, total, body[18:34]
            )
            first = False
        elif btype == 0:
            raise FLACError("duplicate STREAMINFO block")
        pos += blen
        if last:
            break
    if info is None:  # pragma: no cover (first-block check raises first)
        raise FLACError("no STREAMINFO")
    if info.sample_rate == 0:
        raise FLACError("STREAMINFO sample rate is zero")
    return info, pos


def _read_coded_number(bits: _Bits) -> int:
    """The frame header's extended-UTF-8 frame/sample number (1-7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x80:
        n += 1
        probe = (probe << 1) & 0xFF
    if n < 2 or n > 7:
        raise FLACError("bad coded-number prefix")
    val = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if (c & 0xC0) != 0x80:
            raise FLACError("bad coded-number continuation byte")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise FLACError("reserved residual coding method")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    porder = bits.read(4)
    n_parts = 1 << porder
    if blocksize % n_parts:
        raise FLACError("block size not divisible by partition count")
    part_len = blocksize >> porder
    out: list[int] = []
    for p in range(n_parts):
        n = part_len - (order if p == 0 else 0)
        if n < 0:
            raise FLACError("partition shorter than predictor order")
        param = bits.read(param_bits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append(-(v >> 1) - 1 if v & 1 else v >> 1)
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise FLACError("subframe header padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
        if bps <= 0:
            raise FLACError("wasted bits exceed sample size")

    if stype == 0:  # constant
        v = bits.read_signed(bps)
        samples = [v] * blocksize
    elif stype == 1:  # verbatim
        samples = [bits.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # fixed predictor, order 0-4
        order = stype - 8
        if order > blocksize:
            raise FLACError("predictor order exceeds block size")
        samples = [bits.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coeffs = _FIXED_COEFFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 0x1F) + 1
        if order > blocksize:
            raise FLACError("predictor order exceeds block size")
        samples = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise FLACError("invalid LPC precision code")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise FLACError("negative LPC shift")
        coeffs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(r + (pred >> shift))
    else:
        raise FLACError(f"reserved subframe type {stype}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(
    bits: _Bits, info: _StreamInfo
) -> tuple[list[list[int]], int]:
    """Decode one frame; returns (per-channel samples, bits-per-sample)."""
    header_start = bits.byte_pos
    if bits.read(14) != 0b11111111111110:
        raise FLACError("bad frame sync code")
    if bits.read(1):
        raise FLACError("frame header reserved bit set")
    bits.read(1)  # blocking strategy (either is fine; number re-read below)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise FLACError("frame header reserved bit set")
    _read_coded_number(bits)

    if bs_code == 0:
        raise FLACError("reserved block size code")
    if bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)

    if sr_code == 15:
        raise FLACError("invalid sample rate code")
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)

    if ss_code == 0:
        bps = info.bits_per_sample
    elif ss_code == 3:
        raise FLACError("reserved sample size code")
    else:
        bps = _SAMPLE_SIZES[ss_code]

    header_bytes = bits.buf[header_start : bits.byte_pos]
    if _crc8(header_bytes) != bits.read(8):
        raise FLACError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        chans = [_decode_subframe(bits, blocksize, bps) for _ in range(n_ch)]
    elif ch_code <= 10:
        # stereo decorrelation: the side channel carries one extra bit
        side_slot = 1 if ch_code in (8, 10) else 0
        chans = [
            _decode_subframe(bits, blocksize, bps + (1 if i == side_slot else 0))
            for i in range(2)
        ]
        if ch_code == 8:  # left/side
            left, side = chans
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side (side stored first)
            side, right = chans
            chans = [[r + s for r, s in zip(right, side)], right]
        else:  # mid/side: mid = (L+R)>>1, side = L-R; side's low bit
            # restores the precision the mid shift dropped
            mid, side = chans
            left = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
            right = [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)]
            chans = [left, right]
    else:
        raise FLACError("reserved channel assignment")

    bits.align()
    frame_bytes = bits.buf[header_start : bits.byte_pos]
    if _crc16(frame_bytes) != bits.read(16):
        raise FLACError("frame CRC-16 mismatch")
    return chans, bps


def probe_flac(payload: bytes | None, max_samples: int = MAX_SAMPLES) -> bool:
    """Structural probe mirroring :func:`decode_flac`'s gate: marker +
    metadata chain parse + budget. Frame-level corruption is not
    probed (decode raises :class:`FLACError`; callers fall through —
    same contract as ``probe_jpeg``/``probe_gif``)."""
    if not is_flac(payload):
        return False
    try:
        info, _ = _parse_streaminfo(bytes(payload))
    except FLACError:
        return False
    return info.total_samples * info.channels <= max_samples


def decode_flac(
    payload: bytes, max_samples: int = MAX_SAMPLES
) -> DecodedAudio:
    """Decode a whole FLAC stream to interleaved int16-range samples
    (the ``DecodedAudio`` contract shared with ``decode_wav``: higher
    depths shift down, lower depths shift up). Verifies every frame's
    CRC-8/CRC-16 and — when STREAMINFO carries a nonzero MD5 and the
    depth is byte-aligned — the whole-stream MD5 of the decoded
    samples, so decode is proven bit-exact, not just plausible."""
    info, pos = _parse_streaminfo(payload)
    declared = info.total_samples * info.channels
    if declared > max_samples:
        raise UnsupportedFLAC(
            f"declared {declared} samples exceed the {max_samples} budget"
        )
    bits = _Bits(payload, pos)
    per_channel: list[list[int]] = [[] for _ in range(info.channels)]
    total = 0
    md5 = hashlib.md5()
    bps_seen: int | None = None
    while bits.byte_pos < len(payload):
        chans, bps = _decode_frame(bits, info)
        if len(chans) != info.channels:
            raise FLACError("frame channel count differs from STREAMINFO")
        if bps_seen is None:
            bps_seen = bps
        total += len(chans[0]) * len(chans)
        if total > max_samples:
            raise UnsupportedFLAC(
                f"decoded samples exceed the {max_samples} budget"
            )
        if bps % 8 == 0:
            width = bps // 8
            blob = bytearray()
            for i in range(len(chans[0])):
                for ch in chans:
                    blob += int(ch[i]).to_bytes(width, "little", signed=True)
            md5.update(bytes(blob))
        for c, ch in zip(per_channel, chans):
            c.extend(ch)
    if not per_channel[0]:
        raise FLACError("no audio frames")
    if info.total_samples and len(per_channel[0]) != info.total_samples:
        raise FLACError("decoded sample count differs from STREAMINFO")
    if (
        info.md5 != b"\x00" * 16
        and bps_seen is not None
        and bps_seen % 8 == 0
        and md5.digest() != info.md5
    ):
        raise FLACError("stream MD5 mismatch (decoded samples are wrong)")

    # normalize to the int16 range DecodedAudio standardizes on
    bps = bps_seen if bps_seen is not None else info.bits_per_sample
    shift = 16 - bps
    n = len(per_channel[0])
    from array import array

    samples = array("h", bytes(2 * n * info.channels))
    try:
        for ci, ch in enumerate(per_channel):
            if shift >= 0:
                for i, v in enumerate(ch):
                    samples[i * info.channels + ci] = v << shift
            else:
                for i, v in enumerate(ch):
                    samples[i * info.channels + ci] = v >> -shift
    except OverflowError:
        # a sample escaped its declared bit depth: corrupt stream (or
        # decoder bug) — surface as the codec's own error type
        raise FLACError("decoded sample exceeds declared bit depth") from None
    return DecodedAudio(info.sample_rate, info.channels, samples)


# ----------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)


def _best_rice_param(resid: list[int]) -> int:
    best_k, best_bits = 0, None
    zig = [(-r << 1) - 1 if r < 0 else r << 1 for r in resid]
    for k in range(15):
        cost = sum((z >> k) + 1 + k for z in zig)
        if best_bits is None or cost < best_bits:
            best_k, best_bits = k, cost
    return best_k


def _write_residual(w: _BitWriter, resid: list[int]) -> None:
    w.write(0, 2)  # method 0: 4-bit Rice parameters
    w.write(0, 4)  # partition order 0
    k = _best_rice_param(resid)
    w.write(k, 4)
    for r in resid:
        z = (-r << 1) - 1 if r < 0 else r << 1
        w.write_unary(z >> k)
        w.write(z, k)


def _write_subframe(
    w: _BitWriter, samples: list[int], bps: int, force: str | None
) -> None:
    kind = force
    if kind is None:
        kind = "constant" if len(set(samples)) == 1 else "fixed2"
        if len(samples) < 3:
            kind = "verbatim" if len(set(samples)) > 1 else "constant"
    w.write(0, 1)
    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)
        w.write(samples[0], bps)
    elif kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write(s, bps)
    elif kind in ("fixed1", "fixed2"):
        order = int(kind[-1])
        w.write(8 + order, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s, bps)
        coeffs = _FIXED_COEFFS[order]
        resid = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
            for i in range(order, len(samples))
        ]
        _write_residual(w, resid)
    else:  # pragma: no cover
        raise ValueError(f"unknown subframe kind {kind}")


def encode_flac(
    audio: DecodedAudio,
    bits_per_sample: int = 16,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    subframe: str | None = None,
) -> bytes:
    """Real FLAC writer for fixtures and round-trip gates.

    ``stereo_mode``: independent | left_side | right_side | mid_side
    (2-channel input only). ``subframe`` forces a subframe type
    (constant/verbatim/fixed1/fixed2) — default picks constant for
    flat blocks, fixed2 otherwise. Samples must already fit
    ``bits_per_sample`` (8 or 16). STREAMINFO carries the true MD5, so
    the decoder's bit-exactness check is armed."""
    if bits_per_sample not in (8, 16):
        raise ValueError("encoder supports 8 or 16 bits per sample")
    n_ch = audio.channels
    if stereo_mode != "independent" and n_ch != 2:
        raise ValueError("stereo decorrelation requires 2 channels")
    samples = list(audio.samples)
    n = len(samples) // n_ch
    chans = [samples[c::n_ch] for c in range(n_ch)]
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if any(not lo <= s <= hi for s in samples):
        raise ValueError("samples do not fit bits_per_sample")

    md5 = hashlib.md5()
    width = bits_per_sample // 8
    for i in range(n):
        for ch in chans:
            md5.update(int(ch[i]).to_bytes(width, "little", signed=True))

    out = bytearray()
    out += FLAC_MARKER
    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", block_size, block_size)
    streaminfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (
        (audio.sample_rate << 44)
        | ((n_ch - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | n
    )
    streaminfo += packed.to_bytes(8, "big")
    streaminfo += md5.digest()
    out += (0x80000000 | (0 << 24) | len(streaminfo)).to_bytes(4, "big")
    out += streaminfo

    ss_code = {8: 1, 16: 4}[bits_per_sample]
    sr_code = next(
        (c for c, r in _SAMPLE_RATES.items() if r == audio.sample_rate), None
    )

    frame_no = 0
    for start in range(0, n, block_size):
        bs = min(block_size, n - start)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy
        w.write(7, 4)  # block size: 16-bit field at header end
        if sr_code is not None:
            w.write(sr_code, 4)
        elif audio.sample_rate < 1 << 16:
            w.write(13, 4)  # 16-bit Hz field at header end
        else:
            raise ValueError("sample rate not encodable")
        block = [ch[start : start + bs] for ch in chans]
        if stereo_mode == "independent":
            ch_code = n_ch - 1
            subs = [(b, bits_per_sample) for b in block]
        else:
            left, right = block
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                ch_code, subs = 8, [(left, bits_per_sample), (side, bits_per_sample + 1)]
            elif stereo_mode == "right_side":
                ch_code, subs = 9, [(side, bits_per_sample + 1), (right, bits_per_sample)]
            elif stereo_mode == "mid_side":
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                ch_code, subs = 10, [(mid, bits_per_sample), (side, bits_per_sample + 1)]
            else:
                raise ValueError(f"unknown stereo_mode {stereo_mode}")
        w.write(ch_code, 4)
        w.write(ss_code, 3)
        w.write(0, 1)
        # coded frame number (fits 7 bits for small fixtures; extend
        # with the 2-byte UTF-8 form beyond that)
        if frame_no < 0x80:
            w.write(frame_no, 8)
        elif frame_no < 0x800:
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        else:
            raise ValueError("too many frames for the fixture encoder")
        w.write(bs - 1, 16)
        if sr_code is None:
            w.write(audio.sample_rate, 16)
        w.align()
        w.write(_crc8(bytes(w.out)), 8)
        for sub, bps in subs:
            _write_subframe(w, sub, bps, subframe)
        w.align()
        w.write(_crc16(bytes(w.out)), 16)
        w.align()
        out += w.out
        frame_no += 1
    return bytes(out)
