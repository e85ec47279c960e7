"""Pure-stdlib baseline JPEG codec (r7 verdict task 3).

The multimodal path decodes PNG (``png_codec``) and WAV
(``wav_codec``) for real; JPEG was the largest remaining stub. The
baseline sequential DCT process (ITU-T T.81 / ISO 10918-1, the form
virtually every camera and web encoder emits) needs nothing beyond
``struct`` + integer/float math: marker segments, 8x8 forward/inverse
DCT, canonical Huffman entropy coding, zigzag + quantization, and
(for color) 4:2:0 / 4:2:2 chroma subsampling with YCbCr <-> RGB.

Implemented here:

- :func:`decode_jpeg` — baseline (SOF0) sequential Huffman JPEG:
  grayscale or 3-component YCbCr, sampling factors 1..2 per axis
  (covers 4:4:4, 4:2:2, 4:4:0 and 4:2:0), restart markers, byte
  stuffing, multiple DQT/DHT segments. Returns the shared
  ``png_codec.DecodedImage`` so dHash / grid features / resize work
  unchanged on JPEG pixels.
- :func:`encode_jpeg` — the matching baseline encoder (grayscale or
  4:4:4 RGB) with Annex-K-style default tables; used by the fixture
  builders, the round-trip tests and :func:`multimodal.resize_image`.
- :func:`probe_jpeg` — "would decode succeed": a marker walk that
  checks process, precision, sampling and the pixel budget without
  entropy-decoding, mirroring ``png_codec.probe_png``.

Progressive (SOF2) decodes for real: coefficients accumulate across
scans and dequant+IDCT run once at the end. Spectral selection (a DC
scan plus per-component AC band scans with EOBn run coding) landed in
r8; successive approximation (Ah/Al nonzero — first scans deliver the
point-transformed high bits, refinement scans one correction bit per
coefficient, T.81 G.1.2) landed in r9, so the full SOF2 Huffman
process decodes, including the libjpeg-default SA scan scripts real
encoders emit. A completed SA ladder is bit-identical to the
sequential decode of the same coefficients; a truncated ladder (legal
— that's progressive's preview feature) decodes at reduced precision.
12-bit extended-sequential frames (SOF1, r10) decode too — 16-bit
DQT entries, DC categories to 15 — emitted at the pipeline's 8-bit
sample depth (``>> 4``, the same output-domain decision as sub-byte
TIFF scaling UP to 8 bits); the writer's 12-bit mode uses generic
wide Huffman tables since Annex K's stop at the 8-bit categories.
Arithmetic coding (SOF9+), hierarchical, 12-bit progressive and >2x
sampling forms raise :class:`UnsupportedJPEG` — they fall back to
the documented stub gate exactly like non-JPEG formats.

Exactness contract the gate oracles rely on: a block whose 64 samples
are one constant value ``v`` round-trips EXACTLY through
encode -> decode when the DC quantizer divides ``8*(v-128)``'s
rounding step (the default gate tables use ``q[0] = 8``): the forward
DCT of a constant block is DC-only with ``F(0,0) = 8*(v-128)``, the
AC coefficients quantize to zero, and the inverse DCT of a DC-only
block is the constant ``F'(0,0)/8 + 128``. Float noise stays orders
of magnitude below the 0.5 rounding margin, so the decoded byte
equals ``v`` — which lets a DuckDB oracle recompute fingerprints of
JPEG-decoded pixels straight from ``ord()`` without parsing JPEG.

Everything is driver-free pure Python over ``bytes``; it runs inside
the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``, one whole payload per call, no Spark API.
"""

from __future__ import annotations

import math
import struct

from .png_codec import DecodedImage

SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
DQT = 0xDB
DRI = 0xDD
DHT = 0xC4
COM = 0xFE

#: decoded-pixel budget (width*height), the decompression-bomb guard:
#: SOF0 declares dimensions up-front, so a tiny payload can claim a
#: huge canvas. Same doctrine as png_codec.MAX_SAMPLE_BYTES.
MAX_PIXELS = 1 << 25


class JPEGError(ValueError):
    """Malformed JPEG payload."""


class UnsupportedJPEG(NotImplementedError):
    """Valid JPEG, but a process this codec doesn't implement
    (arithmetic, hierarchical, 12-bit progressive, >2x sampling).
    Callers treat it like the stub gate."""


def is_jpeg(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 3
        and payload[0] == 0xFF
        and payload[1] == SOI
        and payload[2] == 0xFF
    )


def _zigzag() -> list[int]:
    # raster index (row*8+col) of each zigzag position, generated
    # rather than transcribed: diagonal s = row+col; odd diagonals run
    # row-increasing, even diagonals row-decreasing (T.81 figure A.6)
    order = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rows if s % 2 else reversed(rows)):
            order.append(r * 8 + (s - r))
    return order


ZIGZAG = _zigzag()

# Annex-K-style default tables. The encoder WRITES its tables into the
# stream (DQT/DHT), and the decoder READS them from the stream, so the
# codec is self-consistent regardless of constants; these defaults are
# the interchange-standard ones so third-party decoders accept our
# output.
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: near-lossless table for fixtures/round-trip audits: every
#: coefficient quantizes by 8 (which the constant-block contract in
#: the module docstring needs for q[0], and keeps AC error at zero
#: for the flat blocks the gates build)
QUANT_FLAT8 = [8] * 64

_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
#: generic tables for 12-bit sample data (T.81 allows DC categories
#: to 15 and AC magnitude categories to 14, which the Annex-K
#: interchange tables don't cover): 16 DC symbols at 5 bits, and
#: EOB/ZRL + every (run, size<=14) AC symbol at 8 bits — legal
#: canonical codes (no all-ones codeword), suboptimal by design
#: (fixtures, not compression).
_DC_WIDE = (
    [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
_AC_WIDE = (
    [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0],
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)],
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# separable DCT basis: _COS[u][x] = cos((2x+1) u pi / 16), _C[0]=1/sqrt2
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


# ---------------------------------------------------------------- decode


_CODES_MEMO: dict[tuple, dict] = {}


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code length, code) -> symbol, per the canonical construction
    of T.81 Annex C. Memoized — a corpus decode sees the same handful
    of tables (usually the Annex-K set) millions of times."""
    key = (tuple(bits), tuple(vals))
    hit = _CODES_MEMO.get(key)
    if hit is not None:
        return hit
    if len(vals) != sum(bits):
        raise JPEGError("DHT value count disagrees with BITS")
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if len(_CODES_MEMO) < 64:  # bounded: hostile streams can't grow it
        _CODES_MEMO[key] = table
    return table


class _BitReader:
    """MSB-first reader over the entropy-coded segment: un-stuffs
    0xFF00, stops at any real marker, resets at RSTn."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None  # marker that ended the scan

    def _fill(self) -> None:
        while self.nbits < 25:
            if self.marker is not None or self.pos >= len(self.buf):
                # past the end: pad with 1s (the spec's fill bits) so a
                # final partial code either resolves or errors cleanly
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is None:
                    # lone 0xFF as the buffer's last byte: treat as
                    # end-of-data so the pad-with-1s path runs and the
                    # decoder errors cleanly instead of spinning here
                    self.pos = len(self.buf)
                    continue
                else:
                    self.marker = nxt  # RSTn or end-of-scan marker
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JPEGError("invalid Huffman code in entropy segment")

    def restart(self) -> None:
        """Consume an expected RSTn marker and resync to a byte edge."""
        self.bits = 0
        self.nbits = 0
        if self.marker is None:
            # reader hasn't hit the marker yet: it must be next in buf
            self._fill_to_marker()
        m = self.marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise JPEGError("expected restart marker")
        self.pos += 2  # consume FF Dn (pos still points at the FF)
        self.marker = None

    def _fill_to_marker(self) -> None:
        while self.pos < len(self.buf):
            if (
                self.buf[self.pos] == 0xFF
                and self.pos + 1 < len(self.buf)
                and self.buf[self.pos + 1] != 0x00
            ):
                self.marker = self.buf[self.pos + 1]
                return
            self.pos += 1


def _extend(v: int, ssss: int) -> int:
    """T.81 F.12: map received magnitude bits to the signed value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _idct_block(
    coef: list[float], level: int = 128, maxval: int = 255
) -> list[int]:
    """8x8 inverse DCT -> level-shifted, clamped 0..maxval samples
    (128/255 for 8-bit, 2048/4095 for 12-bit). DC-only blocks (the
    common flat case) shortcut to a constant."""
    if not any(coef[1:]):
        v = int(round(coef[0] / 8.0)) + level
        v = 0 if v < 0 else (maxval if v > maxval else v)
        return [v] * 64
    # rows then columns, separable
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        row = coef[base : base + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                if row[u]:
                    s += _C[u] * row[u] * _COS[u][x]
            tmp[base + x] = s * 0.5
    out = [0] * 64
    for c in range(8):
        col = [tmp[r * 8 + c] for r in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                if col[v]:
                    s += _C[v] * col[v] * _COS[v][y]
            val = int(round(s * 0.5)) + level
            out[y * 8 + c] = (
                0 if val < 0 else (maxval if val > maxval else val)
            )
    return out


def _parse_segments(payload: bytes):
    """Yield (marker, body, body_start) up to and including SOS; the
    caller reads the entropy segment from SOS's end."""
    if not is_jpeg(payload):
        raise JPEGError("not a JPEG payload (no SOI)")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JPEGError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        while marker == 0xFF and pos < n:  # fill bytes before a marker
            marker = payload[pos]
            pos += 1
        if marker in (SOI, EOI) or 0xD0 <= marker <= 0xD7:
            yield marker, b"", pos
            continue
        if pos + 2 > n:
            raise JPEGError("truncated marker segment")
        (length,) = struct.unpack(">H", payload[pos : pos + 2])
        if length < 2 or pos + length > n:
            raise JPEGError("truncated marker segment")
        yield marker, payload[pos + 2 : pos + length], pos + length
        if marker == SOS:
            return
        pos += length
    raise JPEGError("no SOS marker before end of payload")


def _parse_dqt(body: bytes, quant: dict) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        i += 1
        if pq not in (0, 1):
            raise JPEGError("bad DQT precision")
        step = 2 if pq else 1
        if i + 64 * step > len(body):
            raise JPEGError("truncated DQT")
        tbl = [0] * 64
        for z in range(64):
            v = struct.unpack(">H", body[i : i + 2])[0] if pq else body[i]
            tbl[ZIGZAG[z]] = v
            i += step
        quant[tq] = tbl


def _parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    i = 0
    while i + 17 <= len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1 : i + 17])
        nv = sum(bits)
        vals = list(body[i + 17 : i + 17 + nv])
        if len(vals) != nv:
            raise JPEGError("truncated DHT")
        (huff_ac if tc else huff_dc)[th] = _canonical_codes(bits, vals)
        i += 17 + nv


def _planes_to_image(
    planes: list, comps: list, width: int, height: int,
    hmax: int, vmax: int,
) -> DecodedImage:
    """Shared finish: crop grayscale / upsample + YCbCr->RGB."""
    if len(comps) == 1:
        plane, pw, _ph = planes[0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = plane[y * pw : y * pw + width]
        return DecodedImage(width, height, 1, bytes(out))
    out = bytearray(width * height * 3)
    yp, ypw, _ = planes[0]
    cbp, cbpw, _ = planes[1]
    crp, crpw, _ = planes[2]
    hy, vy = comps[0][0], comps[0][1]
    hcb, vcb = comps[1][0], comps[1][1]
    hcr, vcr = comps[2][0], comps[2][1]
    for row in range(height):
        dst = row * width * 3
        yrow = ((row * vy) // vmax) * ypw
        cbrow = ((row * vcb) // vmax) * cbpw
        crrow = ((row * vcr) // vmax) * crpw
        for col in range(width):
            Y = yp[yrow + (col * hy) // hmax]
            Cb = cbp[cbrow + (col * hcb) // hmax] - 128
            Cr = crp[crrow + (col * hcr) // hmax] - 128
            r = int(round(Y + 1.402 * Cr))
            g = int(round(Y - 0.344136 * Cb - 0.714136 * Cr))
            b = int(round(Y + 1.772 * Cb))
            d = dst + col * 3
            out[d] = 0 if r < 0 else (255 if r > 255 else r)
            out[d + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[d + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return DecodedImage(width, height, 3, bytes(out))


_SOF_UNSUPPORTED = {
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _parse_header(payload: bytes, max_pixels: int):
    """Shared SOI..SOS walk for decode_jpeg and probe_jpeg. Returns
    (width, height, components, quant, huff_dc, huff_ac, restart,
    scan_map, scan_start, prec). components = [(h, v, tq)] in frame
    order; scan_map = [(comp_index, dc_id, ac_id)] in scan order;
    prec is 8 or 12 (extended sequential)."""
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart = 0
    frame = None
    for marker, body, end in _parse_segments(payload):
        if marker == DQT:
            _parse_dqt(body, quant)
        elif marker == DHT:
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == DRI:
            if len(body) != 2:
                raise JPEGError("bad DRI length")
            (restart,) = struct.unpack(">H", body)
        elif marker == 0xC2:  # progressive: routed by decode_jpeg
            raise UnsupportedJPEG("progressive frame in sequential path")
        elif marker in _SOF_UNSUPPORTED:
            raise UnsupportedJPEG(_SOF_UNSUPPORTED[marker])
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            if len(body) < 6:
                raise JPEGError("truncated SOF header")
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc:
                raise JPEGError("truncated SOF component list")
            if prec not in (8, 12) or (prec == 12 and marker == 0xC0):
                # 12-bit is legal only in extended sequential (SOF1)
                raise UnsupportedJPEG(f"{prec}-bit precision")
            if nc not in (1, 3):
                raise UnsupportedJPEG(f"{nc}-component frame")
            if width == 0 or height == 0:
                raise JPEGError("zero frame dimension")
            if width * height > max_pixels:
                raise UnsupportedJPEG(
                    f"{width}x{height} exceeds the {max_pixels}-pixel budget"
                )
            comps = []
            for k in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * k : 9 + 3 * k]
                )
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise UnsupportedJPEG(f"sampling factors {h}x{v}")
                comps.append((cid, h, v, tq))
            frame = (width, height, comps, prec)
        elif marker == SOS:
            if frame is None:
                raise JPEGError("SOS before SOF")
            ns = body[0]
            width, height, comps, prec = frame
            if ns != len(comps):
                raise UnsupportedJPEG("multi-scan / partial-scan stream")
            ids = [c[0] for c in comps]
            scan_map = []
            for k in range(ns):
                cs, td_ta = body[1 + 2 * k], body[2 + 2 * k]
                if cs not in ids:
                    raise JPEGError("SOS references unknown component")
                scan_map.append((ids.index(cs), td_ta >> 4, td_ta & 0x0F))
            components = [(h, v, tq) for (_cid, h, v, tq) in comps]
            if len(components) == 1:
                # a single-component scan is non-interleaved: the MCU
                # is ONE block and sampling factors are ignored
                # (T.81 A.2.2), whatever the SOF declared
                components = [(1, 1, components[0][2])]
            return (
                width,
                height,
                components,
                quant,
                huff_dc,
                huff_ac,
                restart,
                scan_map,
                end,
                prec,
            )
    raise JPEGError("no SOS marker")  # pragma: no cover (walk raises)


def _entropy_end(payload: bytes, pos: int) -> int:
    """Index of the first REAL marker (not stuffing, not RSTn) at or
    after ``pos`` — how scan data is skipped without decoding it."""
    n = len(payload)
    while True:
        i = payload.find(b"\xff", pos)
        if i < 0 or i + 1 >= n:
            return n
        nxt = payload[i + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7 or nxt == 0xFF:
            pos = i + 2 if nxt != 0xFF else i + 1
            continue
        return i


def _decode_progressive(
    payload: bytes, max_pixels: int = MAX_PIXELS
) -> DecodedImage:
    """Progressive decode (SOF2): coefficients accumulate across
    scans — an interleaved or per-component DC scan, then
    per-component AC band scans with EOBn run coding — and
    dequant+IDCT happen once at the end. Successive approximation is
    supported in full: first scans (Ah=0) store the point-transformed
    value ``<< Al``; DC refinement scans read one raw bit per block
    and OR in ``1 << Al``; AC refinement scans follow T.81 G.1.2.3
    (one correction bit per already-nonzero coefficient passed, (r,1)
    symbols for newly-significant ones, EOB runs covering whole
    blocks whose nonzero coefficients still consume bits). A scan
    ladder may stop early — that's progressive's preview feature —
    leaving low-order bits untransmitted; a ladder run to Al=0
    reconstructs the sequential coefficients exactly."""
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart = 0
    frame = None
    geo = None  # (hmax, vmax, mcux, mcuy, per-comp grids)
    coef: list[list[list[int]]] = []
    dc_done: set[int] = set()
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise JPEGError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        while marker == 0xFF and pos < n:
            marker = payload[pos]
            pos += 1
        if marker == EOI:
            break
        if marker == SOI or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise JPEGError("truncated marker segment")
        (length,) = struct.unpack(">H", payload[pos : pos + 2])
        if length < 2 or pos + length > n:
            raise JPEGError("truncated marker segment")
        body = payload[pos + 2 : pos + length]
        seg_end = pos + length
        pos = seg_end
        if marker == DQT:
            _parse_dqt(body, quant)
        elif marker == DHT:
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == DRI:
            if len(body) != 2:
                raise JPEGError("bad DRI length")
            (restart,) = struct.unpack(">H", body)
        elif marker == 0xC2:
            if len(body) < 6:
                raise JPEGError("truncated SOF header")
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * nc:
                raise JPEGError("truncated SOF component list")
            if prec != 8:
                raise UnsupportedJPEG(f"{prec}-bit precision")
            if nc not in (1, 3):
                raise UnsupportedJPEG(f"{nc}-component frame")
            if width == 0 or height == 0:
                raise JPEGError("zero frame dimension")
            if width * height > max_pixels:
                raise UnsupportedJPEG(
                    f"{width}x{height} exceeds the {max_pixels}-pixel budget"
                )
            comps = []
            for k in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * k : 9 + 3 * k]
                )
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise UnsupportedJPEG(f"sampling factors {h}x{v}")
                comps.append((cid, h, v, tq))
            if nc == 1:
                cid, _h, _v, tq = comps[0]
                comps = [(cid, 1, 1, tq)]
            frame = (width, height, comps)
            hmax = max(h for _c, h, _v, _t in comps)
            vmax = max(v for _c, _h, v, _t in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            grids = []
            for (_cid, h, v, _tq) in comps:
                pbw, pbh = mcux * h, mcuy * v  # padded block grid
                cw = (width * h + hmax - 1) // hmax
                ch = (height * v + vmax - 1) // vmax
                bw, bh = (cw + 7) // 8, (ch + 7) // 8  # real blocks
                grids.append((pbw, pbh, bw, bh))
                coef.append([[0] * 64 for _ in range(pbw * pbh)])
            geo = (hmax, vmax, mcux, mcuy, grids)
        elif marker in _SOF_UNSUPPORTED or marker in (0xC0, 0xC1):
            raise JPEGError("mixed frame types in progressive stream")
        elif marker == SOS:
            if frame is None:
                raise JPEGError("SOS before SOF")
            width, height, comps = frame
            hmax, vmax, mcux, mcuy, grids = geo
            if not body:
                raise JPEGError("truncated SOS header")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise JPEGError("truncated SOS header")
            scan = []
            ids = [c[0] for c in comps]
            for k in range(ns):
                cs, tt = body[1 + 2 * k], body[2 + 2 * k]
                if cs not in ids:
                    raise JPEGError("SOS references unknown component")
                scan.append((ids.index(cs), tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if al > 13 or ah > 13:
                raise JPEGError("point transform out of range")
            if ah and al != ah - 1:
                raise JPEGError(
                    "nonconsecutive successive-approximation scan"
                )
            reader = _BitReader(payload, seg_end)
            if ss == 0:
                # DC scan (spectral selection: Se must be 0 too)
                if se != 0:
                    raise JPEGError("DC scan with Se != 0")
                p1 = 1 << al
                pred = [0] * len(scan)
                unit = 0
                if len(scan) > 1:
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if restart and unit and unit % restart == 0:
                                reader.restart()
                                pred = [0] * len(scan)
                            for si, (ci, td, _ta) in enumerate(scan):
                                _cid, h, v, _tq = comps[ci]
                                pbw = grids[ci][0]
                                dct = None
                                if ah == 0:
                                    dct = huff_dc.get(td)
                                    if dct is None:
                                        raise JPEGError("missing DC table")
                                for by in range(v):
                                    for bx in range(h):
                                        blk = coef[ci][
                                            (my * v + by) * pbw
                                            + (mx * h + bx)
                                        ]
                                        if ah:
                                            # refinement: one bit/block
                                            if reader.read_bit():
                                                blk[0] |= p1
                                            continue
                                        ssss = reader.decode_symbol(dct)
                                        if ssss > 11:
                                            raise JPEGError("DC cat > 11")
                                        pred[si] += _extend(
                                            reader.receive(ssss), ssss
                                        )
                                        blk[0] = pred[si] << al
                                unit += 1
                else:
                    ci, td, _ta = scan[0]
                    pbw, _pbh, bw, bh = grids[ci]
                    dct = None
                    if ah == 0:
                        dct = huff_dc.get(td)
                        if dct is None:
                            raise JPEGError("missing DC table")
                    p0 = 0
                    for byy in range(bh):
                        for bxx in range(bw):
                            if restart and unit and unit % restart == 0:
                                reader.restart()
                                p0 = 0
                            unit += 1
                            if ah:
                                if reader.read_bit():
                                    coef[ci][byy * pbw + bxx][0] |= p1
                                continue
                            ssss = reader.decode_symbol(dct)
                            if ssss > 11:
                                raise JPEGError("DC cat > 11")
                            p0 += _extend(reader.receive(ssss), ssss)
                            coef[ci][byy * pbw + bxx][0] = p0 << al
                dc_done.update(ci for ci, _t, _a in scan)
            else:
                # AC band scan: exactly one component (T.81 G.1.1.1)
                if len(scan) != 1:
                    raise JPEGError("interleaved AC progressive scan")
                if not (1 <= ss <= se <= 63):
                    raise JPEGError("bad spectral band")
                ci, _td, ta = scan[0]
                act = huff_ac.get(ta)
                if act is None:
                    raise JPEGError("missing AC table")
                pbw, _pbh, bw, bh = grids[ci]
                eob_run = 0
                unit = 0
                if ah:
                    # refinement (T.81 G.1.2.3): one correction bit per
                    # already-nonzero coefficient passed; (r, 1) symbols
                    # place newly-significant +-(1<<al) after a run of r
                    # STILL-ZERO coefficients; inside an EOB run every
                    # nonzero coefficient of the band still gets a bit
                    p1, m1 = 1 << al, -1 << al
                    for byy in range(bh):
                        for bxx in range(bw):
                            if restart and unit and unit % restart == 0:
                                reader.restart()
                                eob_run = 0
                            unit += 1
                            blk = coef[ci][byy * pbw + bxx]
                            k = ss
                            if eob_run == 0:
                                while k <= se:
                                    rs = reader.decode_symbol(act)
                                    r, s = rs >> 4, rs & 0x0F
                                    if s == 0:
                                        if r != 15:  # EOBn
                                            eob_run = 1 << r
                                            if r:
                                                eob_run += reader.receive(r)
                                            break
                                        sval = 0  # ZRL: 16 zero-history
                                    elif s != 1:
                                        raise JPEGError(
                                            "refinement magnitude > 1"
                                        )
                                    else:
                                        sval = (
                                            p1 if reader.read_bit() else m1
                                        )
                                    while k <= se:
                                        if blk[k]:
                                            if reader.read_bit() and not (
                                                blk[k] & p1
                                            ):
                                                blk[k] += (
                                                    p1 if blk[k] >= 0 else m1
                                                )
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if sval:
                                        if k > se:
                                            raise JPEGError(
                                                "AC band overrun"
                                            )
                                        blk[k] = sval
                                    k += 1
                            if eob_run:
                                while k <= se:
                                    if blk[k]:
                                        if reader.read_bit() and not (
                                            blk[k] & p1
                                        ):
                                            blk[k] += (
                                                p1 if blk[k] >= 0 else m1
                                            )
                                    k += 1
                                eob_run -= 1
                    pos = _entropy_end(payload, seg_end)
                    continue
                for byy in range(bh):
                    for bxx in range(bw):
                        if restart and unit and unit % restart == 0:
                            reader.restart()
                            eob_run = 0
                        unit += 1
                        if eob_run:
                            eob_run -= 1
                            continue
                        blk = coef[ci][byy * pbw + bxx]
                        k = ss
                        while k <= se:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                # EOBn: run of 2^r + r extra bits,
                                # including THIS block
                                eob_run = (1 << r) - 1
                                if r:
                                    eob_run += reader.receive(r)
                                break
                            k += r
                            if k > se:
                                raise JPEGError("AC band overrun")
                            blk[k] = _extend(reader.receive(s), s) << al
                            k += 1
            # resume the marker walk where the scan's entropy ended
            pos = _entropy_end(payload, seg_end)
    if frame is None:
        raise JPEGError("no SOF2 frame in progressive stream")
    width, height, comps = frame
    hmax, vmax, mcux, mcuy, grids = geo
    planes = []
    for ci, (_cid, h, v, tq) in enumerate(comps):
        if tq not in quant:
            raise JPEGError(f"missing quant table {tq}")
        q = quant[tq]
        pbw, pbh, _bw, _bh = grids[ci]
        pw, ph = pbw * 8, pbh * 8
        plane = bytearray(pw * ph)
        for byy in range(pbh):
            for bxx in range(pbw):
                zz = coef[ci][byy * pbw + bxx]
                raster = [0.0] * 64
                for k in range(64):
                    if zz[k]:
                        ri = ZIGZAG[k]
                        raster[ri] = zz[k] * q[ri]
                samples = _idct_block(raster)
                ox, oy = bxx * 8, byy * 8
                for r8 in range(8):
                    dst = (oy + r8) * pw + ox
                    plane[dst : dst + 8] = bytes(samples[r8 * 8 : r8 * 8 + 8])
        planes.append((plane, pw, ph))
    comps3 = [(h, v, tq) for (_cid, h, v, tq) in comps]
    return _planes_to_image(planes, comps3, width, height, hmax, vmax)


def probe_jpeg(payload: bytes | None, max_pixels: int = MAX_PIXELS) -> bool:
    """True iff :func:`decode_jpeg` would accept the stream's header:
    baseline/extended-sequential or progressive Huffman (spectral
    selection and successive approximation both decode), 8-bit, 1 or
    3 components, sampling <= 2x, every referenced quant/Huffman
    table present, within the pixel budget. Walks scan HEADERS
    (skipping entropy data by marker scan for progressive —
    inconsistent Ah/Al probes False, mirroring decode's stream
    error); never entropy-decodes."""
    if not is_jpeg(payload):
        return False
    if _frame_marker(payload) == 0xC2:
        return _probe_progressive(payload, max_pixels)
    try:
        (_w, _h, comps, quant, hdc, hac, _ri, scan, _s, _prec) = (
            _parse_header(payload, max_pixels)
        )
    except (JPEGError, UnsupportedJPEG, struct.error, IndexError):
        return False
    for (ci, td, ta) in scan:
        if comps[ci][2] not in quant or td not in hdc or ta not in hac:
            return False
    return True


def _probe_progressive(payload: bytes, max_pixels: int) -> bool:
    """Header-only walk over EVERY scan of a progressive stream:
    successive-approximation parameters consistent (Ah=0 or Al=Ah-1),
    bands sane, referenced tables present (DC refinement scans read
    raw bits, so they need no DC table); entropy data is skipped with
    the marker scan, never decoded."""
    dc_ids: set[int] = set()
    ac_ids: set[int] = set()
    qt_ids: set[int] = set()
    comps = None
    pos, n = 2, len(payload)
    saw_scan = False
    try:
        while pos + 2 <= n:
            if payload[pos] != 0xFF:
                return False
            marker = payload[pos + 1]
            pos += 2
            while marker == 0xFF and pos < n:
                marker = payload[pos]
                pos += 1
            if marker == EOI:
                break
            if marker == SOI or 0xD0 <= marker <= 0xD7:
                continue
            if pos + 2 > n:
                return False
            (length,) = struct.unpack(">H", payload[pos : pos + 2])
            if length < 2 or pos + length > n:
                return False
            body = payload[pos + 2 : pos + length]
            seg_end = pos + length
            pos = seg_end
            if marker == DQT:
                q: dict[int, list[int]] = {}
                _parse_dqt(body, q)
                qt_ids.update(q)
            elif marker == DHT:
                d: dict[int, dict] = {}
                a: dict[int, dict] = {}
                _parse_dht(body, d, a)
                dc_ids.update(d)
                ac_ids.update(a)
            elif marker == 0xC2:
                prec, height, width, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    return False
                if width == 0 or height == 0:
                    return False
                if width * height > max_pixels:
                    return False
                comps = []
                for k in range(nc):
                    _cid, hv, tq = struct.unpack(
                        ">BBB", body[6 + 3 * k : 9 + 3 * k]
                    )
                    h, v = hv >> 4, hv & 0x0F
                    if not (1 <= h <= 2 and 1 <= v <= 2):
                        return False
                    comps.append(tq)
            elif marker == SOS:
                if comps is None:
                    return False
                ns = body[0]
                scan_tables = [
                    (body[2 + 2 * k] >> 4, body[2 + 2 * k] & 0x0F)
                    for k in range(ns)
                ]
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                if al > 13 or ah > 13 or (ah and al != ah - 1):
                    return False
                if ss == 0:
                    if se != 0:
                        return False
                    # DC refinement scans read raw bits, no table needed
                    if ah == 0 and any(
                        td not in dc_ids for td, _ta in scan_tables
                    ):
                        return False
                else:
                    if ns != 1 or not (1 <= ss <= se <= 63):
                        return False
                    if scan_tables[0][1] not in ac_ids:
                        return False
                saw_scan = True
                pos = _entropy_end(payload, seg_end)
    except (struct.error, IndexError):
        return False
    return comps is not None and saw_scan and all(t in qt_ids for t in comps)


def _frame_marker(payload: bytes) -> int | None:
    """The stream's SOFn marker (first one before SOS), or None."""
    try:
        for marker, _body, _end in _parse_segments(payload):
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return marker
            if marker == SOS:
                return None
    except JPEGError:
        return None
    return None


def decode_jpeg(
    payload: bytes, max_pixels: int = MAX_PIXELS
) -> DecodedImage:
    """Decode a baseline-sequential or progressive Huffman JPEG to
    8-bit samples.

    Grayscale frames return ``channels=1`` (the Y plane, no color
    transform). Three-component frames are treated as JFIF YCbCr,
    upsampled nearest-neighbor to full resolution and converted to
    RGB (``channels=3``) with the standard CCIR 601 round+clamp.
    Progressive streams (SOF2) decode with both spectral-selection
    and successive-approximation scans (full T.81 Huffman-progressive
    coverage); arithmetic-coded frames raise :class:`UnsupportedJPEG`.
    """
    if _frame_marker(payload) == 0xC2:
        return _decode_progressive(payload, max_pixels)
    (
        width,
        height,
        comps,
        quant,
        huff_dc,
        huff_ac,
        restart,
        scan_map,
        scan_start,
        prec,
    ) = _parse_header(payload, max_pixels)

    hmax = max(h for h, _v, _tq in comps)
    vmax = max(v for _h, v, _tq in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per-component plane at its own (subsampled) resolution, padded
    # to whole MCUs
    planes = []
    for (h, v, _tq) in comps:
        pw, ph = mcux * h * 8, mcuy * v * 8
        planes.append((bytearray(pw * ph), pw, ph))

    for ci, (_h, _v, tq) in enumerate(comps):
        if tq not in quant:
            raise JPEGError(f"missing quant table {tq}")
    for (ci, td, ta) in scan_map:
        if td not in huff_dc or ta not in huff_ac:
            raise JPEGError("missing Huffman table")

    reader = _BitReader(payload, scan_start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.restart()
                pred = [0] * len(comps)
            for (ci, td, ta) in scan_map:
                h, v, tq = comps[ci]
                q = quant[tq]
                dct = huff_dc[td]
                act = huff_ac[ta]
                plane, pw, _ph = planes[ci]
                for by in range(v):
                    for bx in range(h):
                        coef = [0.0] * 64
                        ssss = reader.decode_symbol(dct)
                        if ssss > (15 if prec == 12 else 11):
                            raise JPEGError("DC category out of range")
                        diff = _extend(reader.receive(ssss), ssss)
                        pred[ci] += diff
                        coef[0] = pred[ci] * q[0]
                        z = 1
                        while z < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    z += 16
                                    continue
                                break  # EOB
                            z += r
                            if z > 63:
                                raise JPEGError("AC index overrun")
                            ri = ZIGZAG[z]
                            coef[ri] = _extend(reader.receive(s), s) * q[ri]
                            z += 1
                        if prec == 12:
                            # 12-bit IDCT domain, emitted at the
                            # pipeline's 8-bit sample depth (same
                            # output-domain decision as sub-byte TIFF
                            # scaling UP to 8 bits)
                            samples = [
                                v >> 4
                                for v in _idct_block(coef, 2048, 4095)
                            ]
                        else:
                            samples = _idct_block(coef)
                        ox = (mx * h + bx) * 8
                        oy = (my * v + by) * 8
                        for r8 in range(8):
                            dst = (oy + r8) * pw + ox
                            plane[dst : dst + 8] = bytes(
                                samples[r8 * 8 : r8 * 8 + 8]
                            )
            mcu_count += 1

    return _planes_to_image(planes, comps, width, height, hmax, vmax)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:  # pad to a byte edge with 1 bits (T.81 F.1.2.3)
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), inverse of _canonical_codes."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return abs(v).bit_length()


def _fdct_block(samples: list[int], level: int = 128) -> list[float]:
    """8x8 forward DCT of level-shifted samples (level 128 for 8-bit,
    2048 for 12-bit). Constant blocks shortcut to DC-only (exactly
    8*(v-level)), keeping the flat-block round-trip contract
    float-noise-free."""
    first = samples[0]
    if samples.count(first) == 64:  # C-speed constant check
        out = [0.0] * 64
        out[0] = 8.0 * (first - level)
        return out
    shifted = [s - level for s in samples]
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        row = shifted[base : base + 8]
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += row[x] * _COS[u][x]
            tmp[base + u] = s * 0.5 * _C[u]
    out = [0.0] * 64
    for c in range(8):
        col = [tmp[r * 8 + c] for r in range(8)]
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += col[y] * _COS[v][y]
            out[v * 8 + c] = s * 0.5 * _C[v]
    return out


def _encode_dc(w: _BitWriter, dc: int, pred: int, dc_tbl: dict) -> int:
    """DC diff + magnitude bits; returns the new predictor."""
    diff = dc - pred
    ssss = _category(diff)
    code, length = dc_tbl[ssss]
    w.put(code, length)
    if ssss:
        bits = diff if diff >= 0 else diff + (1 << ssss) - 1
        w.put(bits, ssss)
    return dc


def _encode_ac_band(
    w: _BitWriter,
    coef_q: list[int],
    ac_tbl: dict,
    lo: int = 1,
    hi: int = 63,
    al: int = 0,
) -> None:
    """AC run-length coding of zigzag indices [lo, hi] (raster-order
    coefficients in). With the full band this is the sequential AC
    layer; for a progressive spectral-selection scan the trailing EOB
    symbol doubles as EOB0 (an EOB run of one block), so the same
    coding is valid in both frame types. ``al`` > 0 applies the
    successive-approximation point transform (magnitude shift,
    truncating toward zero — T.81 G.1.2.2) for a first SA scan."""
    if al:
        zz = []
        for z in range(64):
            v = coef_q[ZIGZAG[z]]
            t = abs(v) >> al
            zz.append(t if v >= 0 else -t)
    else:
        zz = [coef_q[ZIGZAG[z]] for z in range(64)]
    last_nz = lo - 1
    for z in range(hi, lo - 1, -1):
        if zz[z]:
            last_nz = z
            break
    run = 0
    for z in range(lo, last_nz + 1):
        v = zz[z]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tbl[(run << 4) | s]
        w.put(code, length)
        bits = v if v >= 0 else v + (1 << s) - 1
        w.put(bits, s)
        run = 0
    if last_nz < hi:
        code, length = ac_tbl[0x00]  # EOB / EOB0
        w.put(code, length)


# AC table for successive-approximation refinement scans (th=2): the
# Annex-K interchange tables lack the EOBn symbols (nbits<<4, nbits>=1)
# a refinement scan's cross-block EOB runs need, so — like every real
# progressive encoder — SA scans ship their own table. 2 codes of
# length 2 (EOB0 and (0,1), the hot symbols) + 30 of length 6 satisfy
# Kraft exactly under the canonical construction.
_AC_REFINE: tuple[list[int], list[int]] = (
    [0, 2, 0, 0, 0, 30, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [
        0x00, 0x01, 0x11, 0x21, 0x31, 0x41, 0x51, 0x61,
        0x71, 0x81, 0x91, 0xA1, 0xB1, 0xC1, 0xD1, 0xE1,
        0xF1, 0xF0, 0x10, 0x20, 0x30, 0x40, 0x50, 0x60,
        0x70, 0x80, 0x90, 0xA0, 0xB0, 0xC0, 0xD0, 0xE0,
    ],
)


def _encode_ac_refine_scan(
    w: _BitWriter,
    comp_blocks: list[list[int]],
    ac_tbl: dict,
    lo: int,
    hi: int,
    al: int,
) -> None:
    """Successive-approximation AC refinement scan (T.81 G.1.2.3,
    the jcphuff encode_mcu_AC_refine shape): newly-significant
    coefficients (|coef| >> al == 1) are coded as (run, 1) symbols
    whose run counts only STILL-ZERO positions; already-nonzero
    coefficients contribute one buffered correction bit each, flushed
    after the next emitted symbol; trailing content folds into a
    cross-block EOB run whose correction bits ride behind the EOBn
    symbol. ``comp_blocks``: raster-order quantized blocks, block-walk
    order."""
    eobrun = 0
    be_bits: list[int] = []  # correction bits owed to the pending EOBn

    def flush_eobrun() -> None:
        nonlocal eobrun, be_bits
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            code, length = ac_tbl[nbits << 4]
            w.put(code, length)
            if nbits:
                w.put(eobrun - (1 << nbits), nbits)
            for b in be_bits:
                w.put(b, 1)
            eobrun = 0
            be_bits = []

    for coef_q in comp_blocks:
        zz = [coef_q[ZIGZAG[z]] for z in range(64)]
        absval = [abs(v) >> al for v in zz]
        eob = lo - 1  # index of the LAST newly-significant coefficient
        for z in range(lo, hi + 1):
            if absval[z] == 1:
                eob = z
        r = 0  # run of still-zero positions since the last symbol
        br: list[int] = []  # correction bits since the last symbol
        for k in range(lo, hi + 1):
            t = absval[k]
            if t == 0:
                r += 1
                continue
            # ZRLs only when another newly-significant coef follows
            # (k <= eob); otherwise the tail folds into the EOB run
            while r > 15 and k <= eob:
                flush_eobrun()
                code, length = ac_tbl[0xF0]
                w.put(code, length)
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if t > 1:  # history coefficient: one correction bit
                br.append(t & 1)
                continue
            flush_eobrun()
            code, length = ac_tbl[(r << 4) | 1]
            w.put(code, length)
            w.put(1 if zz[k] >= 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFF or len(be_bits) > 900:
                flush_eobrun()
    flush_eobrun()


def _encode_plane_block(
    w: _BitWriter,
    coef_q: list[int],
    pred: int,
    dc_tbl: dict,
    ac_tbl: dict,
) -> int:
    """Huffman-encode one quantized block (raster order in);
    returns the new DC predictor."""
    pred = _encode_dc(w, coef_q[0], pred, dc_tbl)
    _encode_ac_band(w, coef_q, ac_tbl, 1, 63)
    return pred


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
) -> bytes:
    """Baseline sequential JPEG encoder: grayscale (``channels=1``)
    or RGB (``channels=3``, encoded as YCbCr). ``subsampling``:
    ``'444'`` (no chroma subsampling, geometry survives exactly),
    ``'420'`` (2x2 luma sampling, box-averaged chroma — the common
    camera shape, and the fixture that exercises the decoder's
    interleaved multi-block MCU path) or ``'422'`` (horizontal-only
    chroma halving, the broadcast/video shape). Tables default to the Annex-K
    interchange set; fixtures pass :data:`QUANT_FLAT8` for the
    flat-block exactness contract. ``restart_interval`` > 0 emits a
    DRI segment and an RSTn marker every that-many MCUs (the
    error-resilience feature real camera streams use — and the fixture
    that exercises the decoder's restart/resync path).
    ``progressive=True`` (or ``"ss"``) writes a spectral-selection
    progressive stream (SOF2: one DC scan, then a 1..63 AC band scan
    per component, all with Ah=Al=0 — the fixture for the progressive
    decode path); ``progressive="sa"`` writes a full
    successive-approximation ladder (the libjpeg-style script: DC
    first at Al=1, banded AC first scans at Al=1..2, then refinement
    scans down to Al=0 — lossless vs the sequential coefficients, so
    decode output is bit-identical to the ``progressive=False``
    stream's). Both require 4:4:4 / grayscale and no restart markers.
    Raises ``ValueError`` on geometry / channel mismatches
    (same guard style as ``png_codec.encode_png``).
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12 and progressive:
        raise ValueError("12-bit writer is sequential only")
    if progressive not in (False, True, "ss", "sa"):
        raise ValueError("progressive must be False, True, 'ss' or 'sa'")
    if progressive and (subsampling != "444" or restart_interval):
        raise ValueError(
            "progressive writer supports 4:4:4/grayscale, no restarts"
        )
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError("restart_interval must be in [0, 65535]")
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer holds {len(pixels)} bytes; expected "
            f"{width * height * channels}"
        )
    if subsampling not in ("444", "420", "422"):
        raise ValueError("subsampling must be '444', '420' or '422'")
    ql = list(quant_luma or QUANT_LUMA)
    qc = list(quant_chroma or quant_luma or QUANT_CHROMA)
    if len(ql) != 64 or len(qc) != 64 or min(ql) < 1 or min(qc) < 1:
        raise ValueError("quant tables must hold 64 entries >= 1")

    # component planes (level-unshifted 0..255) at full resolution
    if channels == 1:
        full = [list(pixels)]
        samp = [(1, 1)]
        qtabs = [ql]
        qids = [0]
    else:
        n = width * height
        yv = [0] * n
        cb = [0] * n
        cr = [0] * n
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv[i] = min(255, max(0, int(round(0.299 * r + 0.587 * g + 0.114 * b))))
            cb[i] = min(255, max(0, int(round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))))
            cr[i] = min(255, max(0, int(round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))))
        full = [yv, cb, cr]
        samp = {
            "444": [(1, 1), (1, 1), (1, 1)],
            "420": [(2, 2), (1, 1), (1, 1)],
            "422": [(2, 1), (1, 1), (1, 1)],
        }[subsampling]
        qtabs = [ql, qc, qc]
        qids = [0, 1, 1]

    if precision == 12:
        # input stays 8-bit; coded samples are <<4 so a decode at the
        # pipeline's 8-bit output depth (>>4) returns them exactly
        full = [[v << 4 for v in plane] for plane in full]

    hmax = max(h for h, _v in samp)
    vmax = max(v for _h, v in samp)

    # per-component planes at their coded (possibly subsampled)
    # resolution; chroma downsampling is a box average with edge clamp
    planes = []
    for ci, (h, v) in enumerate(samp):
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        if (h, v) == (hmax, vmax):
            planes.append((full[ci], width, height, cw, ch))
            continue
        fx, fy = hmax // h, vmax // v
        src = full[ci]
        plane = [0] * (cw * ch)
        for y in range(ch):
            for x in range(cw):
                acc = cnt = 0
                for dy in range(fy):
                    sy = min(height - 1, y * fy + dy)
                    for dx in range(fx):
                        sx = min(width - 1, x * fx + dx)
                        acc += src[sy * width + sx]
                        cnt += 1
                plane[y * cw + x] = (acc + cnt // 2) // cnt
        planes.append((plane, cw, ch, cw, ch))

    # header segments
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0, no density
    if precision == 12:  # Pq=1: 16-bit table entries
        dqt = bytes([0x10]) + b"".join(
            struct.pack(">H", ql[ZIGZAG[z]]) for z in range(64)
        )
        if channels == 3:
            dqt += bytes([0x11]) + b"".join(
                struct.pack(">H", qc[ZIGZAG[z]]) for z in range(64)
            )
    else:
        dqt = bytes([0x00]) + bytes(ql[ZIGZAG[z]] for z in range(64))
        if channels == 3:
            dqt += bytes([0x01]) + bytes(qc[ZIGZAG[z]] for z in range(64))
    out += _seg(DQT, dqt)
    sof = struct.pack(">BHHB", precision, height, width, channels)
    for cid in range(channels):
        h, v = samp[cid]
        sof += bytes([cid + 1, (h << 4) | v, qids[cid]])
    out += _seg(
        0xC2 if progressive else (0xC1 if precision == 12 else 0xC0), sof
    )
    dht = b""
    dc_pair = _DC_WIDE if precision == 12 else _DC_LUMA
    ac_pair = _AC_WIDE if precision == 12 else _AC_LUMA
    dc_pair_c = _DC_WIDE if precision == 12 else _DC_CHROMA
    ac_pair_c = _AC_WIDE if precision == 12 else _AC_CHROMA
    tables = [(0x00, dc_pair), (0x10, ac_pair)]
    if channels == 3:
        tables += [(0x01, dc_pair_c), (0x11, ac_pair_c)]
    if progressive == "sa":
        tables += [(0x12, _AC_REFINE)]
    for tid, (bits, vals) in tables:
        dht += bytes([tid] + bits) + bytes(vals)
    out += _seg(DHT, dht)
    if restart_interval:
        out += _seg(DRI, struct.pack(">H", restart_interval))

    enc_dc = [_encode_codes(*dc_pair)]
    enc_ac = [_encode_codes(*ac_pair)]
    if channels == 3:
        enc_dc += [_encode_codes(*dc_pair_c)] * 2
        enc_ac += [_encode_codes(*ac_pair_c)] * 2

    if progressive:
        # hmax == vmax == 1, so the block grid is bw x bh per comp
        bw = (width + 7) // 8
        bh = (height + 7) // 8
        blocks: list[list[list[int]]] = []
        for ci in range(channels):
            plane, pw, ph, _cw, _ch = planes[ci]
            q = qtabs[ci]
            comp_blocks = []
            for byy in range(bh):
                for bxx in range(bw):
                    block = [0] * 64
                    for r8 in range(8):
                        sy = min(ph - 1, byy * 8 + r8)
                        for c8 in range(8):
                            sx = min(pw - 1, bxx * 8 + c8)
                            block[r8 * 8 + c8] = plane[sy * pw + sx]
                    coefs = _fdct_block(block)
                    comp_blocks.append([
                        int(round(coefs[i] / q[i])) if coefs[i] else 0
                        for i in range(64)
                    ])
            blocks.append(comp_blocks)
        nb = bw * bh

        def dc_sos(ah: int, al: int) -> bytes:
            # interleaved when channels == 3; with 1x1 sampling the
            # MCU walk IS the block walk
            sos = bytes([channels])
            for cid in range(channels):
                sos += bytes([cid + 1, (0x00 if cid == 0 else 0x01) << 4])
            return _seg(SOS, sos + bytes([0, 0, (ah << 4) | al]))

        def ac_sos(ci: int, ss_: int, se_: int, ah: int, al: int,
                   ta: int | None = None) -> bytes:
            if ta is None:
                ta = 0x00 if ci == 0 else 0x01
            sos = bytes([1, ci + 1, ta])
            return _seg(SOS, sos + bytes([ss_, se_, (ah << 4) | al]))

        if progressive == "sa":
            # successive-approximation ladder (libjpeg-style script):
            # every coefficient bit is eventually transmitted, so the
            # decode is identical to the sequential stream's
            enc_ref = _encode_codes(*_AC_REFINE)
            # scan 1: DC first, Al=1 (diffs of the point-transformed DC)
            out += dc_sos(0, 1)
            w = _BitWriter()
            pred = [0] * channels
            for bi in range(nb):
                for ci in range(channels):
                    pred[ci] = _encode_dc(
                        w, blocks[ci][bi][0] >> 1, pred[ci], enc_dc[ci]
                    )
            w.flush()
            out += w.out
            # AC first scans: banded luma at Al=2, full-band chroma Al=1
            first = [(0, 1, 5, 2)]
            if channels == 3:
                first += [(1, 1, 63, 1), (2, 1, 63, 1)]
            first += [(0, 6, 63, 2)]
            for ci, lo, hi, al in first:
                out += ac_sos(ci, lo, hi, 0, al)
                w = _BitWriter()
                for bi in range(nb):
                    _encode_ac_band(w, blocks[ci][bi], enc_ac[ci], lo, hi, al)
                w.flush()
                out += w.out
            # AC refinement: luma 2->1, then DC refinement to Al=0,
            # then every component's AC down to Al=0
            refine = [(0, 1, 63, 2, 1)]
            tail = [(1, 1, 63, 1, 0), (2, 1, 63, 1, 0)] if channels == 3 else []
            tail += [(0, 1, 63, 1, 0)]
            for ci, lo, hi, ah, al in refine:
                out += ac_sos(ci, lo, hi, ah, al, ta=0x02)
                w = _BitWriter()
                _encode_ac_refine_scan(
                    w, blocks[ci], enc_ref, lo, hi, al
                )
                w.flush()
                out += w.out
            out += dc_sos(1, 0)
            w = _BitWriter()
            for bi in range(nb):
                for ci in range(channels):
                    w.put(blocks[ci][bi][0] & 1, 1)
            w.flush()
            out += w.out
            for ci, lo, hi, ah, al in tail:
                out += ac_sos(ci, lo, hi, ah, al, ta=0x02)
                w = _BitWriter()
                _encode_ac_refine_scan(
                    w, blocks[ci], enc_ref, lo, hi, al
                )
                w.flush()
                out += w.out
            out += b"\xff\xd9"  # EOI
            return bytes(out)

        # spectral selection: scan 1 is DC at full precision
        out += dc_sos(0, 0)
        w = _BitWriter()
        pred = [0] * channels
        for bi in range(nb):
            for ci in range(channels):
                pred[ci] = _encode_dc(
                    w, blocks[ci][bi][0], pred[ci], enc_dc[ci]
                )
        w.flush()
        out += w.out
        # scans 2..: one AC band scan per component
        for ci in range(channels):
            out += ac_sos(ci, 1, 63, 0, 0)
            w = _BitWriter()
            for bi in range(nb):
                _encode_ac_band(w, blocks[ci][bi], enc_ac[ci], 1, 63)
            w.flush()
            out += w.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([channels])
    for cid in range(channels):
        sos += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += _seg(SOS, sos)

    w = _BitWriter()
    pred = [0] * channels
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align with 1-fill, emit RSTn (n cycles 0..7),
                # reset every DC predictor (T.81 F.1.2.3 / E.1.4)
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * channels
            mcu_count += 1
            for ci in range(channels):
                h, v = samp[ci]
                plane, pw, ph, _cw, _ch = planes[ci]
                q = qtabs[ci]
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        if y0 + 8 <= ph and x0 + 8 <= pw:
                            # interior block (the common case): 8 row
                            # slices instead of 64 clamped indexings
                            block = []
                            for r8 in range(8):
                                o = (y0 + r8) * pw + x0
                                block.extend(plane[o : o + 8])
                        else:  # edge block: replicate the last row/col
                            block = [0] * 64
                            for r8 in range(8):
                                sy = min(ph - 1, y0 + r8)
                                for c8 in range(8):
                                    sx = min(pw - 1, x0 + c8)
                                    block[r8 * 8 + c8] = plane[sy * pw + sx]
                        coef = _fdct_block(
                            block, 2048 if precision == 12 else 128
                        )
                        coef_q = [
                            int(round(coef[i] / q[i])) if coef[i] else 0
                            for i in range(64)
                        ]
                        pred[ci] = _encode_plane_block(
                            w, coef_q, pred[ci], enc_dc[ci], enc_ac[ci]
                        )
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
