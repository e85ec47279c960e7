"""Pure-stdlib GIF codec (r9).

GIF (87a/89a) is the last big scraped-web raster format without an
in-container decoder: LZW entropy coding over palette indices, an
optional 4-pass interlace, and an animation model of sub-rectangle
frames composited onto a logical screen with per-frame disposal
(GIF89a spec, CompuServe 1990; public). Everything here is ``struct``
+ pure-Python LZW — no codec libraries — mirroring the doctrine of
:mod:`.png_codec` / :mod:`.jpeg_codec`:

- corrupt structure or entropy data raises :class:`GIFError`
  (``ValueError``) — callers fall through, never hang;
- forms we refuse on principle (over-budget canvases / animations —
  the decompression-bomb guard) raise :class:`UnsupportedGIF`
  (``NotImplementedError``), and :func:`probe_gif` mirrors the gate
  so ``decode_status`` stays honest. GIF has no other gated forms:
  every legal stream decodes.

Decode surface:

- :func:`decode_gif` — first frame composited on the logical screen,
  returned as a :class:`png_codec.DecodedImage` (3-channel RGB when
  fully opaque, 4-channel RGBA when any pixel stays transparent);
- :func:`decode_gif_frames_at` — the animation walk: every frame is
  LZW-decoded and composited (frames are delta-coded sub-rectangles,
  so unlike AVI a stride-s sampler still pays the full decode), with
  disposal methods 0/1 (leave), 2 (restore background = transparent)
  and 3 (restore previous) honored; every ``stride``-th canvas is
  yielded as RGBA.

Encode surface (for round-trip tests and deterministic gate
fixtures): :func:`encode_gif` (one full-canvas frame from 1/3/4
channel samples, palette-built, ≤256 distinct colors) and
:func:`encode_gif_indexed` (multi-frame, sub-rectangles, disposal,
transparency, interlace — index-level, the test harness for the
compositor).

Runs inside the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``; driver-free pure Python over ``bytes``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .png_codec import DecodedImage

#: canvas pixel budget (width*height) — decompression-bomb guard,
#: same doctrine as jpeg_codec.MAX_PIXELS / bmp_codec.MAX_PIXELS
MAX_PIXELS = 1 << 25
#: frame-count budget, same doctrine as avi_codec.MAX_FRAMES
MAX_FRAMES = 1 << 14
#: sum of frame-rectangle pixels across the whole animation — a tiny
#: file can declare thousands of full-canvas frames; LZW decode cost
#: is proportional to this sum, so it is the budget that matters
MAX_TOTAL_PIXELS = 1 << 27

GIF87A = b"GIF87a"
GIF89A = b"GIF89a"


class GIFError(ValueError):
    """Structurally or entropy-level corrupt GIF stream."""


class UnsupportedGIF(NotImplementedError):
    """Legal GIF form this codec refuses (over-budget canvas or
    animation); callers fall through to their documented stub/fake
    path instead of failing the job."""


def is_gif(payload: bytes | None) -> bool:
    return payload is not None and payload[:6] in (GIF87A, GIF89A)


@dataclass
class GIFInfo:
    width: int
    height: int
    n_frames: int
    version: str  # "87a" | "89a"


@dataclass
class _Frame:
    left: int
    top: int
    width: int
    height: int
    interlace: bool
    palette: bytes  # effective color table (local wins), RGB triples
    transparent: int | None
    disposal: int
    min_code_size: int
    data: bytes  # concatenated LZW sub-blocks


def _subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Collect a GIF sub-block chain; returns (payload, pos-past-terminator)."""
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise GIFError("truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise GIFError("truncated sub-block")
        out += buf[pos : pos + n]
        pos += n


def _parse(
    payload: bytes,
    max_pixels: int,
    max_frames: int,
    max_total_pixels: int,
) -> tuple[GIFInfo, list[_Frame]]:
    if len(payload) < 13:
        raise GIFError("truncated header")
    if payload[:6] not in (GIF87A, GIF89A):
        raise GIFError("not a GIF signature")
    version = payload[3:6].decode("ascii")
    width, height = struct.unpack_from("<HH", payload, 6)
    if width == 0 or height == 0:
        raise GIFError("zero-sized logical screen")
    if width * height > max_pixels:
        raise UnsupportedGIF(
            f"canvas {width}x{height} over the {max_pixels}-pixel budget"
        )
    packed = payload[10]
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        if pos + 3 * n > len(payload):
            raise GIFError("truncated global color table")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n

    frames: list[_Frame] = []
    gce_transparent: int | None = None
    gce_disposal = 0
    total_px = 0
    while True:
        if pos >= len(payload):
            raise GIFError("missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise GIFError("truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) != 4:
                    raise GIFError("graphic control block must be 4 bytes")
                flags = data[0]
                gce_disposal = (flags >> 2) & 0x07
                gce_transparent = data[3] if flags & 0x01 else None
            # 0xFE comment / 0x01 plain text / 0xFF application: skipped
            continue
        if block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise GIFError("truncated image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            if fw == 0 or fh == 0:
                raise GIFError("zero-sized frame")
            if left + fw > width or top + fh > height:
                raise GIFError("frame rectangle exceeds the logical screen")
            lct: bytes | None = None
            if ipacked & 0x80:
                n = 2 ** ((ipacked & 0x07) + 1)
                if pos + 3 * n > len(payload):
                    raise GIFError("truncated local color table")
                lct = payload[pos : pos + 3 * n]
                pos += 3 * n
            palette = lct if lct is not None else gct
            if palette is None:
                raise GIFError("frame has neither local nor global color table")
            if pos >= len(payload):
                raise GIFError("missing LZW minimum code size")
            mcs = payload[pos]
            pos += 1
            # palette ≤ 256 → legal encoders emit 2..8; anything that
            # would push the first code width past 12 bits is garbage
            if not 2 <= mcs <= 11:
                raise GIFError(f"bad LZW minimum code size {mcs}")
            data, pos = _subblocks(payload, pos)
            total_px += fw * fh
            if total_px > max_total_pixels:
                raise UnsupportedGIF(
                    f"animation over the {max_total_pixels}-pixel total budget"
                )
            if len(frames) >= max_frames:
                raise UnsupportedGIF(f"more than {max_frames} frames")
            frames.append(
                _Frame(
                    left, top, fw, fh,
                    bool(ipacked & 0x40),
                    palette, gce_transparent, gce_disposal, mcs, data,
                )
            )
            gce_transparent = None
            gce_disposal = 0
            continue
        raise GIFError(f"unknown block introducer 0x{block:02x}")
    if not frames:
        raise GIFError("no image data before trailer")
    return GIFInfo(width, height, len(frames), version), frames


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF-flavor LZW: LSB-first codes, growing width capped at 12
    bits, clear/end codes, deferred-clear tolerated (table freezes at
    4096 until the next clear). Stops once ``expected`` indices are
    out (the end code is optional in the wild)."""
    clear = 1 << min_code_size
    end = clear + 1
    literals = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    code_size = min_code_size + 1
    prev: bytes | None = None

    def _reset() -> None:
        nonlocal table, code_size, prev
        table = literals + [b"", b""]
        code_size = min_code_size + 1
        prev = None

    _reset()
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    while len(out) < expected:
        if bitpos + code_size > nbits:
            raise GIFError("LZW stream truncated")
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            _reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise GIFError("first LZW code after clear is not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise GIFError("LZW code out of range")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise GIFError("LZW output shorter than the frame raster")
    return bytes(out[:expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(height: int) -> list[int]:
    return [
        r for start, step in _INTERLACE_PASSES for r in range(start, height, step)
    ]


def _deinterlace(indices: bytes, fw: int, fh: int) -> bytes:
    out = bytearray(len(indices))
    for src, dst in enumerate(_interlace_rows(fh)):
        out[dst * fw : (dst + 1) * fw] = indices[src * fw : (src + 1) * fw]
    return bytes(out)


def _frame_indices(f: _Frame) -> bytes:
    idx = _lzw_decode(f.min_code_size, f.data, f.width * f.height)
    if f.interlace:
        idx = _deinterlace(idx, f.width, f.height)
    return idx


def _paint(canvas: bytearray, cw: int, f: _Frame, idx: bytes) -> None:
    """Composite one frame's indices onto the RGBA canvas in place."""
    npal = len(f.palette) // 3
    pal_rgba = [f.palette[3 * v : 3 * v + 3] + b"\xff" for v in range(npal)]
    try:
        if f.transparent is None:
            for row in range(f.height):
                base = row * f.width
                o = ((f.top + row) * cw + f.left) * 4
                canvas[o : o + 4 * f.width] = b"".join(
                    pal_rgba[v] for v in idx[base : base + f.width]
                )
        else:
            tr = f.transparent
            for row in range(f.height):
                base = row * f.width
                o0 = ((f.top + row) * cw + f.left) * 4
                for col in range(f.width):
                    v = idx[base + col]
                    if v == tr:
                        continue
                    o = o0 + 4 * col
                    canvas[o : o + 4] = pal_rgba[v]
    except IndexError:
        raise GIFError("palette index out of range") from None


def decode_gif_frames_at(
    payload: bytes,
    stride: int = 1,
    *,
    max_pixels: int = MAX_PIXELS,
    max_frames: int = MAX_FRAMES,
    max_total_pixels: int = MAX_TOTAL_PIXELS,
) -> tuple[GIFInfo, list[tuple[int, DecodedImage]]]:
    """Decode every ``stride``-th composited frame of an animation.

    Every frame's LZW data is decoded and composited regardless of
    stride — GIF frames are delta-coded sub-rectangles, so skipping
    the pixel work for unsampled frames would corrupt later canvases
    (unlike AVI, where frames are independent and
    ``decode_avi_frames_at`` really does skip). Canvases come back
    4-channel RGBA (alpha 0 where nothing was ever painted or
    disposal 2 cleared)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    info, frames = _parse(payload, max_pixels, max_frames, max_total_pixels)
    cw, ch = info.width, info.height
    canvas = bytearray(cw * ch * 4)  # transparent black
    picked: list[tuple[int, DecodedImage]] = []
    for i, f in enumerate(frames):
        saved = bytes(canvas) if f.disposal == 3 else None
        _paint(canvas, cw, f, _frame_indices(f))
        if i % stride == 0:
            picked.append((i, DecodedImage(cw, ch, 4, bytes(canvas))))
        if f.disposal == 2:  # restore background = clear the rect
            zero = b"\x00" * (4 * f.width)
            for row in range(f.height):
                o = ((f.top + row) * cw + f.left) * 4
                canvas[o : o + 4 * f.width] = zero
        elif f.disposal == 3 and saved is not None:
            canvas[:] = saved
    return info, picked


def decode_gif(
    payload: bytes,
    *,
    max_pixels: int = MAX_PIXELS,
    max_frames: int = MAX_FRAMES,
    max_total_pixels: int = MAX_TOTAL_PIXELS,
) -> DecodedImage:
    """First frame composited on the logical screen. 3-channel RGB
    when every canvas pixel was painted; 4-channel RGBA when any
    stayed transparent. Only frame 0's entropy data is decoded."""
    info, frames = _parse(payload, max_pixels, max_frames, max_total_pixels)
    cw, ch = info.width, info.height
    canvas = bytearray(cw * ch * 4)
    f = frames[0]
    _paint(canvas, cw, f, _frame_indices(f))
    if 0 in canvas[3::4]:
        return DecodedImage(cw, ch, 4, bytes(canvas))
    rgb = bytearray(canvas)
    del rgb[3::4]
    return DecodedImage(cw, ch, 3, bytes(rgb))


def probe_gif(payload: bytes | None, max_pixels: int = MAX_PIXELS) -> bool:
    """Structural probe mirroring :func:`decode_gif`'s gate: True iff
    the container parses and fits the budgets. Entropy-level (LZW)
    corruption is not probed — decode raises :class:`GIFError` for
    those, and callers' fall-through doctrine covers it (same contract
    as ``probe_jpeg``)."""
    if not is_gif(payload):
        return False
    try:
        _parse(bytes(payload), max_pixels, MAX_FRAMES, MAX_TOTAL_PIXELS)
    except (GIFError, UnsupportedGIF):
        return False
    return True


# ----------------------------------------------------------------- encode


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Mirror of :func:`_lzw_decode`: LSB-first growing-width codes;
    emits a clear code up front and resets when the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    table: dict[bytes, int] = {}
    code_size = min_code_size + 1
    next_code = end + 1

    def _emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def _reset() -> None:
        nonlocal table, code_size, next_code
        table = {bytes([i]): i for i in range(clear)}
        code_size = min_code_size + 1
        next_code = end + 1

    _reset()
    _emit(clear)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        _emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the decoder widens after its table reaches 1<<code_size
            # entries, which happens one code LATER than the naive
            # mirror — widen when the entry just added is the last
            # that fits, so the NEXT emission uses the wider code
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            _emit(clear)
            _reset()
        w = bytes([k])
    if w:
        _emit(table[w])
    _emit(end)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _pack_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_indexed(
    width: int,
    height: int,
    palette: bytes,
    frames: list[dict],
    *,
    version: bytes = GIF89A,
) -> bytes:
    """Index-level encoder (the compositor's test harness and the
    fixture builder for gates). ``palette`` is RGB triples (≤256);
    each frame dict: ``indices`` (row-major bytes, required) plus
    optional ``left/top/width/height`` (default full canvas),
    ``disposal`` (0), ``transparent`` (None), ``interlace`` (False),
    ``lct`` (local color table bytes, default: use the global)."""
    npal = len(palette) // 3
    if len(palette) % 3 or not 1 <= npal <= 256:
        raise GIFError("palette must be 1..256 RGB triples")
    if not frames:
        raise GIFError("at least one frame required")

    def _table(pal: bytes) -> tuple[bytes, int]:
        n = len(pal) // 3
        bits = max(1, (n - 1).bit_length())
        padded = pal + b"\x00" * (3 * ((1 << bits) - n))
        return padded, bits

    gct, gbits = _table(palette)
    out = bytearray()
    out += version
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | ((gbits - 1) & 0x07), 0, 0])  # GCT flag+size, bg, aspect
    out += gct

    for f in frames:
        left = f.get("left", 0)
        top = f.get("top", 0)
        fw = f.get("width", width)
        fh = f.get("height", height)
        indices: bytes = f["indices"]
        if len(indices) != fw * fh:
            raise GIFError("frame indices do not match its rectangle")
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        interlace = bool(f.get("interlace", False))
        lct = f.get("lct")
        if disposal or transparent is not None:
            flags = ((disposal & 0x07) << 2) | (1 if transparent is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
        ipacked = 0x40 if interlace else 0
        table_bits = None
        if lct is not None:
            ltab, lbits = _table(lct)
            ipacked |= 0x80 | ((lbits - 1) & 0x07)
            table_bits = lbits
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([ipacked])
        if lct is not None:
            out += ltab
        if interlace:
            reordered = bytearray()
            for r in _interlace_rows(fh):
                reordered += indices[r * fw : (r + 1) * fw]
            indices = bytes(reordered)
        mcs = max(2, table_bits if table_bits is not None else gbits)
        out += bytes([mcs])
        out += _pack_subblocks(_lzw_encode(mcs, indices))
    out.append(0x3B)
    return bytes(out)


def encode_gif(
    pixels: bytes, width: int, height: int, channels: int
) -> bytes:
    """One full-canvas frame from raw samples. channels: 1 (gray),
    3 (RGB), or 4 (RGBA with binary alpha — alpha<128 pixels become a
    transparent index). Distinct colors must fit a 256-entry palette
    (255 with transparency) or :class:`GIFError` is raised — GIF is a
    palette format; quantization is the caller's business."""
    if channels not in (1, 3, 4):
        raise GIFError("channels must be 1, 3 or 4")
    if len(pixels) != width * height * channels:
        raise GIFError("pixel buffer does not match dimensions")
    colors: dict[bytes, int] = {}
    idx = bytearray(width * height)
    has_transparent = False
    for p in range(width * height):
        px = pixels[p * channels : (p + 1) * channels]
        if channels == 1:
            rgb = px * 3
        elif channels == 3:
            rgb = px
        else:
            if px[3] < 128:
                has_transparent = True
                idx[p] = 0xFF  # placeholder, patched below
                continue
            rgb = px[:3]
        code = colors.setdefault(bytes(rgb), len(colors))
        if code > 255:
            raise GIFError(f"{len(colors)} distinct colors exceed a GIF palette")
        idx[p] = code
    if has_transparent and len(colors) > 255:
        raise GIFError(
            f"{len(colors)} distinct colors leave no palette slot for transparency"
        )
    transparent = None
    if has_transparent:
        transparent = len(colors)
        for p in range(width * height):
            if idx[p] == 0xFF and (
                channels == 4 and pixels[p * 4 + 3] < 128
            ):
                idx[p] = transparent
    palette = b"".join(sorted(colors, key=colors.get))
    if has_transparent:
        palette += b"\x00\x00\x00"
    return encode_gif_indexed(
        width,
        height,
        palette,
        [{"indices": bytes(idx), "transparent": transparent}],
    )
