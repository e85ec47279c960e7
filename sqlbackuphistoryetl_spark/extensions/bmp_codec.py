"""Pure-stdlib BMP (Windows DIB file) codec (r9).

BMP is the file form of the same DIB pixel structure the AVI codec
already decodes for video frames (bottom-up, BGR(X), 4-byte-aligned
rows, optional RGBQUAD palette), so a standalone ``.bmp`` needs
nothing beyond ``struct``: a 14-byte BITMAPFILEHEADER, a
BITMAPINFOHEADER (or any of its later supersets — V4/V5 headers are
read as their leading 40 bytes), an optional palette, and the pixel
array at ``bfOffBits``. Decoded forms: BI_RGB 8-bit palettized /
24-bit / 32-bit (top-down and bottom-up) and BI_RLE8 run-length
palettized. The ancient BITMAPCOREHEADER, 1/2/4/16-bit depths,
BI_RLE4 and BI_BITFIELDS raise :class:`UnsupportedBMP` and fall back
to the documented stub gate like the other codecs' gated forms.

:func:`decode_dib_rows` is the shared raster walk — ``avi_codec``
routes its uncompressed frame chunks through it, so the BGR swap,
row alignment, palette lookup and bottom-up flip have exactly one
implementation.

Everything is driver-free pure Python over ``bytes``; it runs inside
the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``.
"""

from __future__ import annotations

import struct

from .png_codec import DecodedImage

#: decoded-pixel budget (width*height) — the decompression-bomb guard,
#: same doctrine as jpeg_codec.MAX_PIXELS
MAX_PIXELS = 1 << 25

BI_RGB = 0
BI_RLE8 = 1
BI_RLE4 = 2
BI_BITFIELDS = 3


class BMPError(ValueError):
    """Malformed BMP payload."""


class UnsupportedBMP(NotImplementedError):
    """Valid BMP, but a form this codec doesn't implement (core
    header, 1/2/4/16-bit depths, RLE4, bitfields). Callers treat it
    like the stub gate."""


def is_bmp(payload: bytes | None) -> bool:
    return payload is not None and len(payload) >= 54 and payload[:2] == b"BM"


def decode_dib_rows(
    data: bytes,
    width: int,
    height: int,
    bit_count: int,
    top_down: bool,
    palette: bytes | None,
    errcls: type[ValueError] = BMPError,
) -> bytes:
    """Shared DIB raster decode: 8-bit palettized / 24-bit BGR /
    32-bit BGRX rows (4-byte aligned, bottom-up unless ``top_down``)
    to top-down RGB samples. Raises ``errcls`` on short data or an
    out-of-range palette index, so each container reports its own
    error type."""
    px_bytes = bit_count // 8
    stride = ((width * px_bytes + 3) // 4) * 4
    if len(data) < stride * height:
        raise errcls(
            f"pixel data holds {len(data)} bytes; needs {stride * height}"
        )
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else (height - 1 - row)
        s = src_row * stride
        d = row * width * 3
        if px_bytes == 1:  # palettized: index -> RGBQUAD (B,G,R,x)
            for x in range(width):
                p = 4 * data[s + x]
                if p + 3 > len(palette or b""):
                    raise errcls("palette index out of range")
                out[d + 3 * x] = palette[p + 2]
                out[d + 3 * x + 1] = palette[p + 1]
                out[d + 3 * x + 2] = palette[p]
        else:  # 24-bit BGR / 32-bit BGRX (the pad byte is skipped)
            for x in range(width):
                o = s + px_bytes * x
                out[d + 3 * x] = data[o + 2]
                out[d + 3 * x + 1] = data[o + 1]
                out[d + 3 * x + 2] = data[o]
    return bytes(out)


def _parse(payload: bytes, max_pixels: int):
    """Header walk shared by probe and decode. Returns
    (width, height, bit_count, compression, top_down, palette,
    data_offset)."""
    if not is_bmp(payload):
        raise BMPError("not a BMP (missing BM signature)")
    magic, _fsize, _r1, _r2, off_bits = struct.unpack(
        "<2sIHHI", payload[:14]
    )
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size == 12:
        raise UnsupportedBMP("BITMAPCOREHEADER (OS/2 1.x)")
    if hdr_size < 40:
        raise BMPError(f"invalid DIB header size {hdr_size}")
    if len(payload) < 14 + hdr_size:
        raise BMPError("truncated DIB header")
    (
        _hs,
        width,
        height,
        planes,
        bit_count,
        compression,
        _size_img,
        _xp,
        _yp,
        clr_used,
        _clr_imp,
    ) = struct.unpack("<IiiHHIIiiII", payload[14:54])
    if planes != 1 or width <= 0 or height == 0:
        raise BMPError("invalid BITMAPINFOHEADER geometry")
    top_down = height < 0
    height = abs(height)
    if width * height > max_pixels:
        raise UnsupportedBMP(
            f"{width}x{height} exceeds the {max_pixels}-pixel budget"
        )
    if compression == BI_RLE8:
        if bit_count != 8:
            raise BMPError("BI_RLE8 requires an 8-bit DIB")
        if top_down:
            raise BMPError("RLE bitmaps cannot be top-down")
    elif compression != BI_RGB:
        kind = {BI_RLE4: "BI_RLE4", BI_BITFIELDS: "BI_BITFIELDS"}.get(
            compression, f"compression {compression}"
        )
        raise UnsupportedBMP(kind)
    palette: bytes | None = None
    if bit_count == 8:
        n_pal = clr_used or 256
        if n_pal > 256:
            raise BMPError("8-bit DIB declares more than 256 colors")
        pal_start = 14 + hdr_size
        if len(payload) < pal_start + 4 * n_pal:
            raise BMPError("palettized BMP without a full palette")
        palette = payload[pal_start : pal_start + 4 * n_pal]
    elif bit_count not in (24, 32):
        raise UnsupportedBMP(f"{bit_count}-bit DIB (8/24/32 decode)")
    if off_bits < 14 + hdr_size or off_bits > len(payload):
        raise BMPError("pixel data offset out of range")
    return width, height, bit_count, compression, top_down, palette, off_bits


def _decode_rle8(
    data: bytes, width: int, height: int
) -> bytes:
    """BI_RLE8 to unpadded bottom-up index rows (width bytes each).
    Escapes: 00 00 = end of line, 00 01 = end of bitmap, 00 02 dx dy =
    delta (skipped pixels keep index 0), 00 n>=3 = absolute run padded
    to a word boundary."""
    rows = bytearray(width * height)  # bottom-up logical canvas
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= height or x + cnt > width:
                raise BMPError("RLE run overflows the row")
            base = y * width + x
            rows[base : base + cnt] = bytes([val]) * cnt
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return bytes(rows)
        elif val == 2:  # delta
            if i + 2 > n:
                raise BMPError("truncated RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise BMPError("RLE delta out of bounds")
        else:  # absolute mode: val literal indexes, word-padded
            if y >= height or x + val > width:
                raise BMPError("RLE absolute run overflows the row")
            if i + val > n:
                raise BMPError("truncated RLE absolute run")
            base = y * width + x
            rows[base : base + val] = data[i : i + val]
            x += val
            i += val + (val & 1)
    raise BMPError("RLE stream missing end-of-bitmap")


def probe_bmp(payload: bytes | None, max_pixels: int = MAX_PIXELS) -> bool:
    """True iff :func:`decode_bmp` implements this payload's FORM
    (header walk only — a True probe can still fail decode on a
    corrupt pixel array)."""
    if not is_bmp(payload):
        return False
    try:
        _parse(payload, max_pixels)
    except (BMPError, UnsupportedBMP, struct.error):
        return False
    return True


def decode_bmp(
    payload: bytes, max_pixels: int = MAX_PIXELS
) -> DecodedImage:
    """Decode a BI_RGB 8/24/32-bit or BI_RLE8 BMP to top-down RGB."""
    width, height, bit_count, compression, top_down, palette, off = _parse(
        payload, max_pixels
    )
    data = payload[off:]
    if compression == BI_RLE8:
        idx = _decode_rle8(data, width, height)
        out = bytearray(width * height * 3)
        for row in range(height):
            s = (height - 1 - row) * width  # RLE canvases are bottom-up
            d = row * width * 3
            for xx in range(width):
                p = 4 * idx[s + xx]
                if p + 3 > len(palette):
                    raise BMPError("palette index out of range")
                out[d + 3 * xx] = palette[p + 2]
                out[d + 3 * xx + 1] = palette[p + 1]
                out[d + 3 * xx + 2] = palette[p]
        return DecodedImage(width, height, 3, bytes(out))
    rgb = decode_dib_rows(
        data, width, height, bit_count, top_down, palette
    )
    return DecodedImage(width, height, 3, rgb)


def encode_bmp(
    pixels: bytes, width: int, height: int, bit_count: int = 24
) -> bytes:
    """Minimal BMP writer for fixtures: top-down RGB samples in,
    bottom-up BI_RGB out. ``bit_count`` 24 or 32 writes truecolor
    rows; 8 builds a deterministic palette from the sorted unique
    colors (<= 256 or ``ValueError``). Exact decode inverse."""
    if bit_count not in (8, 24, 32):
        raise ValueError("bit_count must be 8, 24 or 32")
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match width*height*3")
    palette_blob = b""
    if bit_count == 8:
        colors = sorted(
            {tuple(pixels[i : i + 3]) for i in range(0, len(pixels), 3)}
        )
        if len(colors) > 256:
            raise ValueError(
                f"8-bit BMP needs <= 256 distinct colors, got {len(colors)}"
            )
        index = {c: i for i, c in enumerate(colors)}
        palette_blob = b"".join(
            bytes((b, g, r, 0)) for (r, g, b) in colors
        )
    px_bytes = bit_count // 8
    stride = ((width * px_bytes + 3) // 4) * 4
    rows = []
    for row in range(height - 1, -1, -1):  # bottom-up
        base = row * width * 3
        if bit_count == 8:
            line = bytes(
                index[tuple(pixels[base + 3 * x : base + 3 * x + 3])]
                for x in range(width)
            )
        else:
            line = b"".join(
                bytes(
                    (
                        pixels[base + 3 * x + 2],
                        pixels[base + 3 * x + 1],
                        pixels[base + 3 * x],
                    )
                )
                + b"\x00" * (px_bytes - 3)
                for x in range(width)
            )
        rows.append(line + b"\x00" * (stride - len(line)))
    raster = b"".join(rows)
    off = 14 + 40 + len(palette_blob)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bit_count, BI_RGB, len(raster), 0, 0,
        len(palette_blob) // 4, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    return head + info + palette_blob + raster
