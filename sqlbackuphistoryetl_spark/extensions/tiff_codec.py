"""Pure-stdlib TIFF codec (r9).

TIFF is the scanned-document standard — patent archives, book-scan
and newspaper corpora ship baseline TIFF — and the last raster format
in this engine's family without a decoder. Baseline TIFF 6.0 is an
IFD (the same tag structure :mod:`.exif_codec` walks inside JPEG
APP1) pointing at strip data in one of three baseline codings, all
"stdlib + struct" territory:

- Compression 1: uncompressed rows;
- Compression 32773: PackBits (the Apple RLE);
- Compression 8: Adobe deflate (stdlib zlib per strip);
- Compression 5: TIFF-flavor LZW — MSB-first growing codes with
  EARLY width change (one code before the table fills, the documented
  TIFF 6.0 quirk — deliberately a THIRD LZW variant next to GIF's
  LSB-first/late pairing), plus the optional horizontal-differencing
  predictor (tag 317).

Decoded forms: 8-bit grayscale, 8-bit RGB(A), and 8-bit palette (the
16-bit-per-entry ColorMap scaled down), both endiannesses, multi-strip
images. Bilevel/sub-byte/16-bit sample depths, tiled layout, and the
non-baseline codings (CCITT fax, JPEG-in-TIFF) raise
:class:`UnsupportedTIFF` behind the standard stub gate; structural or
entropy corruption raises :class:`TIFFError`. :func:`probe_tiff`
mirrors the gate header-only. The encoder writes all three baseline
codings (+ predictor) so round trips pin the LZW early-change timing
and the PackBits boundary cases without binary fixtures.

Runs inside the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``; driver-free pure Python over ``bytes``.
"""

from __future__ import annotations

import struct

from .png_codec import DecodedImage

#: decoded-pixel budget, same doctrine as the sibling codecs
MAX_PIXELS = 1 << 25

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_BYTE_COUNTS = 279
TAG_PREDICTOR = 317
TAG_COLOR_MAP = 320

COMP_NONE = 1
COMP_LZW = 5
COMP_DEFLATE = 8  # Adobe deflate: zlib streams per strip
COMP_PACKBITS = 32773


class TIFFError(ValueError):
    """Structurally or entropy-level corrupt TIFF stream."""


class UnsupportedTIFF(NotImplementedError):
    """Legal TIFF form this codec refuses (non-baseline coding,
    sub-byte/16-bit depths, tiles, over-budget dimensions)."""


def is_tiff(payload: bytes | None) -> bool:
    return payload is not None and payload[:4] in (
        b"II*\x00", b"MM\x00*",
    )


_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_entries(payload: bytes, endian: str, off: int) -> dict[int, list[int]]:
    """First-IFD entries as tag → list of integer values (SHORT/LONG/
    BYTE only — the baseline tags are all integral)."""
    if off + 2 > len(payload):
        raise TIFFError("IFD offset past end of file")
    (n,) = struct.unpack_from(endian + "H", payload, off)
    base = off + 2
    if base + 12 * n > len(payload):
        raise TIFFError("IFD entries past end of file")
    out: dict[int, list[int]] = {}
    for i in range(n):
        tag, vtype, count = struct.unpack_from(
            endian + "HHI", payload, base + 12 * i
        )
        size = _TYPE_SIZES.get(vtype)
        if size is None:
            continue  # rationals etc.: no baseline tag needs them
        total = size * count
        raw = payload[base + 12 * i + 8 : base + 12 * i + 12]
        if total > 4:
            (doff,) = struct.unpack(endian + "I", raw)
            if doff + total > len(payload):
                raise TIFFError("tag value past end of file")
            data = payload[doff : doff + total]
        else:
            data = raw[:total]
        if vtype == 3:
            vals = list(struct.unpack(endian + f"{count}H", data))
        elif vtype == 4:
            vals = list(struct.unpack(endian + f"{count}I", data))
        elif vtype in (1, 2):
            vals = list(data)
        else:  # pragma: no cover
            continue
        out[tag] = vals
    return out


def _parse(payload: bytes, max_pixels: int):
    if not is_tiff(payload):
        raise TIFFError("not a TIFF (missing II*/MM* header)")
    if len(payload) < 8:
        raise TIFFError("truncated TIFF header")
    endian = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    tags = _read_entries(payload, endian, ifd_off)

    def one(tag: int, default: int | None = None) -> int:
        vals = tags.get(tag)
        if vals is None:
            if default is None:
                raise TIFFError(f"required tag {tag} missing")
            return default
        return vals[0]

    width = one(TAG_WIDTH)
    height = one(TAG_HEIGHT)
    if width == 0 or height == 0:
        raise TIFFError("zero image dimensions")
    if width * height > max_pixels:
        raise UnsupportedTIFF(
            f"{width}x{height} over the {max_pixels}-pixel budget"
        )
    spp = one(TAG_SAMPLES_PER_PIXEL, 1)
    bits = tags.get(TAG_BITS_PER_SAMPLE, [1])
    if len(bits) not in (1, spp):
        raise TIFFError("BitsPerSample count disagrees with SamplesPerPixel")
    if any(b != 8 for b in bits):
        raise UnsupportedTIFF(
            f"{bits[0]}-bit samples (baseline 8-bit decode only)"
        )
    comp = one(TAG_COMPRESSION, COMP_NONE)
    if comp not in (COMP_NONE, COMP_LZW, COMP_DEFLATE, COMP_PACKBITS):
        raise UnsupportedTIFF(f"compression {comp} (1/5/8/32773 decode)")
    photometric = one(TAG_PHOTOMETRIC)
    if photometric not in (0, 1, 2, 3):
        raise UnsupportedTIFF(f"photometric {photometric}")
    if photometric == 3 and spp != 1:
        raise TIFFError("palette image with SamplesPerPixel != 1")
    if photometric == 2 and spp not in (3, 4):
        raise TIFFError("RGB image needs 3 or 4 samples per pixel")
    predictor = one(TAG_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise UnsupportedTIFF(f"predictor {predictor}")
    offsets = tags.get(TAG_STRIP_OFFSETS)
    counts = tags.get(TAG_STRIP_BYTE_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TIFFError("strip offsets/byte counts missing or mismatched")
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise TIFFError("strip data past end of file")
    rows_per_strip = one(TAG_ROWS_PER_STRIP, height)
    if rows_per_strip == 0:
        raise TIFFError("zero RowsPerStrip")
    colormap = tags.get(TAG_COLOR_MAP)
    if photometric == 3:
        if not colormap or len(colormap) != 3 * 256:
            raise TIFFError("palette image without a 3x256 ColorMap")
    return (
        endian, width, height, spp, comp, photometric, predictor,
        offsets, counts, rows_per_strip, colormap,
    )


def probe_tiff(payload: bytes | None, max_pixels: int = MAX_PIXELS) -> bool:
    """Header-only probe mirroring :func:`decode_tiff`'s gate (strip
    data is not decompressed — same contract as the sibling probes)."""
    if not is_tiff(payload):
        return False
    try:
        _parse(bytes(payload), max_pixels)
    except (TIFFError, UnsupportedTIFF, struct.error):
        return False
    return True


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            end = pos + n + 1
            if end > len(data):
                raise TIFFError("PackBits literal run truncated")
            out += data[pos:end]
            pos = end
        elif n > 128:
            if pos >= len(data):
                raise TIFFError("PackBits replicate run truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) < expected:
        raise TIFFError("PackBits output shorter than the strip")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first, 8-bit roots, clear=256, EOI=257,
    EARLY code-width change (TIFF 6.0 §13: the width grows when the
    NEXT code would not fit — one code earlier than GIF)."""
    CLEAR, EOI = 256, 257
    literals = [bytes([i]) for i in range(256)]
    table: list[bytes] = []
    code_size = 9
    prev: bytes | None = None

    def _reset() -> None:
        nonlocal table, code_size, prev
        table = literals + [b"", b""]
        code_size = 9
        prev = None

    _reset()
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    while len(out) < expected:
        if bitpos + code_size > nbits:
            raise TIFFError("LZW strip truncated")
        byte_i = bitpos >> 3
        # right-pad: a short slice near the end would silently shift
        # the big-endian window
        window = int.from_bytes(
            data[byte_i : byte_i + 4].ljust(4, b"\x00"), "big"
        )
        code = (window >> (32 - (bitpos & 7) - code_size)) & (
            (1 << code_size) - 1
        )
        bitpos += code_size
        if code == CLEAR:
            _reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= CLEAR:
                raise TIFFError("first LZW code after clear is not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise TIFFError("LZW code out of range")
            if len(table) < 4094:
                table.append(prev + entry[:1])
                # EARLY change: grow when the next-to-assign code
                # hits the width limit minus one
                if len(table) == (1 << code_size) - 1 and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise TIFFError("LZW output shorter than the strip")
    return bytes(out[:expected])


def decode_tiff(
    payload: bytes, max_pixels: int = MAX_PIXELS
) -> DecodedImage:
    """First-IFD baseline decode to a :class:`png_codec.DecodedImage`
    (palette expands to RGB; gray PhotometricInterpretation 0 is
    inverted to the usual min-is-black)."""
    (
        endian, width, height, spp, comp, photometric, predictor,
        offsets, counts, rows_per_strip, colormap,
    ) = _parse(payload, max_pixels)
    row_bytes = width * spp
    raster = bytearray()
    row0 = 0
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise TIFFError("strip data past end of file")
        nrows = min(rows_per_strip, height - row0)
        if nrows <= 0:
            raise TIFFError("more strips than image rows")
        expected = nrows * row_bytes
        chunk = payload[off : off + cnt]
        if comp == COMP_NONE:
            if len(chunk) < expected:
                raise TIFFError("uncompressed strip shorter than its rows")
            strip = bytes(chunk[:expected])
        elif comp == COMP_PACKBITS:
            strip = _unpackbits(chunk, expected)
        elif comp == COMP_DEFLATE:
            import zlib

            try:
                strip = zlib.decompress(bytes(chunk), bufsize=expected)
            except zlib.error as e:
                raise TIFFError(f"deflate strip: {e}") from None
            if len(strip) < expected:
                raise TIFFError("deflate output shorter than the strip")
            strip = strip[:expected]
        else:
            strip = _lzw_decode(chunk, expected)
        if predictor == 2:
            s = bytearray(strip)
            for r in range(nrows):
                base = r * row_bytes
                for i in range(spp, row_bytes):
                    s[base + i] = (s[base + i] + s[base + i - spp]) & 0xFF
            strip = bytes(s)
        raster += strip
        row0 += nrows
    if row0 < height:
        raise TIFFError("strips cover fewer rows than ImageLength")

    if photometric == 3:
        # ColorMap entries are 16-bit; baseline writers scale 8-bit
        # values by 257 — scale back down
        pal = colormap
        rgb = bytearray(width * height * 3)
        for p, v in enumerate(raster):
            rgb[3 * p] = pal[v] >> 8
            rgb[3 * p + 1] = pal[256 + v] >> 8
            rgb[3 * p + 2] = pal[512 + v] >> 8
        return DecodedImage(width, height, 3, bytes(rgb))
    if photometric == 0:  # WhiteIsZero: invert to min-is-black
        raster = bytearray(255 - b for b in raster)
    return DecodedImage(width, height, spp, bytes(raster))


# ----------------------------------------------------------------- encode


def _packbits(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find a replicate run of >= 3
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        # literal run until the next >=3 replicate (or 128 cap)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Mirror of :func:`_lzw_decode` incl. the early width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nacc = 0
    table: dict[bytes, int] = {}
    code_size = 9
    next_code = EOI + 1

    def _emit(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << code_size) | code
        nacc += code_size
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1

    def _reset() -> None:
        nonlocal table, code_size, next_code
        table = {bytes([i]): i for i in range(256)}
        code_size = 9
        next_code = EOI + 1

    _reset()
    _emit(CLEAR)
    w = b""
    for k in data:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        _emit(table[w])
        if next_code < 4094:
            table[wk] = next_code
            next_code += 1
            # the decoder widens while PROCESSING a code (its append
            # lags the encoder's by one), so the encoder's next_code
            # threshold sits one above the decoder's table-length
            # threshold — same +1 pairing the GIF codec derives, one
            # code earlier on both sides (TIFF 6.0 early change)
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            _emit(CLEAR)
            _reset()
        w = bytes([k])
    if w:
        _emit(table[w])
    _emit(EOI)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def encode_tiff(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    compression: int = COMP_NONE,
    predictor: int = 1,
    endian: str = "<",
    rows_per_strip: int | None = None,
) -> bytes:
    """Baseline TIFF writer for fixtures and gates: 1 (gray) or 3 (RGB)
    8-bit channels, compression 1/5/32773, optional horizontal
    predictor, multi-strip, both endiannesses."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if compression not in (COMP_NONE, COMP_LZW, COMP_DEFLATE, COMP_PACKBITS):
        raise ValueError("compression must be 1, 5, 8 or 32773")
    if predictor == 2 and compression == COMP_NONE:
        raise ValueError("predictor needs a compressed coding")
    rps = rows_per_strip or height
    row_bytes = width * channels

    strips: list[bytes] = []
    for row0 in range(0, height, rps):
        nrows = min(rps, height - row0)
        strip = pixels[row0 * row_bytes : (row0 + nrows) * row_bytes]
        if predictor == 2:
            s = bytearray(strip)
            for r in range(nrows):
                base = r * row_bytes
                for i in range(row_bytes - 1, channels - 1, -1):
                    s[base + i] = (s[base + i] - s[base + i - channels]) & 0xFF
            strip = bytes(s)
        if compression == COMP_PACKBITS:
            strip = b"".join(
                _packbits(strip[r * row_bytes : (r + 1) * row_bytes])
                for r in range(nrows)
            )
        elif compression == COMP_LZW:
            strip = _lzw_encode(strip)
        elif compression == COMP_DEFLATE:
            import zlib

            strip = zlib.compress(strip, 6)
        strips.append(strip)

    entries: list[tuple[int, int, int, list[int]]] = [
        (TAG_WIDTH, 4, 1, [width]),
        (TAG_HEIGHT, 4, 1, [height]),
        (TAG_BITS_PER_SAMPLE, 3, channels, [8] * channels),
        (TAG_COMPRESSION, 3, 1, [compression]),
        (TAG_PHOTOMETRIC, 3, 1, [1 if channels == 1 else 2]),
        (TAG_SAMPLES_PER_PIXEL, 3, 1, [channels]),
        (TAG_ROWS_PER_STRIP, 4, 1, [rps]),
    ]
    if predictor == 2:
        entries.append((TAG_PREDICTOR, 3, 1, [2]))

    n_entries = len(entries) + 2  # + StripOffsets, StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    data_off = ifd_off + ifd_size

    # out-of-line tag data (bits-per-sample for RGB, strip arrays)
    extra = bytearray()

    def _tag_bytes(tag, vtype, count, vals) -> bytes:
        nonlocal data_off
        fmt = {3: "H", 4: "I"}[vtype]
        size = _TYPE_SIZES[vtype] * count
        packed = struct.pack(endian + fmt * count, *vals)
        head = struct.pack(endian + "HHI", tag, vtype, count)
        if size <= 4:
            return head + packed.ljust(4, b"\x00")
        at = data_off + len(extra)
        extra.extend(packed)
        return head + struct.pack(endian + "I", at)

    # strip arrays need placement AFTER we know extra's layout; place
    # the strip data after all out-of-line tag values
    strip_count_vals = [len(s) for s in strips]
    # first pass to account for extra sizes of fixed tags
    fixed_bytes = [
        _tag_bytes(tag, vtype, count, vals)
        for tag, vtype, count, vals in entries
    ]
    # reserve space for the two strip arrays (LONGs, out-of-line iff >1)
    def _array_tag(tag, vals) -> bytes:
        nonlocal data_off
        return _tag_bytes(tag, 4, len(vals), vals)

    # compute strip data offsets: after IFD + extra (including the two
    # arrays themselves when out-of-line)
    arr_extra = sum(4 * len(strips) for _ in range(2)) if len(strips) > 1 else 0
    strips_base = data_off + len(extra) + arr_extra
    strip_offsets = []
    at = strips_base
    for s in strips:
        strip_offsets.append(at)
        at += len(s)
    off_bytes = _array_tag(TAG_STRIP_OFFSETS, strip_offsets)
    cnt_bytes = _array_tag(TAG_STRIP_BYTE_COUNTS, strip_count_vals)

    all_tags = sorted(
        fixed_bytes + [off_bytes, cnt_bytes],
        key=lambda b: struct.unpack(endian + "H", b[:2])[0],
    )
    out = bytearray()
    out += b"II*\x00" if endian == "<" else b"MM\x00*"
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", n_entries)
    for t in all_tags:
        out += t
    out += struct.pack(endian + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
