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
  predictor (tag 317);
- Compression 2 (T.4 Modified Huffman), 3 (Group 3 proper: EOLs +
  T4Options 1-D/2-D/byte-aligned) and 4 (ITU T.6 "Group 4" MMR) via
  :mod:`.ccitt` (r10) — what real bilevel archival scans actually
  use; the T.4/T.6 uncompressed-mode escapes stay gated.

Decoded forms: 1/2/4/8-bit grayscale (bilevel scans — the most common
archival TIFF form — included; sub-byte rows unpack through the same
MSB-first byte-padded expansion PNG uses, ``png_codec._unpack_bits``),
8-bit RGB(A), and 1/2/4/8-bit palette (the 16-bit-per-entry ColorMap
scaled down), both endiannesses, in both STRIP and TILE layouts (tags
322-325; edge tiles clip their padding). 16-bit samples, sub-byte
multi-channel packing, predictor-on-sub-byte, and the non-baseline
codings (CCITT fax, JPEG-in-TIFF) raise :class:`UnsupportedTIFF`
behind the standard stub gate; structural or entropy corruption
raises :class:`TIFFError`. :func:`probe_tiff` mirrors the gate
header-only. The encoder writes all the decoded forms (all three
compressed codings + predictor, sub-byte packing, tiles, palette) so
round trips pin the LZW early-change timing, the bit-packing edges
and the tile-clip arithmetic without binary fixtures.

Runs inside the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``; driver-free pure Python over ``bytes``.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from .png_codec import DecodedImage, _unpack_bits

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
TAG_T4_OPTIONS = 292
TAG_T6_OPTIONS = 293
TAG_PREDICTOR = 317
TAG_COLOR_MAP = 320
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325

COMP_NONE = 1
COMP_CCITT_MH = 2  # T.4 1-D Modified Huffman, no EOLs (fax)
COMP_G3 = 3  # T.4 Group 3 proper: EOLs + T4Options 1-D/2-D (r10)
COMP_G4 = 4  # ITU T.6 Group 4 MMR — the archival-scan standard
COMP_LZW = 5
COMP_DEFLATE = 8  # Adobe deflate: zlib streams per strip
COMP_PACKBITS = 32773


class TIFFError(ValueError):
    """Structurally or entropy-level corrupt TIFF stream."""


class UnsupportedTIFF(NotImplementedError):
    """Legal TIFF form this codec refuses (non-baseline coding,
    16-bit depths, sub-byte multi-channel packing, over-budget
    dimensions)."""


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


class TiffLayout(NamedTuple):
    endian: str
    width: int
    height: int
    spp: int
    bits: int  # per sample: 1/2/4/8 (sub-byte only for spp == 1)
    comp: int
    photometric: int
    predictor: int
    offsets: list[int]  # strip or tile offsets, per `tiled`
    counts: list[int]
    rows_per_strip: int  # strip layout only
    tile_w: int  # tile layout only
    tile_h: int
    colormap: list[int] | None
    tiled: bool
    t4_options: int


def _parse(payload: bytes, max_pixels: int) -> TiffLayout:
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
    bits_list = tags.get(TAG_BITS_PER_SAMPLE, [1])
    if len(bits_list) not in (1, spp):
        raise TIFFError("BitsPerSample count disagrees with SamplesPerPixel")
    if any(b != bits_list[0] for b in bits_list):
        raise UnsupportedTIFF("heterogeneous per-sample bit depths")
    bits = bits_list[0]
    if bits not in (1, 2, 4, 8):
        raise UnsupportedTIFF(
            f"{bits}-bit samples (1/2/4/8-bit decode only)"
        )
    if bits != 8 and spp != 1:
        # sub-byte multi-sample packing is not baseline TIFF
        raise UnsupportedTIFF(f"{bits}-bit samples with {spp} channels")
    comp = one(TAG_COMPRESSION, COMP_NONE)
    if comp not in (
        COMP_NONE, COMP_CCITT_MH, COMP_G3, COMP_G4, COMP_LZW,
        COMP_DEFLATE, COMP_PACKBITS,
    ):
        raise UnsupportedTIFF(
            f"compression {comp} (1/2/3/4/5/8/32773 decode)"
        )
    t4_options = one(TAG_T4_OPTIONS, 0)
    if comp in (COMP_CCITT_MH, COMP_G3, COMP_G4):
        if bits != 1 or spp != 1:
            raise TIFFError("CCITT coding on a non-bilevel image")
        if one(TAG_T6_OPTIONS, 0) & 2:
            # T.6 uncompressed-mode escape sequences
            raise UnsupportedTIFF("T6 uncompressed mode")
        if comp == COMP_G3 and t4_options & 2:
            raise UnsupportedTIFF("T.4 uncompressed mode")
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
    if predictor == 2 and bits != 8:
        # horizontal differencing is byte-wise; on packed sub-byte
        # rows it's writer-specific, not baseline
        raise UnsupportedTIFF("predictor 2 with sub-byte samples")

    tiled = TAG_TILE_OFFSETS in tags
    if tiled and TAG_STRIP_OFFSETS in tags:
        raise TIFFError("both strip and tile layouts present")
    tile_w = tile_h = 0
    rows_per_strip = 0
    if tiled:
        offsets = tags.get(TAG_TILE_OFFSETS)
        counts = tags.get(TAG_TILE_BYTE_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TIFFError("tile offsets/byte counts missing or mismatched")
        tile_w = one(TAG_TILE_WIDTH)
        tile_h = one(TAG_TILE_LENGTH)
        if tile_w == 0 or tile_h == 0:
            raise TIFFError("zero tile dimensions")
        if tile_w * tile_h > max_pixels:
            # a tiny declared image with giant declared tiles is a
            # decompression bomb, not a legal layout
            raise UnsupportedTIFF(
                f"{tile_w}x{tile_h} tiles over the {max_pixels}-pixel budget"
            )
        across = (width + tile_w - 1) // tile_w
        down = (height + tile_h - 1) // tile_h
        if len(offsets) != across * down:
            raise TIFFError("tile count disagrees with image/tile geometry")
    else:
        offsets = tags.get(TAG_STRIP_OFFSETS)
        counts = tags.get(TAG_STRIP_BYTE_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TIFFError("strip offsets/byte counts missing or mismatched")
        rows_per_strip = one(TAG_ROWS_PER_STRIP, height)
        if rows_per_strip == 0:
            raise TIFFError("zero RowsPerStrip")
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise TIFFError("strip data past end of file")
    colormap = tags.get(TAG_COLOR_MAP)
    if photometric == 3:
        if not colormap or len(colormap) != 3 * (1 << bits):
            raise TIFFError(
                f"palette image without a 3x{1 << bits} ColorMap"
            )
    return TiffLayout(
        endian, width, height, spp, bits, comp, photometric, predictor,
        offsets, counts, rows_per_strip, tile_w, tile_h, colormap, tiled,
        t4_options,
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
    out = lzw_decompress(data, expected, strict_length=True)
    if len(out) < expected:
        raise TIFFError("LZW output shorter than the strip")
    return out[:expected]


def lzw_decompress(
    data: bytes,
    max_out: int,
    early: bool = True,
    strict_length: bool = False,
) -> bytes:
    """The LZW core, shared with PDF's LZWDecode (same coding family,
    PDF 32000 §7.4.4 = TIFF 6.0 §13; PDF's ``/EarlyChange 0`` variant
    turns off the one-code-early width growth via ``early``).

    Stops at EOI or when the input bits run out (lenient — crawled
    PDFs drop the EOI routinely). ``max_out`` is the decompression-
    bomb budget: output reaching it raises unless ``strict_length``
    (the TIFF strip path, where ``max_out`` IS the expected length and
    stopping there is the contract). Truncated input raises only
    under ``strict_length``; the lenient path returns what decoded.
    """
    CLEAR, EOI = 256, 257
    literals = [bytes([i]) for i in range(256)]
    table: list[bytes] = []
    code_size = 9
    prev: bytes | None = None
    grow_slack = 1 if early else 0

    def _reset() -> None:
        nonlocal table, code_size, prev
        table = literals + [b"", b""]
        code_size = 9
        prev = None

    _reset()
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    while len(out) < max_out:
        if bitpos + code_size > nbits:
            if strict_length:
                raise TIFFError("LZW strip truncated")
            break
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
                if (
                    len(table) == (1 << code_size) - grow_slack
                    and code_size < 12
                ):
                    code_size += 1
        out += entry
        prev = entry
    if not strict_length and len(out) >= max_out:
        raise TIFFError(f"LZW output past the {max_out}-byte budget")
    return bytes(out)


def _decompress_chunk(
    chunk: bytes, comp: int, expected: int, width: int = 0, nrows: int = 0,
    t4_options: int = 0,
) -> bytes:
    """One strip/tile of entropy data → exactly ``expected`` bytes.
    The CCITT codings are row-structured, so they take the chunk's
    (width, nrows) geometry and emit packed bilevel rows directly."""
    if comp == COMP_NONE:
        if len(chunk) < expected:
            raise TIFFError("uncompressed chunk shorter than its rows")
        return bytes(chunk[:expected])
    if comp in (COMP_CCITT_MH, COMP_G3, COMP_G4):
        from . import ccitt

        try:
            if comp == COMP_CCITT_MH:
                return ccitt.decode_mh(bytes(chunk), width, nrows)
            if comp == COMP_G3:
                return ccitt.decode_g3(
                    bytes(chunk), width, nrows,
                    two_d=bool(t4_options & 1),
                    aligned=bool(t4_options & 4),
                )
            return ccitt.decode_g4(bytes(chunk), width, nrows)
        except ccitt.CCITTError as e:
            raise TIFFError(f"CCITT chunk: {e}") from None
    if comp == COMP_PACKBITS:
        return _unpackbits(chunk, expected)
    if comp == COMP_DEFLATE:
        import zlib

        try:
            out = zlib.decompress(bytes(chunk), bufsize=expected)
        except zlib.error as e:
            raise TIFFError(f"deflate chunk: {e}") from None
        if len(out) < expected:
            raise TIFFError("deflate output shorter than the chunk")
        return out[:expected]
    return _lzw_decode(chunk, expected)


def _undiff(strip: bytes, nrows: int, row_bytes: int, spp: int) -> bytes:
    """Undo the horizontal-differencing predictor (tag 317 = 2)."""
    s = bytearray(strip)
    for r in range(nrows):
        base = r * row_bytes
        for i in range(spp, row_bytes):
            s[base + i] = (s[base + i] + s[base + i - spp]) & 0xFF
    return bytes(s)


def decode_tiff(
    payload: bytes, max_pixels: int = MAX_PIXELS
) -> DecodedImage:
    """First-IFD baseline decode to a :class:`png_codec.DecodedImage`
    (palette expands to RGB; gray PhotometricInterpretation 0 is
    inverted to the usual min-is-black). Both strip and tile layouts
    decode; 1/2/4-bit packed grayscale/bilevel/palette rows (each row
    — or tile row — padded to a byte edge, MSB-first, same packing
    PNG uses) expand through :func:`png_codec._unpack_bits`, with
    gray scaled by the exact 255/85/17 factors and palette indexes
    kept raw for the ColorMap lookup."""
    lay = _parse(payload, max_pixels)
    width, height, spp, bits = lay.width, lay.height, lay.spp, lay.bits
    gray_scale = lay.photometric in (0, 1)  # not palette indexes

    if lay.tiled:
        tw, th = lay.tile_w, lay.tile_h
        across = (width + tw - 1) // tw
        tile_stride = (tw * spp * bits + 7) // 8
        raster = bytearray(width * height * spp)
        for ti, (off, cnt) in enumerate(zip(lay.offsets, lay.counts)):
            ty, tx = divmod(ti, across)
            tile = _decompress_chunk(
                payload[off : off + cnt], lay.comp, th * tile_stride,
                width=tw, nrows=th, t4_options=lay.t4_options,
            )
            if lay.predictor == 2:
                tile = _undiff(tile, th, tw * spp, spp)
            if bits != 8:
                tile = _unpack_bits(tile, tw, th, bits, gray_scale)
            # blit the valid region; edge tiles carry padding to clip
            cw = min(tw, width - tx * tw)
            ch = min(th, height - ty * th)
            for r in range(ch):
                src = r * tw * spp
                dst = ((ty * th + r) * width + tx * tw) * spp
                raster[dst : dst + cw * spp] = tile[src : src + cw * spp]
    else:
        row_stride = (width * spp * bits + 7) // 8
        packed = bytearray()
        row0 = 0
        for off, cnt in zip(lay.offsets, lay.counts):
            nrows = min(lay.rows_per_strip, height - row0)
            if nrows <= 0:
                raise TIFFError("more strips than image rows")
            strip = _decompress_chunk(
                payload[off : off + cnt], lay.comp, nrows * row_stride,
                width=width, nrows=nrows, t4_options=lay.t4_options,
            )
            if lay.predictor == 2:
                strip = _undiff(strip, nrows, width * spp, spp)
            packed += strip
            row0 += nrows
        if row0 < height:
            raise TIFFError("strips cover fewer rows than ImageLength")
        raster = (
            _unpack_bits(packed, width, height, bits, gray_scale)
            if bits != 8
            else packed
        )

    if lay.photometric == 3:
        # ColorMap entries are 16-bit; baseline writers scale 8-bit
        # values by 257 — scale back down
        pal = lay.colormap
        n = 1 << bits
        rgb = bytearray(width * height * 3)
        for p, v in enumerate(raster):
            if v >= n:
                raise TIFFError("palette index out of ColorMap range")
            rgb[3 * p] = pal[v] >> 8
            rgb[3 * p + 1] = pal[n + v] >> 8
            rgb[3 * p + 2] = pal[2 * n + v] >> 8
        return DecodedImage(width, height, 3, bytes(rgb))
    if lay.photometric == 0:  # WhiteIsZero: invert to min-is-black
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


def _pack_row(vals: bytes, bits: int) -> bytearray:
    """Inverse of ``png_codec._unpack_bits`` for one row: MSB-first
    sub-byte packing, padded to a byte edge."""
    stride = (len(vals) * bits + 7) // 8
    out = bytearray(stride)
    mask = (1 << bits) - 1
    for x, v in enumerate(vals):
        shift = 8 - bits - ((x * bits) & 7)
        out[(x * bits) >> 3] |= (v & mask) << shift
    return out


def encode_tiff(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    compression: int = COMP_NONE,
    predictor: int = 1,
    endian: str = "<",
    rows_per_strip: int | None = None,
    bits: int = 8,
    tile: tuple[int, int] | None = None,
    colormap: list[tuple[int, int, int]] | None = None,
    photometric: int | None = None,
    t4_options: int = 0,
) -> bytes:
    """TIFF writer for fixtures and gates, covering every form the
    decoder accepts: 1 (gray) or 3 (RGB) channels, 1/2/4/8-bit gray
    or palette samples (``pixels`` is always one byte per sample; the
    writer packs sub-byte rows), compression 1/5/8/32773, optional
    horizontal predictor (8-bit only), strip OR tile layout, optional
    ColorMap (8-bit triples, scaled x257 as baseline writers do), and
    both endiannesses. ``photometric`` overrides the inferred value
    (e.g. 0 for a WhiteIsZero bilevel scan)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if bits not in (1, 2, 4, 8):
        raise ValueError("bits must be 1, 2, 4 or 8")
    if bits != 8 and channels != 1:
        raise ValueError("sub-byte packing is single-channel only")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if bits != 8 and any(v >> bits for v in pixels):
        raise ValueError(f"sample value exceeds {bits}-bit range")
    if compression not in (
        COMP_NONE, COMP_CCITT_MH, COMP_G3, COMP_G4, COMP_LZW,
        COMP_DEFLATE, COMP_PACKBITS,
    ):
        raise ValueError("compression must be 1, 2, 3, 4, 5, 8 or 32773")
    if compression in (COMP_CCITT_MH, COMP_G3, COMP_G4) and bits != 1:
        raise ValueError("CCITT codings are bilevel (bits=1) only")
    if predictor == 2 and compression == COMP_NONE:
        raise ValueError("predictor needs a compressed coding")
    if predictor == 2 and bits != 8:
        raise ValueError("predictor 2 is 8-bit only")
    if colormap is not None:
        if channels != 1:
            raise ValueError("palette images are single-channel indexes")
        if len(colormap) != 1 << bits:
            raise ValueError(f"ColorMap needs {1 << bits} entries")
        if any(v >= (1 << bits) for v in pixels):
            raise ValueError("palette index out of ColorMap range")
    if photometric is None:
        photometric = 3 if colormap is not None else (1 if channels == 1 else 2)

    row_samples = width * channels

    def _rows_chunk(row_vals: list[bytes]) -> bytes:
        """rows of one-byte samples -> packed, predicted, compressed."""
        if compression in (COMP_CCITT_MH, COMP_G3, COMP_G4):
            from . import ccitt

            if compression == COMP_CCITT_MH:
                return ccitt.encode_mh(list(row_vals), len(row_vals[0]))
            if compression == COMP_G3:
                return ccitt.encode_g3(
                    list(row_vals), len(row_vals[0]),
                    two_d=bool(t4_options & 1),
                    aligned=bool(t4_options & 4),
                )
            return ccitt.encode_g4(list(row_vals), len(row_vals[0]))
        if bits != 8:
            raw = b"".join(bytes(_pack_row(r, bits)) for r in row_vals)
        elif predictor == 2:
            s = bytearray(b"".join(row_vals))
            rb = len(row_vals[0])
            for r in range(len(row_vals)):
                base = r * rb
                for i in range(rb - 1, channels - 1, -1):
                    s[base + i] = (s[base + i] - s[base + i - channels]) & 0xFF
            raw = bytes(s)
        else:
            raw = b"".join(row_vals)
        if compression == COMP_PACKBITS:
            rb = len(raw) // len(row_vals)
            return b"".join(
                _packbits(raw[r * rb : (r + 1) * rb])
                for r in range(len(row_vals))
            )
        if compression == COMP_LZW:
            return _lzw_encode(raw)
        if compression == COMP_DEFLATE:
            import zlib

            return zlib.compress(raw, 6)
        return raw

    chunks: list[bytes] = []
    if tile is not None:
        tw, th = tile
        if tw < 1 or th < 1:
            raise ValueError("tile dimensions must be positive")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        for ty in range(down):
            for tx in range(across):
                rows = []
                for r in range(th):
                    y = ty * th + r
                    row = bytearray(tw * channels)
                    if y < height:
                        cw = min(tw, width - tx * tw)
                        src = (y * width + tx * tw) * channels
                        row[: cw * channels] = pixels[src : src + cw * channels]
                    rows.append(bytes(row))
                chunks.append(_rows_chunk(rows))
    else:
        rps = rows_per_strip or height
        for row0 in range(0, height, rps):
            nrows = min(rps, height - row0)
            rows = [
                pixels[(row0 + r) * row_samples : (row0 + r + 1) * row_samples]
                for r in range(nrows)
            ]
            chunks.append(_rows_chunk(rows))

    entries: list[tuple[int, int, int, list[int]]] = [
        (TAG_WIDTH, 4, 1, [width]),
        (TAG_HEIGHT, 4, 1, [height]),
        (TAG_BITS_PER_SAMPLE, 3, channels, [bits] * channels),
        (TAG_COMPRESSION, 3, 1, [compression]),
        (TAG_PHOTOMETRIC, 3, 1, [photometric]),
        (TAG_SAMPLES_PER_PIXEL, 3, 1, [channels]),
    ]
    if tile is not None:
        entries.append((TAG_TILE_WIDTH, 4, 1, [tile[0]]))
        entries.append((TAG_TILE_LENGTH, 4, 1, [tile[1]]))
        off_tag, cnt_tag = TAG_TILE_OFFSETS, TAG_TILE_BYTE_COUNTS
    else:
        entries.append((TAG_ROWS_PER_STRIP, 4, 1, [rows_per_strip or height]))
        off_tag, cnt_tag = TAG_STRIP_OFFSETS, TAG_STRIP_BYTE_COUNTS
    if predictor == 2:
        entries.append((TAG_PREDICTOR, 3, 1, [2]))
    if compression == COMP_G3 and t4_options:
        entries.append((TAG_T4_OPTIONS, 4, 1, [t4_options]))
    if colormap is not None:
        n = 1 << bits
        cm = (
            [r * 257 for r, _g, _b in colormap]
            + [g * 257 for _r, g, _b in colormap]
            + [b * 257 for _r, _g, b in colormap]
        )
        entries.append((TAG_COLOR_MAP, 3, 3 * n, cm))

    n_entries = len(entries) + 2  # + chunk offsets, chunk byte counts
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    data_off = ifd_off + ifd_size

    extra = bytearray()

    def _tag_bytes(tag, vtype, count, vals) -> bytes:
        fmt = {3: "H", 4: "I"}[vtype]
        size = _TYPE_SIZES[vtype] * count
        packed = struct.pack(endian + fmt * count, *vals)
        head = struct.pack(endian + "HHI", tag, vtype, count)
        if size <= 4:
            return head + packed.ljust(4, b"\x00")
        at = data_off + len(extra)
        extra.extend(packed)
        return head + struct.pack(endian + "I", at)

    fixed_bytes = [
        _tag_bytes(tag, vtype, count, vals)
        for tag, vtype, count, vals in entries
    ]
    # the two chunk arrays land in `extra` next (iff out-of-line);
    # chunk data follows everything
    arr_extra = (4 * len(chunks)) * 2 if len(chunks) > 1 else 0
    chunk_base = data_off + len(extra) + arr_extra
    chunk_offsets = []
    at = chunk_base
    for c in chunks:
        chunk_offsets.append(at)
        at += len(c)
    off_bytes = _tag_bytes(off_tag, 4, len(chunks), chunk_offsets)
    cnt_bytes = _tag_bytes(cnt_tag, 4, len(chunks), [len(c) for c in chunks])

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
    for c in chunks:
        out += c
    return bytes(out)
