"""EXIF metadata extraction — a TIFF IFD walk inside JPEG APP1 (r9).

Image curation wants capture metadata without decoding pixels:
orientation (to know whether width/height are swapped for display and
whether a dHash needs rotation), capture timestamp (time-based dedup
and split hygiene), camera make/model (device-level stratification).
EXIF is a TIFF structure embedded in a JPEG APP1 segment: byte-order
mark (II/MM) + magic 42 + linked IFDs of (tag, type, count, value)
entries, with the photo-specific fields in a sub-IFD linked from tag
0x8769. All offsets are relative to the TIFF header — the classic
EXIF-parser bug is treating them as file offsets.

Parsing is header-bounded: the walk touches only the APP1 segment
(≤64 KB by JPEG's own length field), so this rides the same
O(header-bytes) triage doctrine as ``media_info``. Corrupt EXIF
degrades to "no fields" — a bad camera firmware blob must never kill
a 100 TB pass.

:func:`build_exif_app1` is the fixture builder (both endiannesses),
so round-trip tests and the driver gate pin offset arithmetic, type
decoding, and the sub-IFD link without any binary fixtures on disk.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

EXIF_HEADER = b"Exif\x00\x00"

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


@dataclass
class ExifInfo:
    orientation: int | None = None
    datetime: str | None = None
    make: str | None = None
    model: str | None = None
    pixel_x: int | None = None
    pixel_y: int | None = None


class ExifError(ValueError):
    """Structurally corrupt EXIF segment (callers treat as absent)."""


def _find_app1(payload: bytes) -> bytes | None:
    """The Exif APP1 body (after the Exif\\0\\0 header), or None."""
    if payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # entropy data starts: no more headers
            return None
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker == 0xE1:
            body = payload[pos + 4 : pos + 2 + seglen]
            if body[: len(EXIF_HEADER)] == EXIF_HEADER:
                return body[len(EXIF_HEADER) :]
        pos += 2 + seglen
    return None


def _read_value(tiff: bytes, endian: str, vtype: int, count: int, raw: bytes):
    size = _TYPE_SIZES.get(vtype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(tiff):
            raise ExifError("value offset past the TIFF block")
        data = tiff[off : off + total]
    if vtype == 2:  # ASCII, NUL-terminated
        return data.split(b"\x00", 1)[0].decode("ascii", "replace")
    if vtype == 3:
        return struct.unpack(endian + "H", data[:2])[0]
    if vtype == 4:
        return struct.unpack(endian + "I", data[:4])[0]
    return None  # rationals et al.: not needed for the triage fields


def _walk_ifd(tiff: bytes, endian: str, off: int) -> dict[int, object]:
    if off + 2 > len(tiff):
        raise ExifError("IFD offset past the TIFF block")
    (n,) = struct.unpack_from(endian + "H", tiff, off)
    out: dict[int, object] = {}
    base = off + 2
    if base + 12 * n > len(tiff):
        raise ExifError("IFD entries past the TIFF block")
    for i in range(n):
        tag, vtype, count = struct.unpack_from(
            endian + "HHI", tiff, base + 12 * i
        )
        raw = tiff[base + 12 * i + 8 : base + 12 * i + 12]
        try:
            out[tag] = _read_value(tiff, endian, vtype, count, raw)
        except ExifError:
            continue  # one bad entry must not hide its siblings
    return out


def parse_exif(payload: bytes) -> ExifInfo:
    """EXIF triage fields of a JPEG payload; all-None when the payload
    has no (or corrupt) EXIF. Never raises — triage doctrine."""
    try:
        tiff = _find_app1(payload)
        if tiff is None or len(tiff) < 8:
            return ExifInfo()
        if tiff[:2] == b"II":
            endian = "<"
        elif tiff[:2] == b"MM":
            endian = ">"
        else:
            return ExifInfo()
        magic, ifd0_off = struct.unpack_from(endian + "HI", tiff, 2)
        if magic != 42:
            return ExifInfo()
        ifd0 = _walk_ifd(tiff, endian, ifd0_off)
        info = ExifInfo(
            orientation=ifd0.get(TAG_ORIENTATION),
            datetime=ifd0.get(TAG_DATETIME),
            make=ifd0.get(TAG_MAKE),
            model=ifd0.get(TAG_MODEL),
        )
        sub_off = ifd0.get(TAG_EXIF_IFD)
        if isinstance(sub_off, int):
            sub = _walk_ifd(tiff, endian, sub_off)
            px, py = sub.get(TAG_PIXEL_X), sub.get(TAG_PIXEL_Y)
            info.pixel_x = px if isinstance(px, int) else None
            info.pixel_y = py if isinstance(py, int) else None
        return info
    except (ExifError, struct.error):
        return ExifInfo()


# ----------------------------------------------------------------- build


def build_exif_app1(
    orientation: int | None = None,
    datetime: str | None = None,
    make: str | None = None,
    model: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    endian: str = "<",
) -> bytes:
    """A complete APP1 segment (marker + length + Exif header + TIFF
    block) for fixtures; splice after a JPEG's SOI. Long ASCII values
    land past the IFD via real offsets, so the offset arithmetic the
    parser must get right is actually exercised."""
    entries: list[tuple[int, int, int, bytes]] = []  # tag,type,count,payload
    tail = bytearray()

    def _ascii(tag: int, s: str) -> None:
        data = s.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(data), data))

    def _short(tag: int, v: int) -> None:
        entries.append((tag, 3, 1, struct.pack(endian + "H", v)))

    def _long(tag: int, v: int) -> None:
        entries.append((tag, 4, 1, struct.pack(endian + "I", v)))

    if make is not None:
        _ascii(TAG_MAKE, make)
    if model is not None:
        _ascii(TAG_MODEL, model)
    if orientation is not None:
        _short(TAG_ORIENTATION, orientation)
    if datetime is not None:
        _ascii(TAG_DATETIME, datetime)

    sub_entries: list[tuple[int, int, int, bytes]] = []
    if pixel_x is not None:
        sub_entries.append(
            (TAG_PIXEL_X, 4, 1, struct.pack(endian + "I", pixel_x))
        )
    if pixel_y is not None:
        sub_entries.append(
            (TAG_PIXEL_Y, 4, 1, struct.pack(endian + "I", pixel_y))
        )

    n0 = len(entries) + (1 if sub_entries else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    sub_off = ifd0_off + ifd0_size
    sub_size = (2 + 12 * len(sub_entries) + 4) if sub_entries else 0
    data_off = sub_off + sub_size

    def _emit(ents: list[tuple[int, int, int, bytes]]) -> bytes:
        nonlocal data_off
        out = bytearray(struct.pack(endian + "H", len(ents)))
        for tag, vtype, count, payload in sorted(ents):
            out += struct.pack(endian + "HHI", tag, vtype, count)
            if len(payload) <= 4:
                out += payload.ljust(4, b"\x00")
            else:
                out += struct.pack(endian + "I", data_off)
                tail.extend(payload)
                data_off += len(payload)
        out += struct.pack(endian + "I", 0)  # no next IFD
        return bytes(out)

    ifd0_ents = list(entries)
    if sub_entries:
        ifd0_ents.append(
            (TAG_EXIF_IFD, 4, 1, struct.pack(endian + "I", sub_off))
        )
    tiff = bytearray()
    tiff += (b"II" if endian == "<" else b"MM")
    tiff += struct.pack(endian + "HI", 42, ifd0_off)
    tiff += _emit(ifd0_ents)
    if sub_entries:
        tiff += _emit(sub_entries)
    tiff += tail

    body = EXIF_HEADER + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def splice_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after a JPEG's SOI marker."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]
