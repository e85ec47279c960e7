"""PDF triage and text extraction — stdlib-only (r10).

PDF is the largest single text source in real crawl pipelines, and
the extraction layer is pure parsing: object syntax, FlateDecode
(stdlib zlib), and the content-stream text operators. This module
implements the honest subset that covers machine-generated simple
PDFs — the class a synthetic-fixture oracle can verify end-to-end —
and degrades cleanly on everything else:

- :func:`pdf_info`: header version, object/page counts, encryption
  flag — O(bytes) single scan, the triage pass;
- :func:`extract_text`: per-page text from BT..ET blocks — ``Tj``,
  ``'``, ``"`` and ``TJ`` show operators, ``Td/TD/T*/Tm`` treated as
  line breaks, literal-string escapes (octal included) and hex
  strings decoded as Latin-1. No CMap/ToUnicode, no encryption, no
  embedded-font re-encoding: text behind those returns as whatever
  the string bytes spell (crawl-grade best effort, never a crash);
- :func:`build_pdf`: a deterministic minimal writer (catalog, pages
  tree, Helvetica, per-page content streams, optional FlateDecode,
  real xref table) so round trips pin the object parser, the stream
  Length resolution, the inflate path and the operator walk without
  binary fixtures.

Objects are found by scanning ``N G obj .. endobj`` pairs rather than
trusting the xref (crawled PDFs routinely carry broken or truncated
xrefs; the scan is what lenient real-world readers fall back to).
Stream bodies are skipped during the scan by their ``/Length`` so
binary content can't fake object boundaries, with a resync guard for
lying lengths. All loops are bounded by the payload size; corrupt
structure raises :class:`PDFError`, which callers triage rather than
propagate.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

#: inflate budget per stream — the decompression-bomb doctrine again
MAX_STREAM_BYTES = 64 << 20
MAX_OBJECTS = 1 << 16


class PDFError(ValueError):
    """Structurally corrupt PDF (callers triage as 'unknown')."""


@dataclass
class PdfInfo:
    version: str
    n_objects: int
    n_pages: int
    encrypted: bool
    has_xref: bool


def is_pdf(payload: bytes) -> bool:
    return payload[:5] == b"%PDF-"


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+\d+\s+R)?")


def _scan_objects(payload: bytes) -> dict[int, bytes]:
    """{object number: body bytes} by scanning obj..endobj, skipping
    stream bodies by their declared /Length (indirect Lengths resolve
    in a second pass; a lying length falls back to searching for
    ``endstream``)."""
    objects: dict[int, bytes] = {}
    pos = 0
    n = 0
    while True:
        m = _OBJ_RE.search(payload, pos)
        if m is None:
            break
        n += 1
        if n > MAX_OBJECTS:
            raise PDFError(f"more than {MAX_OBJECTS} objects")
        body_start = m.end()
        # find the stream keyword or endobj, skipping stream bodies
        search = body_start
        while True:
            e_obj = payload.find(b"endobj", search)
            s_kw = payload.find(b"stream", search)
            if s_kw != -1 and (e_obj == -1 or s_kw < e_obj) and (
                payload[s_kw : s_kw + 9] != b"endstream"
            ):
                # skip the stream body: declared length if direct
                lm = _LENGTH_RE.search(payload, body_start, s_kw)
                data_start = s_kw + 6
                if payload[data_start : data_start + 2] == b"\r\n":
                    data_start += 2
                elif payload[data_start : data_start + 1] == b"\n":
                    data_start += 1
                if lm is not None and lm.group(2) is None:
                    after = data_start + int(lm.group(1))
                else:
                    after = data_start  # unknown: search from here
                e_stream = payload.find(b"endstream", after)
                if e_stream == -1:
                    e_stream = payload.find(b"endstream", data_start)
                if e_stream == -1:
                    raise PDFError("stream without endstream")
                search = e_stream + 9
                continue
            break
        if e_obj == -1:
            raise PDFError("obj without endobj")
        objects[int(m.group(1))] = payload[body_start:e_obj]
        pos = e_obj + 6
    return objects


def pdf_info(payload: bytes) -> PdfInfo:
    if not is_pdf(payload):
        raise PDFError("not a PDF (no %PDF- header)")
    version = payload[5:8].decode("latin-1", "replace")
    objects = _scan_objects(payload)
    n_pages = sum(
        1
        for body in objects.values()
        if re.search(rb"/Type\s*/Page\b(?!s)", _dict_of(body))
    )
    return PdfInfo(
        version,
        len(objects),
        n_pages,
        b"/Encrypt" in payload,
        b"xref" in payload,
    )


def _dict_of(body: bytes) -> bytes:
    """The object's top-level dictionary bytes (up to the stream
    keyword if one follows)."""
    at = body.find(b"stream")
    return body if at == -1 else body[:at]


def _stream_data(body: bytes, objects: dict[int, bytes]) -> bytes | None:
    """The decoded stream content of an object, or None if it has no
    stream. FlateDecode inflates under MAX_STREAM_BYTES; unknown
    filters return the raw bytes (best effort, never a crash)."""
    at = body.find(b"stream")
    if at == -1:
        return None
    head = body[:at]
    data_start = at + 6
    if body[data_start : data_start + 2] == b"\r\n":
        data_start += 2
    elif body[data_start : data_start + 1] == b"\n":
        data_start += 1
    end = body.rfind(b"endstream")
    if end == -1:
        end = len(body)
    lm = _LENGTH_RE.search(head)
    if lm is not None:
        if lm.group(2) is None:
            length = int(lm.group(1))
        else:  # indirect /Length N 0 R
            ref_body = objects.get(int(lm.group(1)), b"")
            digits = re.search(rb"\d+", ref_body)
            length = int(digits.group(0)) if digits else end - data_start
        end = min(end, data_start + length)
    data = body[data_start:end]
    if re.search(rb"/Filter\s*(\[\s*)?/FlateDecode", head):
        try:
            d = zlib.decompressobj()
            out = d.decompress(data, MAX_STREAM_BYTES)
            if d.unconsumed_tail:
                raise PDFError(
                    f"stream inflates past {MAX_STREAM_BYTES} bytes"
                )
            return out
        except zlib.error as e:
            raise PDFError(f"FlateDecode: {e}") from None
    return data


_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> str:
    """A PDF literal string body (inside parens): backslash escapes
    incl. 1-3 digit octal; bytes read as Latin-1."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i : i + 1]
        if e in _STR_ESCAPES:
            out += _STR_ESCAPES[e]
            i += 1
        elif e.isdigit():
            j = i
            while j < min(i + 3, n) and raw[j : j + 1].isdigit():
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e == b"\n":
            i += 1  # line continuation
        else:
            out += e
            i += 1
    return out.decode("latin-1")


# content-stream tokens we care about: strings, arrays, and operators
_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)"  # literal string
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>"  # hex string
    rb"|(?P<op>[A-Za-z'\"][A-Za-z0-9*'\"]*)"  # operator / keyword
    rb"|(?P<delim>[\[\]])"
)


def _page_text(content: bytes) -> str:
    """Text-showing walk of one content stream: Tj/'/\" and TJ emit
    glyph strings; Td/TD/T*/Tm and the ' / \" forms start new lines.
    Everything else (graphics, positioning numbers) is skipped."""
    parts: list[str] = []
    pending: list[str] = []

    def newline() -> None:
        if pending:
            parts.append("".join(pending))
            pending.clear()

    last_str: str | None = None
    in_array = False
    for m in _TOKEN_RE.finditer(content):
        if m.group("lit") is not None:
            last_str = _decode_literal(m.group("lit"))
            if in_array:
                pending.append(last_str)
        elif m.group("hex") is not None:
            h = re.sub(rb"\s", b"", m.group("hex"))
            if len(h) % 2:
                h += b"0"
            last_str = bytes.fromhex(h.decode("ascii")).decode("latin-1")
            if in_array:
                pending.append(last_str)
        elif m.group("delim") is not None:
            in_array = m.group("delim") == b"["
        else:
            op = m.group("op")
            if op == b"Tj" and last_str is not None:
                pending.append(last_str)
            elif op in (b"'", b'"') and last_str is not None:
                newline()
                pending.append(last_str)
            elif op == b"TJ":
                pass  # array strings were appended as they streamed by
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                newline()
            elif op == b"ET":
                newline()
            last_str = None
    newline()
    return "\n".join(p for p in parts if p)


def extract_text(payload: bytes) -> list[str]:
    """Per-page text (one string per /Type /Page object, document
    order by object number; pageless PDFs fall back to every stream
    that contains a BT block). Encrypted PDFs raise :class:`PDFError`
    — content streams are ciphertext, silence would be a lie."""
    if not is_pdf(payload):
        raise PDFError("not a PDF (no %PDF- header)")
    if b"/Encrypt" in payload:
        raise PDFError("encrypted PDF (no decryption support)")
    objects = _scan_objects(payload)
    pages: list[str] = []
    page_objs = sorted(
        num
        for num, body in objects.items()
        if re.search(rb"/Type\s*/Page\b(?!s)", _dict_of(body))
    )
    for num in page_objs:
        body = objects[num]
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", _dict_of(body))
        if cm is None:
            pages.append("")
            continue
        content = objects.get(int(cm.group(1)))
        data = _stream_data(content, objects) if content else None
        pages.append(_page_text(data) if data else "")
    if not page_objs:
        for num in sorted(objects):
            data = _stream_data(objects[num], objects)
            if data and b"BT" in data:
                pages.append(_page_text(data))
    return pages


@dataclass
class PdfImage:
    obj_num: int
    width: int
    height: int
    filter: str  # 'DCTDecode' | 'CCITTFaxDecode' | 'FlateDecode' | 'raw' | other
    data: bytes  # the ENCODED stream bytes (JPEG file for DCTDecode,
    # fax-coded bits for CCITTFaxDecode, inflated raw samples for
    # FlateDecode/raw) — decoding routes to the sibling codecs
    k: int = 0  # CCITT /K: <0 G4, 0 MH, >0 G3 2-D
    blackis1: bool = False


_INT_RE = {
    "w": re.compile(rb"/Width\s+(\d+)"),
    "h": re.compile(rb"/Height\s+(\d+)"),
    "k": re.compile(rb"/K\s+(-?\d+)"),
}
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/(\w+)")


def extract_images(payload: bytes) -> list[PdfImage]:
    """Embedded image XObjects (``/Subtype /Image``) in object-number
    order — the scanned-PDF path. Returns the ENCODED payloads plus
    the parameters needed to decode them with the sibling codecs:
    DCTDecode data IS a JPEG file (``jpeg_codec.decode_jpeg``),
    CCITTFaxDecode data is a fax-coded block (``ccitt.decode_g4`` /
    ``decode_g3`` / ``decode_mh`` per ``/K``; ``/BlackIs1`` flips the
    run-color convention), FlateDecode inflates here to raw samples.
    Unknown filters pass through tagged so callers can triage."""
    if not is_pdf(payload):
        raise PDFError("not a PDF (no %PDF- header)")
    objects = _scan_objects(payload)
    out: list[PdfImage] = []
    for num in sorted(objects):
        body = objects[num]
        head = _dict_of(body)
        if not re.search(rb"/Subtype\s*/Image\b", head):
            continue
        wm = _INT_RE["w"].search(head)
        hm = _INT_RE["h"].search(head)
        if wm is None or hm is None:
            continue  # geometry-less image: not decodable, skip
        fm = _FILTER_RE.search(head)
        filt = fm.group(1).decode("ascii") if fm else "raw"
        if filt == "FlateDecode":
            data = _stream_data(body, objects)  # inflates
            if data is None:
                continue
        else:
            # hand the ENCODED bytes out un-inflated: _stream_data
            # only decodes Flate, everything else passes through raw
            data = _stream_data(body, objects)
            if data is None:
                continue
        km = _INT_RE["k"].search(head)
        out.append(
            PdfImage(
                num,
                int(wm.group(1)),
                int(hm.group(1)),
                filt,
                data,
                k=int(km.group(1)) if km else 0,
                blackis1=bool(re.search(rb"/BlackIs1\s+true", head)),
            )
        )
    return out


def decode_pdf_image(img: PdfImage, max_pixels: int = 1 << 25):
    """Route an extracted image to the sibling decoders. Returns a
    ``png_codec.DecodedImage`` or raises (PDFError for unsupported
    filters — callers triage). CCITT decodes to gray with fax-black =
    luminance 0 ALWAYS: ``/BlackIs1`` only selects the bit-value
    convention of the filter's raw output (default false = black
    pixels stored as 0 bits), not which pixels are black — it is
    carried in :class:`PdfImage` for raw-bit consumers but does not
    change the gray decode."""
    if img.width * img.height > max_pixels:
        raise PDFError("image over the pixel budget")
    if img.filter == "DCTDecode":
        from .jpeg_codec import decode_jpeg

        return decode_jpeg(img.data, max_pixels)
    if img.filter == "CCITTFaxDecode":
        from . import ccitt
        from .png_codec import DecodedImage, _unpack_bits

        if img.k < 0:
            packed = ccitt.decode_g4(img.data, img.width, img.height)
        elif img.k == 0:
            packed = ccitt.decode_mh(img.data, img.width, img.height)
        else:
            packed = ccitt.decode_g3(
                img.data, img.width, img.height, two_d=True
            )
        gray = _unpack_bits(packed, img.width, img.height, 1, True)
        # ccitt emits 1 = fax-black; black is luminance 0
        gray = bytearray(255 - v for v in gray)
        return DecodedImage(img.width, img.height, 1, bytes(gray))
    if img.filter in ("FlateDecode", "raw"):
        from .png_codec import DecodedImage

        n = img.width * img.height
        for ch in (1, 3):
            if len(img.data) >= n * ch and (
                ch == 3 or len(img.data) < n * 3
            ):
                return DecodedImage(
                    img.width, img.height, ch, bytes(img.data[: n * ch])
                )
        raise PDFError("raw image data shorter than its geometry")
    raise PDFError(f"unsupported image filter {img.filter}")


# ---------------------------------------------------------------- writer



def _escape_literal(s: str) -> bytes:
    out = s.encode("latin-1", "replace")
    return (
        out.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    )


def build_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """Deterministic minimal PDF: catalog → pages tree → one page +
    Helvetica content stream per entry (each inner list is that
    page's text lines, one Td+Tj pair per line), optional
    FlateDecode, and a REAL xref table + trailer so readers that do
    trust the xref work too."""
    objs: list[bytes] = []
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = b" ".join(
        b"%d 0 R" % (3 + 2 * i) for i in range(n_pages)
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_num, page_num + 1)
        )
        body = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                body.append(b"0 -14 Td")
            body.append(b"(" + _escape_literal(line) + b") Tj")
        body.append(b"ET")
        stream = b"\n".join(body)
        filt = b""
        if compress:
            stream = zlib.compress(stream, 6)
            filt = b"/Filter /FlateDecode "
        objs.append(
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(stream)
            + stream + b"\nendstream"
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def build_scanned_pdf(images: list[dict]) -> bytes:
    """Deterministic scanned-document fixture: one page whose content
    draws each image XObject. Each dict: ``width``, ``height``,
    ``filter`` ('DCTDecode'/'CCITTFaxDecode'/'FlateDecode'), ``data``
    (ENCODED bytes), optional ``k``/``blackis1`` for CCITT. Real xref
    included."""
    objs: list[bytes] = []
    n = len(images)
    res = b" ".join(
        b"/Im%d %d 0 R" % (i, 4 + i) for i in range(n)
    )
    draw = b"\n".join(
        b"q 100 0 0 100 %d 100 cm /Im%d Do Q" % (50 + 120 * i, i)
        for i in range(n)
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << " + res + b" >> >> "
        b"/Contents %d 0 R >>" % (4 + n)
    )
    for im in images:
        extra = b""
        if im["filter"] == "CCITTFaxDecode":
            extra = b"/K %d " % im.get("k", 0)
            if im.get("blackis1"):
                extra += b"/BlackIs1 true "
            extra = (
                b"/DecodeParms << /Columns %d /Rows %d >> " % (
                    im["width"], im["height"]) + extra
            )
        objs.append(
            b"<< /Subtype /Image /Width %d /Height %d /Filter /%s "
            % (im["width"], im["height"], im["filter"].encode("ascii"))
            + extra
            + b"/Length %d >>\nstream\n" % len(im["data"])
            + im["data"] + b"\nendstream"
        )
    objs.append(
        b"<< /Length %d >>\nstream\n" % len(draw) + draw + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
