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
  strings decoded through the font's ToUnicode CMap when one exists
  (bfchar/bfrange, 1- and 2-byte codes — r11) and as Latin-1
  otherwise. No encryption, no embedded-font glyph re-encoding: text
  behind those returns as whatever the string bytes spell
  (crawl-grade best effort, never a crash);
- :func:`build_pdf`: a deterministic minimal writer (catalog, pages
  tree, Helvetica, per-page content streams, filter arms for every
  transport filter, the ObjStm + xref-stream modern layout, ToUnicode
  CMaps, real xref table in the classic layout) so round trips pin
  the object parser, the stream Length resolution, every decode path
  and the operator walk without binary fixtures.

Objects are found by scanning ``N G obj .. endobj`` pairs rather than
trusting the xref (crawled PDFs routinely carry broken or truncated
xrefs; the scan is what lenient real-world readers fall back to),
then ``/Type /ObjStm`` object streams are expanded so compressed
objects — the DEFAULT storage for most modern producers (r11) — join
the map. Stream CONTENT decodes through the full transport-filter
chain: FlateDecode, LZWDecode (shared with the TIFF codec),
ASCIIHexDecode, ASCII85Decode, RunLengthDecode, each honoring
``/DecodeParms`` predictors (TIFF horizontal + PNG rows — what xref
streams use). Stream bodies are skipped during the scan by their
``/Length`` so binary content can't fake object boundaries, with a
resync guard for lying lengths. All loops are bounded by the payload
size; corrupt structure raises :class:`PDFError`, which callers
triage rather than propagate.
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


def _find_stream_kw(payload: bytes, start: int) -> int:
    """Offset of the next TRUE ``stream`` keyword at/after ``start``,
    or -1. The spec requires the keyword to be followed by EOL and in
    practice it always follows the dict close / whitespace — so a
    ``stream`` substring inside a name (``/Mystream``), a literal
    string (``(a stream here)``) or the ``endstream`` keyword is NOT a
    stream start (r10 advice: the old inline guard compared
    ``payload[s_kw:s_kw+9]`` to ``endstream``, which can never match
    at a ``stream`` hit — any dict containing the bare substring
    raised a phantom 'stream without endstream')."""
    pos = start
    while True:
        s_kw = payload.find(b"stream", pos)
        if s_kw == -1:
            return -1
        pos = s_kw + 6
        if payload[s_kw - 3 : s_kw + 6] == b"endstream":
            continue
        prev = payload[s_kw - 1 : s_kw]
        if prev not in (b"", b" ", b"\t", b"\r", b"\n", b">"):
            continue
        nxt = payload[s_kw + 6 : s_kw + 7]
        if nxt not in (b"\r", b"\n"):
            continue
        return s_kw


def _scan_objects(payload: bytes) -> dict[int, bytes]:
    """{object number: body bytes} by scanning obj..endobj, skipping
    stream bodies by their declared /Length (indirect Lengths resolve
    in a second pass; a lying length falls back to searching for
    ``endstream``). Objects stored inside object streams are invisible
    here — :func:`_objects` layers the ObjStm expansion on top."""
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
            s_kw = _find_stream_kw(payload, search)
            if s_kw != -1 and (e_obj == -1 or s_kw < e_obj):
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


def _expand_object_streams(objects: dict[int, bytes]) -> dict[int, bytes]:
    """Objects stored compressed inside ``/Type /ObjStm`` streams
    (PDF 32000 §7.5.7 — the DEFAULT layout for most modern producers,
    and invisible to the obj..endobj scan) joined into the object map.
    The stream's first ``/First`` bytes are N (objnum, offset) integer
    pairs; bodies follow back-to-back. A direct object with the same
    number wins (incremental updates append direct revisions AFTER the
    original, and the scan already keeps the latest direct one)."""
    out = dict(objects)
    for num in sorted(objects):
        body = objects[num]
        if not re.search(rb"/Type\s*/ObjStm\b", _dict_of(body)):
            continue
        head = _dict_of(body)
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if nm is None or fm is None:
            raise PDFError("ObjStm without /N or /First")
        n, first = int(nm.group(1)), int(fm.group(1))
        if n > MAX_OBJECTS:
            raise PDFError(f"ObjStm declares more than {MAX_OBJECTS} objects")
        data = _stream_data(body, objects)
        if data is None or first > len(data):
            raise PDFError("ObjStm stream shorter than /First")
        toks = data[:first].split()
        if len(toks) < 2 * n:
            raise PDFError("ObjStm header shorter than /N pairs")
        try:
            pairs = [
                (int(toks[2 * i]), int(toks[2 * i + 1])) for i in range(n)
            ]
        except ValueError:
            raise PDFError("ObjStm header is not integer pairs") from None
        for i, (objnum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < n else len(data) - first
            if off < 0 or first + end > len(data) or end < off:
                raise PDFError("ObjStm offsets out of range")
            out.setdefault(objnum, data[first + off : first + end])
    return out


def _objects(payload: bytes) -> dict[int, bytes]:
    """The full object map: direct obj..endobj scan + ObjStm expansion."""
    return _expand_object_streams(_scan_objects(payload))


def parse_xref_stream(
    body: bytes, objects: dict[int, bytes]
) -> dict[int, tuple[int, int, int]]:
    """Entries of a ``/Type /XRef`` cross-reference stream (PDF 32000
    §7.5.8): {objnum: (type, field2, field3)} — type 1 = direct at
    offset field2, type 2 = compressed in ObjStm field2 at index
    field3, type 0 = free. /W gives the per-field byte widths (width
    0 = field defaulted: type defaults to 1), /Index the (start,
    count) subsections. The lenient reader doesn't NEED the xref —
    :func:`_objects` scans and expands — but parity tooling and tests
    verify the writer's table through this."""
    head = _dict_of(body)
    wm = re.search(rb"/W\s*\[([^\]]*)\]", head)
    if wm is None:
        raise PDFError("XRef stream without /W")
    widths = [int(x) for x in wm.group(1).split()]
    if len(widths) != 3 or sum(widths) <= 0 or max(widths) > 8:
        raise PDFError(f"XRef /W malformed: {widths}")
    sm = re.search(rb"/Size\s+(\d+)", head)
    if sm is None:
        raise PDFError("XRef stream without /Size")
    im = re.search(rb"/Index\s*\[([^\]]*)\]", head)
    if im is not None:
        nums = [int(x) for x in im.group(1).split()]
        if len(nums) % 2:
            raise PDFError("XRef /Index has odd length")
        sections = list(zip(nums[::2], nums[1::2]))
    else:
        sections = [(0, int(sm.group(1)))]
    data = _stream_data(body, objects)
    if data is None:
        raise PDFError("XRef object has no stream")
    rowlen = sum(widths)
    entries: dict[int, tuple[int, int, int]] = {}
    pos = 0
    for start, count in sections:
        for objnum in range(start, start + count):
            if pos + rowlen > len(data):
                raise PDFError("XRef stream shorter than its /Index")
            fields = []
            for w in widths:
                fields.append(
                    int.from_bytes(data[pos : pos + w], "big") if w else -1
                )
                pos += w
            if fields[0] == -1:
                fields[0] = 1  # zero-width type field defaults to 1
            entries[objnum] = (fields[0], max(fields[1], 0), max(fields[2], 0))
    return entries


def pdf_info(payload: bytes) -> PdfInfo:
    if not is_pdf(payload):
        raise PDFError("not a PDF (no %PDF- header)")
    version = payload[5:8].decode("latin-1", "replace")
    objects = _objects(payload)
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
    at = _find_stream_kw(body, 0)
    return body if at == -1 else body[:at]


# ---------------------------------------------------- stream filter chain

#: filters this module decodes in-chain; anything else (DCTDecode,
#: CCITTFaxDecode, JBIG2Decode, JPXDecode …) is an image codec whose
#: ENCODED bytes are the useful output (extract_images routes them to
#: the sibling decoders)
_TRANSPORT_FILTERS = frozenset(
    {
        "FlateDecode",
        "LZWDecode",
        "ASCIIHexDecode",
        "ASCII85Decode",
        "RunLengthDecode",
    }
)

_FILTER_LIST_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PARM_INT_RE = {
    k: re.compile(rb"/" + k.encode() + rb"\s+(-?\d+)")
    for k in ("Predictor", "Columns", "Colors", "BitsPerComponent",
              "EarlyChange")
}


def _balanced_dict(src: bytes, start: int) -> tuple[bytes, int]:
    """The ``<< .. >>`` dict starting at ``start`` (balanced nesting);
    returns (dict bytes incl. delimiters, end offset past ``>>``)."""
    if src[start : start + 2] != b"<<":
        raise PDFError("expected <<")
    depth = 0
    i = start
    n = len(src)
    while i < n - 1:
        two = src[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return src[start:i], i
        else:
            i += 1
    raise PDFError("unbalanced << >> dictionary")


def _parse_filters(head: bytes) -> tuple[list[str], list[dict]]:
    """(filter names in application order, per-filter int parm dicts)
    from an object dictionary. ``/DecodeParms`` may be one dict, an
    array of dict/null matching the filter array, or absent."""
    fm = _FILTER_LIST_RE.search(head)
    if fm is None:
        return [], []
    if fm.group(2) is not None:
        names = [fm.group(2).decode("ascii")]
    else:
        names = [n.decode("ascii") for n in _NAME_RE.findall(fm.group(1))]
    parms: list[dict] = [{} for _ in names]
    pm = re.search(rb"/(?:DecodeParms|DP)\b\s*", head)
    if pm is not None:
        at = pm.end()
        found: list[dict] = []
        if head[at : at + 2] == b"<<":
            d, _ = _balanced_dict(head, at)
            found = [_parm_ints(d)]
        elif head[at : at + 1] == b"[":
            i = at + 1
            while i < len(head) and head[i : i + 1] != b"]":
                if head[i : i + 2] == b"<<":
                    d, i = _balanced_dict(head, i)
                    found.append(_parm_ints(d))
                elif head[i : i + 4] == b"null":
                    found.append({})
                    i += 4
                else:
                    i += 1
        for i, p in enumerate(found[: len(names)]):
            parms[i] = p
    return names, parms


def _parm_ints(d: bytes) -> dict:
    return {
        k: int(m.group(1))
        for k, rx in _PARM_INT_RE.items()
        if (m := rx.search(d)) is not None
    }


def _undo_predictor(data: bytes, parms: dict) -> bytes:
    """Reverse the /Predictor pre-filter after Flate/LZW: 2 = TIFF
    horizontal differencing, >= 10 = PNG per-row filters (the form
    every xref stream in the wild uses — predictor 12/Up). Reuses the
    PNG codec's unfilter core."""
    pred = parms.get("Predictor", 1)
    if pred <= 1:
        return data
    columns = parms.get("Columns", 1)
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    stride = (columns * colors * bpc + 7) // 8
    if stride <= 0:
        raise PDFError("predictor with non-positive row stride")
    if pred == 2:
        if bpc != 8:
            raise PDFError("TIFF predictor only supported at 8 bpc")
        out = bytearray(data)
        for row in range(0, len(out) - stride + 1, stride):
            for i in range(row + colors, row + stride):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    if 10 <= pred <= 15:
        from .png_codec import PNGError, _unfilter

        if len(data) % (stride + 1):
            raise PDFError("PNG-predictor rows misaligned")
        height = len(data) // (stride + 1)
        bpp = max(1, (colors * bpc + 7) // 8)
        try:
            return bytes(_unfilter(data, stride, height, bpp))
        except PNGError as e:
            raise PDFError(f"predictor: {e}") from None
    raise PDFError(f"unknown /Predictor {pred}")


def _decode_one(data: bytes, name: str, parms: dict) -> bytes:
    if name == "FlateDecode":
        try:
            d = zlib.decompressobj()
            out = d.decompress(data, MAX_STREAM_BYTES)
            if d.unconsumed_tail:
                raise PDFError(
                    f"stream inflates past {MAX_STREAM_BYTES} bytes"
                )
        except zlib.error as e:
            raise PDFError(f"FlateDecode: {e}") from None
        return _undo_predictor(out, parms)
    if name == "LZWDecode":
        from .tiff_codec import TIFFError, lzw_decompress

        try:
            out = lzw_decompress(
                data, MAX_STREAM_BYTES,
                early=parms.get("EarlyChange", 1) != 0,
            )
        except TIFFError as e:
            raise PDFError(f"LZWDecode: {e}") from None
        return _undo_predictor(out, parms)
    if name == "ASCIIHexDecode":
        h = re.sub(rb"[\s>]", b"", data.split(b">", 1)[0] + b"")
        if len(h) % 2:
            h += b"0"
        try:
            return bytes.fromhex(h.decode("ascii"))
        except (ValueError, UnicodeDecodeError) as e:
            raise PDFError(f"ASCIIHexDecode: {e}") from None
    if name == "ASCII85Decode":
        import base64

        d = re.sub(rb"\s", b"", data)
        if d.endswith(b"~>"):
            d = d[:-2]
        if d.startswith(b"<~"):
            d = d[2:]
        try:
            return base64.a85decode(d)
        except ValueError as e:
            raise PDFError(f"ASCII85Decode: {e}") from None
    if name == "RunLengthDecode":
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            b = data[i]
            i += 1
            if b == 128:
                break
            if b < 128:
                if i + b + 1 > n:
                    raise PDFError("RunLengthDecode literal truncated")
                out += data[i : i + b + 1]
                i += b + 1
            else:
                if i >= n:
                    raise PDFError("RunLengthDecode run truncated")
                out += bytes([data[i]]) * (257 - b)
                i += 1
            if len(out) > MAX_STREAM_BYTES:
                raise PDFError(
                    f"RunLengthDecode past {MAX_STREAM_BYTES} bytes"
                )
        return bytes(out)
    raise PDFError(f"not a transport filter: {name}")  # pragma: no cover


def _raw_stream_bytes(
    body: bytes, objects: dict[int, bytes]
) -> tuple[bytes, bytes] | None:
    """(dict head, raw stream bytes before any filter) or None."""
    at = _find_stream_kw(body, 0)
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
    return head, body[data_start:end]


def _stream_data(
    body: bytes,
    objects: dict[int, bytes],
    want_remaining: bool = False,
):
    """The stream content of an object decoded through its TRANSPORT
    filter chain (Flate / LZW / ASCIIHex / ASCII85 / RunLength, each
    with /DecodeParms predictors), or None if it has no stream. The
    chain stops at the first image-codec filter (DCTDecode, CCITT…) —
    those bytes ARE the useful output and route to the sibling
    decoders. ``want_remaining`` additionally returns the undecoded
    filter tail (empty when fully decoded)."""
    raw = _raw_stream_bytes(body, objects)
    if raw is None:
        return (None, []) if want_remaining else None
    head, data = raw
    names, parms = _parse_filters(head)
    idx = 0
    for name, parm in zip(names, parms):
        if name not in _TRANSPORT_FILTERS:
            break
        data = _decode_one(data, name, parm)
        idx += 1
    return (data, names[idx:]) if want_remaining else data


_STR_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _literal_bytes(raw: bytes) -> bytes:
    """A PDF literal string body (inside parens) with backslash
    escapes (1-3 digit octal included) resolved to raw glyph-code
    bytes — what a font CMap maps; Latin-1 is the no-CMap fallback."""
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
    return bytes(out)


# ------------------------------------------------------- ToUnicode CMaps

_HEX_ITEM_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_cmap(data: bytes) -> tuple[int, dict[int, str]]:
    """(code byte length, {glyph code: unicode str}) from a ToUnicode
    CMap stream (PDF 32000 §9.10.3): ``bfchar`` pairs, ``bfrange``
    with an incrementing dst or an explicit dst array; dst hex is
    UTF-16BE. Code length comes from the codespacerange src width
    (1-byte simple fonts, 2-byte CID fonts), defaulting to the first
    mapping's src width."""
    code_len = 0
    cm = re.search(
        rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data
    )
    if cm is not None:
        code_len = max(1, len(cm.group(1)) // 2)

    def _uni(h: bytes) -> str:
        b = bytes.fromhex(h.decode("ascii"))
        if len(b) % 2:
            b = b"\x00" + b
        return b.decode("utf-16-be", "replace")

    mapping: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        items = _HEX_ITEM_RE.findall(m.group(1))
        for i in range(0, len(items) - 1, 2):
            src, dst = items[i], items[i + 1]
            if not code_len:
                code_len = max(1, len(src) // 2)
            mapping[int(src, 16)] = _uni(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        body = m.group(1)
        pos = 0
        while True:
            lo_m = _HEX_ITEM_RE.search(body, pos)
            if lo_m is None:
                break
            hi_m = _HEX_ITEM_RE.search(body, lo_m.end())
            if hi_m is None:
                break
            if not code_len:
                code_len = max(1, len(lo_m.group(1)) // 2)
            lo, hi = int(lo_m.group(1), 16), int(hi_m.group(1), 16)
            if hi < lo or hi - lo > 1 << 16:
                raise PDFError("bfrange out of order or oversized")
            # dst: either one hex item (incrementing) or [ <..> <..> ]
            rest = body[hi_m.end() :].lstrip()
            if rest.startswith(b"["):
                close = rest.find(b"]")
                if close == -1:
                    raise PDFError("bfrange dst array unterminated")
                dsts = _HEX_ITEM_RE.findall(rest[:close])
                for i, d in enumerate(dsts[: hi - lo + 1]):
                    mapping[lo + i] = _uni(d)
                pos = hi_m.end() + len(body[hi_m.end() :]) - len(rest) \
                    + close + 1
            else:
                d_m = _HEX_ITEM_RE.search(body, hi_m.end())
                if d_m is None:
                    break
                base_hex = d_m.group(1)
                base = int(base_hex, 16)
                # dst byte width, rounded up to whole UTF-16BE units;
                # a hostile bfrange whose dst overflows the declared
                # width widens per-item so it degrades, never crashes
                width = max(2, (len(base_hex) + 3) // 4 * 2)
                for i in range(hi - lo + 1):
                    v = base + i
                    w = max(width, (v.bit_length() + 15) // 16 * 2)
                    mapping[lo + i] = v.to_bytes(w, "big").decode(
                        "utf-16-be", "replace"
                    )
                pos = d_m.end()
    return (code_len or 1), mapping


def _apply_cmap(raw: bytes, code_len: int, mapping: dict[int, str]) -> str:
    out: list[str] = []
    for i in range(0, len(raw), code_len):
        chunk = raw[i : i + code_len]
        code = int.from_bytes(chunk, "big")
        got = mapping.get(code)
        out.append(got if got is not None else chunk.decode("latin-1"))
    return "".join(out)


def _ref_or_none(src: bytes, key: bytes) -> int | None:
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", src)
    return int(m.group(1)) if m else None


def _resources_of(page_head: bytes, objects: dict[int, bytes]) -> bytes:
    """The page's /Resources dict bytes — inline or via indirect ref."""
    m = re.search(rb"/Resources\s*", page_head)
    if m is None:
        return b""
    at = m.end()
    if page_head[at : at + 2] == b"<<":
        d, _ = _balanced_dict(page_head, at)
        return d
    ref = _ref_or_none(page_head[m.start() : at + 32], rb"/Resources")
    if ref is not None:
        return objects.get(ref, b"")
    return b""


def _font_cmaps(
    page_head: bytes, objects: dict[int, bytes]
) -> dict[bytes, tuple[int, dict[int, str]]]:
    """{font resource name: (code_len, ToUnicode map)} for fonts that
    carry one; fonts without a ToUnicode fall back to Latin-1."""
    res = _resources_of(page_head, objects)
    fm = re.search(rb"/Font\s*", res)
    if fm is None:
        return {}
    at = fm.end()
    if res[at : at + 2] == b"<<":
        fdict, _ = _balanced_dict(res, at)
    else:
        ref = _ref_or_none(res[fm.start() : at + 32], rb"/Font")
        fdict = objects.get(ref, b"") if ref is not None else b""
    out: dict[bytes, tuple[int, dict[int, str]]] = {}
    for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fdict):
        font = objects.get(int(m.group(2)))
        if font is None:
            continue
        tu = _ref_or_none(_dict_of(font), rb"/ToUnicode")
        if tu is None or tu not in objects:
            continue
        data = _stream_data(objects[tu], objects)
        if data is None:
            continue
        out[m.group(1)] = _parse_cmap(data)
    return out


# content-stream tokens we care about: strings, arrays, names, operators
_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)"  # literal string
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>"  # hex string
    rb"|/(?P<name>[^\s/<>\[\]()%]+)"  # name (font selection via Tf)
    rb"|(?P<op>[A-Za-z'\"][A-Za-z0-9*'\"]*)"  # operator / keyword
    rb"|(?P<delim>[\[\]])"
)


def _page_text(content: bytes, fonts=None) -> str:
    """Text-showing walk of one content stream: Tj/'/\" and TJ emit
    glyph strings; Td/TD/T*/Tm and the ' / \" forms start new lines.
    ``fonts`` maps resource names to (code_len, ToUnicode dict) — the
    ``Tf`` operator switches the active map; strings under a mapped
    font decode through it, everything else reads as Latin-1.
    Graphics and positioning numbers are skipped."""
    parts: list[str] = []
    pending: list[str] = []

    def newline() -> None:
        if pending:
            parts.append("".join(pending))
            pending.clear()

    def decode(raw: bytes) -> str:
        if cur_map is not None:
            return _apply_cmap(raw, cur_map[0], cur_map[1])
        return raw.decode("latin-1")

    last_str: str | None = None
    last_name: bytes | None = None
    cur_map: tuple[int, dict[int, str]] | None = None
    in_array = False
    for m in _TOKEN_RE.finditer(content):
        if m.group("lit") is not None:
            last_str = decode(_literal_bytes(m.group("lit")))
            if in_array:
                pending.append(last_str)
        elif m.group("hex") is not None:
            h = re.sub(rb"\s", b"", m.group("hex"))
            if len(h) % 2:
                h += b"0"
            last_str = decode(bytes.fromhex(h.decode("ascii")))
            if in_array:
                pending.append(last_str)
        elif m.group("name") is not None:
            last_name = m.group("name")
            last_str = None
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
            elif op == b"Tf" and fonts and last_name is not None:
                cur_map = fonts.get(last_name)
            last_str = None
    newline()
    return "\n".join(p for p in parts if p)


def extract_text(payload: bytes) -> list[str]:
    """Per-page text (one string per /Type /Page object — including
    pages stored inside object streams — document order by object
    number; pageless PDFs fall back to every stream that contains a
    BT block). ``/Contents`` may be one ref or an array of refs
    (parts join with a newline, per the spec's stream concatenation).
    Fonts carrying a /ToUnicode CMap decode through it. Encrypted
    PDFs raise :class:`PDFError` — content streams are ciphertext,
    silence would be a lie."""
    if not is_pdf(payload):
        raise PDFError("not a PDF (no %PDF- header)")
    if b"/Encrypt" in payload:
        raise PDFError("encrypted PDF (no decryption support)")
    objects = _objects(payload)
    pages: list[str] = []
    page_objs = sorted(
        num
        for num, body in objects.items()
        if re.search(rb"/Type\s*/Page\b(?!s)", _dict_of(body))
    )
    for num in page_objs:
        head = _dict_of(objects[num])
        cm = re.search(
            rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[([^\]]*)\])", head
        )
        if cm is None:
            pages.append("")
            continue
        if cm.group(1) is not None:
            refs = [int(cm.group(1))]
        else:
            refs = [
                int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", cm.group(2))
            ]
        fonts = _font_cmaps(head, objects)
        texts = []
        for ref in refs:
            content = objects.get(ref)
            data = _stream_data(content, objects) if content else None
            if data:
                texts.append(_page_text(data, fonts))
        pages.append("\n".join(t for t in texts if t))
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
    objects = _objects(payload)
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
        # transport filters (incl. chains like [/ASCII85 /DCTDecode])
        # decode here; the remaining filter names the image codec the
        # payload routes to — 'FlateDecode' is kept as the label for a
        # fully-inflated raw-sample image (decode_pdf_image contract)
        data, remaining = _stream_data(body, objects, want_remaining=True)
        if data is None:
            continue
        if remaining:
            filt = remaining[0]
        else:
            names, _ = _parse_filters(head)
            filt = "FlateDecode" if names else "raw"
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


def _encode_content(stream: bytes, filt: str | None) -> tuple[bytes, bytes]:
    """(encoded stream bytes, ``/Filter …`` dict fragment) for the
    writer's content-filter fixture arms. Every name here has a
    matching decode path in :func:`_decode_one`, so round trips pin
    each transport filter without binary fixtures."""
    if filt is None:
        return stream, b""
    if filt == "flate":
        return zlib.compress(stream, 6), b"/Filter /FlateDecode "
    if filt == "lzw":
        from .tiff_codec import _lzw_encode

        return _lzw_encode(stream), b"/Filter /LZWDecode "
    if filt == "ahx":
        return (
            stream.hex().encode("ascii") + b">",
            b"/Filter /ASCIIHexDecode ",
        )
    if filt == "a85":
        import base64

        return base64.a85encode(stream) + b"~>", b"/Filter /ASCII85Decode "
    if filt == "rl":
        out = bytearray()
        for i in range(0, len(stream), 128):
            chunk = stream[i : i + 128]
            out.append(len(chunk) - 1)
            out += chunk
        out.append(128)  # EOD
        return bytes(out), b"/Filter /RunLengthDecode "
    raise ValueError(f"unknown content_filter {filt!r}")


def _cmap_stream(ranges: list[tuple[int, int, int]]) -> bytes:
    """A minimal ToUnicode CMap: one-byte codespace, ``bfrange``
    triples (lo, hi, dst_start) with UTF-16BE destinations."""
    out = [
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
        b"begincmap\n1 begincodespacerange\n<00> <ff>\n"
        b"endcodespacerange\n",
        b"%d beginbfrange\n" % len(ranges),
    ]
    for lo, hi, dst in ranges:
        out.append(b"<%02x> <%02x> <%04x>\n" % (lo, hi, dst))
    out.append(b"endbfrange\nendcmap\nend\nend")
    return b"".join(out)


def _xref_stream_bytes(
    entries: list[tuple[int, int, int]], extra_dict: bytes
) -> bytes:
    """A /Type /XRef object body: W [1 2 2] rows for objects
    0..len-1, PNG predictor-12 Up-filtered then deflated (the layout
    every modern producer emits, so the reader's predictor path gets
    exercised by our own fixtures)."""
    stride = 5
    rows = bytearray()
    prev = bytes(stride)
    for t, f2, f3 in entries:
        row = bytes([t]) + f2.to_bytes(2, "big") + f3.to_bytes(2, "big")
        rows.append(2)  # PNG Up filter
        rows += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        prev = row
    data = zlib.compress(bytes(rows), 6)
    return (
        b"<< /Type /XRef /Size %d /W [1 2 2] /Root 1 0 R "
        b"/Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 5 >> "
        % len(entries)
        + extra_dict
        + b"/Length %d >>\nstream\n" % len(data)
        + data
        + b"\nendstream"
    )


def build_pdf(
    pages: list[list[str]],
    compress: bool = False,
    content_filter: str | None = None,
    compress_objects: bool = False,
    tounicode: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Deterministic minimal PDF: catalog → pages tree → one page +
    Helvetica content stream per entry (each inner list is that
    page's text lines, one Td+Tj pair per line).

    Fixture arms (each pinning a reader path):

    * ``compress`` / ``content_filter``: content streams under
      FlateDecode (``compress=True`` ≡ ``content_filter='flate'``),
      LZWDecode (``'lzw'``), ASCIIHexDecode (``'ahx'``),
      ASCII85Decode (``'a85'``) or RunLengthDecode (``'rl'``);
    * ``compress_objects``: the modern-producer layout — every
      non-stream object (catalog, pages tree, page dicts, font) lives
      compressed inside a ``/Type /ObjStm``, and the cross-reference
      is a predictor-12 ``/Type /XRef`` stream (no table, no
      ``trailer`` keyword);
    * ``tounicode``: bfrange triples (lo, hi, dst_start) attached to
      the font as a ToUnicode CMap, so extracted text maps through it.

    The default layout writes a REAL xref table + trailer so readers
    that do trust the xref work too.
    """
    filt_name = content_filter or ("flate" if compress else None)
    objs: list[bytes] = []
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    tu_num = font_num + 1 if tounicode else None
    kids = b" ".join(
        b"%d 0 R" % (3 + 2 * i) for i in range(n_pages)
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    stream_objs = set()
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
        stream, filt = _encode_content(b"\n".join(body), filt_name)
        objs.append(
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(stream)
            + stream + b"\nendstream"
        )
        stream_objs.add(page_num + 1)
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
    if tu_num is not None:
        font += b" /ToUnicode %d 0 R" % tu_num
    objs.append(font + b" >>")
    if tu_num is not None:
        cmap = zlib.compress(_cmap_stream(tounicode), 6)
        objs.append(
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(cmap)
            + cmap + b"\nendstream"
        )
        stream_objs.add(tu_num)

    if not compress_objects:
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

    # modern layout: dict objects into one ObjStm, xref as a stream
    objstm_num = len(objs) + 1
    xref_num = len(objs) + 2
    compressed = [
        n for n in range(1, len(objs) + 1) if n not in stream_objs
    ]
    header = bytearray()
    bodies = bytearray()
    offs: dict[int, int] = {}
    for n in compressed:
        offs[n] = len(bodies)
        bodies += objs[n - 1] + b"\n"
    for n in compressed:
        header += b"%d %d " % (n, offs[n])
    stm = zlib.compress(bytes(header) + bytes(bodies), 6)
    objstm = (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (len(compressed), len(header), len(stm))
        + stm + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n")
    direct_at: dict[int, int] = {}
    for n in sorted(stream_objs):
        direct_at[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n - 1] + b"\nendobj\n"
    direct_at[objstm_num] = len(out)
    out += b"%d 0 obj\n" % objstm_num + objstm + b"\nendobj\n"
    xref_at = len(out)
    entries: list[tuple[int, int, int]] = [(0, 0, 65535)]
    for n in range(1, xref_num + 1):
        if n in direct_at:
            entries.append((1, direct_at[n], 0))
        elif n == xref_num:
            entries.append((1, xref_at, 0))
        else:
            entries.append((2, objstm_num, compressed.index(n)))
    out += (
        b"%d 0 obj\n" % xref_num
        + _xref_stream_bytes(entries, b"")
        + b"\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
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
