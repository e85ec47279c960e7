"""Pure-stdlib uncompressed-AVI video codec (r7 verdict task 5).

Video frame sampling was the last fully-fake multimodal path. AVI is
RIFF (the same container family as WAV — Microsoft 1992), and frames
of a ``BI_RGB`` (biCompression=0) DIB stream need no codec at all:
each ``00db``/``00dc`` chunk is a bottom-up, BGR, 4-byte-row-aligned
pixel dump. This module walks the nested RIFF LIST tree (``hdrl`` →
``strl`` → ``strf`` BITMAPINFOHEADER, then ``movi``, including
``rec `` groupings), validates the stream is uncompressed 24-bit, and
decodes every video frame to the shared ``png_codec.DecodedImage``
(top-down RGB) — so dHash / featurize / resize work on real video
frames unchanged. A minimal writer (:func:`encode_avi`) builds
fixtures and drives round-trip tests.

Motion-JPEG streams (fourcc ``MJPG``) also decode for real: every
frame chunk is a standalone JPEG, routed through :mod:`.jpeg_codec`.
Palettized 8-bit DIBs (RGBQUAD table in strf) and 32-bit BGRX decode
since r9. Other compressed fourccs (cinepak/DV/...) and the remaining
packed depths (1/2/4-bit, 16-bit 555/565) raise
:class:`UnsupportedAVI` and fall back to the documented stub path,
exactly like the other codecs' gates. Budgets cap declared dimensions
and frame counts so a tiny forged header can't allocate gigabytes.

Everything is driver-free pure Python over ``bytes``; it runs inside
the Arrow-batched ``mapInPandas`` workers of
``extensions.multimodal``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .png_codec import DecodedImage

#: per-frame pixel budget and frame-count budget (decompression-bomb
#: guards: AVI headers declare both up-front)
MAX_FRAME_PIXELS = 1 << 24
MAX_FRAMES = 1 << 14

MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


class AVIError(ValueError):
    """Malformed AVI payload."""


class UnsupportedAVI(NotImplementedError):
    """Valid AVI, but a form this codec doesn't implement (compressed
    video other than MJPG; 1/2/4-bit packed or 16-bit DIBs). Callers
    treat it like the stub gate."""


@dataclass
class AVIInfo:
    width: int
    height: int
    bit_count: int
    compression: int
    n_frames: int  # count of video frame chunks actually present
    top_down: bool
    palette: bytes | None = None  # RGBQUAD (B,G,R,x) entries, 8-bit DIBs


def is_avi(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
    )


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, list_type|None, body_start, body_end) for every
    chunk in [pos, end); LIST chunks yield their type and are then
    descended into by the caller."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body_start = pos + 8
        body_end = body_start + clen
        if body_end > end:
            raise AVIError(f"truncated {cid!r} chunk")
        if cid in (b"LIST", b"RIFF"):
            if clen < 4:
                raise AVIError("LIST chunk too short for a type")
            yield cid, buf[body_start : body_start + 4], body_start + 4, body_end
        else:
            yield cid, None, body_start, body_end
        pos = body_end + (clen & 1)  # chunks are word-aligned


def _video_frame_chunks(
    buf: bytes, pos: int, end: int, ids: tuple[bytes, bytes], out: list
) -> None:
    """Collect the video stream's frame chunk bodies (ids carry the
    stream INDEX, e.g. ``01db`` when audio is stream 0), descending
    into ``rec `` grouping LISTs (AVI interleaving writes frames
    there)."""
    for cid, ltype, s, e in _walk(buf, pos, end):
        if cid == b"LIST" and ltype == b"rec ":
            _video_frame_chunks(buf, s, e, ids, out)
        elif cid in ids:
            out.append(buf[s:e])


def parse_avi(
    payload: bytes,
    max_frame_pixels: int = MAX_FRAME_PIXELS,
    max_frames: int = MAX_FRAMES,
    lenient: bool = False,
) -> tuple[AVIInfo, list[bytes]]:
    """Header walk + frame chunk collection (no pixel work). Returns
    (info, raw frame chunk bodies). Raises :class:`AVIError` on a
    malformed container and :class:`UnsupportedAVI` on compressed /
    non-24-bit streams or budget breaches. ``lenient=True`` (the
    media_info triage path) keeps the malformed-container errors but
    waives the decode gates — geometry/fourcc/frame-count of a
    codec-we-can't-decode stream is still valid METADATA, and no pixel
    work follows that the budgets would protect."""
    if not is_avi(payload):
        raise AVIError("not a RIFF/AVI payload")
    strf = None
    video_stream = None  # index of the vids stream among strl LISTs
    stream_no = 0
    frames: list[bytes] = []

    def _hdrl(pos: int, end: int) -> None:
        nonlocal strf, video_stream, stream_no
        for cid, ltype, s, e in _walk(payload, pos, end):
            if cid == b"LIST" and ltype == b"strl":
                stype = None
                for c2, _l2, s2, e2 in _walk(payload, s, e):
                    if c2 == b"strh":
                        stype = payload[s2 : s2 + 4]
                    elif c2 == b"strf" and stype == b"vids" and strf is None:
                        strf = payload[s2:e2]
                        video_stream = stream_no
                stream_no += 1
            elif cid == b"LIST" and ltype is not None:
                _hdrl(s, e)

    movi_spans: list[tuple[int, int]] = []
    for cid, ltype, s, e in _walk(payload, 12, len(payload)):
        if cid == b"LIST" and ltype == b"hdrl":
            _hdrl(s, e)
        elif cid == b"LIST" and ltype == b"movi":
            movi_spans.append((s, e))
    if strf is not None:
        # frame chunk ids carry the STREAM index — an audio-first AVI
        # stores its video frames as 01db/01dc, not 00db
        pfx = b"%02d" % video_stream
        for s, e in movi_spans:
            _video_frame_chunks(payload, s, e, (pfx + b"db", pfx + b"dc"), frames)

    if strf is None:
        raise AVIError("no video stream (strl/strh 'vids' + strf) found")
    if len(strf) < 40:
        raise AVIError("BITMAPINFOHEADER shorter than 40 bytes")
    (
        _bisize,
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
    ) = struct.unpack("<IiiHHIIiiII", strf[:40])
    if planes != 1 or width <= 0 or height == 0:
        raise AVIError("invalid BITMAPINFOHEADER geometry")
    top_down = height < 0
    height = abs(height)
    palette: bytes | None = None
    if compression == MJPG_FOURCC:
        # Motion-JPEG: every frame chunk is a standalone baseline JPEG
        # — decodable since the r8 jpeg_codec landed (the r7 verdict's
        # "keep MJPEG gated until the JPEG task lands" condition)
        pass
    elif compression != 0:  # other fourccs need real codec libraries
        if not lenient:
            fourcc = struct.pack("<I", compression)
            raise UnsupportedAVI(f"compressed video stream {fourcc!r}")
    elif bit_count == 8:
        # palettized DIB (r9): RGBQUAD table follows the 40-byte
        # header inside strf; biClrUsed==0 means a full 256 entries
        n_pal = clr_used or 256
        if n_pal > 256:
            raise AVIError("8-bit DIB declares more than 256 colors")
        if len(strf) < 40 + 4 * n_pal:
            raise AVIError("palettized DIB without a full palette")
        palette = strf[40 : 40 + 4 * n_pal]
    elif bit_count in (24, 32):
        # biClrUsed on a truecolor DIB is a legal "important colors"
        # hint; it does not affect decode
        pass
    else:  # 1/2/4-bit packed and 16-bit 555/565 stay gated
        if not lenient:
            raise UnsupportedAVI(f"{bit_count}-bit DIB (8/24/32 decode)")
    if not lenient:
        if width * height > max_frame_pixels:
            raise UnsupportedAVI(
                f"{width}x{height} exceeds the {max_frame_pixels}-pixel budget"
            )
        if len(frames) > max_frames:
            raise UnsupportedAVI(
                f"{len(frames)} frames exceed the {max_frames}-frame budget"
            )
    return (
        AVIInfo(
            width, height, bit_count, compression, len(frames), top_down,
            palette,
        ),
        frames,
    )


def probe_avi(payload: bytes | None) -> bool:
    """True iff :func:`decode_avi_frames` would accept the container:
    an uncompressed 24-bit DIB or MJPEG video stream within budgets,
    with consistent geometry. Probes frame HEADERS (DIB size check /
    per-frame :func:`jpeg_codec.probe_jpeg`), never pixel work."""
    if payload is None or not is_avi(payload):
        return False
    try:
        info, frames = parse_avi(payload)
    except (AVIError, UnsupportedAVI, struct.error):
        return False
    if info.compression == MJPG_FOURCC:
        from . import jpeg_codec

        return all(jpeg_codec.probe_jpeg(f) for f in frames)
    stride = ((info.width * (info.bit_count // 8) + 3) // 4) * 4
    return all(len(f) >= stride * info.height for f in frames)


def _decode_frame(data: bytes, info: AVIInfo) -> DecodedImage:
    if info.compression == MJPG_FOURCC:
        from . import jpeg_codec

        try:
            img = jpeg_codec.decode_jpeg(data)
        except jpeg_codec.UnsupportedJPEG as e:
            raise UnsupportedAVI(f"MJPEG frame: {e}") from e
        except jpeg_codec.JPEGError as e:
            raise AVIError(f"bad MJPEG frame: {e}") from e
        if img.channels == 1:
            # normalize to the 3-channel frame contract
            img = DecodedImage(
                img.width, img.height, 3,
                bytes(b for v in img.pixels for b in (v, v, v)),
            )
        return img
    # the raster is the same DIB structure a .bmp file carries — one
    # shared walk (BGR swap, alignment, palette, bottom-up flip)
    from .bmp_codec import decode_dib_rows

    rgb = decode_dib_rows(
        data, info.width, info.height, info.bit_count, info.top_down,
        info.palette, errcls=AVIError,
    )
    return DecodedImage(info.width, info.height, 3, rgb)


def decode_avi_frames(
    payload: bytes,
    max_frame_pixels: int = MAX_FRAME_PIXELS,
    max_frames: int = MAX_FRAMES,
) -> list[DecodedImage]:
    """Decode every video frame to top-down RGB ``DecodedImage``s."""
    info, frames = parse_avi(payload, max_frame_pixels, max_frames)
    return [_decode_frame(f, info) for f in frames]


def decode_avi_frames_at(
    payload: bytes,
    indices: list[int] | None = None,
    stride: int | None = None,
    max_frame_pixels: int = MAX_FRAME_PIXELS,
    max_frames: int = MAX_FRAMES,
) -> tuple[AVIInfo, list[tuple[int, DecodedImage]]]:
    """(stream info incl. total frame count, [(index, decoded frame)])
    for the requested ``indices`` (out-of-range ignored) or every
    ``stride``-th frame — the container walk is one pass either way,
    but pixel work (row copy + BGR swap, or the per-frame JPEG decode
    for MJPEG) happens just for the selected frames; a stride-s
    sampler pays 1/s of the decode."""
    info, frames = parse_avi(payload, max_frame_pixels, max_frames)
    if indices is None:
        if stride is None or stride < 1:
            raise ValueError("pass indices or a positive stride")
        indices = range(0, len(frames), stride)  # type: ignore[assignment]
    picked = [
        (i, _decode_frame(frames[i], info))
        for i in indices
        if 0 <= i < len(frames)
    ]
    return info, picked


def encode_avi(
    frames: list[DecodedImage],
    fps: int = 10,
    codec: str = "rgb",
    quant_luma: list[int] | None = None,
) -> bytes:
    """Minimal AVI writer. ``codec='rgb'``: uncompressed 24-bit DIB —
    the decode inverse for RGB frames
    (``decode(encode(fs))[i].pixels == fs[i].pixels`` exactly).
    ``codec='rgb32'``: the same pixels as 32-bit BGRX rows.
    ``codec='pal8'``: palettized 8-bit DIB — a deterministic palette of
    the frames' sorted unique colors (<= 256 or ``ValueError``) lands
    as RGBQUADs behind the BITMAPINFOHEADER; also an exact decode
    inverse. ``codec='mjpeg'``: every frame is a standalone baseline JPEG
    (grayscale or RGB 4:4:4; pass ``quant_luma`` — e.g.
    ``jpeg_codec.QUANT_FLAT8`` keeps flat-block fixtures byte-exact
    through the lossy codec). All frames must share one geometry.
    Emits the canonical hdrl(avih + strl(strh+strf)) + movi layout
    with an idx1 index so external players accept the file."""
    if not frames:
        raise ValueError("at least one frame required")
    if codec not in ("rgb", "rgb32", "pal8", "mjpeg"):
        raise ValueError("codec must be 'rgb', 'rgb32', 'pal8' or 'mjpeg'")
    w, h = frames[0].width, frames[0].height
    want_c = frames[0].channels if codec == "mjpeg" else 3
    if want_c not in (1, 3):
        raise ValueError("frames must be 1- or 3-channel")
    for f in frames:
        if (f.width, f.height, f.channels) != (w, h, want_c):
            raise ValueError("all frames must share geometry and channels")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    bit_count = {"rgb": 24, "rgb32": 32, "pal8": 8, "mjpeg": 24}[codec]
    stride = ((w * (bit_count // 8) + 3) // 4) * 4
    frame_size = stride * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    palette_blob = b""
    if codec == "mjpeg":
        from . import jpeg_codec

        dib_frames = [
            jpeg_codec.encode_jpeg(
                bytes(f.pixels), w, h, want_c, quant_luma=quant_luma
            )
            for f in frames
        ]
        frame_size = max(len(d) for d in dib_frames)
    elif codec == "pal8":
        # deterministic palette: sorted unique colors across all frames
        colors = sorted(
            {
                tuple(f.pixels[i : i + 3])
                for f in frames
                for i in range(0, len(f.pixels), 3)
            }
        )
        if len(colors) > 256:
            raise ValueError(
                f"pal8 needs <= 256 distinct colors, got {len(colors)}"
            )
        index = {c: i for i, c in enumerate(colors)}
        palette_blob = b"".join(
            bytes((b, g, r, 0)) for (r, g, b) in colors  # RGBQUAD
        )
        dib_frames = []
        for f in frames:
            rows = []
            for row in range(h - 1, -1, -1):  # bottom-up
                base = row * w * 3
                line = bytes(
                    index[tuple(f.pixels[base + 3 * x : base + 3 * x + 3])]
                    for x in range(w)
                )
                rows.append(line + b"\x00" * (stride - len(line)))
            dib_frames.append(b"".join(rows))
    else:
        px_bytes = bit_count // 8
        dib_frames = []
        for f in frames:
            rows = []
            for row in range(h - 1, -1, -1):  # bottom-up
                line = bytearray()
                base = row * w * 3
                for x in range(w):
                    r, g, b = (
                        f.pixels[base + 3 * x],
                        f.pixels[base + 3 * x + 1],
                        f.pixels[base + 3 * x + 2],
                    )
                    # BGR, plus a zero pad byte for 32-bit BGRX
                    line += bytes((b, g, r)) + b"\x00" * (px_bytes - 3)
                line += b"\x00" * (stride - len(line))
                rows.append(bytes(line))
            dib_frames.append(b"".join(rows))

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    handler = b"MJPG" if codec == "mjpeg" else b"DIB "
    compression = MJPG_FOURCC if codec == "mjpeg" else 0
    frame_id = b"00dc" if codec == "mjpeg" else b"00db"
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0,  # flags, priority+lang
            0,  # initial frames
            1, fps,  # scale, rate
            0, len(frames),  # start, length
            frame_size, 0xFFFFFFFF & -1, 0,  # bufsize, quality(-1), samplesize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bit_count, compression, frame_size, 0, 0,
        len(palette_blob) // 4, 0,
    ) + palette_blob
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(frame_id, d) for d in dib_frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi type word
    idx = bytearray()
    off = 4
    for d in dib_frames:
        idx += frame_id + struct.pack("<III", 0x10, off, len(d))
        off += 8 + len(d) + (len(d) & 1)
    idx1 = chunk(b"idx1", bytes(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
