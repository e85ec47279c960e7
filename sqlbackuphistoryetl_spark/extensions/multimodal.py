"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a content_type.
Decode/feature-extraction runs as Arrow-batched pandas iterators
(``mapInPandas``) — the only place Python touches data, and it touches
whole columnar batches, never rows. PNG decodes FOR REAL through the
stdlib codec in :mod:`.png_codec` (zlib + struct — decode, resize,
re-encode, real-pixel featurization, perceptual dHash), baseline +
progressive JPEG through :mod:`.jpeg_codec` (Huffman + 8x8 DCT,
4:2:0/4:2:2/4:4:4; arithmetic coding stays gated), GIF through
:mod:`.gif_codec` (LZW, interlace, transparency, animation
compositing), BMP through :mod:`.bmp_codec` (DIB raster, RLE8),
baseline TIFF through :mod:`.tiff_codec` (strips, PackBits,
early-change LZW, predictor) and WAV/PCM audio through :mod:`.wav_codec` (RIFF parse, block features,
energy-delta fingerprint). Formats that genuinely need codec libraries
this container doesn't ship (WebP/AVIF, MP3/AAC/Opus, video) keep the
clearly-marked NotImplementedError gate / deterministic-fake paths,
while the Spark-side plumbing — schema, batch iteration, deterministic
metadata — is real and tested for all of them.

Scale notes: payload partitions should be sized by bytes
(spark.sql.files.maxPartitionBytes), not row count; metadata extraction
is embarrassingly parallel with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAYLOAD_METADATA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("content_type", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("decode_status", StringType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Decode an image payload to raw samples.

    PNG decodes FOR REAL via the stdlib codec
    (:mod:`.png_codec` — zlib + struct, all five scanline filters,
    palette expansion, 8/16-bit, Adam7 interlace) and baseline
    sequential or progressive JPEG via :mod:`.jpeg_codec` (Huffman +
    DCT; spectral-selection AND successive-approximation scans since
    r9), GIF via :mod:`.gif_codec` (LZW, interlace, transparency —
    first frame composited on the logical screen, r9) and BMP via
    :mod:`.bmp_codec` (BI_RGB/BI_RLE8 DIB, r9); all return a
    ``png_codec.DecodedImage``. PNG covers every legal IHDR form
    since r9 (sub-byte depths included). Every other format (and the
    forms the codecs don't implement: arithmetic-coded JPEG,
    sub-16-bit BMP, over-budget dimensions) still raises behind the
    documented stub gate — WebP/AVIF need codec libraries this
    container doesn't ship.
    """
    from . import bmp_codec, gif_codec, jpeg_codec, png_codec, tiff_codec

    if png_codec.is_png(payload):
        try:
            return png_codec.decode_png(payload)
        except png_codec.UnsupportedPNG as e:
            raise NotImplementedError(f"image decode stub: {e}") from e
    if jpeg_codec.is_jpeg(payload):
        try:
            return jpeg_codec.decode_jpeg(payload)
        except jpeg_codec.UnsupportedJPEG as e:
            raise NotImplementedError(f"image decode stub: {e}") from e
    if gif_codec.is_gif(payload):
        try:
            return gif_codec.decode_gif(payload)
        except gif_codec.UnsupportedGIF as e:
            raise NotImplementedError(f"image decode stub: {e}") from e
    if bmp_codec.is_bmp(payload):
        try:
            return bmp_codec.decode_bmp(payload)
        except bmp_codec.UnsupportedBMP as e:
            raise NotImplementedError(f"image decode stub: {e}") from e
    if tiff_codec.is_tiff(payload):
        try:
            return tiff_codec.decode_tiff(payload)
        except tiff_codec.UnsupportedTIFF as e:
            raise NotImplementedError(f"image decode stub: {e}") from e
    raise NotImplementedError("image decode stub: codec libraries not installed")


_CODEC_TABLE = None


#: in-container image codecs in dispatch order:
#: (is_<fmt>, decode_<fmt>, (error types that mean "fall through"), tag)
def _image_codecs():
    # Built once per process (imports stay lazy so loading this module
    # stays light); _decode_any runs per PAYLOAD, and rebuilding the
    # table there means five sys.modules lookups and a tuple
    # construction per image — ~3 µs each, pure waste against billions
    # of payloads.
    global _CODEC_TABLE
    if _CODEC_TABLE is not None:
        return _CODEC_TABLE
    from . import bmp_codec, gif_codec, jpeg_codec, png_codec, tiff_codec

    _CODEC_TABLE = (
        (png_codec.is_png, png_codec.decode_png,
         (png_codec.UnsupportedPNG, png_codec.PNGError), "png-zlib"),
        (jpeg_codec.is_jpeg, jpeg_codec.decode_jpeg,
         (jpeg_codec.UnsupportedJPEG, jpeg_codec.JPEGError), "jpeg-baseline"),
        (gif_codec.is_gif, gif_codec.decode_gif,
         (gif_codec.UnsupportedGIF, gif_codec.GIFError), "gif-lzw"),
        (bmp_codec.is_bmp, bmp_codec.decode_bmp,
         (bmp_codec.UnsupportedBMP, bmp_codec.BMPError), "bmp-dib"),
        (tiff_codec.is_tiff, tiff_codec.decode_tiff,
         (tiff_codec.UnsupportedTIFF, tiff_codec.TIFFError), "tiff-baseline"),
    )
    return _CODEC_TABLE


def _decode_any(raw: bytes) -> tuple[object | None, str | None]:
    """Shared image-dispatch for the Arrow-batched operators: try the
    in-container codecs (PNG, JPEG, GIF, BMP, TIFF) by signature; a gated
    form or a corrupt body behind a valid signature — routine in
    crawled data — falls through to ``(None, None)`` rather than
    killing the job (the caller's ``decoder`` column records which
    path ran). One implementation so adding a codec can't miss a call
    site (r8 had four hand-written copies of this chain)."""
    for is_fmt, decode, errs, tag in _image_codecs():
        if is_fmt(raw):
            try:
                return decode(raw), tag
            except errs:
                return None, None
    return None, None


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload to (width, height).

    PNG, baseline-JPEG, GIF and BMP inputs run decode →
    nearest-neighbor resample → re-encode entirely in the stdlib
    codecs (output stays in the input's format; GIF stays within the
    source palette so the ≤256-color bound holds by construction);
    other formats raise behind the stub gate (see
    :func:`decode_image`).
    """
    from . import bmp_codec, gif_codec, jpeg_codec, png_codec, tiff_codec

    img = decode_image(payload)  # raises the stub gate for other formats
    out = png_codec.resize_nearest(img, width, height)
    if jpeg_codec.is_jpeg(payload):
        if out.channels not in (1, 3):  # pragma: no cover (decode emits 1/3)
            raise ValueError("JPEG re-encode supports 1/3 channels")
        return jpeg_codec.encode_jpeg(
            out.pixels, out.width, out.height, out.channels
        )
    if gif_codec.is_gif(payload):
        return gif_codec.encode_gif(out.pixels, out.width, out.height, out.channels)
    if bmp_codec.is_bmp(payload):
        if out.channels != 3:  # pragma: no cover (decode_bmp emits 3)
            raise ValueError("BMP re-encode supports 3 channels")
        return bmp_codec.encode_bmp(out.pixels, out.width, out.height)
    if tiff_codec.is_tiff(payload):
        if out.channels == 4:
            # decode_tiff emits RGBA for photometric-2 spp=4 scans; the
            # encoder is RGB — drop alpha (same flattening GIF re-encode
            # applies) instead of erroring on a legal input
            px = out.pixels
            out = png_codec.DecodedImage(
                out.width, out.height, 3,
                bytes(b for i, b in enumerate(px) if i % 4 != 3),
            )
        return tiff_codec.encode_tiff(
            out.pixels, out.width, out.height, out.channels
        )
    return png_codec.encode_png(out.pixels, out.width, out.height, out.channels)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("content_type", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decoder", StringType(), True),
    ]
)


def decode_and_featurize(df: DataFrame, feature_dim: int = 16) -> DataFrame:
    """(doc_id, payload, content_type) → fixed-dim feature vectors.

    Arrow-batched ``mapInPandas``. PNG/JPEG/GIF/BMP payloads decode
    FOR REAL (the stdlib codecs, via :func:`_decode_any`) and
    featurize from decoded pixels — mean block luminance over
    ``feature_dim`` blocks, scaled to [-1, 1] (``decoder`` records
    which codec ran). Formats without an in-container codec
    keep the clearly-marked DETERMINISTIC FAKE: features derived from
    the payload's sha256 digest (``decoder = 'fake-sha256'``) — stable
    across runs/executors, exercising the real schema, batch iteration,
    and downstream ANN compatibility (array<float> matches
    extensions.similarity's vector column contract). Both paths emit
    the same shape, so mixed-format corpora featurize in one pass.
    """
    from . import png_codec

    def _fake(digest: bytes) -> list[float]:
        # DETERMINISTIC FAKE decode: digest bytes → [-1, 1] floats.
        reps = (feature_dim + len(digest) - 1) // len(digest)
        raw = (digest * reps)[:feature_dim]
        return [b / 127.5 - 1.0 for b in raw]

    def _feat(b: bytes | None) -> tuple[list[float] | None, str | None]:
        if b is None:
            return None, None
        img, dec = _decode_any(bytes(b))
        if img is not None:
            return png_codec.grid_features(img, feature_dim), dec
        # gated form or corrupt body behind a valid signature, or a
        # format without an in-container codec: deterministic fake
        return _fake(hashlib.sha256(b).digest()), "fake-sha256"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pairs = pdf["payload"].map(_feat)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": pdf["content_type"],
                    "feature": pairs.map(lambda p: p[0]),
                    "decoder": pairs.map(lambda p: p[1]),
                }
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_index", LongType(), False),
        StructField("frame_bytes", BinaryType(), True),
        StructField("frame_w", LongType(), True),
        StructField("frame_h", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, stride: int = 2
) -> DataFrame:
    """Video-style frame sampling: one payload row fans out to every
    ``stride``-th frame. Uncompressed AVI decodes FOR REAL
    (:mod:`.avi_codec`, r7 verdict task 5): ``frame_bytes`` holds the
    decoded top-down RGB samples of each sampled frame
    (``decoder = 'avi-dib'``, ``n_frames`` = the container's actual
    frame count; re-encode with ``png_codec.encode_png(fb, w, h, 3)``
    to feed the image ops). Animated GIF decodes FOR REAL too
    (:mod:`.gif_codec`, r9): composited RGBA canvases,
    ``decoder = 'gif-lzw'``. Decoded frames carry ``frame_w/frame_h``
    (r9: raw pixel buffers are uninterpretable without geometry — the
    gap :func:`frame_dhash` exposed); the fake path leaves them NULL.
    Compressed non-MJPEG AVI and every other format
    keep the DETERMINISTIC FAKE (fixed-size byte slices,
    ``decoder = 'fake-slice'``) so the fan-out shape — 1→N rows inside
    ``mapInPandas``, no driver involvement, no shuffle — stays real
    and testable for them too. Output partitioning inherits the
    input's; size input partitions by bytes, not rows, because the
    expansion factor is per-payload."""
    from . import avi_codec, gif_codec

    def _rows(r):
        payload = bytes(r.payload)
        if gif_codec.is_gif(payload):
            try:
                # every frame still LZW-decodes (GIF frames are
                # delta-coded sub-rectangles; see decode_gif_frames_at)
                # but only every stride-th composited canvas is kept
                info, picked = gif_codec.decode_gif_frames_at(
                    payload, stride=stride
                )
            except (gif_codec.UnsupportedGIF, gif_codec.GIFError):
                picked = None  # over-budget/corrupt: fall through to fake
            if picked is not None:
                for fi, img in picked:
                    yield fi, img.pixels, img.width, img.height, info.n_frames, "gif-lzw"
                return
        if avi_codec.is_avi(payload):
            try:
                # one container walk, pixel work ONLY for the sampled
                # indices — a stride-s sampler pays 1/s of the decode
                info, picked = avi_codec.decode_avi_frames_at(
                    payload, stride=stride
                )
            except (avi_codec.UnsupportedAVI, avi_codec.AVIError):
                picked = None  # unsupported/corrupt: fall through to fake
            if picked is not None:
                dec = (
                    "avi-mjpeg"
                    if info.compression == avi_codec.MJPG_FOURCC
                    else "avi-dib"
                )
                for fi, img in picked:
                    yield fi, img.pixels, img.width, img.height, info.n_frames, dec
                return
        n_frames = (len(payload) + frame_size - 1) // frame_size
        for fi in range(0, n_frames, stride):
            yield (
                fi,
                payload[fi * frame_size : (fi + 1) * frame_size],
                None,
                None,
                n_frames,
                "fake-slice",
            )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, ws, hs, totals, decs = [], [], [], [], [], [], []
            for r in pdf.itertuples(index=False):
                if r.payload is None:
                    continue
                for fi, fb, w, h, n, dec in _rows(r):
                    ids.append(r.doc_id)
                    idxs.append(fi)
                    frames.append(fb)
                    ws.append(w)
                    hs.append(h)
                    totals.append(n)
                    decs.append(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                    "frame_w": pd.Series(ws, dtype="object"),
                    "frame_h": pd.Series(hs, dtype="object"),
                    "n_frames": pd.Series(totals, dtype="int64"),
                    "decoder": pd.Series(decs, dtype="object"),
                }
            )

    return df.mapInPandas(_batches, FRAME_SCHEMA)


FRAME_DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_index", LongType(), False),
        StructField("dhash", LongType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def frame_dhash(frames: DataFrame) -> DataFrame:
    """Per-frame perceptual hash over :func:`sample_frames` output:
    ``sample_frames → frame_dhash → image_near_dup`` is cross-video
    visual dedup (same banded hamming join as images; pass
    ``id_col="doc_id"`` after aggregating per-video, or dedup at frame
    granularity directly). Raw canvases reconstruct via the r9
    ``frame_w/frame_h`` columns; channel count infers from the buffer
    size (AVI frames are RGB, GIF canvases RGBA). Fake-slice rows and
    geometry-less frames surface NULL. Map-side Arrow batches, no
    shuffle."""
    from . import png_codec

    def _one(fb, w, h):
        if fb is None or w is None or h is None:
            return None
        n = len(fb)
        if w * h == 0 or n % (w * h):
            return None
        ch = n // (w * h)
        if ch not in (1, 3, 4):
            return None
        hsh = png_codec.dhash(
            png_codec.DecodedImage(int(w), int(h), ch, bytes(fb))
        )
        return hsh - (1 << 64) if hsh >= 1 << 63 else hsh

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_index": pdf["frame_index"],
                    "dhash": [
                        _one(fb, w, h)
                        for fb, w, h in zip(
                            pdf["frame_bytes"], pdf["frame_w"], pdf["frame_h"]
                        )
                    ],
                    "decoder": pdf["decoder"],
                }
            )

    return frames.mapInPandas(_batches, FRAME_DHASH_SCHEMA)


IMAGE_QUALITY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mean_lum", LongType(), True),
        StructField("min_lum", LongType(), True),
        StructField("max_lum", LongType(), True),
        StructField("n_distinct_lum", LongType(), True),
        StructField("is_flat", StringType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def image_quality(df: DataFrame) -> DataFrame:
    """Per-image quality signals for curation — the image twin of the
    audio block-quality op: geometry, EXACT-integer luminance stats
    (mean = floor(sum/n), min, max, distinct-level count) and the
    flat-image flag (min == max catches the blank thumbnails and
    tracking pixels a crawl is full of). PNG, JPEG, GIF and BMP decode
    for real; undecodable payloads surface with NULL stats rather than
    vanishing. ``is_flat`` is emitted as 'y'/'n' strings so the value
    hash is engine-exact (boolean rendering differs per engine).
    Arrow-batched ``mapInPandas``, embarrassingly parallel, no
    shuffle."""
    from . import png_codec

    def _one(b):
        if b is None:
            return (None,) * 7 + (None,)
        img, dec = _decode_any(bytes(b))
        if img is None:
            return (None,) * 7 + (None,)
        lum = png_codec.luminance(img).pixels
        n = len(lum)
        lo, hi = min(lum), max(lum)
        return (
            img.width,
            img.height,
            sum(lum) // n,
            lo,
            hi,
            len(set(lum)),
            "y" if lo == hi else "n",
            dec,
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = pdf["payload"].map(_one)
            out = {"doc_id": pdf["doc_id"]}
            names = [
                "width", "height", "mean_lum", "min_lum", "max_lum",
                "n_distinct_lum", "is_flat", "decoder",
            ]
            for i, name in enumerate(names):
                out[name] = rows.map(lambda r, i=i: r[i]).astype("object")
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, IMAGE_QUALITY_SCHEMA)


def extract_payload_metadata(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary, content_type) → typed metadata.

    Arrow-batched; each pandas batch computes byte length + sha256 and
    records whether a real decoder exists for the content type.
    """

    from . import (
        bmp_codec,
        flac_codec,
        gif_codec,
        jpeg_codec,
        png_codec,
        tiff_codec,
        wav_codec,
    )

    def _status(ct, payload) -> str:
        if ct and ct.startswith("text/"):
            return "ok"
        # header PROBE, not just the signature: over-budget PNGs/GIFs/
        # FLACs, arithmetic JPEGs, sub-16-bit BMP forms, non-PCM WAVs
        # would pass the magic check but raise in decode, and this
        # column's contract is "a real decoder exists for it"
        raw = bytes(payload) if payload is not None else None
        if (
            png_codec.probe_png(raw)
            or jpeg_codec.probe_jpeg(raw)
            or gif_codec.probe_gif(raw)
            or bmp_codec.probe_bmp(raw)
            or tiff_codec.probe_tiff(raw)
            or wav_codec.probe_wav(raw)
            or flac_codec.probe_flac(raw)
        ):
            return "ok"
        return "stubbed"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content_type": pdf["content_type"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else None),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "decode_status": [
                        _status(ct, p)
                        for ct, p in zip(pdf["content_type"], payloads)
                    ],
                }
            )

    return df.mapInPandas(_batches, PAYLOAD_METADATA)


MEDIA_INFO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("bit_depth", LongType(), True),
    ]
)


def _media_info_one(raw: bytes) -> tuple:
    """(format, width, height, n_frames, channels, sample_rate,
    n_samples, bit_depth) from HEADERS ONLY — no entropy decode, no
    pixel/sample work. Corrupt or unrecognized payloads come back as
    ('unknown', NULL...)."""
    import struct

    from . import (
        avi_codec,
        bmp_codec,
        flac_codec,
        gif_codec,
        mp3_codec,
        mp4_codec,
        ogg_codec,
        pdf_codec,
        tiff_codec,
        wav_codec,
        webm_codec,
        webp_codec,
    )

    none7 = (None,) * 7
    try:
        if raw[:8] == b"\x89PNG\r\n\x1a\n" and raw[12:16] == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", raw[16:26])
            chans = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(ctype)
            if chans is None or w == 0 or h == 0:
                return ("unknown",) + none7
            return ("png", w, h, 1, chans, None, None, depth)
        if raw[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(raw):
                if raw[pos] != 0xFF:
                    break
                marker = raw[pos + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    prec, h, w, ncomp = struct.unpack(
                        ">BHHB", raw[pos + 4 : pos + 10]
                    )
                    return ("jpeg", w, h, 1, ncomp, None, None, prec)
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                (seglen,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
                pos += 2 + seglen
            return ("unknown",) + none7
        if gif_codec.is_gif(raw):
            info, frames = gif_codec._parse(
                raw, gif_codec.MAX_PIXELS, gif_codec.MAX_FRAMES,
                gif_codec.MAX_TOTAL_PIXELS,
            )
            chans = 3 if frames[0].transparent is None else 4
            return ("gif", info.width, info.height, info.n_frames,
                    chans, None, None, 8)
        if bmp_codec.is_bmp(raw):
            w, h, bit_count, _c, _td, _pal, _off = bmp_codec._parse(
                raw, bmp_codec.MAX_PIXELS
            )
            return ("bmp", w, h, 1, 3, None, None, bit_count)
        if tiff_codec.is_tiff(raw):
            lay = tiff_codec._parse(raw, tiff_codec.MAX_PIXELS)
            # palette expands to RGB on decode
            chans = 3 if lay.photometric == 3 else lay.spp
            return ("tiff", lay.width, lay.height, 1, chans, None, None,
                    lay.bits)
        if avi_codec.is_avi(raw):
            # lenient: geometry/fourcc of a codec-we-can't-decode
            # stream is still valid triage metadata
            info, _frames = avi_codec.parse_avi(raw, lenient=True)
            return ("avi", info.width, info.height, info.n_frames,
                    3, None, None, info.bit_count)
        if wav_codec.is_wav(raw):
            pos, n = 12, len(raw)
            fmt = data_len = None
            while pos + 8 <= n:
                cid = raw[pos : pos + 4]
                (clen,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
                if pos + 8 + clen > n:
                    return ("unknown",) + none7
                if cid == b"fmt ":
                    fmt = raw[pos + 8 : pos + 8 + clen]
                elif cid == b"data":
                    data_len = clen
                pos += 8 + clen + (clen & 1)
            if fmt is None or len(fmt) < 16 or data_len is None:
                return ("unknown",) + none7
            afmt, chans, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", fmt[:16]
            )
            if chans < 1 or rate < 1:
                return ("unknown",) + none7
            n_samples = (
                data_len // (chans * bits // 8)
                if afmt == 1 and bits in (8, 16)
                else None  # companded/ADPCM sample counts need decode state
            )
            return ("wav", None, None, None, chans, rate, n_samples, bits)
        if flac_codec.is_flac(raw):
            si, _pos = flac_codec._parse_streaminfo(raw)
            return ("flac", None, None, None, si.channels, si.sample_rate,
                    si.total_samples or None, si.bits_per_sample)
        if mp4_codec.is_mp4(raw):
            # dominant crawl video container; box walk only — the
            # H.264/AAC payload is perceptual-codec territory and is
            # skipped by mdat's size field, never read
            mi = mp4_codec.parse_mp4(raw)
            return ("mp4", mi.width, mi.height, mi.n_frames, mi.channels,
                    mi.sample_rate, mi.n_samples, mi.bit_depth)
        if webm_codec.is_webm(raw):
            # the other dominant crawl video container (r11): EBML
            # varint walk only — VP8/VP9/Opus Clusters are skipped by
            # their size field, never read (the mp4/H.264 doctrine)
            ki = webm_codec.parse_webm(raw)
            fmt = "webm" if ki.doc_type == "webm" else "mkv"
            return (fmt, ki.width, ki.height, None, ki.channels,
                    ki.sample_rate, None, ki.bit_depth)
        if webp_codec.is_webp(raw):
            wi = webp_codec.parse_webp(raw)
            return ("webp", wi.width, wi.height, wi.n_frames,
                    4 if wi.has_alpha else 3, None, None, 8)
        if ogg_codec.is_ogg(raw):
            oi = ogg_codec.parse_ogg(raw)
            return ("ogg", None, None, None, oi.channels, oi.sample_rate,
                    oi.n_samples, None)
        if pdf_codec.is_pdf(raw):
            di = pdf_codec.pdf_info(raw)
            return ("pdf", None, None, di.n_pages, None, None, None, None)
        if mp3_codec.is_mp3(raw):
            # LAST in dispatch: the 0xFF frame-sync prefix is weak, so
            # is_mp3 validates the full first header
            pi = mp3_codec.parse_mp3(raw)
            return ("mp3", None, None, pi.n_frames, pi.channels,
                    pi.sample_rate, pi.n_samples, None)
    except Exception:  # corrupt header behind a valid magic: triage, not crash
        return ("unknown",) + none7
    return ("unknown",) + none7


def media_info(df: DataFrame) -> DataFrame:
    """(doc_id, payload, ...) → header-only media triage: format,
    geometry, frame/sample counts, channels, rate, bit depth — the
    cheap first pass a crawl runs over 100 TB of opaque payloads
    BEFORE spending decode time. Parses container headers only (PNG
    IHDR, JPEG SOF, GIF block walk, BMP/TIFF/AVI headers, WAV fmt,
    FLAC STREAMINFO, MP4 box walk, WebM/Matroska EBML walk, WebP
    chunk walk, Ogg page walk, MP3 frame headers, PDF object scan —
    thirteen containers as of r11); never entropy-decodes, so cost is
    O(header bytes) per
    payload regardless of media size. AVI parses LENIENTLY: geometry
    and frame count report even for fourccs the decoder gates (triage
    metadata, not decode). Corrupt headers triage as 'unknown' rather
    than failing the job. Arrow-batched ``mapInPandas``,
    embarrassingly parallel, no shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in MEDIA_INFO_SCHEMA if f.name != "doc_id"]
        for pdf in it:
            rows = pdf["payload"].map(
                lambda b: ("unknown",) + (None,) * 7
                if b is None
                else _media_info_one(bytes(b))
            )
            out = {"doc_id": pdf["doc_id"]}
            for i, name in enumerate(names):
                out[name] = rows.map(lambda r, i=i: r[i]).astype("object")
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, MEDIA_INFO_SCHEMA)


EXIF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("orientation", LongType(), True),
        StructField("exif_datetime", StringType(), True),
        StructField("make", StringType(), True),
        StructField("model", StringType(), True),
        StructField("pixel_x", LongType(), True),
        StructField("pixel_y", LongType(), True),
    ]
)


PDF_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_pages", LongType(), True),
        StructField("text", StringType(), True),
        StructField("status", StringType(), True),
    ]
)


def extract_pdf_text(df: DataFrame) -> DataFrame:
    """(doc_id, payload, ...) → per-document PDF text: page count and
    the pages joined by form-feeds (the text-pipeline convention), via
    :mod:`.pdf_codec`'s stdlib object/stream/operator walk. Encrypted
    or corrupt payloads surface with NULL text and a status of
    'encrypted'/'corrupt' rather than vanishing or killing the job —
    the crawl reader contract every codec here follows. Arrow-batched
    ``mapInPandas``, embarrassingly parallel, no shuffle."""
    from . import pdf_codec

    def _one(b):
        if b is None or not pdf_codec.is_pdf(bytes(b)):
            return None, None, "not_pdf"
        try:
            pages = pdf_codec.extract_text(bytes(b))
            return len(pages), "\f".join(pages), "ok"
        except pdf_codec.PDFError as e:
            return None, None, (
                "encrypted" if "encrypted" in str(e) else "corrupt"
            )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = pdf["payload"].map(_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_pages": rows.map(lambda r: r[0]).astype("object"),
                    "text": rows.map(lambda r: r[1]),
                    "status": rows.map(lambda r: r[2]),
                }
            )

    return df.mapInPandas(_batches, PDF_TEXT_SCHEMA)


PDF_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_images", LongType(), True),
        StructField("filter", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mean_lum", LongType(), True),
        StructField("min_lum", LongType(), True),
        StructField("max_lum", LongType(), True),
    ]
)


def extract_pdf_image_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload, ...) → the scanned-PDF path: embedded-image
    count plus the FIRST image's filter, geometry and exact-integer
    luminance stats, decoded through the sibling codecs (DCTDecode →
    jpeg_codec, CCITTFaxDecode → ccitt with fax-black = luminance 0,
    FlateDecode → raw samples). Undecodable images or non-PDFs
    surface as NULL stats — triage, never a crash. Arrow-batched
    ``mapInPandas``, map-side only."""
    from . import pdf_codec, png_codec

    def _one(b):
        none6 = (None,) * 6
        if b is None or not pdf_codec.is_pdf(bytes(b)):
            return (None,) + none6
        try:
            imgs = pdf_codec.extract_images(bytes(b))
        except pdf_codec.PDFError:
            return (None,) + none6
        if not imgs:
            return (0,) + none6
        im = imgs[0]
        try:
            dec = pdf_codec.decode_pdf_image(im)
        except (pdf_codec.PDFError, NotImplementedError, ValueError):
            return (len(imgs), im.filter, im.width, im.height,
                    None, None, None)
        lum = png_codec.luminance(dec).pixels
        return (
            len(imgs), im.filter, dec.width, dec.height,
            sum(lum) // len(lum), min(lum), max(lum),
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in PDF_IMAGE_SCHEMA if f.name != "doc_id"]
        for pdf in it:
            rows = pdf["payload"].map(_one)
            out = {"doc_id": pdf["doc_id"]}
            for i, name in enumerate(names):
                out[name] = rows.map(lambda r, i=i: r[i]).astype("object")
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, PDF_IMAGE_SCHEMA)


def image_exif(df: DataFrame) -> DataFrame:
    """(doc_id, payload, ...) → EXIF triage fields (orientation,
    capture timestamp, make/model, declared pixel dims) via
    :mod:`.exif_codec` — an APP1/TIFF-IFD header walk, no pixel
    decode. Payloads without (or with corrupt) EXIF surface as NULLs;
    same O(header-bytes) doctrine as :func:`media_info`. Arrow-batched
    ``mapInPandas``, map-side only."""
    from . import exif_codec

    def _one(b):
        if b is None:
            return (None,) * 6
        e = exif_codec.parse_exif(bytes(b))
        return (e.orientation, e.datetime, e.make, e.model,
                e.pixel_x, e.pixel_y)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in EXIF_SCHEMA if f.name != "doc_id"]
        for pdf in it:
            rows = pdf["payload"].map(_one)
            out = {"doc_id": pdf["doc_id"]}
            for i, name in enumerate(names):
                out[name] = rows.map(lambda r, i=i: r[i]).astype("object")
            yield pd.DataFrame(out)

    return df.mapInPandas(_batches, EXIF_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("dhash", LongType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def image_dhash(df: DataFrame, hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """(doc_id, payload, ...) → (doc_id, dhash, decoder): the 64-bit
    perceptual difference hash of every decodable image payload
    (PNG, JPEG, GIF and BMP via the stdlib codecs; see
    :func:`png_codec.dhash`). Non-decodable payloads surface with a
    NULL dhash and ``decoder = NULL`` rather than vanishing or failing
    the job — callers filter or route them. Arrow-batched
    ``mapInPandas``, embarrassingly parallel, no shuffle."""
    from . import png_codec

    # the signed fold below and DHASH_SCHEMA's LongType hold exactly
    # 64 bits — a 72-bit 8x9 hash would overflow at Arrow conversion,
    # so fail fast instead
    if hash_w * hash_h != 64:
        raise ValueError(
            f"hash_w*hash_h must be 64 (got {hash_w}x{hash_h}="
            f"{hash_w * hash_h}); DHASH_SCHEMA stores a signed 64-bit long"
        )

    def _one(b) -> tuple[int | None, str | None]:
        if b is None:
            return None, None
        img, dec = _decode_any(bytes(b))
        if img is None:
            return None, None
        # dHash sign bit stays clear at hash_w*hash_h <= 63 bits only
        # for 7x9 grids; at the default 64 bits map the unsigned hash
        # into the signed long domain explicitly
        h = png_codec.dhash(img, hash_w, hash_h)
        if h >= 1 << 63:
            h -= 1 << 64
        return h, dec

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pairs = pdf["payload"].map(_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash": pairs.map(lambda p: p[0]).astype("object"),
                    "decoder": pairs.map(lambda p: p[1]),
                }
            )

    return df.mapInPandas(_batches, DHASH_SCHEMA)


def image_near_dup(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Perceptual near-duplicate pairs from 64-bit dHashes:
    ``(id_a, id_b, hamming)`` with ``id_a < id_b`` and
    ``hamming <= max_hamming``.

    Candidate generation is the pigeonhole band join (the PassJoin /
    LSH doctrine, never all-pairs): the hash splits into
    ``max_hamming + 1`` bit-bands, so any pair within ``max_hamming``
    bits agrees EXACTLY on at least one band — candidates are an
    equi-join on (band index, band value), 100% recall by
    construction. Verification is one JVM-side
    ``bit_count(a ^ b)`` — no Python. Scale shape: ``max_hamming + 1``
    short rows per image, one shuffle keyed by the band, exact-hash
    duplicates are the only hot keys (AQE skew handles boilerplate
    images)."""
    from pyspark.sql import functions as F

    if max_hamming < 0 or max_hamming > 16:
        raise ValueError("max_hamming must be in [0, 16]")
    n_bands = int(max_hamming) + 1
    width = 64 // n_bands  # leftover high bits fold into the last band
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    def _band(i):
        bits = (64 - i * width) if i == n_bands - 1 else width
        shifted = F.shiftrightunsigned(F.col("__h"), i * width)
        # a full-width band (max_hamming=0) is the hash itself; a
        # 64-bit mask literal would overflow the signed long domain
        return (
            shifted
            if bits >= 64
            else shifted.bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
        )

    bands = h.select(
        "__id", "__h",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("bi"), _band(i).alias("bv"))
                for i in range(n_bands)
            ])
        ).alias("b"),
    ).select("__id", "__h", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    a = bands
    b = bands.select(
        F.col("__id").alias("__id2"), F.col("__h").alias("__h2"), "bi", "bv"
    )
    return (
        a.join(b, ["bi", "bv"])
        .filter(F.col("__id") < F.col("__id2"))
        .withColumn(
            "hamming", F.bit_count(F.col("__h").bitwiseXOR(F.col("__h2")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id2").alias("id_b"),
            F.col("hamming").cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("afp", LongType(), True),
        StructField("decoder", StringType(), True),
    ]
)


def decode_audio(payload: bytes) -> object:
    """Decode an audio payload to raw samples.

    WAV-family (PCM / G.711 / IMA ADPCM via :mod:`.wav_codec`) and
    FLAC (all subframe types, stereo decorrelation, MD5-verified
    bit-exact decode via :mod:`.flac_codec`, r9) decode FOR REAL and
    return a ``wav_codec.DecodedAudio``; perceptual codecs
    (MP3/AAC/Opus) raise behind the documented stub gate — they need
    codec libraries this container doesn't ship (see the PLANS.md
    perceptual-audio doctrine)."""
    from . import flac_codec, wav_codec

    if wav_codec.is_wav(payload):
        try:
            return wav_codec.decode_wav(payload)
        except wav_codec.UnsupportedWAV as e:
            raise NotImplementedError(f"audio decode stub: {e}") from e
    if flac_codec.is_flac(payload):
        try:
            return flac_codec.decode_flac(payload)
        except flac_codec.UnsupportedFLAC as e:
            raise NotImplementedError(f"audio decode stub: {e}") from e
    raise NotImplementedError("audio decode stub: codec libraries not installed")


def _decode_any_audio(raw: bytes) -> tuple[object | None, str | None]:
    """Audio twin of :func:`_decode_any`: (DecodedAudio, decoder tag)
    or (None, None) with the same fall-through doctrine."""
    from . import flac_codec, wav_codec

    if wav_codec.is_wav(raw):
        try:
            return wav_codec.decode_wav(raw), "wav-pcm"
        except (wav_codec.UnsupportedWAV, wav_codec.WAVError):
            return None, None
    if flac_codec.is_flac(raw):
        try:
            return flac_codec.decode_flac(raw), "flac"
        except (flac_codec.UnsupportedFLAC, flac_codec.FLACError):
            return None, None
    return None, None


def audio_fingerprint(df: DataFrame) -> DataFrame:
    """(doc_id, payload, ...) → (doc_id, sample_rate, channels,
    n_samples, afp, decoder): metadata plus the 64-bit energy-delta
    fingerprint of every decodable audio payload (WAV/PCM via
    :func:`wav_codec.energy_fingerprint` — the audio twin of the image
    dHash). Non-decodable payloads surface with NULLs. Near-duplicate
    recordings then dedup through the SAME pigeonhole band join as
    images: ``image_near_dup(fps, hash_col="afp")``. Arrow-batched
    ``mapInPandas``, no shuffle."""
    from . import wav_codec

    def _one(b):
        if b is None:
            return None, None, None, None, None
        a, dec = _decode_any_audio(bytes(b))
        if a is None:
            return None, None, None, None, None
        h = wav_codec.energy_fingerprint(a)
        if h >= 1 << 63:
            h -= 1 << 64
        return a.sample_rate, a.channels, len(a.samples), h, dec

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = pdf["payload"].map(_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rows.map(lambda r: r[0]).astype("object"),
                    "channels": rows.map(lambda r: r[1]).astype("object"),
                    "n_samples": rows.map(lambda r: r[2]).astype("object"),
                    "afp": rows.map(lambda r: r[3]).astype("object"),
                    "decoder": rows.map(lambda r: r[4]),
                }
            )

    return df.mapInPandas(_batches, AUDIO_SCHEMA)


def audio_near_dup(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "afp",
) -> DataFrame:
    """:func:`image_near_dup` with the audio schema's defaults — the
    banded hamming join is hash-agnostic, so
    ``audio_near_dup(audio_fingerprint(df))`` works as written (a bare
    alias would default to the image schema's ``dhash`` column and
    fail resolution)."""
    return image_near_dup(hashes, max_hamming, id_col, hash_col)
