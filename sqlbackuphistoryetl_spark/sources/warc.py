"""WARC / WET crawl-archive source + sink (extension layer, r11).

WARC (ISO 28500) is the interchange format Common Crawl and every
web-archive pipeline ship: a flat sequence of records, each a
``WARC/1.x`` version line, RFC-822-style named headers, a blank line,
``Content-Length`` bytes of block, and a ``\\r\\n\\r\\n`` terminator.
``response`` records carry a full HTTP response message as their
block; WET files are the same container whose ``conversion`` records
carry already-extracted plain text. On disk both are almost always
``.warc.gz`` with EACH RECORD its own gzip member (multi-member gzip),
which is what makes per-record random access possible server-side.

Spark mapping (same doctrine as ``extensions/webdataset.py``):

* archives are NOT splittable — ``binaryFile`` reads each shard whole
  into its own task and a map-side Arrow batch walks the records with
  stdlib ``gzip`` (``GzipFile`` iterates multi-member streams
  transparently). Shard size is the parallelism knob at 100 TB
  (Common Crawl shards are ~1 GB for exactly this reason); for tiny
  fixture shards pass ``fan_out`` to spread file rows first.
* one hostile record must never OOM an executor: a block whose
  declared ``Content-Length`` exceeds :data:`MAX_MEMBER_BYTES` is
  skipped in bounded chunks and surfaces as a NULL-payload row
  (visible drop, never a silent vanish or a job kill). A record that
  cannot be framed at all (missing/garbage Content-Length, bad magic)
  ends the shard walk with a visible ``__malformed__`` sentinel row —
  framing is byte-offset arithmetic, so nothing after a framing error
  can be trusted.
* everything downstream of extraction is JVM-side: WET text, HTML
  prose (``functions/htmlfns.html_to_text``), stats — the Python walk
  only frames bytes and parses headers, O(header bytes + one memcpy
  per in-budget block).

The writer emits the Common Crawl layout (one gzip member per record,
``mtime=0`` for byte-stable members) through the same
distributed-ordinal shard assignment as the webdataset sinks: one
range shuffle, one packer task per shard, atomic rename publish.
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..extensions.webdataset import MAX_MEMBER_BYTES, _write_shards
from ..functions.charsetfns import decode_payload, ensure_charset_confs
from ..functions.htmlfns import html_to_text

#: reader output: one row per WARC record, long form
WARC_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), False),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("http_content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

#: sentinel warc_type for a shard whose remaining bytes cannot be framed
MALFORMED = "__malformed__"

_SKIP_CHUNK = 1 << 20


class WARCError(ValueError):
    """Raised by the writer on rows it cannot serialize."""


# ---------------------------------------------------------------- reader


def _hdr_str(raw: bytes) -> str:
    """Header bytes → str: UTF-8 first (WARC 1.1 permits UTF-8 header
    values, and write_warc emits them for IRI target URIs), latin-1
    fallback so hostile bytes never throw."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _parse_headers(stream) -> dict | None:
    """Named headers up to the blank line; None on EOF mid-headers.

    Lowercased keys; values decoded UTF-8-first with latin-1 fallback
    (see _hdr_str). Obsolete line folding (leading SP/HT continuation)
    is honored per RFC 822.
    """
    headers: dict[str, str] = {}
    last = None
    while True:
        line = stream.readline()
        if line in (b"\r\n", b"\n"):
            return headers
        if not line:
            return None
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + _hdr_str(line.strip())
            continue
        key, sep, val = line.partition(b":")
        if not sep:
            return None  # not a header line: framing is broken
        last = _hdr_str(key.strip()).lower()
        headers[last] = _hdr_str(val.strip())


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body; the raw bytes
    come back unchanged if the chunk framing is broken (lenient —
    crawlers store what the server actually sent)."""
    out, pos = [], 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return body
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return body
        if size == 0:
            return b"".join(out)
        start = eol + 2
        end = start + size
        if end > len(body):
            return body
        out.append(body[start:end])
        pos = end + 2  # skip the chunk-data CRLF


def _split_http(block: bytes):
    """(status, content_type, payload) from an HTTP message block;
    (None, None, block) when it isn't parseable as HTTP."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head, payload = block[:sep], block[sep + 4 :]
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype, chunked = None, False
    for line in lines[1:]:
        key, sep2, val = line.partition(b":")
        if not sep2:
            continue
        k = key.strip().lower()
        if k == b"content-type" and ctype is None:
            ctype = val.strip().decode("latin-1")
        elif k == b"transfer-encoding" and b"chunked" in val.lower():
            chunked = True
    if chunked:
        payload = _dechunk(payload)
    return status, ctype, payload


def iter_warc_records(stream):
    """Walk one WARC stream (plain or an open ``GzipFile``), yielding
    ``(headers_dict, block_or_None, over_budget)`` per record.

    Over-budget blocks are skipped in bounded chunks (``block`` is
    None, ``over_budget`` True). A framing failure yields one final
    ``(None, None, False)`` sentinel and stops: Content-Length
    arithmetic is the only record boundary, so a walk cannot resync
    reliably after losing it (cf. the webdataset visible-drop
    doctrine, extensions/webdataset.py MAX_MEMBER_BYTES).
    """
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            yield None, None, False
            return
        headers = _parse_headers(stream)
        if headers is None:
            yield None, None, False
            return
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            yield None, None, False
            return
        if clen < 0:
            yield None, None, False
            return
        if clen > MAX_MEMBER_BYTES:
            left = clen
            while left > 0:
                got = stream.read(min(_SKIP_CHUNK, left))
                if not got:
                    break
                left -= len(got)
            yield headers, None, True
            continue
        block = stream.read(clen)
        if len(block) < clen:  # truncated shard tail: visible drop
            yield headers, None, True
            return
        yield headers, block, False


def _record_rows(shard: str, stream):
    for headers, block, _over in iter_warc_records(stream):
        if headers is None:
            yield (shard, None, MALFORMED, None, None, None, None,
                   None, None, None)
            continue
        wtype = headers.get("warc-type", "")
        ctype = headers.get("content-type")
        status, http_ctype, payload = None, None, block
        if (
            block is not None
            and wtype == "response"
            and (ctype or "").startswith("application/http")
        ):
            status, http_ctype, payload = _split_http(block)
        yield (
            shard,
            headers.get("warc-record-id"),
            wtype,
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            ctype,
            int(headers["content-length"]),
            status,
            http_ctype,
            payload,
        )


def _read_warc_files(
    spark: SparkSession, path: str, glob: str, open_stream, fan_out: int | None
) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    if fan_out is not None:
        files = files.repartition(fan_out, "path")

    cols = [f.name for f in WARC_SCHEMA]

    def _walk(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                shard = os.path.basename(r.path)
                with open_stream(bytes(r.content)) as stream:
                    rows.extend(_record_rows(shard, stream))
            out = {c: pd.Series([r[i] for r in rows], dtype="object")
                   for i, c in enumerate(cols)}
            yield pd.DataFrame(out)

    return files.mapInPandas(_walk, WARC_SCHEMA)


def read_warc(
    spark: SparkSession, path: str, fan_out: int | None = None,
    glob: str = "*.warc",
) -> DataFrame:
    """Scan uncompressed ``*.warc`` shards into :data:`WARC_SCHEMA`."""
    return _read_warc_files(spark, path, glob, io.BytesIO, fan_out)


def read_warc_gz(
    spark: SparkSession, path: str, fan_out: int | None = None,
    glob: str = "*.warc.gz",
) -> DataFrame:
    """Scan ``*.warc.gz`` shards (one gzip member per record, the
    Common Crawl layout — but any valid gzip stream works: GzipFile
    walks concatenated members transparently) into
    :data:`WARC_SCHEMA`. For WET dumps pass ``glob='*.warc.wet.gz'``
    or use :func:`read_wet_gz`."""
    def _open(blob: bytes):
        return gzip.GzipFile(fileobj=io.BytesIO(blob), mode="rb")

    return _read_warc_files(spark, path, glob, _open, fan_out)


def read_wet_gz(
    spark: SparkSession, path: str, fan_out: int | None = None
) -> DataFrame:
    """Common Crawl WET convenience: ``*.warc.wet.gz`` shards."""
    return read_warc_gz(spark, path, fan_out, glob="*.warc.wet.gz")


# ----------------------------------------------------- JVM-side derivations


def wet_text(df: DataFrame) -> DataFrame:
    """``conversion`` records as ``(target_uri, warc_date, text)`` —
    the WET payload is the extracted text: UTF-8 by spec, but a
    record-level Content-Type charset param or BOM is honored
    (functions/charsetfns.py, r13), and malformed bytes decode to
    U+FFFD instead of failing the task."""
    ensure_charset_confs(df.sparkSession)
    return df.filter(
        (F.col("warc_type") == "conversion") & F.col("payload").isNotNull()
    ).select(
        "target_uri",
        "warc_date",
        decode_payload("payload", "content_type").alias("text"),
    )


def response_text(df: DataFrame) -> DataFrame:
    """HTML ``response`` records reduced to prose
    ``(target_uri, warc_date, http_status, text)`` via the pure-JVM
    ``html_to_text`` chain — no Python past extraction."""
    ensure_charset_confs(df.sparkSession)
    html = df.filter(
        (F.col("warc_type") == "response")
        & F.col("payload").isNotNull()
        & F.col("http_content_type").startswith("text/html")
    )
    return html.select(
        "target_uri",
        "warc_date",
        "http_status",
        html_to_text(
            decode_payload("payload", "http_content_type")
        ).alias("text"),
    )


def response_main_text(df: DataFrame, **thresholds) -> DataFrame:
    """Like :func:`response_text` but routed through the
    jusText-style main-content extractor
    (extensions/maincontent.py, r12) instead of the keep-everything
    ``html_to_text`` — nav bars, footer link soup and other
    boilerplate BLOCKS are classified out per page before the prose
    reaches any downstream quality signal. ``thresholds`` forward to
    :func:`~..extensions.maincontent.main_content_extract`. Same
    shape, still pure JVM past extraction."""
    from ..extensions.maincontent import main_content_extract

    ensure_charset_confs(df.sparkSession)
    html = df.filter(
        (F.col("warc_type") == "response")
        & F.col("payload").isNotNull()
        & F.col("http_content_type").startswith("text/html")
    )
    return html.select(
        "target_uri",
        "warc_date",
        "http_status",
        main_content_extract(
            decode_payload("payload", "http_content_type"), **thresholds
        ).alias("text"),
    )


# ----------------------------------------------------------------- writer

_HTTP_ENVELOPE_TYPES = {"response"}


def _record_bytes(r) -> bytes:
    import hashlib

    payload = bytes(r.payload) if r.payload is not None else b""
    wtype = r.warc_type
    if wtype in _HTTP_ENVELOPE_TYPES:
        http_ctype = getattr(r, "http_content_type", None) or "text/plain"
        block = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + http_ctype.encode("utf-8")
            + b"\r\nContent-Length: "
            + str(len(payload)).encode()
            + b"\r\n\r\n"
            + payload
        )
        ctype = "application/http; msgtype=response"
    else:
        block = payload
        ctype = getattr(r, "content_type", None) or "text/plain"
    digest = hashlib.md5(
        r.target_uri.encode() + b"|" + wtype.encode() + b"|" + payload
    ).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:md5:{digest}>\r\n"
        f"WARC-Date: {r.warc_date}\r\n"
        f"WARC-Target-URI: {r.target_uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("utf-8")  # WARC 1.1 headers may be UTF-8 (IRI target URIs)
    return head + block + b"\r\n\r\n"


def _pack_warc_zst(pdf) -> bytes:
    from ..extensions.zstd_codec import zstd_compress_raw

    out = io.BytesIO()
    for r in pdf.itertuples(index=False):
        if r.payload is None or r.target_uri is None or r.warc_date is None:
            raise WARCError(
                "write_warc rows need target_uri, warc_date, and payload"
            )
        # one zstd FRAME per record — the .warc.zst analog of the
        # member-per-record gzip layout, same random-access property
        out.write(zstd_compress_raw(_record_bytes(r)))
    return out.getvalue()


def _pack_warc_gz(pdf) -> bytes:
    out = io.BytesIO()
    for r in pdf.itertuples(index=False):
        if r.payload is None or r.target_uri is None or r.warc_date is None:
            raise WARCError(
                "write_warc rows need target_uri, warc_date, and payload"
            )
        # one gzip member PER RECORD (the Common Crawl layout) so a
        # server-side reader can seek to any record; mtime=0 keeps
        # members byte-stable across runs
        out.write(gzip.compress(_record_bytes(r), mtime=0))
    return out.getvalue()


def write_warc(
    df: DataFrame,
    path: str,
    records_per_shard: int,
    num_partitions: int | None = None,
) -> list:
    """Write ``(target_uri, warc_type, warc_date, payload[,
    http_content_type, content_type])`` rows as ``shard-NNNNNN.warc.gz``
    files — one gzip member per record. ``response`` rows get a
    deterministic ``HTTP/1.1 200 OK`` envelope around their payload
    (crawl-fixture semantics); every other type writes the payload as
    the block verbatim. Shard assignment, packing, and the atomic
    rename publish ride the webdataset machinery
    (extensions/webdataset.py _write_shards): ONE range shuffle, one
    packer task per shard. Eager; returns per-shard summary rows.
    """
    key = F.col("target_uri").alias("key")
    ext = F.col("warc_type").alias("ext")
    passthrough = [
        c for c in df.columns if c not in ("target_uri", "warc_type")
    ]
    shaped = df.select(key, ext, "target_uri", "warc_type", *passthrough)
    return _write_shards(
        shaped, path, records_per_shard, num_partitions,
        _pack_warc_gz, ".warc.gz",
    )


def write_warc_zst(
    df: DataFrame,
    path: str,
    records_per_shard: int,
    num_partitions: int | None = None,
) -> list:
    """:func:`write_warc` with zstd containers: ``shard-NNNNNN.warc.zst``
    files, one raw-block zstd FRAME per record
    (extensions/zstd_codec.py — conformant frames any real zstd
    reads), preserving the random-access property the gzip layout has
    (:func:`warc_cdx_index` indexes both)."""
    key = F.col("target_uri").alias("key")
    ext = F.col("warc_type").alias("ext")
    passthrough = [
        c for c in df.columns if c not in ("target_uri", "warc_type")
    ]
    shaped = df.select(key, ext, "target_uri", "warc_type", *passthrough)
    return _write_shards(
        shaped, path, records_per_shard, num_partitions,
        _pack_warc_zst, ".warc.zst",
    )


def read_warc_zst(
    spark: SparkSession, path: str, fan_out: int | None = None,
    glob: str = "*.warc.zst",
) -> DataFrame:
    """Scan ``*.warc.zst`` shards (concatenated zstd frames — the
    raw/RLE-block subset this engine reads; see the zstd_codec module
    doc for the entropy-layer gate) into :data:`WARC_SCHEMA`."""
    from ..extensions.zstd_codec import zstd_decompress

    def _open(blob: bytes):
        return io.BytesIO(zstd_decompress(blob))

    return _read_warc_files(spark, path, glob, _open, fan_out)


# -------------------------------------------------- random-access index

#: CDX-style index row: where each record's gzip member lives
CDX_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("offset", LongType(), False),
        StructField("length", LongType(), False),
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
    ]
)


def iter_gzip_members(blob: bytes):
    """(offset, length, decompressed bytes) per gzip member of a
    multi-member stream — the boundary walk GzipFile hides. Header
    FEXTRA/FNAME/FCOMMENT/FHCRC fields are skipped per RFC 1952; a
    member inflating past :data:`MAX_MEMBER_BYTES` or truncated
    mid-stream raises (framing is offset arithmetic; nothing after a
    bad member can be trusted)."""
    import zlib

    pos, n = 0, len(blob)
    while pos < n:
        if blob[pos : pos + 2] != b"\x1f\x8b":
            raise WARCError(f"bad gzip magic at offset {pos}")
        if pos + 10 > n:
            raise WARCError("truncated gzip header")
        flg = blob[pos + 3]
        p = pos + 10
        try:
            if flg & 4:  # FEXTRA
                xlen = int.from_bytes(blob[p : p + 2], "little")
                p += 2 + xlen
            if flg & 8:  # FNAME
                p = blob.index(b"\x00", p) + 1
            if flg & 16:  # FCOMMENT
                p = blob.index(b"\x00", p) + 1
            if flg & 2:  # FHCRC
                p += 2
        except ValueError:
            raise WARCError("unterminated gzip header field") from None
        d = zlib.decompressobj(-15)
        try:
            data = d.decompress(blob[p:], MAX_MEMBER_BYTES)
        except zlib.error as e:
            raise WARCError(f"gzip member at {pos}: {e}") from None
        if d.unconsumed_tail:
            raise WARCError(
                f"gzip member at {pos} inflates past {MAX_MEMBER_BYTES}"
            )
        if not d.eof:
            raise WARCError(f"gzip member at {pos} is truncated")
        consumed = (n - p) - len(d.unused_data)
        end = p + consumed + 8  # CRC32 + ISIZE trailer
        if end > n:
            raise WARCError(f"gzip member at {pos} missing its trailer")
        yield pos, end - pos, data
        pos = end


def warc_cdx_index(
    spark: SparkSession, path: str, fan_out: int | None = None,
    glob: str = "*.warc.gz",
) -> DataFrame:
    """CDX-style random-access index over ``*.warc.gz`` shards —
    (shard, offset, length, record_id, warc_type, target_uri) per
    record, where (offset, length) frame the record's OWN gzip member
    (the reason Common Crawl writes one member per record: a serving
    layer range-reads exactly those bytes). Works on shards this
    module wrote AND on external member-per-record archives; persist
    the result as parquet and join on target_uri to serve. One
    map-side pass, no shuffle.

    Container dispatch is by file suffix (r12): ``.zst`` shards walk
    zstd FRAMES (extensions/zstd_codec.py: iter_zstd_frames — the
    frame-per-record ``.warc.zst`` layout), everything else walks
    gzip members; pass ``glob='*.warc.zst'`` to index a zstd
    archive."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    if fan_out is not None:
        files = files.repartition(fan_out, "path")

    cols = [f.name for f in CDX_SCHEMA]

    def _walk(it):
        import pandas as pd

        from ..extensions.zstd_codec import iter_zstd_frames

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                shard = os.path.basename(r.path)
                walker = (
                    iter_zstd_frames
                    if shard.endswith(".zst")
                    else iter_gzip_members
                )
                for off, length, data in walker(bytes(r.content)):
                    for headers, _block, _over in iter_warc_records(
                        io.BytesIO(data)
                    ):
                        if headers is None:
                            rows.append(
                                (shard, off, length, None, MALFORMED, None)
                            )
                            break
                        rows.append(
                            (
                                shard,
                                off,
                                length,
                                headers.get("warc-record-id"),
                                headers.get("warc-type", ""),
                                headers.get("warc-target-uri"),
                            )
                        )
            out = {c: pd.Series([row[i] for row in rows], dtype="object")
                   for i, c in enumerate(cols)}
            yield pd.DataFrame(out)

    return files.mapInPandas(_walk, CDX_SCHEMA)


def read_warc_record(shard_path: str, offset: int, length: int):
    """Serve ONE record by its index entry: range-read ``length``
    bytes at ``offset``, inflate the single gzip member, parse the
    record. Returns (headers dict, block bytes or None). This is the
    point-lookup half of :func:`warc_cdx_index` — on an object store
    the same (offset, length) pair becomes an HTTP Range request.
    Container dispatch by suffix, as in the index build."""
    with open(shard_path, "rb") as fh:
        fh.seek(offset)
        member = fh.read(length)
    if shard_path.endswith(".zst"):
        from ..extensions.zstd_codec import zstd_decompress

        blob = zstd_decompress(member)
    else:
        blob = gzip.decompress(member)
    for headers, block, _over in iter_warc_records(io.BytesIO(blob)):
        if headers is None:
            raise WARCError("indexed member does not frame a record")
        return headers, block
    raise WARCError("indexed member holds no record")


#: what read_warc_by_index serves per index row. ``payload`` carries
#: the same bytes as WARC_SCHEMA's payload: for ``response`` records
#: the HTTP envelope is split off (and chunked bodies de-chunked)
#: into http_status / http_content_type, exactly like the full scan —
#: code written against read_warc output consumes served rows as-is.
CDX_SERVE_SCHEMA = (
    "shard string, offset long, record_id string, warc_type string, "
    "target_uri string, warc_date string, http_status int, "
    "http_content_type string, payload binary"
)


def read_warc_by_index(index: DataFrame, base_path: str) -> DataFrame:
    """The serving layer as a BATCH job (r12): one range-read per
    index row — each task seeks to its rows' (offset, length) inside
    ``base_path``/shard and inflates exactly that one gzip member
    (:func:`read_warc_record` per row). This is how a 100 TB archive
    serves a selected subset WITHOUT scanning: filter the (tiny,
    parquet-persisted) CDX index first, then range-read only the
    survivors — on an object store each read is one HTTP Range
    request. Bytes moved = selected records, not corpus.

    ``index`` is :func:`warc_cdx_index` output (or any frame with
    shard/offset/length); repartition it before calling if the
    selection is narrow enough to underfill the cluster."""

    def _serve(it):
        import pandas as pd

        cols = [
            "shard", "offset", "record_id", "warc_type", "target_uri",
            "warc_date", "http_status", "http_content_type", "payload",
        ]
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                headers, block = read_warc_record(
                    os.path.join(base_path, r.shard),
                    int(r.offset),
                    int(r.length),
                )
                wtype = headers.get("warc-type", "")
                ctype = headers.get("content-type")
                status, http_ctype, payload = None, None, block
                if (
                    block is not None
                    and wtype == "response"
                    and (ctype or "").startswith("application/http")
                ):
                    status, http_ctype, payload = _split_http(block)
                rows.append(
                    (
                        r.shard,
                        int(r.offset),
                        headers.get("warc-record-id"),
                        wtype,
                        headers.get("warc-target-uri"),
                        headers.get("warc-date"),
                        status,
                        http_ctype,
                        payload,
                    )
                )
            yield pd.DataFrame(
                {c: pd.Series([row[i] for row in rows], dtype="object")
                 for i, c in enumerate(cols)}
            )

    return index.select("shard", "offset", "length").mapInPandas(
        _serve, CDX_SERVE_SCHEMA
    )


# ------------------------------------------------------------ WAT records

#: the standard WAT envelope subset a curation pass consumes: page
#: title + outgoing links (the link graph is what WAT files EXIST for)
WAT_HTML_DDL = (
    "Envelope struct<`Payload-Metadata`: struct<"
    "`HTTP-Response-Metadata`: struct<`HTML-Metadata`: struct<"
    "Head: struct<Title: string>, "
    "Links: array<struct<url: string>>>>>>"
)


def wat_records(df: DataFrame) -> DataFrame:
    """``metadata`` records with a JSON payload as
    ``(target_uri, warc_date, json)`` — the WAT third of the Common
    Crawl trio (WARC = raw responses, WET = extracted text, WAT =
    per-page metadata JSON). Pair with ``from_json`` /
    ``get_json_object`` downstream; :func:`wat_html_metadata` covers
    the standard HTML envelope."""
    ensure_charset_confs(df.sparkSession)  # malformed bytes → U+FFFD
    return df.filter(
        (F.col("warc_type") == "metadata")
        & F.col("payload").isNotNull()
        & F.coalesce(F.col("content_type"), F.lit(""))
         .startswith("application/json")
    ).select(
        "target_uri", "warc_date",
        F.decode("payload", "UTF-8").alias("json"),
    )


def wat_html_metadata(df: DataFrame) -> DataFrame:
    """WAT envelopes reduced to the fields link-graph and title
    pipelines consume: ``(target_uri, warc_date, title, links)`` with
    ``links`` an array of outgoing URLs. One ``from_json`` against
    :data:`WAT_HTML_DDL` (hyphenated envelope keys and all) — fields
    outside the subset are simply not parsed, which is the point:
    schema-on-read keeps the scan cost at the consumed columns."""
    html_md = (
        "w.Envelope.`Payload-Metadata`.`HTTP-Response-Metadata`"
        ".`HTML-Metadata`"
    )
    parsed = wat_records(df).withColumn(
        "w", F.from_json("json", WAT_HTML_DDL)
    )
    return parsed.select(
        "target_uri",
        "warc_date",
        F.col(f"{html_md}.Head.Title").alias("title"),
        F.coalesce(
            F.transform(F.col(f"{html_md}.Links"), lambda l: l["url"]),
            F.expr("cast(array() as array<string>)"),
        ).alias("links"),
    )
