"""WARC/WET source + sink: framing, HTTP envelope split, chunked
bodies, multi-member gzip, budget/malformed visible drops, write →
read round-trip (r11, sources/warc.py)."""

from __future__ import annotations

import gzip
import io

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.sources.warc import (
    MALFORMED,
    WARCError,
    _dechunk,
    _split_http,
    iter_warc_records,
    read_warc,
    read_warc_gz,
    response_text,
    wet_text,
    write_warc,
)


def _record(wtype, uri, block, ctype="text/plain", extra=()):
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:test:{uri}>\r\n"
        f"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        + "".join(f"{k}: {v}\r\n" for k, v in extra)
        + f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return head + block + b"\r\n\r\n"


def _http_block(body, ctype="text/html", extra=b""):
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\n" + extra
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


def test_iter_plain_records():
    raw = _record("warcinfo", "meta", b"software: test\r\n") + _record(
        "conversion", "http://a/1", b"hello world"
    )
    recs = list(iter_warc_records(io.BytesIO(raw)))
    assert len(recs) == 2
    (h1, b1, o1), (h2, b2, o2) = recs
    assert h1["warc-type"] == "warcinfo" and not o1
    assert h2["warc-type"] == "conversion"
    assert b2 == b"hello world"


def test_iter_header_folding_and_padding():
    raw = (
        b"\r\n\r\n"  # leading inter-record padding
        + _record("conversion", "http://a/1", b"x",
                  extra=[("X-Long", "part1\r\n  part2")])
    )
    (h, b, _o), = list(iter_warc_records(io.BytesIO(raw)))
    assert h["x-long"] == "part1 part2"
    assert b == b"x"


def test_iter_malformed_stops_with_sentinel():
    raw = _record("conversion", "http://a/1", b"ok") + b"GARBAGE NOT WARC\r\n"
    recs = list(iter_warc_records(io.BytesIO(raw)))
    assert recs[0][1] == b"ok"
    assert recs[1] == (None, None, False)


def test_iter_bad_content_length_is_malformed():
    raw = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"Content-Length: banana\r\n\r\n"
    )
    assert list(iter_warc_records(io.BytesIO(raw))) == [(None, None, False)]


def test_iter_truncated_block_is_visible_drop():
    rec = _record("conversion", "http://a/1", b"full body here")
    recs = list(iter_warc_records(io.BytesIO(rec[:-10])))
    assert len(recs) == 1
    h, b, over = recs[0]
    assert h["warc-type"] == "conversion" and b is None and over


def test_iter_over_budget_skips_and_continues(monkeypatch):
    import sqlbackuphistoryetl_spark.sources.warc as W

    monkeypatch.setattr(W, "MAX_MEMBER_BYTES", 8)
    raw = _record("conversion", "http://a/big", b"0123456789abcdef") + _record(
        "conversion", "http://a/ok", b"tiny"
    )
    recs = list(W.iter_warc_records(io.BytesIO(raw)))
    assert len(recs) == 2
    assert recs[0][1] is None and recs[0][2] is True
    assert recs[1][1] == b"tiny" and recs[1][2] is False


def test_split_http_and_dechunk():
    s, c, p = _split_http(_http_block(b"<html>hi</html>"))
    assert (s, c, p) == (200, "text/html", b"<html>hi</html>")
    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    s, c, p = _split_http(chunked)
    assert p == b"hello world"
    # broken chunk framing falls back to the raw bytes
    assert _dechunk(b"ZZZ\r\nnope") == b"ZZZ\r\nnope"
    # non-HTTP block passes through
    assert _split_http(b"not http") == (None, None, b"not http")


def _fixture_df(spark, n=12):
    rows = []
    for i in range(n):
        uri = f"http://example.com/doc/{i:04d}"
        rows.append(
            (uri, "response", "2025-01-01T00:00:00Z",
             f"<html><body><p>body {i}</p></body></html>".encode(),
             "text/html")
        )
        rows.append(
            (uri, "conversion", "2025-01-01T00:00:00Z",
             f"body {i}".encode(), None)
        )
    return spark.createDataFrame(
        rows,
        "target_uri string, warc_type string, warc_date string, "
        "payload binary, http_content_type string",
    )


def test_write_read_round_trip(spark, tmp_path):
    path = str(tmp_path / "warc")
    df = _fixture_df(spark, 12)
    summary = write_warc(df, path, records_per_shard=5)
    assert [r["n_samples"] for r in summary] == [5, 5, 2]
    back = read_warc_gz(spark, path, fan_out=8)
    rows = back.collect()
    assert len(rows) == 24
    by = {(r["target_uri"], r["warc_type"]): r for r in rows}
    r0 = by[("http://example.com/doc/0000", "response")]
    assert r0["http_status"] == 200
    assert r0["http_content_type"] == "text/html"
    assert bytes(r0["payload"]) == b"<html><body><p>body 0</p></body></html>"
    assert r0["content_type"].startswith("application/http")
    c0 = by[("http://example.com/doc/0000", "conversion")]
    assert bytes(c0["payload"]) == b"body 0"
    assert c0["http_status"] is None
    assert c0["warc_date"] == "2025-01-01T00:00:00Z"
    # record ids are deterministic content digests
    assert r0["record_id"].startswith("<urn:md5:")


def test_wet_and_response_text(spark, tmp_path):
    path = str(tmp_path / "warc")
    write_warc(_fixture_df(spark, 6), path, records_per_shard=16)
    back = read_warc_gz(spark, path, fan_out=4)
    wet = {r["target_uri"]: r["text"] for r in wet_text(back).collect()}
    assert wet["http://example.com/doc/0003"] == "body 3"
    prose = {r["target_uri"]: r["text"] for r in response_text(back).collect()}
    assert prose["http://example.com/doc/0003"] == "body 3"


def test_read_plain_warc(spark, tmp_path):
    shard = tmp_path / "x.warc"
    shard.write_bytes(
        _record("conversion", "http://a/1", b"alpha")
        + _record("conversion", "http://a/2", b"beta")
    )
    rows = read_warc(spark, str(tmp_path)).collect()
    assert sorted(bytes(r["payload"]) for r in rows) == [b"alpha", b"beta"]


def test_read_malformed_shard_sentinel(spark, tmp_path):
    blob = _record("conversion", "http://a/1", b"ok") + b"NOT A RECORD"
    (tmp_path / "bad.warc.gz").write_bytes(gzip.compress(blob, mtime=0))
    rows = read_warc_gz(spark, str(tmp_path)).collect()
    types = sorted(r["warc_type"] for r in rows)
    assert types == [MALFORMED, "conversion"]
    ok = [r for r in rows if r["warc_type"] == "conversion"][0]
    assert bytes(ok["payload"]) == b"ok"


def test_writer_rejects_null_payload(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://a/1", "conversion", "2025-01-01T00:00:00Z", None, None)],
        "target_uri string, warc_type string, warc_date string, "
        "payload binary, http_content_type string",
    )
    with pytest.raises(Exception) as ei:
        write_warc(df, str(tmp_path / "w"), records_per_shard=4)
    assert "target_uri, warc_date, and payload" in str(ei.value)


def test_writer_rejects_null_warc_date(spark, tmp_path):
    """r12 (ADVICE): a NULL warc_date must raise WARCError, not
    serialize as the literal string 'None'."""
    df = spark.createDataFrame(
        [("http://a/1", "conversion", None, b"x", None)],
        "target_uri string, warc_type string, warc_date string, "
        "payload binary, http_content_type string",
    )
    with pytest.raises(Exception) as ei:
        write_warc(df, str(tmp_path / "w"), records_per_shard=4)
    assert "warc_date" in str(ei.value)


def test_iri_target_uri_roundtrips_utf8(spark, tmp_path):
    """r12 (ADVICE): non-Latin-1 target URIs (IRIs are routine in
    crawl data) write as UTF-8 headers (WARC 1.1) and read back
    byte-identical — no UnicodeEncodeError in the packer task."""
    iri = "http://例え.jp/パス/ファイル?q=café"
    df = spark.createDataFrame(
        [(iri, "conversion", "2025-01-01T00:00:00Z", b"body", None)],
        "target_uri string, warc_type string, warc_date string, "
        "payload binary, http_content_type string",
    )
    path = str(tmp_path / "w")
    write_warc(df, path, records_per_shard=4)
    rows = read_warc_gz(spark, path).collect()
    assert len(rows) == 1
    assert rows[0]["target_uri"] == iri
    assert bytes(rows[0]["payload"]) == b"body"


class TestRandomAccessIndex:
    def test_gzip_member_walk_boundaries(self):
        blobs = [gzip.compress(b"alpha", mtime=0),
                 gzip.compress(b"bravo charlie", mtime=0)]
        stream = b"".join(blobs)
        from sqlbackuphistoryetl_spark.sources.warc import iter_gzip_members

        got = list(iter_gzip_members(stream))
        assert [(o, l) for o, l, _ in got] == [
            (0, len(blobs[0])), (len(blobs[0]), len(blobs[1])),
        ]
        assert [d for _, _, d in got] == [b"alpha", b"bravo charlie"]

    def test_member_walk_rejects_truncation_and_garbage(self):
        from sqlbackuphistoryetl_spark.sources.warc import iter_gzip_members

        good = gzip.compress(b"data", mtime=0)
        with pytest.raises(WARCError):
            list(iter_gzip_members(good[:-6]))
        with pytest.raises(WARCError):
            list(iter_gzip_members(good + b"NOTGZIP"))

    def test_index_then_point_lookup(self, spark, tmp_path):
        import os

        from sqlbackuphistoryetl_spark.sources.warc import (
            read_warc_record,
            warc_cdx_index,
        )

        path = str(tmp_path / "warc")
        write_warc(_fixture_df(spark, 10), path, records_per_shard=4)
        idx = warc_cdx_index(spark, path, fan_out=4).collect()
        assert len(idx) == 20  # 10 docs x (response + conversion)
        by_uri = {}
        for r in idx:
            by_uri.setdefault((r["target_uri"], r["warc_type"]), r)
        row = by_uri[("http://example.com/doc/0007", "conversion")]
        headers, block = read_warc_record(
            os.path.join(path, row["shard"]), row["offset"], row["length"]
        )
        assert headers["warc-target-uri"] == "http://example.com/doc/0007"
        assert block == b"body 7"
        # a response member serves its full HTTP message
        row = by_uri[("http://example.com/doc/0007", "response")]
        headers, block = read_warc_record(
            os.path.join(path, row["shard"]), row["offset"], row["length"]
        )
        assert block.startswith(b"HTTP/1.1 200 OK")
        assert block.endswith(b"<html><body><p>body 7</p></body></html>")

    def test_index_matches_full_scan(self, spark, tmp_path):
        import os

        from sqlbackuphistoryetl_spark.sources.warc import (
            read_warc_record,
            warc_cdx_index,
        )

        path = str(tmp_path / "warc")
        write_warc(_fixture_df(spark, 6), path, records_per_shard=16)
        scan = {
            (r["target_uri"], r["warc_type"]): r["record_id"]
            for r in read_warc_gz(spark, path).collect()
        }
        for r in warc_cdx_index(spark, path).collect():
            headers, _ = read_warc_record(
                os.path.join(path, r["shard"]), r["offset"], r["length"]
            )
            assert (
                headers["warc-record-id"]
                == scan[(r["target_uri"], r["warc_type"])]
                == r["record_id"]
            )


    def test_distributed_point_reads(self, spark, tmp_path):
        """r12: read_warc_by_index serves a FILTERED index selection
        as a distributed batch of range reads — payloads byte-match
        the full scan, and unselected records are never read."""
        from sqlbackuphistoryetl_spark.sources.warc import (
            read_warc_by_index,
            warc_cdx_index,
        )

        path = str(tmp_path / "warc")
        write_warc(_fixture_df(spark, 8), path, records_per_shard=5)
        scan = {
            (r["target_uri"], r["warc_type"]): bytes(r["payload"])
            for r in read_warc_gz(spark, path).collect()
        }
        idx = warc_cdx_index(spark, path).filter(
            F.col("warc_type") == "conversion"
        )
        served = read_warc_by_index(idx, path).collect()
        assert len(served) == 8
        for r in served:
            assert r["warc_type"] == "conversion"
            assert bytes(r["payload"]) == scan[
                (r["target_uri"], "conversion")
            ]
            assert r["warc_date"] == "2025-01-01T00:00:00Z"
            assert r["record_id"].startswith("<urn:md5:")

    def test_served_response_payload_matches_scan(self, spark, tmp_path):
        """r13 (ADVICE): serving a RESPONSE record must de-envelope
        (and expose http_status / http_content_type) exactly like the
        full scan — same column name, same bytes. The r12 serve path
        emitted the raw block (HTTP envelope included) as 'payload'."""
        from sqlbackuphistoryetl_spark.sources.warc import (
            read_warc_by_index,
            warc_cdx_index,
        )

        path = str(tmp_path / "warc")
        write_warc(_fixture_df(spark, 4), path, records_per_shard=5)
        scan = {
            (r["target_uri"], r["warc_type"]): r
            for r in read_warc_gz(spark, path).collect()
        }
        idx = warc_cdx_index(spark, path).filter(
            F.col("warc_type") == "response"
        )
        served = read_warc_by_index(idx, path).collect()
        assert len(served) == 4
        for r in served:
            full = scan[(r["target_uri"], "response")]
            assert bytes(r["payload"]) == bytes(full["payload"])
            assert not bytes(r["payload"]).startswith(b"HTTP/")
            assert r["http_status"] == full["http_status"] == 200
            assert r["http_content_type"] == full["http_content_type"]


class TestWarcZst:
    def test_round_trip_and_cdx(self, spark, tmp_path):
        """r12: .warc.zst shards (one raw-block zstd frame per record)
        round-trip, index, and point-read exactly like the gzip
        layout — container dispatch by suffix."""
        from sqlbackuphistoryetl_spark.sources.warc import (
            read_warc_by_index,
            read_warc_zst,
            warc_cdx_index,
            write_warc_zst,
        )

        path = str(tmp_path / "warczst")
        df = _fixture_df(spark, 6)
        summary = write_warc_zst(df, path, records_per_shard=4)
        assert sum(r["n_samples"] for r in summary) == 6
        back = read_warc_zst(spark, path, fan_out=4)
        rows = back.collect()
        assert len(rows) == 12
        by = {(r["target_uri"], r["warc_type"]): r for r in rows}
        r0 = by[("http://example.com/doc/0000", "response")]
        assert r0["http_status"] == 200
        assert bytes(by[("http://example.com/doc/0003", "conversion")]
                     ["payload"]) == b"body 3"
        # CDX over zstd frames + distributed point reads
        idx = warc_cdx_index(spark, path, glob="*.warc.zst")
        served = read_warc_by_index(
            idx.filter(F.col("warc_type") == "conversion"), path
        ).collect()
        assert len(served) == 6
        scan = {r["target_uri"]: bytes(r["payload"])
                for r in rows if r["warc_type"] == "conversion"}
        for s in served:
            assert bytes(s["payload"]) == scan[s["target_uri"]]

    def test_zst_and_gz_scans_agree(self, spark, tmp_path):
        from sqlbackuphistoryetl_spark.sources.warc import (
            read_warc_zst,
            write_warc_zst,
        )

        df = _fixture_df(spark, 5)
        gz, zst = str(tmp_path / "gz"), str(tmp_path / "zst")
        write_warc(df, gz, records_per_shard=3)
        write_warc_zst(df, zst, records_per_shard=3)
        a = {(r["target_uri"], r["warc_type"]): (r["record_id"],
             bytes(r["payload"]))
             for r in read_warc_gz(spark, gz).collect()}
        b = {(r["target_uri"], r["warc_type"]): (r["record_id"],
             bytes(r["payload"]))
             for r in read_warc_zst(spark, zst).collect()}
        assert a == b


class TestWAT:
    def _wat_df(self, spark, n=6):
        rows = []
        for i in range(n):
            uri = f"http://example.com/page/{i:04d}"
            env = {
                "Envelope": {
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Head": {"Title": f"Title {i}"},
                                "Links": [
                                    {"url": f"https://l.example/{i}/{j}"}
                                    for j in range(1 + i % 3)
                                ],
                            }
                        }
                    }
                }
            }
            import json as _json

            rows.append(
                (uri, "metadata", "2025-01-01T00:00:00Z",
                 _json.dumps(env).encode(), None, "application/json")
            )
        return spark.createDataFrame(
            rows,
            "target_uri string, warc_type string, warc_date string, "
            "payload binary, http_content_type string, content_type string",
        )

    def test_wat_round_trip_title_and_links(self, spark, tmp_path):
        from sqlbackuphistoryetl_spark.sources.warc import (
            wat_html_metadata,
            wat_records,
        )

        path = str(tmp_path / "wat")
        write_warc(self._wat_df(spark), path, records_per_shard=4)
        back = read_warc_gz(spark, path, fan_out=4)
        # raw WAT json surfaces for ad-hoc get_json_object use
        raw = wat_records(back)
        assert raw.count() == 6
        got = {r["target_uri"]: r
               for r in wat_html_metadata(back).collect()}
        r3 = got["http://example.com/page/0003"]
        assert r3["title"] == "Title 3"
        assert list(r3["links"]) == ["https://l.example/3/0"]
        r5 = got["http://example.com/page/0005"]
        assert list(r5["links"]) == [
            "https://l.example/5/0", "https://l.example/5/1",
            "https://l.example/5/2",
        ]

    def test_wat_tolerates_foreign_json(self, spark, tmp_path):
        from sqlbackuphistoryetl_spark.sources.warc import wat_html_metadata

        df = spark.createDataFrame(
            [("http://a/x", "metadata", "2025-01-01T00:00:00Z",
              b'{"some": "other schema"}', None, "application/json")],
            "target_uri string, warc_type string, warc_date string, "
            "payload binary, http_content_type string, content_type string",
        )
        path = str(tmp_path / "wat2")
        write_warc(df, path, records_per_shard=4)
        rows = wat_html_metadata(read_warc_gz(spark, path)).collect()
        assert len(rows) == 1
        assert rows[0]["title"] is None and list(rows[0]["links"]) == []
