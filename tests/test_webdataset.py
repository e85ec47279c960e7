"""WebDataset tar shard I/O: round-trip, determinism, sample
integrity, grouping, reader robustness (r9)."""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.webdataset import (
    group_samples,
    read_webdataset,
    read_zip_shards,
    write_webdataset,
    write_zip_shards,
)


def _member_rows(n=10):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        rows.append((key, "txt", f"document {i}".encode()))
        rows.append((key, "json", b'{"id": %d}' % i))
    return rows


def test_round_trip_exact(spark, tmp_path):
    path = str(tmp_path / "wds")
    df = spark.createDataFrame(_member_rows(10), "key string, ext string, payload binary")
    summary = write_webdataset(df, path, samples_per_shard=4)
    # 10 samples / 4 per shard = 3 shards (last ragged), 2 members each
    assert [r["shard"] for r in summary] == [0, 1, 2]
    assert [r["n_samples"] for r in summary] == [4, 4, 2]
    assert [r["n_members"] for r in summary] == [8, 8, 4]
    assert sorted(os.listdir(path)) == [
        "shard-000000.tar", "shard-000001.tar", "shard-000002.tar",
    ]

    back = read_webdataset(spark, path)
    got = {(r["key"], r["ext"]): bytes(r["payload"]) for r in back.collect()}
    want = {(k, e): p for k, e, p in _member_rows(10)}
    assert got == want


def test_sample_members_stay_in_one_shard(spark, tmp_path):
    path = str(tmp_path / "wds")
    df = spark.createDataFrame(_member_rows(9), "key string, ext string, payload binary")
    write_webdataset(df, path, samples_per_shard=2)
    per_key = (
        read_webdataset(spark, path)
        .groupBy("key")
        .agg(F.countDistinct("shard").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_key)


def test_shard_files_are_byte_deterministic(spark, tmp_path):
    df = spark.createDataFrame(_member_rows(6), "key string, ext string, payload binary")
    blobs = []
    for d in ("a", "b"):
        path = str(tmp_path / d)
        write_webdataset(df, path, samples_per_shard=3)
        blobs.append(
            [open(os.path.join(path, f), "rb").read()
             for f in sorted(os.listdir(path))]
        )
    assert blobs[0] == blobs[1]
    # members inside a shard are (key, ext)-sorted with zeroed metadata
    with tarfile.open(fileobj=io.BytesIO(blobs[0][0])) as tf:
        names = [m.name for m in tf]
        infos = list(tf)
    assert names == sorted(names)
    assert all(m.mtime == 0 and m.uid == 0 and m.uname == "" for m in infos)


def test_group_samples_pivot(spark, tmp_path):
    path = str(tmp_path / "wds")
    rows = _member_rows(4) + [("000001", "seg.png", b"MASK")]  # dotted ext
    df = spark.createDataFrame(rows, "key string, ext string, payload binary")
    write_webdataset(df, path, samples_per_shard=10)
    grouped = group_samples(read_webdataset(spark, path), ["txt", "json", "seg.png"])
    out = {r["key"]: r for r in grouped.collect()}
    assert len(out) == 4
    assert bytes(out["000002"]["txt"]) == b"document 2"
    assert bytes(out["000001"]["seg_png"]) == b"MASK"
    assert out["000002"]["seg_png"] is None


def test_reader_skips_non_files_and_handles_dirs_and_none(spark, tmp_path):
    # hand-built tar: a directory member, a nested member, an empty file
    path = tmp_path / "wds"
    path.mkdir()
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("sub")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        m = tarfile.TarInfo("sub/abc.txt")
        m.size = 5
        tf.addfile(m, io.BytesIO(b"hello"))
        e = tarfile.TarInfo("empty.json")
        e.size = 0
        tf.addfile(e, io.BytesIO(b""))
    (path / "shard-000000.tar").write_bytes(buf.getvalue())
    rows = {(r["key"], r["ext"]): bytes(r["payload"])
            for r in read_webdataset(spark, str(path)).collect()}
    assert rows == {("sub/abc", "txt"): b"hello", ("empty", "json"): b""}


def test_none_payload_written_as_empty(spark, tmp_path):
    path = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [("k0", "txt", None)], "key string, ext string, payload binary"
    )
    write_webdataset(df, path, samples_per_shard=1)
    rows = read_webdataset(spark, str(path)).collect()
    assert bytes(rows[0]["payload"]) == b""


def test_zip_round_trip_and_determinism(spark, tmp_path):
    import zipfile

    df = spark.createDataFrame(_member_rows(7), "key string, ext string, payload binary")
    blobs = []
    for d in ("za", "zb"):
        path = str(tmp_path / d)
        summary = write_zip_shards(df, path, samples_per_shard=3)
        assert [r["n_samples"] for r in summary] == [3, 3, 1]
        assert sorted(os.listdir(path))[0] == "shard-000000.zip"
        blobs.append(
            [open(os.path.join(path, f), "rb").read()
             for f in sorted(os.listdir(path))]
        )
    assert blobs[0] == blobs[1]  # byte-deterministic
    got = {(r["key"], r["ext"]): bytes(r["payload"])
           for r in read_zip_shards(spark, str(tmp_path / "za")).collect()}
    assert got == {(k, e): p for k, e, p in _member_rows(7)}
    # members are STORED with zeroed timestamps
    with zipfile.ZipFile(io.BytesIO(blobs[0][0])) as zf:
        infos = zf.infolist()
    assert all(zi.compress_type == zipfile.ZIP_STORED for zi in infos)
    assert all(zi.date_time == (1980, 1, 1, 0, 0, 0) for zi in infos)


def test_zip_reader_skips_directory_entries(spark, tmp_path):
    import zipfile

    path = tmp_path / "z"
    path.mkdir()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(zipfile.ZipInfo("sub/", date_time=(1980, 1, 1, 0, 0, 0)), b"")
        zf.writestr(
            zipfile.ZipInfo("sub/doc.txt", date_time=(1980, 1, 1, 0, 0, 0)),
            b"hi",
        )
    (path / "shard-000000.zip").write_bytes(buf.getvalue())
    rows = {(r["key"], r["ext"]): bytes(r["payload"])
            for r in read_zip_shards(spark, str(path)).collect()}
    assert rows == {("sub/doc", "txt"): b"hi"}


def test_reader_plan_is_map_side(spark, tmp_path):
    import contextlib
    import io as _io

    path = str(tmp_path / "wds")
    df = spark.createDataFrame(_member_rows(4), "key string, ext string, payload binary")
    write_webdataset(df, path, samples_per_shard=2)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        read_webdataset(spark, path).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_append_new_shards_only(spark, tmp_path):
    import hashlib

    from sqlbackuphistoryetl_spark.extensions.webdataset import (
        append_webdataset,
    )

    path = str(tmp_path / "wds")
    base = spark.createDataFrame(_member_rows(5), "key string, ext string, payload binary")
    write_webdataset(base, path, samples_per_shard=2)  # shards 0,1,2
    before = {
        f: hashlib.md5(open(os.path.join(path, f), "rb").read()).hexdigest()
        for f in os.listdir(path)
    }
    extra = spark.createDataFrame(
        [(f"9{i:05d}", "txt", f"extra {i}".encode()) for i in range(3)],
        "key string, ext string, payload binary",
    )
    summary = append_webdataset(extra, path, samples_per_shard=2)
    assert [r["shard"] for r in summary] == [3, 4]
    # existing shards untouched byte-for-byte
    after = {
        f: hashlib.md5(open(os.path.join(path, f), "rb").read()).hexdigest()
        for f in os.listdir(path) if f in before
    }
    assert after == before
    got = {r["key"] for r in read_webdataset(spark, path).select("key").collect()}
    assert len(got) == 8
    # appending to an empty/missing dir starts at shard 0
    p2 = str(tmp_path / "fresh")
    s2 = append_webdataset(extra, p2, samples_per_shard=2)
    assert [r["shard"] for r in s2] == [0, 1]


def test_zip_append(spark, tmp_path):
    from sqlbackuphistoryetl_spark.extensions.webdataset import (
        append_zip_shards,
    )

    path = str(tmp_path / "z")
    base = spark.createDataFrame(_member_rows(3), "key string, ext string, payload binary")
    write_zip_shards(base, path, samples_per_shard=2)  # shards 0,1
    extra = spark.createDataFrame(
        [("900000", "txt", b"x")], "key string, ext string, payload binary"
    )
    assert [r["shard"] for r in append_zip_shards(extra, path, 2)] == [2]
    assert read_zip_shards(spark, path).count() == 7


def test_fresh_write_refuses_existing_shards(spark, tmp_path):
    """r9 advice: a fresh write over existing shard files would merge
    two corpora into later scans (stale shard-000xxx.tar from a prior
    run survive any re-write with fewer shards). Fail and point at the
    append form; append itself still works."""
    import pytest

    from sqlbackuphistoryetl_spark.extensions.webdataset import (
        append_webdataset,
        write_webdataset,
    )

    rows = [(f"k{i:03d}", "txt", f"v{i}".encode()) for i in range(8)]
    df = spark.createDataFrame(rows, ["key", "ext", "payload"])
    path = str(tmp_path / "wds")
    write_webdataset(df, path, samples_per_shard=4)
    with pytest.raises(ValueError, match="append"):
        write_webdataset(df, path, samples_per_shard=4)
    # append remains the sanctioned way to add to a populated dir
    more = spark.createDataFrame(
        [(f"m{i}", "txt", b"x") for i in range(4)], ["key", "ext", "payload"]
    )
    assert append_webdataset(more, path, samples_per_shard=4)


def test_zip_member_budget_yields_null_payload(spark, tmp_path):
    """r9 advice: a scraped DEFLATED zip member declaring more than
    MAX_MEMBER_BYTES must never be decompressed — it surfaces as a
    visible NULL-payload row, not an executor OOM or a vanished key."""
    import io
    import zipfile

    from sqlbackuphistoryetl_spark.extensions import webdataset as wds

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("ok.txt", b"fine")
        zf.writestr("bomb.bin", b"\0" * 4096)  # compresses tiny
    blob = bytearray(buf.getvalue())
    path = str(tmp_path / "z")
    import os

    os.makedirs(path)
    with open(os.path.join(path, "shard-000000.zip"), "wb") as fh:
        fh.write(bytes(blob))

    orig = wds.MAX_MEMBER_BYTES
    wds.MAX_MEMBER_BYTES = 1024  # force 'bomb.bin' over budget
    try:
        out = {r["key"]: r["payload"]
               for r in wds.read_zip_shards(spark, path).collect()}
    finally:
        wds.MAX_MEMBER_BYTES = orig
    assert out["ok"] == b"fine"
    assert out["bomb"] is None  # present, visibly dropped


def test_tar_member_budget_yields_null_payload(spark, tmp_path):
    import io
    import os
    import tarfile

    from sqlbackuphistoryetl_spark.extensions import webdataset as wds

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("a.txt", b"ok"), ("big.bin", b"\0" * 4096)]:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    path = str(tmp_path / "t")
    os.makedirs(path)
    with open(os.path.join(path, "shard-000000.tar"), "wb") as fh:
        fh.write(buf.getvalue())

    orig = wds.MAX_MEMBER_BYTES
    wds.MAX_MEMBER_BYTES = 1024
    try:
        out = {r["key"]: r["payload"]
               for r in wds.read_webdataset(spark, path).collect()}
    finally:
        wds.MAX_MEMBER_BYTES = orig
    assert out["a"] == b"ok" and out["big"] is None


def test_read_tar_gz_shards(spark, tmp_path):
    """r10: compressed shards are common in scraped corpora — the
    .tar.gz reader walks them streaming with the same member budget."""
    import gzip
    import io
    import os
    import tarfile

    from sqlbackuphistoryetl_spark.extensions import webdataset as wds

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("a.txt", b"alpha"), ("b.txt", b"beta"),
                           ("big.bin", b"\0" * 4096)]:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    path = str(tmp_path / "gz")
    os.makedirs(path)
    with open(os.path.join(path, "shard-000000.tar.gz"), "wb") as fh:
        fh.write(gzip.compress(buf.getvalue(), 6))

    out = {r["key"]: r["payload"]
           for r in wds.read_webdataset_gz(spark, path).collect()}
    assert out == {"a": b"alpha", "b": b"beta", "big": b"\0" * 4096}

    orig = wds.MAX_MEMBER_BYTES
    wds.MAX_MEMBER_BYTES = 1024
    try:
        out = {r["key"]: r["payload"]
               for r in wds.read_webdataset_gz(spark, path).collect()}
    finally:
        wds.MAX_MEMBER_BYTES = orig
    assert out["a"] == b"alpha" and out["big"] is None


def test_zip_short_member_yields_null_payload(spark, tmp_path):
    """r10 advice: a deflated member whose stream inflates to FEWER
    bytes than its declared uncompressed size must surface as a
    visible NULL drop, consistent with over-declared/over-budget
    members — not as silently short bytes."""
    import io
    import struct
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("ok.txt", (1980, 1, 1, 0, 0, 0)), b"fine"
        )
        zf.writestr(
            zipfile.ZipInfo("short.txt", (1980, 1, 1, 0, 0, 0)),
            b"hello world",
            compress_type=zipfile.ZIP_DEFLATED,
        )
    blob = bytearray(buf.getvalue())
    # lie: bump short.txt's uncompressed size 11 -> 21 in both the
    # local header (offset 22) and the central directory (offset 24)
    lh = blob.find(b"PK\x03\x04", blob.find(b"short.txt") - 40)
    cd = blob.rfind(b"PK\x01\x02")
    assert blob[lh + 22 : lh + 26] == struct.pack("<I", 11)
    blob[lh + 22 : lh + 26] = struct.pack("<I", 21)
    assert blob[cd + 24 : cd + 28] == struct.pack("<I", 11)
    blob[cd + 24 : cd + 28] = struct.pack("<I", 21)

    path = str(tmp_path / "zs")
    os.makedirs(path)
    with open(os.path.join(path, "shard-000000.zip"), "wb") as fh:
        fh.write(bytes(blob))
    out = {r["key"]: r["payload"]
           for r in read_zip_shards(spark, path).collect()}
    assert out["ok"] == b"fine"
    assert out["short"] is None  # present, visibly dropped


def test_tar_xz_reader_round_trip(spark, tmp_path):
    """r11: the xz-compressed tar twin — stdlib lzma streaming, same
    budget doctrine as the gz walk."""
    import lzma
    import tarfile as tf

    from sqlbackuphistoryetl_spark.extensions.webdataset import (
        read_webdataset_xz,
    )

    path = str(tmp_path / "xz")
    os.makedirs(path)
    buf = io.BytesIO()
    with tf.open(fileobj=buf, mode="w:xz") as arc:
        for key, ext, payload in _member_rows(6):
            ti = tf.TarInfo(f"{key}.{ext}")
            ti.size = len(payload)
            arc.addfile(ti, io.BytesIO(payload))
    with open(os.path.join(path, "shard-000000.tar.xz"), "wb") as fh:
        fh.write(buf.getvalue())
    rows = {(r["key"], r["ext"]): bytes(r["payload"])
            for r in read_webdataset_xz(spark, path).collect()}
    assert rows[("000003", "txt")] == b"document 3"
    assert rows[("000005", "json")] == b'{"id": 5}'
    assert len(rows) == 12
