"""Charset-aware payload decode (functions/charsetfns.py, r13)."""

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.charsetfns import (
    CHARSET_ALIASES,
    CHARSET_ARMS,
    charset_of,
    decode_payload,
    ensure_charset_confs,
)

#: (python codec, declared label, canonical JVM name, sample text)
ROUND_TRIPS = [
    ("utf-8", "utf-8", "UTF-8", "naïve — déjà vu ☃"),
    ("cp1252", "iso-8859-1", "windows-1252", "café €99 “quoted”"),
    ("cp1250", "windows-1250", "windows-1250", "Příliš žluťoučký kůň"),
    ("cp1251", "windows-1251", "windows-1251", "Съешь же ещё этих булок"),
    ("cp1254", "iso-8859-9", "windows-1254", "Pijamalı hasta yağız şoföre"),
    ("cp1256", "windows-1256", "windows-1256", "نص عربي قصير"),
    ("iso8859-2", "latin2", "ISO-8859-2", "Árvíztűrő tükörfúrógép"),
    ("iso8859-15", "latin9", "ISO-8859-15", "l'œuvre à 10€"),
    ("koi8-r", "koi8-r", "KOI8-R", "Широкая электрификация"),
    ("cp932", "shift_jis", "windows-31j", "日本語のテキスト"),
    ("euc_jp", "euc-jp", "EUC-JP", "漢字とかな"),
    ("gb18030", "gb2312", "GB18030", "中文网页内容"),
    ("big5", "big5", "Big5", "中文網頁內容"),
    ("euc_kr", "euc-kr", "EUC-KR", "한국어 텍스트"),
    ("cp874", "windows-874", "x-windows-874", "ข้อความภาษาไทย"),
]


def _decode_one(spark, payload: bytes, content_type):
    ensure_charset_confs(spark)
    df = spark.createDataFrame([(payload, content_type)], "p binary, ct string")
    row = df.select(
        charset_of("ct", "p").alias("cs"),
        decode_payload("p", "ct").alias("t"),
    ).collect()[0]
    return row["cs"], row["t"]


def test_header_declared_round_trips(spark):
    """Every dispatch arm decodes REAL non-ASCII bytes declared via
    the Content-Type charset parameter."""
    ensure_charset_confs(spark)
    rows = [
        (i, text.encode(codec), f"text/html; charset={label}")
        for i, (codec, label, _canon, text) in enumerate(ROUND_TRIPS)
    ]
    df = spark.createDataFrame(rows, "i long, p binary, ct string")
    got = {
        r["i"]: (r["cs"], r["t"])
        for r in df.select(
            "i",
            charset_of("ct", "p").alias("cs"),
            decode_payload("p", "ct").alias("t"),
        ).collect()
    }
    for i, (codec, label, canon, text) in enumerate(ROUND_TRIPS):
        assert got[i] == (canon, text), (codec, label, got[i])


def test_meta_charset_sniff(spark):
    html = '<html><head><meta charset="Windows-1251"></head><body>Привет</body></html>'
    cs, t = _decode_one(spark, html.encode("cp1251"), "text/html")
    assert cs == "windows-1251"
    assert "Привет" in t


def test_meta_http_equiv_form(spark):
    html = (
        "<html><head><meta http-equiv='Content-Type' "
        "content='text/html; charset=Shift_JIS'></head>"
        "<body>テスト</body></html>"
    )
    cs, t = _decode_one(spark, html.encode("cp932"), "text/html")
    assert cs == "windows-31j"
    assert "テスト" in t


def test_header_beats_meta(spark):
    """Transport declaration wins over an (incorrect) in-page meta."""
    html = '<meta charset="utf-8"><p>Українська</p>'
    cs, t = _decode_one(
        spark, html.encode("cp1251"), "text/html; charset=windows-1251"
    )
    assert cs == "windows-1251"
    assert "Українська" in t


def test_bom_beats_everything(spark):
    payload = "\ufeffBOM page ✓".encode("utf-8")
    cs, t = _decode_one(spark, payload, "text/html; charset=windows-1251")
    assert cs == "UTF-8"
    assert t == "BOM page ✓"  # BOM stripped


def test_utf16_boms(spark):
    for codec, canon in [("utf-16-le", "UTF-16LE"), ("utf-16-be", "UTF-16BE")]:
        payload = "\ufeffwide ✓".encode(codec)
        cs, t = _decode_one(spark, payload, None)
        assert cs == canon
        assert t == "wide ✓"


def test_unknown_label_falls_back_utf8(spark):
    cs, t = _decode_one(spark, "plain".encode(), "text/html; charset=x-weird-cs")
    assert cs == "UTF-8" and t == "plain"


def test_no_declaration_falls_back_utf8(spark):
    cs, t = _decode_one(spark, "naïve".encode("utf-8"), "text/html")
    assert cs == "UTF-8" and t == "naïve"


def test_malformed_bytes_replace_not_raise(spark):
    """A mis-declared page decodes with U+FFFD, never fails the task."""
    bad = bytes([0x41, 0xFF, 0xFE, 0x81, 0x42])
    cs, t = _decode_one(spark, bad, "text/html; charset=utf-8")
    assert cs == "UTF-8"
    assert t.startswith("A") and t.endswith("B") and "�" in t


def test_null_and_empty_payload(spark):
    ensure_charset_confs(spark)
    df = spark.createDataFrame(
        [(None, "text/html; charset=sjis"), (b"", None)], "p binary, ct string"
    )
    rows = df.select(
        charset_of("ct", "p").alias("cs"),
        decode_payload("p", "ct").alias("t"),
    ).collect()
    assert rows[0]["t"] is None  # NULL in, NULL out
    assert rows[1]["cs"] == "UTF-8" and rows[1]["t"] == ""


def test_alias_table_targets_are_arms():
    assert set(CHARSET_ALIASES.values()) <= set(CHARSET_ARMS)


def test_response_main_text_honors_charset(spark, tmp_path):
    """End-to-end: a windows-1251 page written to a WARC shard comes
    back through response_main_text as readable prose, not mojibake."""
    from sqlbackuphistoryetl_spark.sources.warc import (
        read_warc_gz,
        response_main_text,
        write_warc,
    )

    body = (
        "<html><body><p>"
        + "Широкая электрификация южных губерний даст мощный толчок "
        + "подъёму сельского хозяйства, да."
        + "</p></body></html>"
    )
    df = spark.createDataFrame(
        [(
            "http://example.com/ru",
            "response",
            "2025-01-01T00:00:00Z",
            body.encode("cp1251"),
            "text/html; charset=windows-1251",
        )],
        "target_uri string, warc_type string, warc_date string, "
        "payload binary, http_content_type string",
    )
    path = str(tmp_path / "warc")
    write_warc(df, path, records_per_shard=4)
    out = response_main_text(read_warc_gz(spark, path)).collect()
    assert len(out) == 1
    assert "электрификация" in out[0]["text"]
    assert "�" not in out[0]["text"]
