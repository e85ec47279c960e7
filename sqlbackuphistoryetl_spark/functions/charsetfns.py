"""Charset-aware payload decoding for crawl pages (r13).

Before this module every HTML/text path decoded UTF-8 only; legacy-
charset pages (windows-125x, Shift_JIS, GB2312, Big5, …) silently
mojibaked and poisoned every downstream quality / dedup / tokenizer
signal. This is the WHATWG encoding-sniffing algorithm's load-bearing
subset, re-expressed as pure JVM Column expressions:

1. **BOM wins** (UTF-8 / UTF-16LE / UTF-16BE byte-order marks beat
   any declaration, per WHATWG "encoding sniffing" §decode);
2. else the **Content-Type ``charset=`` parameter** (the transport
   layer's declaration — captured at WARC read time);
3. else a **``<meta charset`` / ``<meta http-equiv`` prescan** of the
   leading bytes, decoded ISO-8859-1 (bijective bytes→chars, so the
   sniff itself can never fail);
4. else **UTF-8** — the documented fallback.

Labels normalize through a WHATWG-style alias table (``latin1`` /
``iso-8859-1`` / ``us-ascii`` → windows-1252, ``shift_jis`` →
windows-31j, ``gb2312``/``gbk`` → GB18030, ``windows-949`` → EUC-KR,
``tis-620`` → x-windows-874 — each the browser-compatible superset);
unknown labels fall back to UTF-8 rather than guessing.

``F.decode`` takes a LITERAL charset, so the decode is a
``when``/``otherwise`` dispatch over :data:`CHARSET_ARMS` — one
JVM-side branch per row, no UDF, no shuffle: scan-speed at 100 TB.
Catalyst's subexpression elimination evaluates the detected-charset
expression once per row even though every arm references it (plain
projection, not a HOF lambda — the let-binding rule doesn't bite).

Spark 4 gates both non-whitelisted charsets and malformed-byte
tolerance behind runtime SQL confs; :func:`ensure_charset_confs` sets

- ``spark.sql.legacy.javaCharsets`` — every JVM charset allowed in
  ``decode`` (Spark 4's default whitelist stops at UTF-16/32), and
- ``spark.sql.legacy.codingErrorAction`` — malformed bytes decode to
  U+FFFD instead of failing the task (a single mis-declared page must
  never kill a 100 TB job; this also hardens the PRE-EXISTING UTF-8
  paths, which raised on malformed input).

Both are public, runtime-settable Spark confs; the readers set them
through ``df.sparkSession`` so library users need no session setup.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.exprcache import column_memo

#: runtime SQL confs the charset dispatch needs (see module doc)
DECODE_CONFS = {
    "spark.sql.legacy.javaCharsets": "true",
    "spark.sql.legacy.codingErrorAction": "true",
}


def ensure_charset_confs(spark: SparkSession) -> None:
    """Set the runtime confs :func:`decode_payload` depends on."""
    for k, v in DECODE_CONFS.items():
        spark.conf.set(k, v)


#: canonical JVM charset names the dispatch decodes — the arms cover
#: the charsets that dominate real crawls (W3Techs ordering): UTF-8,
#: the windows-125x family, Shift_JIS (as its windows-31j superset),
#: EUC-JP, GB* (as GB18030), Big5, EUC-KR, Thai, KOI8-R, and UTF-16.
CHARSET_ARMS = [
    "UTF-8",
    "windows-1252",
    "ISO-8859-2",
    "ISO-8859-15",
    "windows-1250",
    "windows-1251",
    "windows-1254",
    "windows-1256",
    "KOI8-R",
    "windows-31j",
    "EUC-JP",
    "GB18030",
    "Big5",
    "Big5-HKSCS",
    "EUC-KR",
    "x-windows-874",
    "UTF-16LE",
    "UTF-16BE",
]

#: WHATWG-style label → canonical JVM charset (labels lowercased).
#: iso-8859-1/us-ascii intentionally map to windows-1252 and
#: shift_jis to windows-31j — the browser-compatible supersets.
CHARSET_ALIASES = {
    "utf-8": "UTF-8",
    "utf8": "UTF-8",
    "unicode-1-1-utf-8": "UTF-8",
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "iso_8859-1": "windows-1252",
    "latin1": "windows-1252",
    "l1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "cp819": "windows-1252",
    "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "windows-1252": "windows-1252",
    "iso-8859-2": "ISO-8859-2",
    "iso8859-2": "ISO-8859-2",
    "latin2": "ISO-8859-2",
    "iso-8859-15": "ISO-8859-15",
    "iso8859-15": "ISO-8859-15",
    "latin9": "ISO-8859-15",
    "windows-1250": "windows-1250",
    "cp1250": "windows-1250",
    "x-cp1250": "windows-1250",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "x-cp1251": "windows-1251",
    "windows-1254": "windows-1254",
    "cp1254": "windows-1254",
    "iso-8859-9": "windows-1254",
    "latin5": "windows-1254",
    "windows-1256": "windows-1256",
    "cp1256": "windows-1256",
    "koi8-r": "KOI8-R",
    "koi8": "KOI8-R",
    "koi": "KOI8-R",
    "cskoi8r": "KOI8-R",
    "shift_jis": "windows-31j",
    "shift-jis": "windows-31j",
    "sjis": "windows-31j",
    "x-sjis": "windows-31j",
    "ms_kanji": "windows-31j",
    "csshiftjis": "windows-31j",
    "windows-31j": "windows-31j",
    "cp932": "windows-31j",
    "ms932": "windows-31j",
    "euc-jp": "EUC-JP",
    "x-euc-jp": "EUC-JP",
    "cseucpkdfmtjapanese": "EUC-JP",
    "gb2312": "GB18030",
    "gbk": "GB18030",
    "gb_2312": "GB18030",
    "gb_2312-80": "GB18030",
    "csgb2312": "GB18030",
    "x-gbk": "GB18030",
    "chinese": "GB18030",
    "csiso58gb231280": "GB18030",
    "gb18030": "GB18030",
    "big5": "Big5",
    "cn-big5": "Big5",
    "csbig5": "Big5",
    "x-x-big5": "Big5",
    "big5-hkscs": "Big5-HKSCS",
    "euc-kr": "EUC-KR",
    "cseuckr": "EUC-KR",
    "ks_c_5601-1987": "EUC-KR",
    "ksc5601": "EUC-KR",
    "korean": "EUC-KR",
    "windows-949": "EUC-KR",
    "windows-874": "x-windows-874",
    "dos-874": "x-windows-874",
    "tis-620": "x-windows-874",
    "iso-8859-11": "x-windows-874",
    "utf-16": "UTF-16LE",
    "utf-16le": "UTF-16LE",
    "utf-16be": "UTF-16BE",
}

#: charset token inside a Content-Type parameter or a <meta> tag
_LABEL = r"([A-Za-z0-9._:\-]+)"

#: how many leading payload bytes the <meta> prescan reads — WHATWG's
#: byte-stream prescan window is 1024; we read 2048 for slack.
SNIFF_BYTES = 2048


def charset_of(
    content_type: Column | str | None,
    payload: Column | str,
    sniff_bytes: int = SNIFF_BYTES,
) -> Column:
    """The canonical JVM charset name a page's payload decodes with —
    BOM > Content-Type ``charset=`` param > ``<meta`` prescan >
    UTF-8, labels normalized through :data:`CHARSET_ALIASES` (module
    doc). Pure Column expression; never NULL."""
    p = F.col(payload) if isinstance(payload, str) else payload

    bom = (
        F.when(F.substring(p, 1, 3) == F.unhex(F.lit("EFBBBF")), F.lit("UTF-8"))
        .when(F.substring(p, 1, 2) == F.unhex(F.lit("FFFE")), F.lit("UTF-16LE"))
        .when(F.substring(p, 1, 2) == F.unhex(F.lit("FEFF")), F.lit("UTF-16BE"))
    )

    labels = []
    if content_type is not None:
        ct = F.col(content_type) if isinstance(content_type, str) else content_type
        labels.append(
            F.regexp_extract(
                F.coalesce(ct, F.lit("")),
                rf"""(?i)charset\s*=\s*["']?\s*{_LABEL}""",
                1,
            )
        )
    # ISO-8859-1 is byte→char bijective: the prescan decode can never
    # fail, whatever the page's real charset is.
    head = F.decode(F.substring(p, 1, sniff_bytes), "ISO-8859-1")
    labels.append(
        F.regexp_extract(
            head,
            rf"""(?i)<meta[^>]{{0,512}}?charset\s*=\s*["']?\s*{_LABEL}""",
            1,
        )
    )

    label = None
    for cand in labels:
        cond = F.when(cand != "", F.lower(cand))
        label = cond if label is None else label.when(cand != "", F.lower(cand))

    alias_map = F.create_map(
        *[F.lit(x) for kv in CHARSET_ALIASES.items() for x in kv]
    )
    return F.coalesce(bom, F.element_at(alias_map, label), F.lit("UTF-8"))


def decode_with(payload: Column | str, charset: Column) -> Column:
    """``payload`` decoded under the (column-valued) canonical
    ``charset`` — a literal-charset dispatch over
    :data:`CHARSET_ARMS`, unknown values falling back to UTF-8. A
    leading U+FEFF (decoded BOM) is stripped, like browsers do.
    Requires :func:`ensure_charset_confs` on the session."""
    p = F.col(payload) if isinstance(payload, str) else payload
    out = None
    for name in CHARSET_ARMS:
        if name == "UTF-8":
            continue
        cond = charset == name
        arm = F.decode(p, name)
        out = F.when(cond, arm) if out is None else out.when(cond, arm)
    out = out.otherwise(F.decode(p, "UTF-8"))
    return F.regexp_replace(out, "^\ufeff", "")


@column_memo
def decode_payload(
    payload: Column | str,
    content_type: Column | str | None = None,
    sniff_bytes: int = SNIFF_BYTES,
) -> Column:
    """Charset-aware decode of a crawl payload: detect with
    :func:`charset_of`, decode with :func:`decode_with`. The drop-in
    replacement for ``F.decode(payload, "UTF-8")`` on crawl pages.

    ``column_memo``: the dispatch-arm chain costs ~1 s / ~1300 py4j
    round-trips to construct (r13) and is rebuilt by every crawl-text
    consumer — memoized per process, see exprcache."""
    p = F.col(payload) if isinstance(payload, str) else payload
    return decode_with(p, charset_of(content_type, p, sniff_bytes))
