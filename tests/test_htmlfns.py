"""html_to_text: markup stripping, entity decode order, whitespace
normalization (r9)."""

from __future__ import annotations

from sqlbackuphistoryetl_spark.functions.htmlfns import html_to_text


def _x(spark, html):
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(html_to_text("h").alias("t")).collect()[0]["t"]


def test_structure_and_blocks(spark):
    html = (
        "<html><head><style>p{color:red}</style></head><body>"
        "<h1>Title</h1><p>First  para.</p><p>Second<br>line</p>"
        "<script>var x = '<p>sneaky</p>';</script>"
        "<div>Footer</div></body></html>"
    )
    assert _x(spark, html) == "Title\nFirst para.\nSecond\nline\nFooter"


def test_entity_decode_order(spark):
    # &amp;lt; must decode to the LITERAL '&lt;' (one level), never '<'
    assert _x(spark, "<p>a &amp;lt; b &amp; c &lt; d&nbsp;e</p>") == (
        "a &lt; b & c < d e"
    )
    assert _x(spark, "say &quot;hi&quot; &#39;there&apos;") == (
        "say \"hi\" 'there'"
    )


def test_comments_and_attrs(spark):
    html = '<!-- hidden --><a href="https://x.io" class="b">link</a> text'
    assert _x(spark, html) == "link text"


def test_case_insensitive_and_multiline_script(spark):
    html = "<SCRIPT type='x'>\nmany\nlines\n</SCRIPT>real<BR/>text"
    assert _x(spark, html) == "real\ntext"


def test_whitespace_collapse(spark):
    assert _x(spark, "<p>  a\t b </p>\n\n\n<p>  c  </p>") == "a b\nc"


def test_plain_text_passthrough(spark):
    assert _x(spark, "no markup here") == "no markup here"


def test_numeric_refs_decode_bmp_only(spark):
    """r11: &#NNN;/&#xHH; decode JVM-side for BMP codepoints; bogus,
    surrogate, supplementary-plane and double-escaped refs stay
    literal."""
    from sqlbackuphistoryetl_spark.functions.htmlfns import (
        decode_numeric_refs,
    )

    rows = [
        (1, "caf&#233; &#x3B1;&#X3b2;"),
        (2, "keep &#zz; &#128512; &#55296; &# ;"),
        (3, "&#65;&#x42;c"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    out = {r["id"]: r["o"]
           for r in df.select(
               "id", decode_numeric_refs("s").alias("o")).collect()}
    assert out[1] == "café αβ"
    assert out[2] == "keep &#zz; &#128512; &#55296; &# ;"
    assert out[3] == "ABc"
    assert out[4] is None


def test_numeric_amp_refs_do_not_double_decode(spark):
    """r12 (ADVICE): '&#38;lt;' means the literal text '&lt;' — the
    numeric pass must not mint an '&lt;' for the named pass to decode
    again. The ampersand refs decode LAST (the &amp;-last rule),
    including leading-zero and hex spellings."""
    got = _x(
        spark,
        "<p>&#38;lt; &#x26;amp; &#038;gt; lone &#38; and &#X26;</p>",
    )
    assert got == "&lt; &amp; &gt; lone & and &"
    # the standalone decoder (no named-entity pass follows) still
    # decodes 38 by default
    from sqlbackuphistoryetl_spark.functions.htmlfns import (
        decode_numeric_refs,
    )

    df = spark.createDataFrame([("&#38;lt;",)], ["s"])
    assert df.select(
        decode_numeric_refs("s").alias("o")
    ).collect()[0]["o"] == "&lt;"


def test_numeric_refs_inside_html_to_text(spark):
    """Integration order: numeric pass BEFORE &amp; — a literal
    &amp;#65; in source must surface as '&#65;', not 'A'."""
    html = (
        "<html><body><p>r&#233;sum&#x00E9; and &amp;#65; literal"
        "</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id long, h string")
    got = df.select(html_to_text("h").alias("t")).collect()[0]["t"]
    assert got == "résumé and &#65; literal"


def test_amp_numeric_mirror_single_decode(spark):
    """r13 (ADVICE): the mirror of the r12 case — '&amp;#38;' means
    the literal text '&#38;' (one decode of the &amp;). The r12
    multi-pass chain minted '&#38;' in the named pass and the
    deferred final regexp decoded it again to '&'. The single-pass
    tokenizer decodes each source token exactly once."""
    cases = {
        "&amp;#38;": "&#38;",
        "&amp;#x26;": "&#x26;",
        "&amp;#38;lt;": "&#38;lt;",
        "&amp;amp;": "&amp;",
        # and the r12 direction still holds
        "&#38;lt;": "&lt;",
        "&amp;lt;": "&lt;",
        "&amp;#65;": "&#65;",
    }
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    from sqlbackuphistoryetl_spark.functions.htmlfns import decode_entities

    got = {
        r["s"]: r["o"]
        for r in df.select("s", decode_entities("s").alias("o")).collect()
    }
    assert got == cases
