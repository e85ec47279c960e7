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
