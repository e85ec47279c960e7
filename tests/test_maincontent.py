"""Main-content extraction (extensions/maincontent.py, r12): block
segmentation, link-density and stopword-density classification,
entity decode on kept blocks, JVM-only plan."""

from __future__ import annotations

import contextlib
import io

from sqlbackuphistoryetl_spark.extensions.maincontent import (
    main_content_blocks,
    main_content_extract,
)

PAGE = (
    "<html><head><title>t</title><style>p{}</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/a">About</a> '
    '<a href="/c">Contact</a> <a href="/s">Shop</a></nav>'
    "<h1>Tiny</h1>"
    "<p>This is the actual article body and it carries enough prose "
    "to clear the minimum block length easily.</p>"
    '<p>A second paragraph of real content with one inline '
    '<a href="/ref">reference link</a> inside a lot of ordinary '
    "running text around it.</p>"
    '<div>Copyright 2025 <a href="/p">Privacy</a> '
    '<a href="/t">Terms</a> <a href="/i">Imprint</a></div>'
    "<script>var x = '<p>block soup inside script</p>';</script>"
    "</body></html>"
)


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(
        main_content_extract("h", **kw).alias("t")
    ).collect()[0]["t"]


def test_keeps_content_drops_nav_footer(spark):
    got = _extract(spark, PAGE)
    assert got == (
        "This is the actual article body and it carries enough prose "
        "to clear the minimum block length easily.\n"
        "A second paragraph of real content with one inline reference "
        "link inside a lot of ordinary running text around it."
    )
    # nav/footer link soup and the short h1 are gone
    assert "Home" not in got and "Privacy" not in got
    assert "Tiny" not in got
    assert "script" not in got


def test_block_metrics_exposed(spark):
    df = spark.createDataFrame([(PAGE,)], ["h"])
    rows = df.select(
        main_content_blocks("h").alias("b")
    ).collect()[0]["b"]
    by_text = {r["text"]: r for r in rows}
    nav = by_text["Home About Contact Shop"]
    assert nav["link_chars"] == nav["n_chars"]  # 100% link density
    assert not nav["is_content"]
    art = next(r for r in rows if r["text"].startswith("This is"))
    assert art["is_content"] and art["link_chars"] == 0
    assert art["stop_words"] > 0 and art["n_words"] > 10
    # title text rides a non-block element but <body>/<head> aren't
    # boundaries; the style strip removed the css
    assert all("p{}" not in r["text"] for r in rows)


def test_stopword_density_gate(spark):
    html = (
        "<p>alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima</p>"
        "<p>this is the story of a fox and it was good for all of "
        "them to see</p>"
    )
    # off by default: both blocks long enough, both kept
    assert _extract(spark, html).count("\n") == 1
    # jusText English threshold: only the stopword-dense block stays
    got = _extract(spark, html, min_stop_density=0.30)
    assert got == (
        "this is the story of a fox and it was good for all of them "
        "to see"
    )


def test_link_density_boundary(spark):
    # exactly at the threshold passes (<=), just above fails
    text30 = "x" * 70 + ' <a href="/">' + "y" * 30 + "</a>"
    text31 = "x" * 69 + ' <a href="/">' + "y" * 31 + "</a>"
    html = f"<p>{text30}</p>"
    assert _extract(spark, html) != ""
    assert _extract(spark, f"<p>{text31}</p>") == ""


def test_entity_decode_on_kept_blocks(spark):
    html = (
        "<p>fish &amp; chips &#233; with &amp;#65; literal and "
        "&#38;lt; staying escaped in a long enough block</p>"
    )
    got = _extract(spark, html)
    assert "fish & chips é" in got
    assert "&#65; literal" in got
    assert "&lt; staying" in got


def test_all_chrome_page_is_empty_not_null(spark):
    html = '<nav><a href="/">Home</a> <a href="/x">More</a></nav>'
    assert _extract(spark, html) == ""
    df = spark.createDataFrame([(None,)], "h string")
    assert df.select(
        main_content_extract("h").alias("t")
    ).collect()[0]["t"] is None


def test_br_separated_soup_classifies_per_line(spark):
    html = (
        '<div><a href="/1">one</a><br><a href="/2">two</a><br>'
        "This standalone line after the breaks is long prose enough "
        "to be kept on its own merits.</div>"
    )
    got = _extract(spark, html)
    assert got == (
        "This standalone line after the breaks is long prose enough "
        "to be kept on its own merits."
    )


def test_plan_is_jvm_only(spark):
    df = spark.createDataFrame([(PAGE,)], ["h"])
    out = df.select(main_content_extract("h").alias("t"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    assert "Python" not in plan and "BatchEval" not in plan


def test_context_pass_promotes_near_good_neighbors(spark):
    """r12: context=True promotes short link-clean blocks (headings,
    lead-ins) that sit NEXT to a good block; isolated shorts and
    link-dense shorts stay out, and promotion does not chain."""
    html = (
        "<h2>Chapter One</h2>"
        "<p>This long paragraph is unquestionably real content with "
        "plenty of prose to clear every base threshold.</p>"
        "<h3>Lost heading</h3>"
        '<div><a href="/x">nav</a></div>'
        "<h4>Stranded</h4>"
        '<div><a href="/y">more nav</a></div>'
    )
    base = _extract(spark, html)
    assert base.startswith("This long paragraph")
    assert "Chapter" not in base
    got = _extract(spark, html, context=True)
    # the heading BEFORE the article is promoted...
    assert got == (
        "Chapter One\n"
        "This long paragraph is unquestionably real content with "
        "plenty of prose to clear every base threshold.\n"
        "Lost heading"
    )
    # ...and 'Lost heading' (adjacent after) too, but 'Stranded'
    # (neighbors: two link-soup divs) is not — promotion doesn't
    # chain through promoted blocks
    assert "Stranded" not in got


def test_context_pass_respects_link_density_and_near_min(spark):
    html = (
        "<p>A base-good paragraph with enough running text to pass "
        "all of the standard thresholds comfortably.</p>"
        '<div>all <a href="/l">link</a> here</div>'
        "<h6>ok</h6>"
    )
    got = _extract(spark, html, context=True)
    # link-dense neighbor not promoted; 'ok' is below near_min_chars
    assert got == (
        "A base-good paragraph with enough running text to pass all "
        "of the standard thresholds comfortably."
    )
    # lowering near_min_chars promotes the 2-char heading... but 'ok'
    # neighbors the link div, NOT the good block -> still out
    got2 = _extract(spark, html, context=True, near_min_chars=2)
    assert "ok" not in got2


def test_context_pass_noop_on_all_chrome(spark):
    html = '<nav><a href="/">Home</a></nav><h5>Short</h5>'
    assert _extract(spark, html, context=True) == ""


def test_context_pass_empty_block_array(spark):
    """r13 (ADVICE): pages whose filtered block array is EMPTY —
    '<p></p>', '', whitespace — crashed context=True at runtime:
    sequence(1, size=0) is the descending [1, 0] and element_at then
    threw. Must return '' like the context=False path, not explode."""
    degenerate = ["<p></p>", "", "   \n\t  ", "<div><span></span></div>"]
    df = spark.createDataFrame([(h,) for h in degenerate], ["h"])
    rows = df.select(
        main_content_extract("h", context=True).alias("t")
    ).collect()
    assert [r["t"] for r in rows] == [""] * len(degenerate)
