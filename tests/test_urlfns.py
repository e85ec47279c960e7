"""URL normalization + registered-domain extraction (r9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.urlfns import (
    normalize_url,
    registered_domain,
    url_host,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    return [r["n"] for r in df.select(normalize_url("u").alias("n")).collect()]


def test_normalize_variants_collapse(spark):
    variants = [
        "HTTPS://WWW.Example.COM:443/a/b?utm_source=feed&b=2&a=1#frag",
        "https://www.example.com/a/b?a=1&b=2",
        "https://www.example.com:443/a/b?b=2&a=1&fbclid=XYZ",
    ]
    out = _norm(spark, variants)
    assert out == ["https://www.example.com/a/b?a=1&b=2"] * 3


def test_normalize_edges(spark):
    cases = {
        # empty path -> '/', http default port dropped, non-default kept
        "HTTP://Host.com:80": "http://host.com/",
        "http://host.com:8080/x": "http://host.com:8080/x",
        # all params tracking -> no '?'
        "https://h.io/p?utm_medium=a&gclid=1": "https://h.io/p",
        # empty query/trailing '?' -> dropped
        "https://h.io/p?": "https://h.io/p",
        # path case is PRESERVED (paths are case-sensitive)
        "https://h.io/CaseSensitive": "https://h.io/CaseSensitive",
        # no scheme: left alone (relative refs are out of scope)
        "not a url": "not a url",
        "  https://h.io/x  ": "https://h.io/x",
    }
    out = _norm(spark, list(cases))
    assert out == list(cases.values())


def test_url_host_and_registered_domain(spark):
    rows = [
        ("https://a.b.Example.co.uk/x", "a.b.example.co.uk", "example.co.uk"),
        ("http://WWW.example.com/", "www.example.com", "example.com"),
        ("https://example.com.au/", "example.com.au", "example.com.au"),
        ("https://deep.sub.site.org/p", "deep.sub.site.org", "site.org"),
        ("https://localhost/x", "localhost", "localhost"),
        ("plain-text", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], ["u"])
    out = df.select(
        url_host("u").alias("h"),
        registered_domain(url_host("u")).alias("d"),
    ).collect()
    for (u, want_h, want_d), r in zip(rows, out):
        assert r["h"] == want_h, u
        assert r["d"] == want_d, u


def test_normalize_is_codegen_only(spark):
    import contextlib
    import io

    df = spark.createDataFrame([("https://x.io/",)], ["u"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(normalize_url("u")).explain("formatted")
    plan = buf.getvalue()
    # one map-side Project, pure JVM: no Python eval, no shuffle (the
    # higher-order array lambdas keep it out of whole-stage codegen,
    # but it's still a single JVM projection)
    assert "BatchEvalPython" not in plan and "Exchange" not in plan
    assert "Project" in plan
