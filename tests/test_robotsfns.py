"""robots.txt parse + URL governance (RFC 9309, r11,
functions/robotsfns.py): group semantics, agent selection,
wildcard/$-anchor matching, longest-match precedence, default allow."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.robotsfns import (
    effective_rules,
    parse_robots,
    robots_allowed,
)

ROBOTS_A = """# host A: specific group for graftbot, broad * group
User-agent: GraftBot
Disallow: /private
Allow: /private/pub
Disallow: /tmp$
Crawl-delay: 10

User-agent: *
Disallow: /
"""

ROBOTS_B = """User-agent: *
User-agent: otherbot
Disallow: /blocked*core
Allow:
Sitemap: https://b.example/sitemap.xml
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return parse_robots(df)


class TestParse:
    def test_rules_explode_with_group_semantics(self, spark):
        rows = {
            (r["host"], r["agent"], r["rule_type"], r["pattern"])
            for r in _rules(spark).collect()
        }
        assert ("a.example", "graftbot", "disallow", "/private") in rows
        assert ("a.example", "graftbot", "allow", "/private/pub") in rows
        assert ("a.example", "graftbot", "disallow", "/tmp$") in rows
        assert ("a.example", "*", "disallow", "/") in rows
        # stacked header: the rule binds to BOTH agents of the group
        assert ("b.example", "*", "disallow", "/blocked*core") in rows
        assert ("b.example", "otherbot", "disallow", "/blocked*core") in rows
        # crawl-delay/sitemap/empty-pattern lines mint no rules
        assert not any("sitemap" in r[2] for r in rows)
        assert not any(r[3] == "" for r in rows)

    def test_parse_is_jvm_only(self, spark):
        df = spark.range(1).select(
            F.lit("h").alias("host"),
            F.lit("User-agent: *\nDisallow: /x").alias("robots_txt"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            parse_robots(df).explain("formatted")
        plan = buf.getvalue()
        assert "Python" not in plan and "BatchEval" not in plan


class TestSelection:
    def test_specific_group_shadows_star(self, spark):
        eff = effective_rules(_rules(spark), "GraftBot")
        by_host = {}
        for r in eff.collect():
            by_host.setdefault(r["host"], set()).add(r["pattern"])
        # host A: only the graftbot group; the '*' Disallow: / ignored
        assert by_host["a.example"] == {"/private", "/private/pub", "/tmp$"}
        # host B: no graftbot group -> the '*' group applies
        assert by_host["b.example"] == {"/blocked*core"}

    def test_product_token_matching(self, spark):
        """r12 (ADVICE): RFC 9309 §2.2.1 matches the PRODUCT TOKEN —
        a group declared 'GraftBot/1.0' binds crawler 'GraftBot', and
        a versioned crawler name binds the bare-token group; neither
        silently falls back to '*'."""
        df = spark.createDataFrame(
            [
                (
                    "v.example",
                    "User-agent: GraftBot/1.0\nDisallow: /own\n\n"
                    "User-agent: *\nDisallow: /\n",
                ),
            ],
            "host string, robots_txt string",
        )
        rules = parse_robots(df)
        # versioned group, bare crawler token
        eff = effective_rules(rules, "GraftBot")
        pats = {r["pattern"] for r in eff.collect()}
        assert pats == {"/own"}
        # bare group (host A fixture), versioned crawler token
        eff2 = effective_rules(_rules(spark), "GraftBot/2.3")
        by_host = {}
        for r in eff2.collect():
            by_host.setdefault(r["host"], set()).add(r["pattern"])
        assert by_host["a.example"] == {"/private", "/private/pub", "/tmp$"}


class TestGovernance:
    def _allowed(self, spark, urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        out = robots_allowed(df, _rules(spark), "GraftBot")
        return {r["url"]: r["allowed"] for r in out.collect()}

    def test_longest_match_allow_wins(self, spark):
        got = self._allowed(
            spark,
            [
                "https://a.example/private/secret",
                "https://a.example/private/pub/page",
                "https://a.example/open/page",
            ],
        )
        assert got["https://a.example/private/secret"] is False
        # allow /private/pub is LONGER than disallow /private
        assert got["https://a.example/private/pub/page"] is True
        assert got["https://a.example/open/page"] is True

    def test_dollar_anchor(self, spark):
        got = self._allowed(
            spark,
            ["https://a.example/tmp", "https://a.example/tmpfile"],
        )
        assert got["https://a.example/tmp"] is False
        assert got["https://a.example/tmpfile"] is True

    def test_wildcard_and_unknown_host_default_allow(self, spark):
        got = self._allowed(
            spark,
            [
                "https://b.example/blocked/x/core",
                "https://b.example/blocked",
                "https://c.example/anything",
                "https://a.example/",
            ],
        )
        assert got["https://b.example/blocked/x/core"] is False
        assert got["https://b.example/blocked"] is True  # * needs 'core'
        assert got["https://c.example/anything"] is True  # no robots
        # bare path: a.example graftbot group doesn't block '/'
        assert got["https://a.example/"] is True

    def test_query_matches_and_like_metachars_escaped(self, spark):
        rules = parse_robots(
            spark.createDataFrame(
                [("q.example",
                  "User-agent: *\nDisallow: /s?mode=raw\n"
                  "Disallow: /lit%x\nDisallow: /under_y$")],
                "host string, robots_txt string",
            )
        )
        df = spark.createDataFrame(
            [("https://q.example/s?mode=raw&z=1",),
             ("https://q.example/sXmode=raw",),
             ("https://q.example/lit%xx",),
             ("https://q.example/litAx",),
             ("https://q.example/under_y",),
             ("https://q.example/underXy",)],
            "url string",
        )
        got = {r["url"]: r["allowed"]
               for r in robots_allowed(df, rules, "bot").collect()}
        assert got["https://q.example/s?mode=raw&z=1"] is False
        assert got["https://q.example/sXmode=raw"] is True  # ? is literal
        assert got["https://q.example/lit%xx"] is False
        assert got["https://q.example/litAx"] is True  # % escaped
        assert got["https://q.example/under_y"] is False
        assert got["https://q.example/underXy"] is True  # _ escaped


class TestSitemaps:
    def test_urlset_and_index(self, spark):
        from sqlbackuphistoryetl_spark.functions.robotsfns import (
            sitemap_urls,
        )

        urlset = (
            '<?xml version="1.0"?><urlset>'
            "<url><loc> https://a.example/p?x=1&amp;y=2 </loc>"
            "<lastmod>2025-01-03</lastmod><priority>0.8</priority></url>"
            "<url><loc>https://a.example/q</loc></url>"
            "<url><lastmod>2025-01-01</lastmod></url>"  # loc-less: dropped
            "</urlset>"
        )
        index = (
            "<sitemapindex><sitemap>"
            "<loc>https://b.example/sitemap-1.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        df = spark.createDataFrame(
            [("a.example", urlset), ("b.example", index)],
            "host string, sitemap_xml string",
        )
        rows = sitemap_urls(df).collect()
        by_loc = {r["loc"]: r for r in rows}
        assert len(rows) == 3
        # XML entity decoded, whitespace trimmed
        e = by_loc["https://a.example/p?x=1&y=2"]
        assert e["lastmod"] == "2025-01-03" and e["priority"] == 0.8
        assert e["is_index"] is False
        assert by_loc["https://a.example/q"]["lastmod"] is None
        assert by_loc["https://b.example/sitemap-1.xml"]["is_index"] is True

    def test_index_expand_two_waves(self, spark):
        """r13: index → child sitemaps → leaf URLs, one join."""
        from sqlbackuphistoryetl_spark.functions.robotsfns import (
            sitemap_index_expand,
        )

        index = (
            "<sitemapindex>"
            "<sitemap><loc>https://b.example/sm-1.xml</loc></sitemap>"
            "<sitemap><loc>https://b.example/sm-2.xml</loc></sitemap>"
            "<sitemap><loc>https://b.example/sm-404.xml</loc></sitemap>"
            "</sitemapindex>"
        )
        urlset = (
            "<urlset><url><loc>https://a.example/top</loc>"
            "<priority>0.9</priority></url></urlset>"
        )
        sitemaps = spark.createDataFrame(
            [("a.example", urlset), ("b.example", index)],
            "host string, sitemap_xml string",
        )
        fetched = spark.createDataFrame(
            [
                (
                    "https://b.example/sm-1.xml",
                    "<urlset><url><loc>https://b.example/p1&amp;x</loc>"
                    "<priority>0.5</priority></url>"
                    "<url><loc>https://b.example/p2</loc></url></urlset>",
                ),
                (
                    "https://b.example/sm-2.xml",
                    # spec violation: a nested index — surfaces flagged
                    "<sitemapindex><sitemap>"
                    "<loc>https://b.example/sm-deep.xml</loc>"
                    "</sitemap></sitemapindex>",
                ),
            ],
            "url string, sitemap_xml string",
        )
        rows = sitemap_index_expand(sitemaps, fetched).collect()
        by_loc = {r["loc"]: r for r in rows}
        assert len(rows) == 4
        top = by_loc["https://a.example/top"]
        assert top["level"] == 1 and not top["is_index"]
        p1 = by_loc["https://b.example/p1&x"]
        assert p1["level"] == 2 and p1["priority"] == 0.5
        assert by_loc["https://b.example/p2"]["host"] == "b.example"
        deep = by_loc["https://b.example/sm-deep.xml"]
        assert deep["level"] == 2 and deep["is_index"]
        # sm-404.xml was never fetched: contributes nothing, no error


def test_crawl_delay_effective_group(spark):
    from sqlbackuphistoryetl_spark.functions.robotsfns import (
        robots_crawl_delay,
    )

    df = spark.createDataFrame(
        [("a.example", ROBOTS_A),           # graftbot group: delay 10
         ("b.example", ROBOTS_B),           # no delay anywhere
         ("c.example",
          "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 5\n"
          "User-agent: graftbot\nDisallow: /x\n")],  # own group, no delay
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay"]
           for r in robots_crawl_delay(df, "GraftBot").collect()}
    assert got == {"a.example": 10.0}
    # a generic crawler obeys c.example's * group (max of the two)
    got2 = {r["host"]: r["crawl_delay"]
            for r in robots_crawl_delay(df, "otherbot").collect()}
    assert got2["c.example"] == 5.0
