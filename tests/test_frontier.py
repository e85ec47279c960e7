"""Crawl-frontier composite (r11, extensions/frontier.py): canonical
dedup, seen anti-join, robots governance, per-domain politeness cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.frontier import crawl_frontier
from sqlbackuphistoryetl_spark.functions.robotsfns import parse_robots


def _rules(spark):
    return parse_robots(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /private\n")],
            "host string, robots_txt string",
        )
    )


def test_frontier_end_to_end(spark):
    discovered = spark.createDataFrame(
        [
            # two crawl variants of ONE page; max priority wins
            ("HTTPS://A.EXAMPLE:443/p1?utm_source=x&a=1#f", 5),
            ("https://a.example/p1?a=1", 9),
            ("https://a.example/p2", 7),          # already seen
            ("https://a.example/private/x", 99),  # robots-blocked
            ("https://a.example/p3", 3),
            ("https://a.example/p4", 2),
            ("https://b.example/q1", 1),          # no robots: allowed
        ],
        "url string, priority long",
    )
    seen = spark.createDataFrame(
        [("https://a.example/p2",)], "url string"
    )
    out = crawl_frontier(
        discovered, seen, _rules(spark), "bot", per_domain_cap=2,
        priority_col="priority",
    )
    rows = {r["url"]: r for r in out.collect()}
    # dedup kept one canonical row with MAX priority
    assert rows["https://a.example/p1?a=1"]["priority"] == 9
    assert rows["https://a.example/p1?a=1"]["rank"] == 1
    # cap=2 per domain: p3 (prio 3) makes the cut, p4 (prio 2) doesn't
    assert "https://a.example/p3" in rows
    assert "https://a.example/p4" not in rows
    # seen and robots-blocked never surface
    assert "https://a.example/p2" not in rows
    assert all("private" not in u for u in rows)
    assert rows["https://b.example/q1"]["domain"] == "b.example"
    assert rows["https://b.example/q1"]["rank"] == 1


def test_rank_tiebreak_is_url_order(spark):
    discovered = spark.createDataFrame(
        [("https://c.example/b", 1), ("https://c.example/a", 1),
         ("https://c.example/c", 1)],
        "url string, priority long",
    )
    seen = spark.createDataFrame([], "url string")
    out = crawl_frontier(
        discovered, seen, _rules(spark), "bot", per_domain_cap=2,
        priority_col="priority",
    ).collect()
    got = sorted((r["rank"], r["url"]) for r in out)
    assert got == [(1, "https://c.example/a"), (2, "https://c.example/b")]


def test_default_priority_and_cap_validation(spark):
    discovered = spark.createDataFrame(
        [("https://d.example/x",)], "url string"
    )
    seen = spark.createDataFrame([], "url string")
    out = crawl_frontier(
        discovered, seen, _rules(spark), "bot", per_domain_cap=1
    ).collect()
    assert out[0]["priority"] == 0 and out[0]["rank"] == 1
    with pytest.raises(ValueError):
        crawl_frontier(discovered, seen, _rules(spark), "bot", 0)


def test_frontier_plan_shape(spark):
    """Governance joins must ride the host equi-key (hash joins with
    the LIKE as a join filter) — never a nested loop / cartesian —
    and the whole frontier stays JVM-side."""
    import contextlib
    import io

    # hosts must be DERIVED, not literal: a single constant host
    # folds the equality into filters on both sides, leaving no join
    # key and a (legitimate) nested loop — real rules relations have
    # many hosts and must keep the hash join
    host = F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example"))
    rules = parse_robots(
        spark.range(4).select(
            host.alias("host"),
            F.lit("User-agent: *\nDisallow: /private\n").alias("robots_txt"),
        )
    )
    discovered = spark.range(100).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 4).cast("string"),
            F.lit(".example/p"), F.col("id"),
        ).alias("url"),
        (F.col("id") % 5).alias("priority"),
    )
    seen = spark.range(10).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 4).cast("string"),
            F.lit(".example/p"), F.col("id"),
        ).alias("url")
    )
    out = crawl_frontier(
        discovered, seen, rules, "bot", per_domain_cap=3,
        priority_col="priority",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
