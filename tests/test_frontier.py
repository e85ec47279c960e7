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


def test_fetch_waves_respect_crawl_delay(spark):
    """r12: schedule_fetch_waves composes robots_crawl_delay into the
    frontier batch — (rank-1) x effective delay per host, default
    where no delay is declared, one broadcast join, no new window."""
    from sqlbackuphistoryetl_spark.extensions.frontier import (
        schedule_fetch_waves,
    )

    robots = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: bot\nCrawl-delay: 10\nDisallow: /x\n\n"
             "User-agent: *\nCrawl-delay: 99\n"),
            ("b.example", "User-agent: *\nDisallow: /y\n"),  # no delay
        ],
        "host string, robots_txt string",
    )
    discovered = spark.createDataFrame(
        [("https://a.example/p1", 9), ("https://a.example/p2", 5),
         ("https://a.example/p3", 3), ("https://b.example/q1", 1),
         ("https://b.example/q2", 0)],
        "url string, priority long",
    )
    seen = spark.createDataFrame([], "url string")
    batch = crawl_frontier(
        discovered, seen, parse_robots(robots), "bot",
        per_domain_cap=5, priority_col="priority",
    )
    out = schedule_fetch_waves(batch, robots, "bot", default_delay=2.0)
    rows = {r["url"]: r for r in out.collect()}
    # a.example: bot group's delay (10), not the * group's 99
    assert rows["https://a.example/p1"]["crawl_delay"] == 10.0
    assert rows["https://a.example/p1"]["fetch_offset_s"] == 0.0
    assert rows["https://a.example/p2"]["fetch_offset_s"] == 10.0
    assert rows["https://a.example/p3"]["fetch_offset_s"] == 20.0
    # b.example declares none: the default applies
    assert rows["https://b.example/q1"]["crawl_delay"] == 2.0
    assert rows["https://b.example/q2"]["fetch_offset_s"] == 2.0
    assert rows["https://a.example/p1"]["host"] == "a.example"
    # frontier columns survive untouched
    assert rows["https://a.example/p1"]["rank"] == 1


def test_fetch_waves_plan_broadcasts_delays(spark):
    """The delay join must be a broadcast hash join on the host key —
    no extra exchange beyond the frontier's own."""
    import contextlib
    import io

    from sqlbackuphistoryetl_spark.extensions.frontier import (
        schedule_fetch_waves,
    )

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nCrawl-delay: 3\n")],
        "host string, robots_txt string",
    )
    discovered = spark.createDataFrame(
        [(f"https://a.example/p{i}", i) for i in range(4)],
        "url string, priority long",
    )
    seen = spark.createDataFrame([], "url string")
    batch = crawl_frontier(
        discovered, seen, parse_robots(robots), "bot",
        per_domain_cap=9, priority_col="priority",
    )
    out = schedule_fetch_waves(batch, robots, "bot")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    # exactly one window (the frontier's own per-domain rank)
    assert plan.count("Window") >= 1
    # no Python execution nodes (the scan labels mention Python RDDs
    # for createDataFrame inputs; those aren't exec-time Python)
    assert "BatchEval" not in plan and "ArrowEval" not in plan
    assert "InPandas" not in plan
