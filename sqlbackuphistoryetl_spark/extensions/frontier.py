"""Crawl-frontier batch selection (r11) — the discovery-side composite
tying the r11 crawl stack together.

A crawler's steady-state loop is: links discovered on fetched pages →
which of them do we fetch NEXT? At 100 TB that selection is itself a
data-pipeline stage with four relational legs, all built from this
repo's existing primitives:

1. canonicalize (``functions/urlfns.normalize_url``) — crawl variants
   of one page collapse to one exact string, so dedup is a groupBy;
2. novelty — an anti-join against the seen-URLs table (the
   watermark-dedup shape of ``operators/merge.idempotent_append``);
3. permission (``functions/robotsfns.robots_allowed``) — RFC 9309
   governance, rules side broadcast-sized;
4. politeness — a per-registered-domain cap
   (``functions/urlfns.registered_domain``), highest-priority-first
   with a deterministic URL tiebreak: ONE window over the domain key,
   which is also the only shuffle the whole frontier adds beyond the
   robots join.

Everything is JVM expressions + joins; no Python, no driver loops —
the frontier for a billion discovered links is one Spark job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.robotsfns import robots_allowed, robots_crawl_delay
from ..functions.urlfns import normalize_url, registered_domain, url_host


def crawl_frontier(
    discovered: DataFrame,
    seen: DataFrame,
    rules: DataFrame,
    agent: str,
    per_domain_cap: int,
    url_col: str = "url",
    priority_col: str | None = None,
) -> DataFrame:
    """(url, domain, priority, rank) — the next crawl batch.

    ``discovered`` rows are raw (possibly duplicate, possibly dirty)
    URLs with an optional numeric priority (defaults to 0); ``seen``
    holds ALREADY-CANONICAL urls in ``url_col`` (store what
    :func:`normalize_url` emits — canonicalizing at write time is
    what makes novelty an exact anti-join); ``rules`` is
    ``parse_robots`` output. Duplicate discoveries keep their MAX
    priority. ``rank`` is 1-based per registered domain, ordered by
    (priority desc, url asc) — deterministic across partitionings —
    and capped at ``per_domain_cap`` (politeness: a burst of links
    into one site must not monopolize the fetch fleet).
    """
    if per_domain_cap < 1:
        raise ValueError("per_domain_cap must be >= 1")
    pri = (
        F.col(priority_col) if priority_col is not None else F.lit(0)
    ).cast("long")
    canon = discovered.select(
        normalize_url(F.col(url_col)).alias("url"), pri.alias("priority")
    )
    fresh = (
        canon.groupBy("url")
        .agg(F.max("priority").alias("priority"))
        .join(seen.select(F.col(url_col).alias("url")), "url", "left_anti")
    )
    allowed = robots_allowed(fresh, rules, agent).filter(
        F.col("allowed")
    ).drop("allowed")
    ranked = allowed.withColumn(
        "domain", registered_domain(url_host(F.col("url")))
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("domain").orderBy(
                F.col("priority").desc(), F.col("url")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= int(per_domain_cap)).select(
        "url", "domain", "priority", "rank"
    )


def schedule_fetch_waves(
    batch: DataFrame,
    robots: DataFrame,
    agent: str,
    default_delay: float = 1.0,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """RATE politeness on top of :func:`crawl_frontier`'s SIZE cap
    (r12): each selected URL gets a fetch wave offset from its host's
    effective Crawl-delay — ``fetch_offset_s = (rank − 1) × delay``,
    so a fetcher that dispatches each URL at ``batch_start +
    fetch_offset_s`` never hits one host faster than its declared
    delay (``default_delay`` where the host declares none).

    ``batch`` is :func:`crawl_frontier` output; ``robots`` is the raw
    ``(host, robots_txt)`` table — the delay parse is
    :func:`~..functions.robotsfns.robots_crawl_delay` (same
    effective-group selection as governance). The frontier's existing
    per-DOMAIN rank drives the arithmetic, so this adds NO new window
    or shuffle — just one broadcast join against the host-keyed delay
    table (delay relations are robots-sized, small by nature). A
    multi-host domain spaces each host's fetches at least ``delay``
    apart (rank gaps only stretch the spacing — conservative, never
    impolite).

    Adds ``(host, crawl_delay, fetch_offset_s)``; the offset is one
    exact integer-times-double multiply, engine-reproducible.
    """
    delays = robots_crawl_delay(robots, agent, host_col, text_col)
    b = batch.withColumn("host", url_host(F.col("url")))
    joined = b.join(F.broadcast(delays), "host", "left")
    delay = F.coalesce(
        F.col("crawl_delay"), F.lit(float(default_delay))
    )
    return joined.select(
        *batch.columns,
        "host",
        delay.alias("crawl_delay"),
        ((F.col("rank") - 1).cast("double") * delay).alias(
            "fetch_offset_s"
        ),
    )
