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

from ..functions.robotsfns import robots_allowed
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
