"""robots.txt parsing and URL crawl-governance (RFC 9309, r11).

A crawl pipeline's FIRST filter isn't quality — it's permission:
every fetched URL is subject to its host's robots.txt, and a curation
pass that re-crawls or re-distributes disallowed paths is a policy
bug. This module makes the Robots Exclusion Protocol a relational
operation: parse each host's robots.txt ONCE into a rules relation,
then govern any number of URLs with one join — no per-URL Python,
no network, O(rules) broadcast state against 100 TB of URLs.

Everything is JVM Column expressions:

- :func:`parse_robots` — robots.txt text → one row per (host, agent,
  rule_type, pattern). Group semantics per RFC 9309 §2.2: consecutive
  ``User-agent`` lines form a group header; ``Allow``/``Disallow``
  lines bind to EVERY agent of the current header; a later
  ``User-agent`` after rules starts a new group. Comments (#…) strip,
  unknown directives (Sitemap, Crawl-delay) and empty patterns are
  ignored, keys are case-insensitive. The stateful line walk is one
  ``F.aggregate`` fold over the split lines — the BPE merge-fold
  pattern (extensions/bpe.py:_apply_merge), not a UDF.
- :func:`effective_rules` — RFC group selection: a crawler obeys the
  MOST SPECIFIC matching group only — if a host has rules for the
  crawler's own product token, the ``*`` group is ignored entirely
  for that host.
- :func:`robots_allowed` — the governance join: URL path+query
  against the host's effective rules, ``*`` wildcards and the ``$``
  end anchor translated to one JVM ``LIKE`` per rule, longest-match
  (octet length of the pattern) precedence with allow winning ties
  (RFC 9309 §2.2.2), hosts without rules default-allow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .exprcache import column_memo
from .urlfns import url_host

_RULE_STRUCT = (
    "array(named_struct('agent', '', 'rtype', '', 'pattern', ''))"
)


@column_memo
def _rules_column(text_col: str, dir_list: tuple[str, ...]) -> Column:
    """The :func:`parse_robots` line-walk fold as a pure Column of
    ``text_col`` — ~600 py4j round-trips per construction and rebuilt
    by EVERY frontier/governance consumer (twice per composite: once
    for rules, once inside robots_crawl_delay), so it is memoized
    process-wide like the crawl-text builders (r13; exprcache doc)."""
    lines = F.split(F.col(text_col), "\n")

    def step(acc, raw):
        line = F.regexp_replace(raw, "#.*$", "")
        key = F.lower(F.trim(F.regexp_extract(line, r"^([^:]*):", 1)))
        val = F.trim(F.regexp_extract(line, r"^[^:]*:(.*)$", 1))
        is_ua = (key == "user-agent") & (val != "")
        is_rule = key.isin(*dir_list) & (val != "")
        new_agents = F.when(
            is_ua & acc["fresh"],
            F.array_append(acc["agents"], F.lower(val)),
        ).when(is_ua, F.array(F.lower(val))).otherwise(acc["agents"])
        new_fresh = F.when(is_ua, F.lit(True)).when(
            is_rule, F.lit(False)
        ).otherwise(acc["fresh"])
        minted = F.transform(
            acc["agents"],
            lambda a: F.struct(
                a.alias("agent"),
                key.alias("rtype"),
                val.alias("pattern"),
            ),
        )
        new_rules = F.when(
            is_rule, F.concat(acc["rules"], minted)
        ).otherwise(acc["rules"])
        return F.struct(
            new_agents.alias("agents"),
            new_fresh.alias("fresh"),
            new_rules.alias("rules"),
        )

    init = F.struct(
        F.expr("cast(array() as array<string>)").alias("agents"),
        F.lit(False).alias("fresh"),
        F.expr(f"slice({_RULE_STRUCT}, 1, 0)").alias("rules"),
    )
    return F.aggregate(lines, init, step)["rules"]


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    directives: tuple[str, ...] = ("allow", "disallow"),
) -> DataFrame:
    """(host, agent, rule_type, pattern) — one row per rule.

    ``agent`` is lowercased (product tokens match case-insensitively),
    ``rule_type`` is the (lowercased) directive name, ``pattern`` is
    the verbatim value (a path pattern for allow/disallow; pass a
    wider ``directives`` tuple to also mint e.g. ``crawl-delay`` rows
    — :func:`robots_crawl_delay` does). The whole parse is one fold
    over ``split(text, '\\n')`` carrying (current header agents,
    in-header flag, emitted rules)."""
    dir_list = tuple(d.lower() for d in directives)
    folded = robots.select(
        F.col(host_col).alias("host"),
        _rules_column(text_col, dir_list).alias("rules"),
    )
    # explode_outer + isNotNull ≡ explode (rule structs are never
    # null; rule-less hosts died in explode before, die at the filter
    # now) — plain explode's InferFiltersFromGenerate filter would
    # re-evaluate the whole line-fold aggregate a second time below
    # the scan (r13; see dedup.py posting note). The unpack rides
    # selectExpr/SQL-string filters — one parse each instead of
    # per-field Column chains (r14, guide §7.3).
    return (
        folded.select("host", F.explode_outer("rules").alias("r"))
        .filter("r IS NOT NULL")
        .selectExpr(
            "host",
            "r.agent AS agent",
            "r.rtype AS rule_type",
            "r.pattern AS pattern",
        )
    )


def effective_rules(rules: DataFrame, agent: str) -> DataFrame:
    """The rules a crawler named ``agent`` actually obeys, per host:
    the host's group for the agent's own (lowercased) product token if
    one exists, else its ``*`` group — never both (RFC 9309 §2.2.1:
    most specific group only). Matching is on the PRODUCT TOKEN: a
    group declared ``User-agent: GraftBot/1.0`` matches crawler
    ``GraftBot`` — both sides are compared on their first token with
    any ``/version`` suffix stripped, case-insensitively (§2.2.1
    matches the product token itself, not the whole line value)."""
    return _effective_group(rules, agent).select(
        "host", "rule_type", "pattern"
    )


def _effective_group(rules: DataFrame, agent: str) -> DataFrame:
    """Most-specific-group selection shared by :func:`effective_rules`
    and :func:`robots_crawl_delay` (see the former's docstring for the
    product-token matching rule). SQL-string predicates — one parse
    each (r14, guide §7.3); ``own_sql`` transliterates the exact
    regexp_extract/EqualTo tree the Column build produced."""
    a = agent.lower().split("/", 1)[0].strip().replace("'", "''")
    own_sql = r"regexp_extract(agent, '^\\s*([^/\\s]+)', 1) = " + f"'{a}'"
    mine = rules.filter(f"({own_sql}) OR agent = '*'")
    has_own = mine.groupBy("host").agg(
        F.expr(f"max(CAST(({own_sql}) AS INT))").alias("has_own")
    )
    return mine.join(has_own, "host").filter(
        f"(has_own = 1 AND ({own_sql})) OR (has_own = 0 AND agent = '*')"
    )


@column_memo
def _like_pattern(pattern_col: str) -> Column:
    """RFC pattern → SQL LIKE pattern: escape LIKE metachars, ``*`` →
    ``%``, a trailing ``$`` anchors (no trailing ``%``). Takes the
    column NAME, not a Column: the memo key is then a scalar, so a
    plan-bound column from one DataFrame can never be replayed into
    another plan (r13 advice — ``toString()`` drops dataset binding,
    making Column-keyed memoization of possibly-bound inputs unsound)."""
    pattern = F.col(pattern_col)
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.replace(body, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    esc = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, esc).otherwise(F.concat(esc, F.lit("%")))


@column_memo
def _path_column(url_col: str) -> Column:
    """URL → path+query (``/`` when absent) — the governance join's
    probe key, pure in the column name (memoized like the fold)."""
    return F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"^[a-zA-Z]+://[^/]+(/[^#]*)", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )


@column_memo
def _best_rule_column() -> Column:
    """The §2.2.2 precedence aggregate: max (pattern octet length,
    allow-beats-disallow) struct over matching rules."""
    return F.max(
        F.when(
            F.col("rule_type").isNotNull(),
            F.struct(
                F.length("pattern").alias("l"),
                (F.col("rule_type") == "allow").alias("a"),
            ),
        )
    ).alias("best")


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """``urls`` with an ``allowed`` boolean per RFC 9309 §2.2.2:
    among the host's effective rules whose pattern matches the URL's
    path+query, the LONGEST pattern (octet length) wins; at equal
    length allow beats disallow; no matching rule — or no robots.txt
    for the host — is allow. One left join URL→rules (AQE broadcasts
    the rules side while it fits — rules relations are small by
    nature) + one URL-keyed aggregate."""
    eff = effective_rules(rules, agent).withColumn(
        "like_pat", _like_pattern("pattern")
    )
    u = urls.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__path", _path_column(url_col)
    )
    joined = u.join(
        eff, (u["__host"] == eff["host"])
        & F.expr("__path like like_pat escape '\\\\'"),
        "left",
    )
    verdict = joined.groupBy(url_col).agg(_best_rule_column())
    out = verdict.select(
        url_col,
        F.coalesce(F.col("best")["a"], F.lit(True)).alias("allowed"),
    )
    return urls.join(out, url_col)


def robots_crawl_delay(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay) — the effective group's Crawl-delay in
    seconds, one row per host that declares one. Group selection is
    the same most-specific rule as :func:`effective_rules`; multiple
    declarations keep the MAX (the polite reading). Feed this into a
    fetch scheduler next to :func:`~...extensions.frontier.crawl_frontier`'s
    per-domain cap — the cap bounds batch SIZE, the delay bounds
    RATE."""
    rules = parse_robots(
        robots, host_col, text_col,
        directives=("allow", "disallow", "crawl-delay"),
    )
    eff = _effective_group(rules, agent)
    return (
        eff.filter(F.col("rule_type") == "crawl-delay")
        .withColumn("delay", F.col("pattern").cast("double"))
        .filter(F.col("delay").isNotNull())
        .groupBy("host")
        .agg(F.max("delay").alias("crawl_delay"))
    )


# ------------------------------------------------------------- sitemaps

#: XML predefined entities, decode order (amp last — the htmlfns rule)
_XML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&amp;", "&"),
)


def _xml_unescape(col: Column) -> Column:
    for ent, rep in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


@column_memo
def _entry_blocks_column(text_col: str) -> Column:
    """All ``<url>``/``<sitemap>`` entry blocks of one sitemap document
    (pure in the column name; memoized — rebuilt by both discovery
    composites and twice per index expansion)."""
    return F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"(?s)<(?:url|sitemap)>.*?</(?:url|sitemap)>"),
        F.lit(0),
    )


@column_memo
def _entry_loc_column() -> Column:
    """XML-unescaped ``<loc>`` of one exploded entry block ``e``."""
    return _xml_unescape(
        F.regexp_extract("e", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    )


def sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    text_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap XML → (host, loc, lastmod, priority, is_index) — one
    row per ``<url>`` entry (or per child ``<sitemap>`` of an index
    file, flagged so callers recurse the fetch). URL discovery is the
    robots.txt counterpart: robots says where a crawler MAY go,
    sitemaps say where the site WANTS it to go. Pure JVM: one
    ``regexp_extract_all`` per entry block, per-field extracts inside,
    XML predefined entities decoded (sitemap locs are XML-escaped —
    ``&amp;`` in query strings is the rule, not the exception)."""
    # explode_outer: a no-entry sitemap's null row dies at the
    # loc != '' filter below, so output is identical — and no
    # InferFiltersFromGenerate filter re-running the entry-block
    # regexp below the scan (r13; see dedup.py posting note).
    ex = sitemaps.select(
        F.col(host_col).alias("host"),
        (F.instr(F.col(text_col), "<sitemapindex") > 0).alias("is_index"),
        F.explode_outer(_entry_blocks_column(text_col)).alias("e"),
    )
    # one parsed expr per field (r14, guide §7.3): nullif/regexp_extract
    # /CAST transliterate the exact Column trees these replaced
    return ex.select(
        "host",
        _entry_loc_column().alias("loc"),
        F.expr(
            r"nullif(regexp_extract(e, '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1), '')"
        ).alias("lastmod"),
        F.expr(
            r"CAST(nullif(regexp_extract(e, '(?s)<priority>\\s*(.*?)\\s*</priority>', 1), '') AS DOUBLE)"
        ).alias("priority"),
        "is_index",
    ).filter("loc != ''")


def sitemap_index_expand(
    sitemaps: DataFrame,
    fetched: DataFrame,
    host_col: str = "host",
    text_col: str = "sitemap_xml",
    url_col: str = "url",
) -> DataFrame:
    """Two-wave sitemap discovery (r13): parse ``sitemaps``; entries
    of ``<sitemapindex>`` files are CHILD SITEMAP URLs, which join
    against ``fetched`` — the ``(url, sitemap_xml)`` relation holding
    the second discovery wave's fetched bodies — and parse again.
    Returns the union of leaf ``<url>`` entries from both levels with
    a ``level`` column (1 = direct urlset, 2 = via an index). Real
    sitemaps are nearly always index-nested at large sites; the
    protocol caps nesting at one index level, so two waves are
    spec-complete — a child that is ITSELF an index (spec violation)
    surfaces as a ``level`` 2 row with ``is_index`` true rather than
    being silently dropped. A child URL absent from ``fetched``
    (unfetched / fetch failed) contributes nothing, exactly like a
    404'd sitemap.

    Scale shape: both parses are the same pure-JVM explode as
    :func:`sitemap_urls`; the only join is child-locs ⨝ fetched on
    the sitemap URL — sitemap relations are robots-sized next to the
    corpus, so AQE broadcasts it; no window, no extra shuffle."""
    lvl1 = sitemap_urls(sitemaps, host_col, text_col)
    leaf1 = lvl1.filter(~F.col("is_index")).withColumn("level", F.lit(1))
    children = lvl1.filter(F.col("is_index")).select(
        "host", F.col("loc").alias("__child_url")
    )
    bodies = children.join(
        fetched.select(
            F.col(url_col).alias("__child_url"),
            F.col(text_col).alias("__child_xml"),
        ),
        "__child_url",
    )
    lvl2 = sitemap_urls(
        bodies.select("host", F.col("__child_xml").alias("sitemap_xml")),
        "host",
        "sitemap_xml",
    ).withColumn("level", F.lit(2))
    return leaf1.unionByName(lvl2)
