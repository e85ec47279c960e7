"""URL normalization and registered-domain extraction (r9).

Web-curation pipelines (C4, RefinedWeb, FineWeb) dedup and filter by
URL before anything touches document text: the same page is crawled
under tracking-parameter, case, default-port and fragment variants,
and quality/spam policy applies per REGISTERED DOMAIN (eTLD+1), not
per host. Both operations here are pure Column expressions — built-in
``pyspark.sql.functions`` only — one map-side JVM projection: no UDF,
no Python, no shuffle (the higher-order array lambdas sit outside
whole-stage codegen but remain JVM-evaluated), so they cost one
projection at 100 TB.

- :func:`normalize_url` — canonical form: lowercase scheme+host,
  fragment stripped, default ports dropped (http:80 / https:443),
  tracking parameters removed (utm_*, fbclid, gclid, msclkid, ref),
  remaining query keys SORTED, empty path normalized to ``/``.
  Deterministic: two crawl variants of one page collapse to equal
  strings, making URL dedup an exact ``groupBy``.
- :func:`registered_domain` — eTLD+1 via an embedded table of the
  high-traffic two-level public suffixes (co.uk, com.au, ...). A full
  public-suffix list is a data file, not an algorithm; the embedded
  subset is the documented 80/20 heuristic, and the parameter lets a
  deployment pass the complete list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.exprcache import column_memo

#: query parameters that identify a crawl/campaign, not a resource
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "fbclid", "gclid", "msclkid", "ref",
)

#: high-traffic two-level public suffixes (the 80/20 subset; pass the
#: full PSL to registered_domain for exactness)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.kr", "or.kr", "go.kr",
    "co.za", "org.za", "gov.za",
    "com.tr", "org.tr", "gov.tr",
    "com.ar", "com.sg", "com.hk", "com.tw", "co.nz",
)


@column_memo
def normalize_url(url: Column | str) -> Column:
    """Canonical URL form as a single codegen expression chain.

    scheme://host[:port]/path[?query][#fragment] →
    lowercase scheme+host, no fragment, no default port, tracking
    params dropped, query keys sorted, '' path → '/'. URLs without a
    '://' come back trimmed-but-otherwise-untouched (relative refs
    are not this function's business)."""
    u = F.trim(url) if isinstance(url, str) else F.trim(url)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment never reaches a server

    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))

    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(
                *TRACKING_PARAMS
            ),
        )
    )
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    return F.when(
        scheme == "", u  # no scheme: not an absolute URL, leave it be
    ).otherwise(F.concat(scheme, F.lit("://"), host, port, path, query))


@column_memo
def url_host(url: Column | str) -> Column:
    """Lowercase host of an absolute URL ('' when there is no scheme)."""
    u = F.trim(url) if isinstance(url, str) else F.trim(url)
    return F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)
    )


@column_memo
def registered_domain(
    host: Column | str,
    two_level_suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES,
) -> Column:
    """eTLD+1: ``a.b.example.co.uk`` → ``example.co.uk``,
    ``www.example.com`` → ``example.com``. Hosts with fewer labels
    than suffix+1 (bare TLDs, localhost, IPs are out of scope) pass
    through unchanged."""
    h = F.lower(host) if isinstance(host, str) else F.lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    return (
        F.when(n <= 2, h)
        .when(last2.isin(*two_level_suffixes) & (n >= 3), last3)
        .otherwise(last2)
    )
