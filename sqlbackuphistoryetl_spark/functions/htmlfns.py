"""HTML → text extraction as a pure JVM expression chain (r9).

The first transform a web-crawl pipeline applies: strip markup, keep
prose. Complements ``curation.remove_boilerplate_lines`` (which
dedups repeated LINES across pages — nav bars, cookie banners — after
extraction): this is the extraction itself. Everything is built-in
``regexp_replace``/``replace`` Columns — no UDF, no Python, one
map-side projection, so it runs at scan speed over 100 TB of raw
HTML.

Pipeline (order is load-bearing):
1. drop ``<script>``/``<style>`` blocks and comments wholesale
   (their CONTENT is code, not prose);
2. turn block-level closers and ``<br>`` into newlines (paragraph
   structure survives as line structure);
3. strip every remaining tag to a space;
4. decode the named entities that dominate real pages (&amp; LAST —
   decoding it first would double-decode ``&amp;lt;``, the classic
   entity bug); numeric character references are out of regexp reach
   and left as-is (documented limitation — a full decoder is a UDF);
5. normalize whitespace: runs of spaces/tabs to one space, spaces
   hugging newlines dropped, blank-line runs to one newline, trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: named entities decoded (value order is the decode order; &amp; last)
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

#: tags whose closers end a visual block — they become newlines
_BLOCK_CLOSERS = r"(?i)<(?:br\s*/?|/p|/div|/li|/tr|/h[1-6]|/ul|/ol|/table|/blockquote|/section|/article)\s*>"


def html_to_text(col: Column | str) -> Column:
    """Markup-stripped prose of an HTML document (see module doc)."""
    t = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, _BLOCK_CLOSERS, "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    # Spark's trim strips spaces only — newlines need the regexp form
    return F.regexp_replace(F.trim(t), r"^\n+|\n+$", "")
