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
4. decode numeric character references (``&#233;``/``&#x3B1;`` —
   JVM-side via :func:`decode_numeric_refs`, r11) FIRST — a literal
   ``&amp;#65;`` in the source must stay ``&#65;``, so the numeric
   pass runs before any entity minting a bare ``&`` — then the named
   entities that dominate real pages (&amp; LAST — decoding it first
   would double-decode ``&amp;lt;``, the classic entity bug);
5. normalize whitespace: runs of spaces/tabs to one space, spaces
   hugging newlines dropped, blank-line runs to one newline, trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.exprcache import column_memo

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


@column_memo
def html_to_text(col: Column | str) -> Column:
    """Markup-stripped prose of an HTML document (see module doc)."""
    t = F.col(col) if isinstance(col, str) else col
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, _BLOCK_CLOSERS, "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    t = decode_entities(t)
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    # Spark's trim strips spaces only — newlines need the regexp form
    return F.regexp_replace(F.trim(t), r"^\n+|\n+$", "")


@column_memo
def decode_entities(col: Column | str) -> Column:
    """The full entity-decode chain shared by :func:`html_to_text`
    and the main-content extractor — a SINGLE left-to-right tokenizer
    pass over (named-entity | numeric-ref | run) tokens (r13; the
    r12 multi-pass chain was order-dependent: it kept ``&#38;lt;``
    literal but double-decoded the mirror ``&amp;#38;`` — the named
    pass minted ``&#38;`` from ``&amp;`` and the deferred final
    regexp then decoded it to ``&``). One pass never re-scans minted
    output, so BOTH directions stay single-decoded: ``&amp;lt;`` →
    ``&lt;``, ``&#38;lt;`` → ``&lt;``, ``&amp;#65;`` → ``&#65;``,
    ``&amp;#38;`` → ``&#38;``."""
    t = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(t, F.lit(_ENT_TOKENS), F.lit(0))

    def _one(tok):
        named = None
        for ent, rep in HTML_ENTITIES:
            cond = tok == ent
            named = F.when(cond, F.lit(rep)) if named is None else named.when(cond, F.lit(rep))
        return named.otherwise(_decode_numeric_tok(tok))

    return F.array_join(F.transform(toks, _one), "")


#: a VALID numeric character reference: decimal or hex form
_NUM_REF = r"&#(?:[0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});"

#: tokenizer covering every character: a valid ref, or a maximal run
#: that only swallows '&' when it does NOT start a valid ref
_REF_TOKENS = rf"{_NUM_REF}|(?:[^&]|&(?!{_NUM_REF[1:]}))+"

#: a named entity decode_entities handles (&#39; in HTML_ENTITIES is
#: numeric-form and already covered by _NUM_REF)
_NAMED_REF = r"&(?:nbsp|lt|gt|quot|apos|amp);"

#: decode_entities tokenizer: named ref | numeric ref | a maximal run
#: whose '&'s start neither kind of ref
_ENT_TOKENS = (
    rf"{_NAMED_REF}|{_NUM_REF}"
    rf"|(?:[^&]|&(?!{_NAMED_REF[1:]}|{_NUM_REF[1:]}))+"
)


@column_memo
def decode_numeric_refs(col: Column | str, defer_amp: bool = False) -> Column:
    """``&#NNN;`` / ``&#xHH;`` numeric character references decoded to
    their characters — pure JVM (r11; the module docstring's "out of
    regexp reach" limitation retired): tokenize into (ref | run)
    pieces with one ``regexp_extract_all``, map each ref through
    hex → ``unhex`` → UTF-16BE ``decode``, rejoin with
    ``array_join``. BMP only, on purpose: codepoints 1..65535
    excluding the surrogate block decode; supplementary-plane refs
    (emoji), surrogates, zero and malformed refs stay literal — a
    visible non-decode, never a mojibake guess. (UTF-16BE of one BMP
    char IS its 4-hex-digit codepoint, which is what makes this a
    2-expression decode.)

    ``defer_amp=True`` leaves ``&#38;``/``&#x26;`` (the ampersand
    itself) literal so a caller that runs a named-entity pass next can
    decode them LAST — otherwise ``&#38;lt;`` would mint ``&lt;`` and
    be double-decoded to ``<`` (see html_to_text)."""
    t = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(t, F.lit(_REF_TOKENS), F.lit(0))
    return F.array_join(
        F.transform(toks, lambda tok: _decode_numeric_tok(tok, defer_amp)),
        "",
    )


def _decode_numeric_tok(tok: Column, defer_amp: bool = False) -> Column:
    """One tokenizer token → its decoded character if it is a
    decodable numeric ref, else the token verbatim (shared by
    :func:`decode_numeric_refs` and :func:`decode_entities`)."""
    hexpart = F.regexp_extract(tok, r"^&#[xX]([0-9A-Fa-f]{1,6});$", 1)
    decpart = F.regexp_extract(tok, r"^&#([0-9]{1,7});$", 1)
    n = (
        F.when(hexpart != "", F.conv(hexpart, 16, 10).cast("long"))
        .when(decpart != "", decpart.cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )
    bmp = (
        n.isNotNull()
        & (n >= 1)
        & (n <= 0xFFFF)
        & ~((n >= 0xD800) & (n <= 0xDFFF))
    )
    if defer_amp:
        bmp = bmp & (n != 38)
    return F.when(
        bmp,
        F.decode(F.unhex(F.lpad(F.hex(n), 4, "0")), "UTF-16BE"),
    ).otherwise(tok)
