"""Main-content extraction: keep the article, drop the chrome (r12).

:func:`~...functions.htmlfns.html_to_text` strips markup but keeps
EVERY text node — nav bars, footer link soup, "related articles"
sidebars all survive into the prose and then into every downstream
quality signal. Real training-data pipelines (CCNet, FineWeb via
trafilatura, jusText — Pomikálek 2011 "Removing Boilerplate and
Duplicate Content from Web Corpora"; readability's link-density
heuristic) segment the page into BLOCKS and classify each block as
content or boilerplate before any corpus-level filter runs. This
module is that per-page pass; it composes with
``curation.remove_boilerplate_lines`` (corpus-level: lines repeated
ACROSS pages) — this one needs no second pass over the corpus and no
shuffle at all.

Classification is the jusText core, deterministically re-expressed:
a block is CONTENT iff

- its tag-stripped text is at least ``min_chars`` characters, and
- its link density (characters of text inside ``<a>`` elements over
  all characters) is at most ``max_link_density``, and
- its stopword density (stopword tokens over all tokens) is at least
  ``min_stop_density`` — 0.0 (off) by default because the corpus is
  not necessarily English; pass jusText's 0.30 for English pages.

All thresholds compare as integer cross-multiplications (the Gopher
flags doctrine) so there is no float round-trip to disagree with an
oracle. jusText's context-sensitive second pass is available as
``context=True`` (r12): a NEAR-GOOD block — one failing only the
length or stopword gate while keeping an acceptable link density and
at least ``near_min_chars`` characters (headings, short lead-ins) —
is promoted iff an adjacent block classified good on its own merits.
One extra array pass, still deterministic and JVM-only; off by
default so the base classification stays independently auditable.

Everything is built-in Column expressions over ONE ``F.split`` +
``F.transform``/``F.filter`` array pipeline — no UDF, no Python, no
shuffle: a pure map-side projection that runs at scan speed over
100 TB of raw HTML, exactly like ``html_to_text``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.exprcache import column_memo
from ..functions.htmlfns import decode_entities

#: tags that open or close a visual block — the segmentation points.
#: <br> too: jusText treats it as a block separator when doubled; we
#: take the simpler always-a-boundary reading (a <br>-separated run
#: classifies per line, which is what nav/footer soup needs).
_BLOCK_BOUNDARY = (
    r"(?i)</?(?:p|div|li|ul|ol|dl|dt|dd|h[1-6]|table|thead|tbody|tr|td"
    r"|th|blockquote|pre|section|article|nav|footer|header|aside|main"
    r"|figure|figcaption|form|fieldset|hr|br)\b[^>]*/?\s*>"
)

#: the high-frequency English function words jusText-style stopword
#: density counts; deliberately short — density thresholds, not
#: language ID (that's textfns.detect_language's job)
_STOPWORDS = (
    "the|a|an|of|and|to|in|is|that|it|for|was|on|are|as|with|at|be"
    "|this|have|from|or|by|not|but|they|we|you|his|her|its|had|were"
)

_STOP_RE = rf"(?i)(?<![a-z])(?:{_STOPWORDS})(?![a-z])"


def _strip_inline(seg: Column) -> Column:
    """Tag-stripped, space-normalized, trimmed text of one block."""
    t = F.regexp_replace(seg, r"(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


@column_memo
def main_content_blocks(
    col: Column | str,
    min_chars: int = 25,
    max_link_density: float = 0.30,
    min_stop_density: float = 0.0,
) -> Column:
    """Array of per-block structs ``(text, n_chars, link_chars,
    n_words, stop_words, is_content)`` — the classification layer,
    exposed so callers can audit WHY a block was dropped (the jusText
    debug view). ``text`` is tag-stripped but not yet entity-decoded;
    :func:`main_content_extract` decodes on the kept blocks only.

    Thresholds are held as integer per-mille cross-multiplications:
    ``link_chars * 1000 <= n_chars * round(max_link_density * 1000)``
    — no float division anywhere in the plan.
    """
    t = F.col(col) if isinstance(col, str) else col
    # script/style/comment CONTENT is code, not prose — and their
    # bodies may contain block tags that would fake boundaries
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    segs = F.split(t, _BLOCK_BOUNDARY)
    ml = int(round(max_link_density * 1000))
    ms = int(round(min_stop_density * 1000))

    def _classify(seg: Column) -> Column:
        link_raw = F.regexp_extract_all(
            seg, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), F.lit(1)
        )
        link_txt = _strip_inline(F.array_join(link_raw, " "))
        txt = _strip_inline(seg)
        n = F.length(txt)
        link_n = F.length(link_txt)
        words = F.when(n > 0, F.size(F.split(txt, " "))).otherwise(
            F.lit(0)
        )
        stops = F.when(
            n > 0, F.regexp_count(txt, F.lit(_STOP_RE))
        ).otherwise(F.lit(0))
        good = (
            (n >= F.lit(min_chars))
            & (link_n * 1000 <= n * F.lit(ml))
            & (stops * 1000 >= words * F.lit(ms))
        )
        return F.struct(
            txt.alias("text"),
            n.alias("n_chars"),
            link_n.alias("link_chars"),
            words.alias("n_words"),
            stops.alias("stop_words"),
            good.alias("is_content"),
        )

    blocks = F.transform(segs, _classify)
    return F.filter(blocks, lambda b: b["n_chars"] > 0)


@column_memo
def main_content_extract(
    col: Column | str,
    min_chars: int = 25,
    max_link_density: float = 0.30,
    min_stop_density: float = 0.0,
    context: bool = False,
    near_min_chars: int = 8,
) -> Column:
    """The page's main content as newline-joined prose: classify
    blocks (see :func:`main_content_blocks`), keep the content ones,
    entity-decode the result with :func:`html_to_text`'s exact chain.
    Returns the empty string when no block qualifies — a visible
    "this page is all chrome" verdict, never NULL-on-non-NULL-input.

    ``context=True`` runs jusText's context-sensitive second pass
    (module doc): a near-good block — link density within the bar,
    at least ``near_min_chars`` chars, failing only length/stopword —
    joins the output iff an adjacent block is good ON ITS OWN MERITS
    (promotion doesn't chain: one array pass, deterministic).
    """
    blocks = main_content_blocks(
        col, min_chars, max_link_density, min_stop_density
    )
    if not context:
        kept = F.filter(blocks, lambda b: b["is_content"])
        joined = F.array_join(
            F.transform(kept, lambda b: b["text"]), "\n"
        )
        return decode_entities(joined)

    ml = int(round(max_link_density * 1000))

    # LET-BINDING: higher-order lambdas don't get subexpression
    # elimination, and the neighbor logic references the blocks array
    # five times — inlined, the whole classification pipeline would
    # re-evaluate per reference (measured 6x wall in the 200k scale
    # smoke). Binding the array as a one-element transform's lambda
    # variable evaluates it ONCE; every reference below is to the
    # bound value.
    def _ctx(bs: Column) -> Column:
        def _near(b: Column) -> Column:
            return (
                ~b["is_content"]
                & (b["n_chars"] >= F.lit(near_min_chars))
                & (b["link_chars"] * 1000 <= b["n_chars"] * F.lit(ml))
            )

        def _good_at(i: Column) -> Column:
            # off either end -> false (index 0 is invalid even for
            # try_element_at, so gate it explicitly)
            return F.coalesce(
                F.when(
                    i >= 1, F.try_element_at(bs, i)["is_content"]
                ),
                F.lit(False),
            )

        # F.sequence(1, 0) is the DESCENDING [1, 0], not empty — an
        # empty block array (all-chrome / blank page) must map to an
        # empty index array or element_at(bs, 1) throws at runtime.
        idx = F.when(
            F.size(bs) > 0, F.sequence(F.lit(1), F.size(bs))
        ).otherwise(F.array().cast("array<int>"))
        kept_flags = F.transform(
            idx,
            lambda i: F.element_at(bs, i)["is_content"]
            | (
                _near(F.element_at(bs, i))
                & (_good_at(i - 1) | _good_at(i + 1))
            ),
        )
        kept = F.filter(
            F.zip_with(
                bs, kept_flags,
                lambda b, keep: F.when(keep, b),
            ),
            lambda b: b.isNotNull(),
        )
        return F.array_join(
            F.transform(kept, lambda b: b["text"]), "\n"
        )

    joined = F.element_at(F.transform(F.array(blocks), _ctx), 1)
    return decode_entities(joined)
