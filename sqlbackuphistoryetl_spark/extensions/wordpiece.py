"""WordPiece greedy longest-match segmentation (r9).

The inference tokenizer of the BERT family (Devlin et al. 2019; the
`tokenizers` WordPiece model): each word is consumed left-to-right,
taking the LONGEST vocab piece at every position — continuation
pieces carry a ``##`` prefix — and a word with any untokenizable
position becomes a single ``[UNK]``. Complements :mod:`.bpe` (which
applies an ordered MERGE LIST; WordPiece applies a flat vocab by
longest match).

Spark-first layout, same doctrine as ``bpe_segment_corpus``
(bpe.py:196): the Python tokenizer loop runs ONCE PER DISTINCT WORD
(an Arrow-batched ``mapInPandas`` over the distinct-word frame, vocab
broadcast as a plain closure set — O(distinct words), not O(corpus)),
then the word→tokens map joins back onto the corpus and re-assembles
in word order with one doc-keyed aggregation (``array_sort`` on
(pos, tokens) structs → flatten; no window, one shuffle). The
join-back is left unhinted so AQE broadcasts the map while it fits.

At 100 TB: distinct words grow sublinearly with the corpus; the
tokenize stage is embarrassingly parallel over them, and the corpus
never moves through Python.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"
CONT = "##"


def wordpiece_tokenize_word(
    word: str,
    vocab: set[str],
    unk: str = UNK,
    cont: str = CONT,
    max_chars: int = 200,
) -> list[str]:
    """Greedy longest-match-first tokenization of ONE word (the exact
    BERT WordPiece inference algorithm, incl. the whole-word ``[UNK]``
    fallback and the long-word guard)."""
    if not word or len(word) > max_chars:
        return [unk]
    toks: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        end = n
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = cont + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [unk]
        toks.append(piece)
        pos = end
    return toks


def wordpiece_segment_corpus(
    docs: DataFrame,
    vocab: set[str] | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    word_pattern: str = r"\S+",
    lowercase: bool = False,
    unk: str = UNK,
    cont: str = CONT,
) -> DataFrame:
    """(doc_id, tokens, n_tokens): the corpus WordPiece-tokenized.

    ``word_pattern``/``lowercase`` control the pre-tokenizer (BERT's
    basic tokenizer lowercases and strips non-letters; the defaults
    keep raw whitespace words). Empty/NULL texts yield
    ``(doc_id, [], 0)`` rather than vanishing — same contract as
    ``bpe_segment_corpus``."""
    vocab_set = set(vocab)
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words_expr = F.regexp_extract_all(text, F.lit(word_pattern), F.lit(0))
    exploded = docs.select(
        F.col(id_col), F.posexplode(words_expr).alias("pos", "word")
    )

    def _tok(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": pdf["word"].map(
                        lambda w: wordpiece_tokenize_word(
                            w, vocab_set, unk=unk, cont=cont
                        )
                    ),
                }
            )

    seg = (
        exploded.select("word")
        .distinct()
        # Python-bound stage: explicit fan-out so AQE's coalesce of the
        # (often tiny) distinct shuffle can't serialize the tokenizer
        # through one Arrow worker (the r8 single-partition trap; the
        # driver-contract guard test asserts this for every gate)
        .repartition(exploded.sparkSession.sparkContext.defaultParallelism, "word")
        .mapInPandas(_tok, "word string, toks array<string>")
    )
    assembled = exploded.join(seg, "word").groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                lambda st: st["toks"],
            )
        ).alias("tokens")
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "tokens", F.expr("cast(array() as array<string>)")
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
