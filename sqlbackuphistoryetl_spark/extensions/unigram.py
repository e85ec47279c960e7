"""Unigram-LM (SentencePiece-style) Viterbi segmentation (r9).

The other half of the tokenizer family: BPE applies an ordered merge
list, WordPiece a greedy longest match — a unigram LM (Kudo 2018;
SentencePiece's default model) picks the GLOBALLY cheapest
segmentation of each word under per-piece costs (−log p, here scaled
integers), via Viterbi DP over word positions. Greedy and Viterbi
disagree exactly when a locally longest piece forces an expensive
tail — the cases the gate's vocabulary is built to contain.

Determinism contract: costs are INTEGERS and the DP state is the
single integer ``cost * 1024 + piece_count`` — lexicographic
(cost, count) compare as plain integer compare (word length is capped
at :data:`MAX_WORD_CHARS` < 1024 so the count can never carry into
the cost units). Ties in the path (same cost AND count) break toward
the SHORTEST last piece. Unknown characters take :data:`UNK_COST`
each, so every word segments.

Spark-first layout mirrors :mod:`.wordpiece` (its docstring carries
the scale argument): Viterbi runs once per DISTINCT word in an
Arrow-batched ``mapInPandas`` (vocab broadcast as a closure dict,
cost O(word_len × max_piece_len) per word), the corpus re-assembles
JVM-side with one doc-keyed aggregation, and the corpus text never
moves through Python.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"
#: per-character cost of an out-of-vocabulary character
UNK_COST = 20
#: words longer than this become a single [UNK] piece (also keeps the
#: piece count < 1024, the encoded-state carry bound)
MAX_WORD_CHARS = 200

_COUNT_BASE = 1024


def viterbi_segment_word(
    word: str,
    vocab: dict[str, int],
    unk_cost: int = UNK_COST,
    max_word_chars: int = MAX_WORD_CHARS,
) -> tuple[list[str], int, int]:
    """(pieces, total_cost, encoded_state) of the min-cost
    segmentation. ``encoded_state = total_cost * 1024 + n_pieces`` —
    the unique DP value the oracle recomputes."""
    if not word or len(word) > max_word_chars:
        return [UNK], unk_cost, unk_cost * _COUNT_BASE + 1
    max_len = max((len(p) for p in vocab), default=1)
    n = len(word)
    INF = 1 << 60
    dp = [INF] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    dp[0] = 0
    for j in range(1, n + 1):
        # shortest piece first: on equal encoded cost the FIRST
        # assignment wins, giving the documented tie-break
        for length in range(1, min(max_len, j) + 1):
            piece = word[j - length : j]
            cost = vocab.get(piece)
            if cost is None:
                if length > 1:
                    continue
                cost = unk_cost
            cand = dp[j - length] + cost * _COUNT_BASE + 1
            if cand < dp[j]:
                dp[j] = cand
                back[j] = (length, piece)
    pieces: list[str] = []
    j = n
    while j > 0:
        length, piece = back[j]
        pieces.append(piece)
        j -= length
    pieces.reverse()
    return pieces, dp[n] // _COUNT_BASE, dp[n]


def unigram_segment_corpus(
    docs: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    word_pattern: str = r"\S+",
    lowercase: bool = False,
    unk_cost: int = UNK_COST,
) -> DataFrame:
    """(doc_id, tokens, n_tokens, total_cost, encoded_total): the
    corpus Viterbi-segmented. ``encoded_total`` sums each word's
    unique DP value — the column the driver gate's recursive-CTE
    oracle replays. Empty/NULL texts yield ``(doc_id, [], 0, 0, 0)``."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words_expr = F.regexp_extract_all(text, F.lit(word_pattern), F.lit(0))
    exploded = docs.select(
        F.col(id_col), F.posexplode(words_expr).alias("pos", "word")
    )

    def _seg(it: Iterator) -> Iterator:
        import pandas as pd

        def one(w):
            pieces, cost, enc = viterbi_segment_word(w, vocab, unk_cost)
            return pieces, cost, enc

        for pdf in it:
            trip = pdf["word"].map(one)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": trip.map(lambda t: t[0]),
                    "wcost": trip.map(lambda t: t[1]).astype("int64"),
                    "wenc": trip.map(lambda t: t[2]).astype("int64"),
                }
            )

    seg = (
        exploded.select("word")
        .distinct()
        # Python-bound stage: explicit fan-out (guard-tested)
        .repartition(64, "word")
        .mapInPandas(
            _seg, "word string, toks array<string>, wcost long, wenc long"
        )
    )
    assembled = exploded.join(seg, "word").groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                lambda st: st["toks"],
            )
        ).alias("tokens"),
        F.sum("wcost").alias("total_cost"),
        F.sum("wenc").alias("encoded_total"),
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "tokens", F.expr("cast(array() as array<string>)")
            ).alias("tokens"),
            F.coalesce("total_cost", F.lit(0)).alias("total_cost"),
            F.coalesce("encoded_total", F.lit(0)).alias("encoded_total"),
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
