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

__all__ = [
    "viterbi_segment_word",
    "unigram_segment_corpus",
    "unigram_fit",
    "unigram_seed_candidates",
]

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
        .repartition(
            exploded.sparkSession.sparkContext.defaultParallelism, "word"
        )
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


# ------------------------------------------------------------------ fit
#
# SentencePiece's unigram trainer (Kudo 2018 §3.2) seeds a large
# candidate vocabulary from frequent substrings, EM-fits piece
# probabilities, and prunes to the target size. This is that loop,
# deterministically re-expressed:
#
# - SEED: all single characters (coverage guarantee) plus the top
#   ``seed_multi`` multi-char substrings by corpus count (count desc,
#   piece asc — total order, no RNG).
# - E-step: HARD (Viterbi) EM — each distinct word's best path under
#   the current integer costs contributes ``word_count`` per piece it
#   uses. Kudo's soft EM integrates over the whole lattice; the hard
#   variant keeps every quantity an integer, which is what makes the
#   fit oracle-able end-to-end (the gate's DuckDB oracle replays the
#   lattice AND the backtrace). Documented delta, same fixed point
#   family.
# - PRUNE: keep the single chars plus the top ``prune_to_multi``
#   multi-char pieces by expected count (count desc, piece asc).
#   SentencePiece prunes by likelihood loss; expected-count pruning is
#   its first-order approximation and is closed-form replayable.
# - M-step: integer bit-cost re-estimation (below). Single chars that
#   got zero expected count keep count 1 (add-one smoothing on the
#   required pieces) so coverage never breaks.
#
# COST MODEL: cost(x) = bit_length((total << frac_bits) // count(x))
# — the whole-bit quantization of -log2 p(x) with ``frac_bits``
# fractional bits. All-integer (Python int.bit_length, Spark
# length(bin(...)), DuckDB length(bin(...))), so no libm ulp can ever
# disagree between the engine, the oracle, and the reference; always
# >= 1. SentencePiece stores float nats — the quantization is the
# module's integer-determinism doctrine applied to training.
#
# Scale: word counts are ONE hash agg over the corpus; every later
# job is vocab-sized or distinct-word-sized (the wordpiece scale
# argument). Python touches only distinct words (Arrow-batched, the
# existing fan-out doctrine); collects are model-sized (the vocab),
# never corpus-sized.


def _bit_cost(total: int, count: int, frac_bits: int) -> int:
    """bit_length((total << frac_bits) // count) — integer ~ -log2 p."""
    return ((total << frac_bits) // count).bit_length()


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    word_pattern: str = r"\S+",
    lowercase: bool = False,
) -> DataFrame:
    """(word, wcount) — the corpus reduced to its distinct-word model;
    one hash agg, the only corpus-sized job in the fit."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.regexp_extract_all(text, F.lit(word_pattern), F.lit(0))
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def unigram_seed_candidates(
    words: DataFrame, max_piece_len: int
) -> DataFrame:
    """(piece, cnt) — every substring of every distinct word up to
    ``max_piece_len`` chars, weighted by word count. Pure JVM: one
    sequence/transform/flatten explosion + one hash agg; the engine
    half of the seed stage (selection happens in :func:`unigram_fit`).
    """
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda l: F.substring(w, i, l),
            ),
        )
    )
    return (
        words.select(F.col("wcount"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("cnt"))
    )


def _estep_piece_counts(
    words: DataFrame, vocab: dict[str, int], unk_cost: int
) -> DataFrame:
    """(piece, cnt): hard-EM expected counts — Viterbi best-path piece
    occurrences per distinct word, weighted by word count. [UNK]
    never counts (it is not a learnable piece)."""

    def _seg(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out_piece, out_cnt = [], []
            for word, wcount in zip(pdf["word"], pdf["wcount"]):
                pieces, _, _ = viterbi_segment_word(word, vocab, unk_cost)
                for p in pieces:
                    if p != UNK:
                        out_piece.append(p)
                        out_cnt.append(int(wcount))
            yield pd.DataFrame({"piece": out_piece, "cnt": out_cnt})

    return (
        words.repartition(
            words.sparkSession.sparkContext.defaultParallelism, "word"
        )
        .mapInPandas(_seg, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def unigram_fit(
    docs: DataFrame,
    seed_multi: int,
    prune_to_multi: int,
    n_iters: int = 1,
    max_piece_len: int = 2,
    frac_bits: int = 4,
    text_col: str = "text",
    word_pattern: str = r"\S+",
    lowercase: bool = False,
    unk_cost: int = UNK_COST,
) -> dict[str, int]:
    """Fit a unigram-LM vocabulary ``{piece: integer_cost}`` on the
    corpus (the trainer half of this module; see the block comment
    above for the exact algorithm and its documented deltas from
    SentencePiece). The result feeds :func:`unigram_segment_corpus`
    unchanged. Final vocab size = (distinct single chars) +
    ``prune_to_multi``.
    """
    if seed_multi < prune_to_multi:
        raise ValueError("seed_multi must be >= prune_to_multi")
    if max_piece_len < 2:
        raise ValueError("max_piece_len must be >= 2 to learn pieces")
    words = word_counts(docs, text_col, word_pattern, lowercase)
    words = words.localCheckpoint(eager=True)
    cand = unigram_seed_candidates(words, max_piece_len)
    chars = {
        r["piece"]: int(r["cnt"])
        for r in cand.filter(F.length("piece") == 1).collect()
    }
    multi = {
        r["piece"]: int(r["cnt"])
        for r in cand.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(int(seed_multi))
        .collect()
    }
    counts = {**chars, **multi}
    total = sum(counts.values())
    vocab = {
        p: _bit_cost(total, c, frac_bits) for p, c in counts.items()
    }
    for _ in range(int(n_iters)):
        got = {
            r["piece"]: int(r["cnt"])
            for r in _estep_piece_counts(words, vocab, unk_cost).collect()
        }
        keep_multi = sorted(
            ((p, c) for p, c in got.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[: int(prune_to_multi)]
        counts = {p: max(got.get(p, 0), 1) for p in chars}
        counts.update(dict(keep_multi))
        total = sum(counts.values())
        vocab = {
            p: _bit_cost(total, c, frac_bits) for p, c in counts.items()
        }
    return vocab
