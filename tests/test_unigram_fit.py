"""Unigram-LM trainer (extensions/unigram.py: unigram_fit, r12):
seed selection, hard-EM expected counts, pruning, integer bit-costs —
parity against an INDEPENDENT pure-Python reference EM."""

from __future__ import annotations

import pytest

from sqlbackuphistoryetl_spark.extensions.unigram import (
    UNK_COST,
    unigram_fit,
    unigram_seed_candidates,
    unigram_segment_corpus,
    word_counts,
)

CORPUS = [
    (0, "the theme then there the"),
    (1, "than that the thin theme"),
    (2, "ana anna banana than an"),
    (3, "the an anna theme there then"),
]


# --------------------------------------------------------------- reference
# A from-scratch reference implementation: plain dict/loops, tuple-
# compare Viterbi (no encoded-state trick), no Spark — shared nothing
# with the engine beyond the algorithm definition in the module doc.


def _ref_word_counts(rows):
    wc: dict[str, int] = {}
    for _, text in rows:
        for w in text.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_viterbi(word, vocab, unk_cost=UNK_COST):
    """Best segmentation minimizing (cost, n_pieces), ties to the
    SHORTEST last piece: scan candidate lengths ascending and keep
    strict improvements only."""
    n = len(word)
    best: list[tuple[int, int, list[str]] | None] = [None] * (n + 1)
    best[0] = (0, 0, [])
    maxlen = max(len(p) for p in vocab)
    for j in range(1, n + 1):
        for length in range(1, min(maxlen, j) + 1):
            piece = word[j - length : j]
            cost = vocab.get(piece)
            if cost is None:
                if length > 1:
                    continue
                cost = unk_cost
            prev = best[j - length]
            if prev is None:
                continue
            cand = (prev[0] + cost, prev[1] + 1, prev[2] + [piece])
            if best[j] is None or (cand[0], cand[1]) < (
                best[j][0],
                best[j][1],
            ):
                best[j] = cand
    return best[n][2]


def _ref_fit(rows, seed_multi, prune_to_multi, n_iters, max_piece_len=2,
             frac_bits=4):
    wc = _ref_word_counts(rows)
    cand: dict[str, int] = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                cand[p] = cand.get(p, 0) + c
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    multi = dict(
        sorted(
            ((p, c) for p, c in cand.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:seed_multi]
    )
    counts = {**chars, **multi}
    total = sum(counts.values())
    vocab = {
        p: ((total << frac_bits) // c).bit_length()
        for p, c in counts.items()
    }
    for _ in range(n_iters):
        got: dict[str, int] = {}
        for w, c in wc.items():
            for p in _ref_viterbi(w, vocab):
                got[p] = got.get(p, 0) + c
        keep = dict(
            sorted(
                ((p, c) for p, c in got.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )[:prune_to_multi]
        )
        counts = {p: max(got.get(p, 0), 1) for p in chars}
        counts.update(keep)
        total = sum(counts.values())
        vocab = {
            p: ((total << frac_bits) // c).bit_length()
            for p, c in counts.items()
        }
    return vocab


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_seed_candidates_counts(spark):
    words = word_counts(_docs(spark), lowercase=True)
    got = {
        r["piece"]: r["cnt"]
        for r in unigram_seed_candidates(words, 2).collect()
    }
    wc = _ref_word_counts(CORPUS)
    # 'th' appears once per 'the'(3x as a word... weighted by count)
    exp_th = sum(
        c * sum(1 for i in range(len(w) - 1) if w[i : i + 2] == "th")
        for w, c in wc.items()
    )
    assert got["th"] == exp_th
    exp_a = sum(c * w.count("a") for w, c in wc.items())
    assert got["a"] == exp_a


@pytest.mark.parametrize("n_iters", [1, 2, 3])
def test_fit_parity_with_reference(spark, n_iters):
    got = unigram_fit(
        _docs(spark),
        seed_multi=8,
        prune_to_multi=4,
        n_iters=n_iters,
        lowercase=True,
    )
    ref = _ref_fit(CORPUS, 8, 4, n_iters)
    assert got == ref


def test_fit_vocab_shape_and_coverage(spark):
    vocab = unigram_fit(
        _docs(spark), seed_multi=6, prune_to_multi=3, lowercase=True
    )
    chars = {p for p in vocab if len(p) == 1}
    multi = {p for p in vocab if len(p) > 1}
    assert len(multi) == 3
    # every corpus character survives pruning (coverage guarantee)
    corpus_chars = set("".join(w for _, t in CORPUS for w in t.split()))
    assert corpus_chars <= chars
    assert all(c >= 1 for c in vocab.values())


def test_fitted_vocab_segments_corpus(spark):
    """End-to-end: the fit output feeds unigram_segment_corpus and
    frequent multi-char pieces actually get used."""
    docs = _docs(spark)
    vocab = unigram_fit(
        docs, seed_multi=8, prune_to_multi=4, n_iters=2, lowercase=True
    )
    seg = unigram_segment_corpus(docs, vocab, lowercase=True)
    toks = {r["doc_id"]: r["tokens"] for r in seg.collect()}
    flat = [t for ts in toks.values() for t in ts]
    assert any(len(t) > 1 for t in flat)
    # reassembly: tokens of doc 0 re-concatenate to its words
    assert "".join(toks[0]) == "thethemethentherethe"


def test_fit_validates_params(spark):
    with pytest.raises(ValueError):
        unigram_fit(_docs(spark), seed_multi=2, prune_to_multi=5)
    with pytest.raises(ValueError):
        unigram_fit(
            _docs(spark), seed_multi=5, prune_to_multi=2, max_piece_len=1
        )
