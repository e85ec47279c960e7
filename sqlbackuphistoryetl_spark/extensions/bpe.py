"""Distributed BPE tokenizer: fit, segment, encode.

Byte-Pair Encoding subword tokenization (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") as a
Spark-native training + application pipeline. The published algorithm
is a greedy loop — count adjacent symbol pairs, merge the most frequent
pair, repeat — whose naive form touches every token occurrence every
iteration. The scale insight (same as the reference implementation's
word-frequency dict) is that everything after the first aggregation
operates on the DISTINCT-WORD vocabulary:

- ``initial_vocab``: ONE corpus pass → (word, count, syms) where syms
  is the character sequence + end-of-word marker. This is the only
  corpus-sized job in the whole fit.
- ``bpe_fit``: each merge iteration runs two VOCAB-sized jobs (pair
  count + top-1 collect, merge application) — bounded by vocabulary,
  not corpus, no matter how many TB the corpus is. Per-round frames go
  through ``localCheckpoint`` (the connected-components precedent:
  persist would tie every round's cache to an O(rounds)-deep plan).
- ``bpe_segment_corpus``: applies the learned merges to the distinct
  words (vocab-sized jobs again), then broadcast-joins the word→tokens
  map back onto the corpus — re-tokenizing 100 TB is one map-side
  join, not a per-document loop.
- ``bpe_encode_corpus``: same, with tokens mapped to dense integer ids
  (deterministic id assignment: merge order first, then leftover
  initial symbols lexicographically).

Everything is JVM-side: the greedy within-word merge is an
``F.aggregate`` fold (array accumulator), not a UDF. The merge fold
reproduces the reference's left-to-right non-overlapping application
exactly — parity-tested against a pure-Python reference BPE in
``tests/test_bpe.py``.

The pair-count pass itself is oracle-gated through
``functions/textfns.py: bpe_pair_counts`` (the ``bpe_merge_candidates``
gate); ``initial_vocab`` + ``pair_counts_from_vocab`` reproduce that
gate's numbers bit-for-bit (asserted in tests). The iterative fit and
the segmentation are gate-exempt by the same doctrine as
``train_centroids_kmeans``: a driver loop is not one SQL query — their
correctness contract is reference-implementation parity instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprcache import column_memo_lru

#: end-of-word marker — rides as an ordinary symbol so merges can cross
#: into it (learning e.g. ("e", "</w>") → "e</w>", the reference's way
#: of giving word-final subwords their own identity).
#: CONTRACT (same caveat as the reference implementation): the marker
#: must not occur as a substring of corpus words, or a learned merge
#: could mint a product that collides with it and corrupt
#: marker-based detokenization. For adversarial text (raw HTML where a
#: word may literally contain "</w>"), pass a corpus-safe
#: ``end_marker`` such as "\x00w" to every entry point.
END = "</w>"


def initial_vocab(
    docs: DataFrame, text_col: str = "text", end_marker: str = END
) -> DataFrame:
    """(word, count, syms) — the one corpus-sized aggregation.

    ``syms`` = the word's characters plus the end marker; every later
    fit/segment job is bounded by the number of DISTINCT words.
    """
    # parsed exprs (r14, guide §7.3) — identical regexp/concat trees;
    # the end marker is escaped as a SQL string literal. Falls back to
    # the Column build for a non-identifier text column.
    if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", text_col):
        words = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    else:
        words = F.regexp_extract_all(
            F.col(text_col), F.lit(r"\S+"), F.lit(0)
        )
    if end_marker == END:  # custom markers (e.g. "\x00w") keep F.lit
        syms = F.expr(f"concat(split(word, ''), array('{END}'))")
    else:
        syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(end_marker)))
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.expr("CAST(count(1) AS BIGINT)").alias("count"))
        .withColumn("syms", syms)
    )


def pair_counts_from_vocab(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, pair_count) over the current symbol sequences,
    occurrence-counted (a pair twice inside one word counts twice,
    scaled by word frequency) — the quantity the reference argmaxes.
    One explode + one map-side-partial hash aggregate, vocab-sized."""
    s = F.col("syms")
    pairs = F.arrays_zip(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))).alias("lhs"),
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))).alias("rhs"),
    )
    return (
        vocab.select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("count").alias("pair_count"))
    )


def _apply_merge(syms, lhs: str, rhs: str, merged: str):
    """Greedy left-to-right non-overlapping application of ONE merge
    rule to a symbol array — the reference semantics — as a pure
    ``F.aggregate`` fold. ``try_element_at(acc, -1)`` on the empty
    accumulator is NULL (ANSI mode makes plain ``element_at`` throw),
    so the first element always appends."""
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(lhs)) & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_fit(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    end_marker: str = END,
    initial_merges: list[tuple[str, str]] | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` NEW BPE merge rules from the corpus.

    Returns the ordered merge list ``[(lhs, rhs), ...]`` — the entire
    trained tokenizer state (segmentation is a pure function of it).
    Stops early when no pair reaches ``min_pair_count``.

    ``initial_merges`` resumes training from an existing tokenizer:
    the vocab is pre-segmented under them (vocab-sized jobs) and the
    returned list is ``initial_merges + the new rules``. MERGE-PRODUCT
    ids stay stable under extension (:func:`bpe_vocab_table` numbers
    them in merge order); ids of the LEFTOVER initial symbols follow
    the products, so they can shift when an extension adds products —
    persist the vocab table alongside the merges when decode stability
    for single-character tokens matters.

    Cost model: one corpus pass (``initial_vocab``), then per merge two
    vocab-sized jobs. Ties at the argmax break on (lhs, rhs) so the
    learned tokenizer is deterministic across runs and partitionings.
    The vocab frame checkpoints every few rounds (lineage/codegen
    bound, the ``clustering.connected_components`` rationale);
    checkpoint blocks of dropped rounds are freed by ContextCleaner as
    the Python references die — fine at the few-thousand-merge scale
    this in-Spark trainer targets (a 50k-merge production vocabulary
    wants exported pair counts + a driver-side loop, as the reference
    implementations do).
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = initial_vocab(docs, text_col, end_marker).select("count", "syms")
    return _fit_loop(vocab, n_merges, min_pair_count, initial_merges)


def _fit_loop(
    vocab: DataFrame,
    n_merges: int,
    min_pair_count: int,
    initial_merges: list[tuple[str, str]] | None,
) -> list[tuple[str, str]]:
    """The greedy merge loop over a prepared (count, syms) vocab frame
    — shared by the char-level (:func:`bpe_fit`) and byte-level
    (:func:`bpe_fit_bytes`) trainers; the two differ ONLY in how raw
    text becomes the initial symbol sequences."""
    if initial_merges:
        vocab = segment_vocab(vocab, list(initial_merges))
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = list(initial_merges or [])
    for _ in range(int(n_merges)):
        top = (
            pair_counts_from_vocab(vocab)
            .filter(F.col("pair_count") >= int(min_pair_count))
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs = top[0]["lhs"], top[0]["rhs"]
        merges.append((lhs, rhs))
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), lhs, rhs, lhs + rhs)
        )
        # checkpoint every few rounds, not every round: bounds lineage
        # depth at 8 stacked folds while cutting the orphan-block churn
        # (each eager checkpoint leaves blocks only ContextCleaner frees)
        if len(merges) % 8 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def segment_vocab(
    vocab: DataFrame, merges: list[tuple[str, str]], rounds_per_checkpoint: int = 8
) -> DataFrame:
    """Apply an ordered merge list to a (…, syms) vocab frame — k
    vocab-sized transformations, checkpointed every few rounds to bound
    both lineage depth and codegen expression size.

    The folds between two checkpoints are composed as ONE nested Column
    and applied with a single ``select`` (r13): chaining a
    ``withColumn`` per merge re-ANALYZED the whole accumulated
    nested-lambda plan on every call (withColumn resolves against the
    current schema), superlinear in the merge count — ~3 s of serial
    driver time for a 5-merge encode. The collapsed tree, checkpoint
    placement, and results are identical to the chained form (chained
    Projects collapse to exactly this nesting)."""
    out = vocab
    k = int(rounds_per_checkpoint)
    for start in range(0, len(merges), k):
        block = tuple((lhs, rhs) for lhs, rhs in merges[start : start + k])
        syms = _merge_block_column(block)
        out = out.select(
            *[syms.alias("syms") if c == "syms" else F.col(c) for c in out.columns]
        )
        if len(block) == k:
            out = out.localCheckpoint(eager=True)
    return out


@column_memo_lru(maxsize=64)
def _merge_block_column(block: tuple[tuple[str, str], ...]):
    """One checkpoint block's composed merge folds as a pure Column of
    ``syms`` — ~180 py4j round-trips per merge rule to build, and the
    same learned merges are re-applied by every consumer in a query
    (fit → encode → decode roundtrips), so the composed tree is
    memoized. The merges are DATA-DERIVED (a fitted vocabulary), so
    the memo is a bounded LRU, not the never-evicting process dict
    (r13 advice: unbounded growth across fits)."""
    syms = F.col("syms")
    for lhs, rhs in block:
        syms = _apply_merge(syms, lhs, rhs, lhs + rhs)
    return syms


def bpe_segment_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_marker: str = END,
) -> DataFrame:
    """(doc_id, tokens, n_tokens) — the corpus re-tokenized under the
    learned merges.

    Segmentation happens ONCE PER DISTINCT WORD (vocab-sized jobs),
    then the word→tokens map joins back onto the corpus in word order:
    posexplode the document's words, attach each word's token array,
    re-assemble with one doc-keyed aggregation ordered by position
    (``array_sort`` on (pos, tokens) structs → flatten — no window, one
    shuffle on the doc id). The join-back is left UNHINTED: AQE
    broadcasts the map while it fits and falls back to a hash join at
    web-scale vocabularies (1e8+ distinct words would blow the 8 GB
    broadcast limit a forced hint insists on).

    Empty, whitespace-only, and NULL texts yield ``(doc_id, [], 0)``
    rather than vanishing — callers join this output back to the
    corpus and must not lose rows.
    """
    # eager checkpoint, same as bpe_encode_corpus: the downstream
    # consumers re-plan the chained merge folds otherwise, and a
    # fold-chain under a generator/join build side re-pays multi-second
    # codegen per job (measured 6.5 s for a 31-word vocab)
    seg = (
        segment_vocab(initial_vocab(docs, text_col, end_marker), merges)
        .localCheckpoint(eager=True)
        .select("word", F.col("syms").alias("toks"))
    )
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    exploded = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "word")
    ).join(seg, "word")
    assembled = exploded.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "toks"))
                ),
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


def _vocab_table_from_seg(
    seg: DataFrame, merge_products: list[str], spark
) -> DataFrame:
    # distinct merge RULES can mint the same product string (e.g.
    # (ab,c) and (a,bc) both yield "abc") — a token string gets ONE id
    # (first mention wins), or the encode join would fan out every
    # occurrence of the colliding token
    merge_products = list(dict.fromkeys(merge_products))
    """Dense ids over an already-segmented vocab frame — merge products
    first in merge order, surviving initial symbols lexicographically
    after."""
    # NOT IN as one parsed predicate (r14, guide §7.3): same In node
    # the isin chain built; product strings are data-derived, so they
    # are escaped as SQL literals and never memoized (r13 advice).
    if merge_products:
        in_list = ", ".join("'" + _sql_str(p) + "'" for p in merge_products)
        keep = f"NOT (token IN ({in_list}))"
    else:
        keep = "true"
    leftovers = (
        seg.select(F.explode("syms").alias("token"))
        .distinct()
        .filter(keep)
    )
    base = spark.createDataFrame(
        [(t, i) for i, t in enumerate(merge_products)],
        "token string, token_id long",
    )
    n_base = len(merge_products)
    # single-partition window is fine here: the frame holds the
    # surviving INITIAL symbols only (≈ alphabet size), not the corpus
    extra = leftovers.withColumn(
        "token_id",
        F.expr(
            "CAST(row_number() OVER (ORDER BY token) AS LONG) + "
            f"{n_base - 1}"
        ),
    )
    return base.unionByName(extra.select("token", "token_id"))


def bpe_vocab_table(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    end_marker: str = END,
) -> DataFrame:
    """(token, token_id) — deterministic dense ids for every token the
    segmented corpus can emit: merge products first in merge order,
    then the surviving initial symbols (single characters + the end
    marker) lexicographically after. Merge-order ids keep MERGE-PRODUCT
    ids stable when a tokenizer is extended; leftover-symbol ids follow
    the products and can shift across extensions (see
    :func:`bpe_fit`)."""
    # eager checkpoint for the same codegen-per-job reason as
    # bpe_segment_corpus / bpe_encode_corpus
    seg = segment_vocab(
        initial_vocab(docs, text_col, end_marker), merges
    ).localCheckpoint(eager=True)
    return _vocab_table_from_seg(
        seg, [lhs + rhs for lhs, rhs in merges], docs.sparkSession
    )


def bpe_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    end_marker: str = END,
) -> DataFrame:
    """Per-group tokenizer fertility audit — the standard multilingual
    tokenizer diagnostic (tokens per word; see the XLM-R / UniMax
    tokenizer analyses): a language whose fertility is 2× another's
    pays 2× the sequence length for the same text, which skews both
    training cost and any token-budget sampler.

    Returns one row per ``group_col`` value with EXACT integer sums —
    ``(group, n_docs, total_words, total_tokens, total_chars)`` where
    total_chars counts non-whitespace characters — leaving the
    fertility ratio (tokens/words) and compression (chars/token) to
    the consumer, so the output is engine-exact with no float-division
    doctrine.

    Scale shape: segmentation cost is the :func:`bpe_segment_corpus`
    vocab-sized path + one unhinted join-back; the audit itself adds
    one hash aggregate keyed by the group (languages — tiny)."""
    seg = bpe_segment_corpus(docs, merges, text_col, id_col, end_marker)
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    base = docs.select(
        F.col(id_col),
        F.col(group_col).alias("__grp"),
        F.size(words).cast("long").alias("__nw"),
        F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
        .cast("long")
        .alias("__nc"),
    )
    return (
        base.join(seg.select(id_col, "n_tokens"), id_col)
        .groupBy(F.col("__grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nw").cast("long").alias("total_words"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("__nc").cast("long").alias("total_chars"),
        )
    )


def bpe_decode_corpus(
    enc: DataFrame,
    vocab_tbl: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    end_marker: str = END,
) -> DataFrame:
    """(doc_id, text) — invert :func:`bpe_encode_corpus`: map dense ids
    back to token strings, concatenate, and rebuild words at the
    end-marker boundaries. ``decode(encode(x))`` reproduces ``x`` with
    whitespace normalized to single spaces (tokenization splits on
    ``\\S+``, so the original inter-word whitespace is the one thing
    BPE does not preserve) — the audit a training-data user runs
    against a packed shard before trusting it.

    **End-marker collision caveat** (same limit as the ``bpe_fit``
    family): word boundaries are rebuilt by replacing ``end_marker``
    in the concatenated token stream, so a document whose TEXT
    literally contains the marker string (default ``</w>``) decodes
    that substring to a space. Corpora that may contain the literal
    marker should pass a collision-free ``end_marker`` to the whole
    fit/encode/decode chain (any string outside the corpus alphabet,
    e.g. ``"\\x00w\\x00"``).

    Scale shape: the id→token mapping folds to a ONE-ROW frame holding
    a POSITIONAL token array (ids are dense 0..V-1 by
    :func:`bpe_vocab_table` construction, so ``element_at`` is an O(1)
    index access; a sparse caller-supplied table falls back to the map
    form, whose per-lookup linear scan is measurably slower),
    cross-joined onto the corpus (a broadcast nested-loop join of a
    single row); the per-document translation is a map-side
    ``transform`` + string rebuild — zero corpus shuffles, zero
    per-token explodes, no joins keyed on the corpus. The lookup row is
    vocab-sized (a 50k-token BPE vocabulary is ~1 MB; even a 1M-entry
    vocab is tens of MB, inside broadcast bounds). A token id absent
    from ``vocab_tbl`` raises
    (``raise_error``) rather than silently dropping bytes — a decode
    that "works" by skipping unknown ids corrupts the audit it exists
    to serve.

    ``vocab_tbl`` is the (token, token_id) frame of
    :func:`bpe_vocab_table` — pass the SAME table the encode used (or
    its persisted copy; see the id-stability caveat on
    :func:`bpe_fit`).
    """
    # Lookup structure: ids are DENSE 0..V-1 by bpe_vocab_table's
    # construction, so the id→token table folds to a POSITIONAL array
    # (element_at on an array is an O(1) index access). The map form
    # (map_from_entries + try_element_at) is kept as the fallback for
    # caller-supplied sparse tables, but Spark's GetMapValue is a
    # LINEAR scan per lookup — O(|vocab|) per token, measured ~6×
    # slower end-to-end at an 800-token vocab and catastrophically
    # worse at a 50k BPE vocabulary. Both forms (plus the density
    # stats that pick between them) build in ONE single-row aggregate,
    # so plan construction stays LAZY and the caller's vocab plan
    # evaluates exactly once; density is strict — count, distinct
    # count, min 0, max V−1 — and the positional path only fires for
    # NON-NEGATIVE ids (Spark resolves a negative array index from the
    # END, which would silently decode a corrupt id to the wrong token
    # instead of raising; try_element_at(0) throws outright).
    # density stats + both lookup structures in ONE single-row
    # aggregate, each field a parsed expr (r14, guide §7.3 — this
    # block was ~1.1k py4j round-trips per decode construction);
    # the SQL transliterates the exact former Column trees.
    id2tok = vocab_tbl.agg(
        F.expr("count(1)").alias("__n"),
        F.expr("count(DISTINCT token_id)").alias("__nd"),
        F.expr("min(token_id)").alias("__mn"),
        F.expr("max(token_id)").alias("__mx"),
        F.expr(
            "transform(array_sort(collect_list(struct(token_id, token))), "
            "s -> s.token)"
        ).alias("__arr"),
        F.expr(
            "map_from_entries(collect_list(struct(token_id, token)))"
        ).alias("__map"),
    )
    _DENSE_SQL = "(__n > 0) AND (__nd = __n) AND (__mn = 0) AND (__mx = __n - 1)"

    def _lookup_sql(i: str) -> str:
        # the bounds guard also keeps the int cast safe under ANSI: an
        # id beyond the vocab (or a 10^12 corrupt id) must surface as
        # NULL -> raise_error, never as a cast-overflow exception
        return (
            f"CASE WHEN {_DENSE_SQL} THEN "
            f"(CASE WHEN ({i} >= 0) AND ({i} <= __mx) "
            f"THEN try_element_at(__arr, CAST({i} + 1 AS INT)) END) "
            f"ELSE try_element_at(__map, {i}) END"
        )

    # materialize the translated array ONCE in its own projection —
    # referencing the transform twice (null guard + concat) would
    # re-run every lookup
    ids_ref = (
        ids_col
        if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", ids_col)
        else f"`{ids_col}`"
    )
    translated = (
        enc.join(F.broadcast(id2tok))
        .select(
            id_col,
            F.col(ids_col).alias("__ids"),
            F.expr(
                f"transform({ids_ref}, i -> {_lookup_sql('i')})"
            ).alias("__toks"),
        )
    )
    toks = F.col("__toks")
    joined = F.concat_ws("", toks)
    # concat_ws silently skips NULLs, so an unknown id would vanish —
    # guard BEFORE the concat
    checked = F.when(
        F.exists(toks, lambda t: t.isNull()),
        F.raise_error(
            F.concat(
                F.lit("bpe_decode_corpus: token id(s) not in vocab table: "),
                F.to_json(
                    F.filter(
                        F.arrays_zip(
                            F.col("__ids").alias("id"), toks.alias("tok")
                        ),
                        lambda z: z["tok"].isNull(),
                    )
                ),
            )
        ),
    ).otherwise(joined)
    n = len(end_marker)
    body = F.when(
        F.endswith(checked, F.lit(end_marker)),
        F.substring(checked, 1, F.length(checked) - n),
    ).otherwise(checked)
    return translated.select(
        id_col,
        F.replace(body, F.lit(end_marker), F.lit(" ")).alias("text"),
    )


def bpe_encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_marker: str = END,
) -> DataFrame:
    """(doc_id, token_ids, n_tokens) — segmented corpus with tokens
    mapped to the dense ids of :func:`bpe_vocab_table`.

    The segmented vocab is computed ONCE (checkpointed, vocab-sized)
    and feeds both the id table and the word→ids map, and ids attach at
    the VOCAB level — a per-word posexplode over distinct words, never
    a per-token explode of the corpus. The corpus itself is touched
    exactly like :func:`bpe_segment_corpus`: one word-count pass inside
    ``initial_vocab`` and one UNHINTED join-back (AQE broadcasts while
    the map fits) + doc-keyed reassembly shuffle. (A literal map
    expression instead of the join would mint one codegen node per
    vocab entry — fine at toy size, fatal at a 50k BPE vocabulary.)

    Same empty-doc contract as :func:`bpe_segment_corpus`:
    empty/whitespace/NULL texts produce ``(doc_id, [], 0)``."""
    seg = segment_vocab(
        initial_vocab(docs, text_col, end_marker), merges
    ).localCheckpoint(eager=True)
    tok_tbl = F.broadcast(
        _vocab_table_from_seg(
            seg, [lhs + rhs for lhs, rhs in merges], docs.sparkSession
        )
    )
    word_ids = (
        seg.select("word", F.posexplode("syms").alias("pos", "token"))
        .join(tok_tbl, "token")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                lambda st: st["token_id"],
            ).alias("id_toks")
        )
    )
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    exploded = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "word")
    ).join(word_ids, "word")
    assembled = exploded.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id_toks"))),
                lambda st: st["id_toks"],
            )
        ).alias("token_ids")
    )
    return (
        docs.select(id_col)
        .join(assembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                "token_ids", F.expr("cast(array() as array<long>)")
            ).alias("token_ids"),
        )
        .withColumn("n_tokens", F.size("token_ids"))
    )


# ------------------------------------------------------- byte-level BPE

#: GPT-2's pretokenization pattern (Radford et al. 2019; the public
#: gpt2/tiktoken regex): contractions, space-prefixed letter/digit/
#: punctuation runs, and whitespace — the ``\s+(?!\S)`` lookahead
#: leaves the LAST space of a run attached to the following word.
#: Java regex (Spark's engine) supports the lookahead; RE2-based
#: engines don't, so oracle-paired gates pass a lookahead-free
#: ``pretoken_re`` instead.
GPT2_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> list[str]:
    """The GPT-2 byte→printable-unicode bijection, index = byte value:
    visible latin-1 bytes map to themselves, everything else (controls,
    space, DEL, 0x7F-0xA0, 0xAD) shifts to U+0100+ so every byte is a
    printable single-char symbol and merge tables stay plain text.
    Space is U+0120 ('Ġ'), newline U+010A ('Ċ') — the familiar GPT-2
    vocab glyphs."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    table = [""] * 256
    for b, c in zip(bs, cs):
        table[b] = chr(c)
    return table


def _sql_str(s: str) -> str:
    """SQL single-quoted literal body for one mapped byte symbol
    (' doubled, backslash escaped — the only two metachars with
    escapedStringLiterals=false)."""
    return s.replace("\\", "\\\\").replace("'", "''")


def _byte_syms(word) -> "F.Column":
    """UTF-8 bytes of a string column as an array of mapped one-char
    symbols — pure JVM: encode → hex → 2-char groups → a 256-entry
    literal-array lookup. No Python in the path.

    Built as ONE parsed expr (r14, guide §7.3): the 256 F.lit calls
    were ~3.1k py4j round-trips per construction; the SQL array of
    string literals parses to the identical CreateArray tree. Falls
    back to the Column build when ``word`` is a compound expression."""
    ref = word if isinstance(word, str) else word._jc.toString()
    if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", ref):
        table_sql = "array(" + ", ".join(
            "'" + _sql_str(c) + "'" for c in bytes_to_unicode()
        ) + ")"
        return F.expr(
            f"transform(regexp_extract_all(hex(encode({ref}, 'UTF-8')), "
            f"'..', 0), h -> element_at({table_sql}, "
            "CAST(conv(h, 16, 10) AS INT) + 1))"
        )
    table = F.array(*[F.lit(c) for c in bytes_to_unicode()])
    hx = F.hex(F.encode(word, "UTF-8"))
    return F.transform(
        F.regexp_extract_all(hx, F.lit(".."), F.lit(0)),
        lambda h: F.element_at(table, F.conv(h, 16, 10).cast("int") + 1),
    )


def byte_initial_vocab(
    docs: DataFrame,
    text_col: str = "text",
    pretoken_re: str = GPT2_PRETOKEN_RE,
) -> DataFrame:
    """(word, count, syms) over GPT-2 pretokens — the byte-level twin
    of :func:`initial_vocab`. Pretokens keep their leading space (the
    regex's job), there is NO end-of-word marker, and ``syms`` is the
    pretoken's UTF-8 bytes through :func:`bytes_to_unicode` — so ANY
    input text segments losslessly (byte fallback: an unseen unicode
    char is just its bytes) and merges never cross pretoken
    boundaries. Same one-corpus-pass cost model as the char form."""
    words = F.regexp_extract_all(
        F.col(text_col), F.lit(pretoken_re), F.lit(0)
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
        .withColumn("syms", _byte_syms(F.col("word")))
    )


def bpe_fit_bytes(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    pretoken_re: str = GPT2_PRETOKEN_RE,
    initial_merges: list[tuple[str, str]] | None = None,
) -> list[tuple[str, str]]:
    """Learn byte-level (GPT-2-form) BPE merges: the SAME greedy loop
    as :func:`bpe_fit` (two vocab-sized jobs per merge), over
    byte-symbol sequences from :func:`byte_initial_vocab`. The 256
    byte symbols make every string tokenizable — no OOV, ever — which
    is why modern LLM pipelines fit this form."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = byte_initial_vocab(docs, text_col, pretoken_re).select(
        "count", "syms"
    )
    return _fit_loop(vocab, n_merges, min_pair_count, initial_merges)


def bpe_segment_corpus_bytes(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    pretoken_re: str = GPT2_PRETOKEN_RE,
) -> DataFrame:
    """(doc_id, tokens, n_tokens) under byte-level merges — the
    GPT-2-form twin of :func:`bpe_segment_corpus` (segment once per
    DISTINCT pretoken, broadcast/hash join back, one doc-keyed
    reassembly shuffle). Because the pretoken regex covers every
    character and the byte map is a bijection, ``concat(tokens)``
    through :func:`bpe_decode_bytes` reproduces the document EXACTLY
    — whitespace included."""
    seg = (
        segment_vocab(
            byte_initial_vocab(docs, text_col, pretoken_re), merges
        )
        .localCheckpoint(eager=True)
        .select("word", F.col("syms").alias("toks"))
    )
    words = F.regexp_extract_all(
        F.col(text_col), F.lit(pretoken_re), F.lit(0)
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "word")
    ).join(seg, "word")
    assembled = exploded.groupBy(id_col).agg(
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


def bpe_decode_bytes(
    seg: DataFrame, tokens_col: str = "tokens", out_col: str = "text"
) -> DataFrame:
    """Token arrays back to the original text: concat → reverse the
    byte map (one JVM ``translate`` — the 256 mapped chars back to
    latin-1 code points) → re-encode latin-1 → decode UTF-8. Pure
    expression chain; exact inverse of segmentation by construction."""
    table = bytes_to_unicode()
    matching = "".join(table)
    replace = "".join(chr(b) for b in range(256))
    s = F.concat_ws("", F.col(tokens_col))
    raw = F.translate(s, matching, replace)
    return seg.withColumn(
        out_col, F.decode(F.encode(raw, "ISO-8859-1"), "UTF-8")
    )
