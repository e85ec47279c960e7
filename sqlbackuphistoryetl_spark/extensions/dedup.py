"""Near-duplicate detection at corpus scale.

Four tiers, all expressed with JVM-side built-ins (no Python UDFs):

- exact: md5 hash-groupBy (see __spark_entry__.dedup_exact).
- MinHash + LSH banding: shingle → per-seed min-hash signature →
  band-bucket join → candidate pairs. Cost is O(docs × shingles) map +
  one shuffle per stage; the *pair* space is only materialized inside
  LSH buckets, never the N² cross join.
- SimHash: token-hash bit aggregation → bucket by bit-bands →
  Hamming-distance filter via xor/bit_count.
- exact n-gram Jaccard verification for candidate pairs (the precise
  re-rank after the approximate recall stage).

Scale notes: every stage is a groupBy/join on bounded keys; skew from
a hot shingle/band is handled by AQE skew-join; signatures are fixed
width (num_hashes longs) so shuffle rows are small and dense.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions import cachereg


def _spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    in fewer partitions (small-file corpus → 1-2 splits), which would
    serialize the CPU-bound tokenize/hash map stages on one core. No-op
    on inputs that are already well split (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key_col)
    return df


def _shingle_array(text_col: str, k: int):
    """Distinct k-char shingles as an array column — sequence+substring
    (whole-stage codegen; no UDF, no explode). One parsed expr (r14,
    guide §7.3) when the column name is a plain identifier; identical
    sequence/substring tree either way."""
    if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", text_col):
        return F.expr(
            f"array_distinct(transform(sequence(1, greatest(1, "
            f"length({text_col}) - {k - 1})), "
            f"i -> substring({text_col}, i, {k})))"
        )
    n_pos = F.greatest(F.lit(1), F.length(text_col) - F.lit(k - 1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.substring(F.col(text_col), i, k),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_len: int = 5,
) -> DataFrame:
    """(id, sig array<long>): per-seed min over xxhash64(seed, shingle).

    Plan: explode to (id, shingle-hash) rows, then ONE Tungsten
    hash-aggregate computing all per-seed minima — so the pipeline
    shuffles once here ((id, 8-byte hash) rows, with map-side partial
    min combining) and once more for the LSH band join. The shuffled
    payload is the hashed shingle stream, not the text. (A zero-shuffle
    higher-order-function variant exists but measured 2×-6× slower —
    see the inline note; the explode+agg plan is the deliberate choice.)
    """
    # explode + Tungsten hash-aggregate: one codegen'd pass computing all
    # per-seed minima. Measured faster than every higher-order-function
    # variant (HOF lambdas are interpreted, and projection collapse
    # re-evaluates inlined array exprs — 2×-6× slower at sf0.1).
    #
    # Shingling is CPU-bound: a small-file corpus arrives in 1-2 input
    # partitions, which would serialize the whole map stage — spread it
    # across the cluster first. (No-op cost relative to the hash work.)
    df = _spread(df, id_col)
    # One strong hash per shingle, then num_hashes cheap derived hashes
    # of that 8-byte value: hashing the variable-length shingle string
    # once instead of num_hashes times measured 2× faster end-to-end at
    # 200k docs. xxhash64(seed, xxhash64(shingle)) is still a uniform
    # per-seed family; 64-bit pre-hash collisions are negligible.
    shingled = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_shingle_array(text_col, shingle_len)).alias("_shingle"),
    ).select("_id", F.xxhash64("_shingle").alias("_sh"))
    # ALL num_hashes minima as ONE parsed SQL string — py4j round-trip
    # economy (see simhash_signatures). array(min(...), ...) in a
    # single agg Column splits into the same per-seed min aggregate
    # functions with the array built in the aggregate's result
    # projection — one plan node fewer than the agg-then-select form,
    # same aggregation, same values.
    return shingled.groupBy("_id").agg(
        F.expr(
            "array("
            + ", ".join(
                f"min(xxhash64({seed}, _sh))" for seed in range(num_hashes)
            )
            + ")"
        ).alias("sig")
    )


def _band_entries(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, sig, band, bucket) LSH band rows for a signature frame."""
    rows_per_band = num_hashes // bands
    # one parsed expr (r14, guide §7.3): identical transform/struct/
    # xxhash64 tree to the former per-band Column chain
    bb = F.expr(
        f"transform(sequence(0, {bands - 1}), b -> named_struct("
        f"'band', b, 'bucket', xxhash64(concat_ws(',', "
        f"transform(slice(sig, b * {rows_per_band} + 1, {rows_per_band}), "
        f"h -> CAST(h AS STRING))))))"
    )
    return sigs.select(
        "_id", "sig", F.explode(bb).alias("bb")
    ).selectExpr("_id", "sig", "bb.band AS band", "bb.bucket AS bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 5,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) with the signature-estimated
    Jaccard. Pairs only form inside an LSH band bucket."""
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_len)

    band_entries = _band_entries(sigs, num_hashes, bands)

    # Both self-join sides consume band_entries; without a barrier the
    # whole shingle→signature pipeline runs twice (exchange reuse does
    # not fire across the aliased sides) — persisting measured 1.5×
    # faster end-to-end at 200k docs. Rows are narrow (id, 32 longs,
    # band, bucket); MEMORY_AND_DISK spills gracefully. Cache lifetime
    # is generation-scoped: the next call releases this one's blocks
    # (see cachereg; release_caches() for explicit cleanup).
    cachereg.begin("minhash_lsh")
    band_entries = cachereg.persist("minhash_lsh", band_entries)

    left = band_entries.alias("l")
    right = band_entries.alias("r")
    pairs = (
        left.join(
            right,
            F.expr("l.band = r.band AND l.bucket = r.bucket AND l._id < r._id"),
        )
        .selectExpr(
            "l._id AS id_a",
            "r._id AS id_b",
            "CAST(size(filter(zip_with(l.sig, r.sig, (a, b) -> a = b), "
            f"x -> x)) AS DOUBLE) / {float(num_hashes)!r}D AS est_jaccard",
        )
        # est_jaccard filter BEFORE the pair dedup: the signature
        # agreement count is computed map-side on the join output, so
        # random-collision candidates (est ≈ background jaccard) die
        # where they are produced instead of shipping through the
        # dropDuplicates shuffle. With recall-conservative banding
        # (many narrow bands) the candidate mass is large and almost
        # entirely below threshold — measured 30 s → ~4 s at sf0.1.
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def shingle_jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exact k-char-shingle Jaccard for candidate pairs — the precise
    re-rank over the SAME set definition MinHash estimates (so a
    banding stage with 100% recall followed by this verify equals the
    exact all-pairs computation bit-for-bit).

    Shingle arrays are materialized ONLY for docs that appear in a
    candidate pair (one semi-join before the explode-free array build):
    candidates are a vanishing fraction of the corpus, so this turns
    two full-corpus shingle passes into two candidate-sized ones —
    measured ~2s → ~0.6s on the sf0.1 gate, and at 100 TB it is the
    difference between re-reading the corpus and touching only the
    near-dup cluster docs. ``pairs`` is materialized first: it feeds
    both the id set and the final join, and without a barrier the whole
    candidate-generation subplan would execute twice (measured 2× on
    the n-gram gate)."""
    cachereg.begin("shingle_verify")
    # registered persist, not localCheckpoint: the barrier blocks get an
    # owner (releasable, recomputable) instead of waiting on GC. The
    # count() materializes the cache BEFORE the two consumers plan
    # against it — concurrent stages racing an unfilled cache can both
    # compute a partition (Spark block writes are first-wins, not
    # locked), which is the double execution the barrier exists to stop.
    pairs = cachereg.persist("shingle_verify", pairs)
    pairs.count()
    cand_ids = (
        pairs.select(F.col("id_a").alias("_sid"))
        .union(pairs.select(F.col("id_b").alias("_sid")))
        .distinct()
    )
    sh = (
        df.join(cand_ids, df[id_col] == cand_ids["_sid"], "left_semi")
        .select(F.col(id_col).alias("_sid"), _shingle_array(text_col, k).alias("sh"))
    )
    # both join sides consume sh — persist or the candidate-doc shingle
    # arrays compute twice (the same diamond as the band joins)
    sh = cachereg.persist("shingle_verify", sh)
    a, b = sh.alias("sa"), sh.alias("sb")
    return (
        pairs.join(a, pairs["id_a"] == F.col("sa._sid"))
        .join(b, pairs["id_b"] == F.col("sb._sid"))
        .selectExpr(
            "id_a",
            "id_b",
            "CAST(size(array_intersect(sa.sh, sb.sh)) AS DOUBLE)"
            " / size(array_union(sa.sh, sb.sh)) AS jaccard",
        )
    )


def ngram_jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact token-n-gram Jaccard for candidate pairs (precise re-rank).

    array_intersect/array_union on distinct n-gram sets — built-ins only;
    the join fans each pair to its two docs' gram sets. Gram sets are
    built only for docs appearing in a candidate pair (semi-join first,
    with ``pairs`` materialized once — see shingle_jaccard_verify), not
    for the whole corpus twice.
    """
    cachereg.begin("ngram_verify")
    # registered persist + eager count: see shingle_jaccard_verify
    pairs = cachereg.persist("ngram_verify", pairs)
    pairs.count()
    cand_ids = (
        pairs.select(F.col("id_a").alias("_gid"))
        .union(pairs.select(F.col("id_b").alias("_gid")))
        .distinct()
    )
    candidates_only = df.join(
        cand_ids, df[id_col] == cand_ids["_gid"], "left_semi"
    )
    gram_df = _gram_sets(candidates_only, text_col, id_col, n)
    gram_df = cachereg.persist("ngram_verify", gram_df)
    a = gram_df.alias("ga")
    b = gram_df.alias("gb")
    return (
        pairs.join(a, pairs["id_a"] == F.col("ga._gid"))
        .join(b, pairs["id_b"] == F.col("gb._gid"))
        .selectExpr(
            "id_a",
            "id_b",
            "CAST(size(array_intersect(ga.grams, gb.grams)) AS DOUBLE)"
            " / size(array_union(ga.grams, gb.grams)) AS jaccard",
        )
    )


def _gram_sets(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, grams array<string>): distinct lowercase token n-grams.

    The token array is bound as a real column in a FIRST projection and
    only the attribute is referenced inside the transform lambda:
    higher-order-function lambdas re-evaluate captured expressions per
    element (no CSE), so inlining ``split(...)`` there re-splits the
    whole string once per gram position — O(len²) per doc. Multiple
    non-cheap references also stop CollapseProject from re-inlining."""
    tref = (
        text_col
        if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", text_col)
        else f"`{text_col}`"
    )
    toks = df.select(
        F.col(id_col).alias("_gid"),
        F.expr(rf"split(trim(lower({tref})), '\\s+')").alias("_toks"),
    )
    # one parsed expr (r14, guide §7.3): identical CASE/transform/
    # concat_ws tree to the former Column chain
    grams = F.expr(
        f"array_distinct(CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n}))) "
        f"ELSE array(concat_ws(' ', _toks)) END)"
    )
    return toks.select("_gid", grams.alias("grams"))


def ngram_jaccard_all_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.0,
    max_gram_df: int | None = None,
    rescore_candidates_only: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard for every pair sharing ≥1 gram — inverted-
    index formulation: explode grams, equi-join on the gram, count
    shared grams per pair, then |A∩B|/(|A|+|B|-|A∩B|).

    ``rescore_candidates_only`` (capped path): when True, the exact
    re-score assembles gram arrays ONLY for docs appearing in a
    candidate pair (checkpoint the pair set, semi-join the posting
    list). That is the production-corpus shape — at web scale the
    near-dup candidates are a sliver of the corpus, and the
    corpus-sized collect_list shuffle is the dominant cost the
    restriction removes. When False (default), gram arrays build over
    the whole (persisted) posting list with NO barrier job — measured
    ~25% faster on corpora where the candidate set spans most docs
    (the gate slice: 6.8 s vs 5.1 s), which is also the regime where
    the restriction cannot help. Identical output either way.

    Scale: never ships gram arrays through the pair join and never forms
    zero-overlap pairs — the join is an equi-join on the gram value, so
    work is Σ_g df(g)². Two reductions keep that sum honest at corpus
    scale (r5 verdict task 2): (1) grams with df=1 — the overwhelming
    majority of a real corpus's gram mass — are filtered out BEFORE the
    self-join (they cannot form a pair; exactness unchanged), via one
    reusable per-gram df aggregate; (2) ``max_gram_df`` applies the
    standard inverted-index stop-gram bound for the df² blowup no
    skew-split can reduce ("the quick" at web scale): grams with
    df > max_gram_df are dropped from CANDIDATE GENERATION, and — only
    when such hot grams actually exist — surviving candidate pairs are
    re-scored EXACTLY over their full gram sets, so reported jaccard
    values are identical to the uncapped path. When no gram exceeds the
    cap, the candidate counts are already exact and the re-score is
    skipped. The only loss is pairs whose every shared gram is hot — at
    a sane cap (say df > 10⁴) such pairs sit far below any useful
    similarity threshold. With ``max_gram_df=None`` the fully exact
    one-join formulation runs.

    Pairs with no shared gram have jaccard 0 and are (correctly)
    absent; callers wanting them use min_jaccard=0 semantics downstream.
    """
    # Persist the narrow (id, gram) posting list: three subplans consume
    # it (both join sides + sizes) and without a materialization barrier
    # each re-runs tokenize→gram — measured 15× slower at sf0.1. The
    # posting list is the dataset's distinct-gram mass; MEMORY_AND_DISK
    # spills gracefully when a big corpus exceeds executor memory (at
    # real 100 TB scale, stage it to a temp table instead). Lifetime is
    # generation-scoped via cachereg (next call releases this one).
    cachereg.begin("ngram_jaccard")
    # explode_outer, NOT explode: _gram_sets arrays are non-empty by
    # construction (the otherwise-branch mints a 1-element array), so
    # output is identical — but plain explode triggers
    # InferFiltersFromGenerate, whose `size(grams) > 0` filter inlines
    # the WHOLE tokenize+transform gram expression below the _spread
    # exchange (double-evaluated on the raw scan's 1-2 partitions):
    # measured 3.6 s → 0.16 s for this posting build at sf0.1 (r13).
    posting = cachereg.persist(
        "ngram_jaccard",
        _gram_sets(_spread(df, id_col), text_col, id_col, n)
        .select("_gid", F.explode_outer("grams").alias("gram")),
    )

    # Per-gram document frequency — ONE partially-aggregated (map-side
    # combined, skew-safe) pass reused for BOTH stop-gram detection and
    # the df>=2 pair-ability filter. A gram appearing in one document
    # can't form a pair, and in a real corpus MOST gram mass is df=1
    # (7.4M of 7.6M distinct grams at the 200k-doc scale smoke), so
    # dropping it before the self-join removes ~97% of the join input.
    gram_df = cachereg.persist(
        "ngram_jaccard",
        posting.groupBy("gram").agg(F.count(F.lit(1)).alias("_df")),
    )
    if max_gram_df is None:
        pairable = gram_df.filter(F.col("_df") >= 2)
        has_hot = False
    else:
        pairable = gram_df.filter(
            (F.col("_df") >= 2) & (F.col("_df") <= max_gram_df)
        )
        # Driver decision on the persisted aggregate: when NO gram
        # exceeds the cap (the common case at sane caps), the
        # string-joined candidate counts are already exact over every
        # gram, so the array re-score stage is skipped entirely
        # (measured 13 s of 49 s at the 200k smoke).
        has_hot = (
            gram_df.filter(F.col("_df") > max_gram_df).limit(1).count() > 0
        )

    # Candidate join input: posting reduced to pairable grams. The
    # semi-join is AQE-broadcastable when the pairable set is small
    # (df>=2 grams are the near-dup sliver); joining on the gram STRING
    # keeps counts exact — the old 64-bit-hash narrowing is moot now
    # that df=1 mass never reaches the shuffle.
    # Eager materialization before the broadcast build: feeding the
    # filtered cached aggregate straight into the broadcast exchange
    # measured ~7 s of inline build at the 200k smoke vs 0.7 s
    # materialized + 1.8 s probe. Pairable is the near-dup gram sliver
    # (df >= 2), bounded and executor-distributed. A registered persist,
    # NOT localCheckpoint: the checkpoint's storage blocks were owned by
    # nobody (GC-timing cache leak, caught by the cache-accounting
    # test), and unpersisting a checkpoint would break the release
    # contract — persist keeps lineage, so a released frame recomputes.
    pairable = cachereg.persist("ngram_jaccard", pairable.select("gram"))
    pairable.count()
    join_src = posting.join(F.broadcast(pairable), "gram", "left_semi")

    if max_gram_df is not None and has_hot:
        a, b = join_src.alias("a"), join_src.alias("b")
        cand = (
            a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a._gid") < F.col("b._gid")))
            .select(F.col("a._gid").alias("id_a"), F.col("b._gid").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        # Exact re-score over the FULL gram sets (rebuilt from the
        # persisted posting list — one keyed shuffle, no re-tokenize):
        # values match the uncapped path bit-for-bit. NOTE the re-score
        # must stay ARRAY-based (array_intersect per pair): a count-join
        # over the full posting list would reintroduce the hot-gram
        # Σ df(g)² blowup the cap exists to avoid (measured 30% slower
        # even on the 500-doc gate slice). See the docstring for the
        # candidate-restricted variant trade-off.
        by_doc_src = posting
        if rescore_candidates_only:
            # candidate set feeds both the id semi-join and the re-score
            # join — barrier it or the capped pair join executes twice
            cand = cachereg.persist("ngram_jaccard", cand)
            cand.count()
            cand_ids = (
                cand.select(F.col("id_a").alias("_gid"))
                .union(cand.select(F.col("id_b").alias("_gid")))
                .distinct()
            )
            by_doc_src = posting.join(cand_ids, "_gid", "left_semi")
        by_doc = cachereg.persist(
            "ngram_jaccard",
            by_doc_src.groupBy("_gid").agg(
                F.collect_list("gram").alias("grams")
            ),
        )  # aliased into both re-score sides — barrier the collect_list
        ga, gb = by_doc.alias("ga"), by_doc.alias("gb")
        out = (
            cand.join(ga, cand["id_a"] == F.col("ga._gid"))
            .join(gb, cand["id_b"] == F.col("gb._gid"))
            .select(
                "id_a",
                "id_b",
                (
                    F.size(F.array_intersect("ga.grams", "gb.grams")).cast("double")
                    / F.size(F.array_union("ga.grams", "gb.grams"))
                ).alias("jaccard"),
            )
        )
        # Kept from the hash-join era as a zero-cost invariant guard:
        # candidates now string-join on true grams, so every pair
        # shares >=1 gram and jaccard is provably > 0 here.
        out = out.filter(F.col("jaccard") > 0)
        if min_jaccard > 0:
            out = out.filter(F.col("jaccard") >= min_jaccard)
        return out

    # Direct-count path: uncapped, or capped with no hot gram — either
    # way the candidate counts over join_src are exact for every gram.
    sizes = cachereg.persist(
        "ngram_jaccard",
        posting.groupBy("_gid").agg(F.count(F.lit(1)).alias("n_grams")),
    )  # consumed by both the id_a and id_b size joins
    a, b = join_src.alias("a"), join_src.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a._gid") < F.col("b._gid")))
        .groupBy(F.col("a._gid").alias("id_a"), F.col("b._gid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("_gid").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("_gid").alias("id_b"), F.col("n_grams").alias("nb"))
    out = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_containment: float = 0.5,
    max_gram_df: int | None = None,
    rescore_candidates_only: bool = False,
) -> DataFrame:
    """ASYMMETRIC n-gram containment for every pair sharing ≥1 gram:
    c(A→B) = |A∩B| / |A| — the sub-document duplication measure Jaccard
    misses (a paragraph quoted inside a much larger page has tiny
    Jaccard but containment ≈ 1 from the paragraph's side). The
    standard screen for boilerplate inclusion, quotation chains, and
    near-superset pages in training corpora.

    Output: (id_a, id_b, shared, n_a, n_b, containment_a, containment_b)
    for pairs where max(c_a, c_b) ≥ ``min_containment``; id_a < id_b.

    Scale shape = the inverted-index Jaccard (one posting-list
    materialization, equi-join on the gram, Σ df(g)² bounded by the
    same df>=2 pair-ability filter and ``max_gram_df`` stop-gram cap —
    see ngram_jaccard_all_pairs). Containment needs only shared counts
    + per-doc set sizes, so no gram arrays ever ship through the pair
    join. With a cap set AND hot grams actually present, surviving
    pairs are re-counted over the full posting list so values stay
    exact; when no gram exceeds the cap the string-joined candidate
    counts are already exact and the re-score is skipped (the 200k-doc
    smoke's 62 s → ~17 s cut, r5 verdict task 2).
    """
    cachereg.begin("ngram_containment")
    # explode_outer: identical output (non-empty arrays) and no
    # InferFiltersFromGenerate double-eval — see the jaccard twin.
    posting = cachereg.persist(
        "ngram_containment",
        _gram_sets(_spread(df, id_col), text_col, id_col, n)
        .select("_gid", F.explode_outer("grams").alias("gram")),
    )
    sizes = cachereg.persist(
        "ngram_containment",
        posting.groupBy("_gid").agg(F.count(F.lit(1)).alias("n_grams")),
    )  # consumed by both the n_a and n_b joins

    # Per-gram df: stop-gram detection + df>=2 pair-ability filter in
    # one reusable partial-aggregated pass (see ngram_jaccard_all_pairs).
    gram_df = cachereg.persist(
        "ngram_containment",
        posting.groupBy("gram").agg(F.count(F.lit(1)).alias("_df")),
    )
    if max_gram_df is None:
        pairable = gram_df.filter(F.col("_df") >= 2)
        has_hot = False
    else:
        pairable = gram_df.filter(
            (F.col("_df") >= 2) & (F.col("_df") <= max_gram_df)
        )
        has_hot = (
            gram_df.filter(F.col("_df") > max_gram_df).limit(1).count() > 0
        )
    # Eager materialization before the broadcast build — registered
    # persist, not localCheckpoint, for the same ownership/release
    # reasons as the jaccard twin above.
    pairable = cachereg.persist("ngram_containment", pairable.select("gram"))
    pairable.count()
    join_src = posting.join(F.broadcast(pairable), "gram", "left_semi")

    a, b = join_src.alias("a"), join_src.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a._gid") < F.col("b._gid")),
        )
        .groupBy(F.col("a._gid").alias("id_a"), F.col("b._gid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    if max_gram_df is not None and has_hot:
        # exact re-count of shared grams over the UNCAPPED gram sets —
        # capped counts only generate candidates, they never leave this
        # function. ARRAY intersect per pair, not a posting count-join:
        # the full posting includes the hot grams, and re-joining on
        # them would pay the Σ df(g)² blowup the cap exists to avoid.
        # ``rescore_candidates_only`` trades a barrier + semi-join for a
        # candidate-mass (vs corpus-mass) collect_list — same trade-off
        # as ngram_jaccard_all_pairs (see its docstring).
        by_doc_src = posting
        if rescore_candidates_only:
            cand = cachereg.persist("ngram_containment", cand)  # consumed twice
            cand.count()
            ids = (
                cand.select(F.col("id_a").alias("_gid"))
                .union(cand.select(F.col("id_b").alias("_gid")))
                .distinct()
            )
            by_doc_src = posting.join(ids, "_gid", "left_semi")
        by_doc = cachereg.persist(
            "ngram_containment",
            by_doc_src.groupBy("_gid").agg(
                F.collect_list("gram").alias("grams")
            ),
        )  # aliased into both re-count sides
        ga, gb = by_doc.alias("ga"), by_doc.alias("gb")
        cand = (
            cand.select("id_a", "id_b")
            .join(ga, F.col("id_a") == F.col("ga._gid"))
            .join(gb, F.col("id_b") == F.col("gb._gid"))
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("ga.grams", "gb.grams")).alias("shared"),
            )
            # Invariant guard (candidates string-join on true grams, so
            # the exact re-count is provably >=1 — kept from the
            # hash-join era at zero cost).
            .filter(F.col("shared") > 0)
        )

    za = sizes.select(F.col("_gid").alias("id_a"), F.col("n_grams").alias("n_a"))
    zb = sizes.select(F.col("_gid").alias("id_b"), F.col("n_grams").alias("n_b"))
    out = (
        cand.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            "n_a",
            "n_b",
            (F.col("shared").cast("double") / F.col("n_a")).alias("containment_a"),
            (F.col("shared").cast("double") / F.col("n_b")).alias("containment_b"),
        )
    )
    return out.filter(
        F.greatest("containment_a", "containment_b") >= min_containment
    )


def pair_source_matrix(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    jaccard_col: str = "jaccard",
    scale: int = 1_000_000,
) -> DataFrame:
    """Cross-source duplication matrix — the curation REPORT built on
    top of any pair stage (exact n-gram Jaccard, MinHash, SimHash,
    embedding near-dup): for every unordered source pair, how many
    near-duplicate pairs link them and how similar they are. This is
    what answers "which crawls re-scraped each other" / "is the new
    source mostly copies of an old one" before deciding a mix.

    ``pairs`` must expose (id_a, id_b, <jaccard_col>). Two keyed
    equi-joins pull each side's source label through the narrow
    (id, source) projection — never broadcast (at 100 TB the corpus
    side is the big one; AQE picks the build side per join), never
    carrying text. The source pair is canonicalized with
    least/greatest so (A,B) and (B,A) land in one cell. Similarity is
    aggregated as a SUM of ``floor(j·scale + 0.5)`` longs — exact,
    aggregation-order independent, cross-engine reproducible; consumers
    divide ``qjaccard_sum / (n_pairs · scale)`` for the mean.

    Output: (source_a, source_b, n_pairs, qjaccard_sum).
    """
    s = docs.select(F.col(id_col), F.col(source_col))
    a = s.select(
        F.col(id_col).alias("id_a"), F.col(source_col).alias("_sa")
    )
    b = s.select(
        F.col(id_col).alias("id_b"), F.col(source_col).alias("_sb")
    )
    q = F.floor(F.col(jaccard_col) * scale + F.lit(0.5)).cast("long")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            q.alias("_qj"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_qj").alias("qjaccard_sum"),
        )
    )


_COUNTER_BITS = 16          # packed per-bit counter width
_PER_LONG = 4               # counters per 64-bit aggregate
_MAX_TOKENS = (1 << _COUNTER_BITS) - 1  # counter overflow guard


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    ngram_n: int | None = None,
) -> DataFrame:
    """(id, simhash long): sign-aggregated token-hash bits.

    ``ngram_n``: hash token n-grams instead of single tokens. When the
    downstream similarity target is n-gram Jaccard (as in the exact
    verify stage), sketching the SAME feature set widens the Hamming
    gap dramatically: single-token features are shared across a common-
    vocabulary corpus, correlating sketch bits between unrelated docs
    (measured: ~1M background pairs within Hamming 12 at 5k docs),
    while n-grams are mostly doc-specific so unrelated docs sit near
    Hamming 32 (measured: ~3k candidates within 15 on the same corpus,
    with true near-dups still ≤ 11).

    explode → Tungsten hash-aggregate, with per-bit counters PACKED four
    to a long (16 bits each): bits//4 SUM aggregates instead of one per
    bit — the bit sums can't carry into each other because a doc's
    token count is capped at 65535 (longer docs are truncated; a 64-bit
    sketch saturates long before that). Bit i of the sketch is set iff
    more than half the tokens have bit i set (2·count > n, identical to
    the ±1-sum sign). Verified bit-identical to the unpacked form.

    64 bits (not 32) is the scale-correct default: with 16-bit LSH
    bands the bucket space is 65536/band, so expected bucket occupancy
    stays O(N/65536) — at 200k docs the 32-bit/8-bit-band configuration
    measured 78M candidate pairs (128 s); 64/16 keeps candidates linear.
    """
    # Tokenize+aggregate is CPU-bound and a small-file corpus arrives in
    # 1-2 input partitions, serializing the whole map stage on one core
    # (same guard as minhash_signatures; measured 2-4× on sf0.1).
    df = _spread(df, id_col)
    if ngram_n is not None:
        tokens = (
            _gram_sets(df, text_col, id_col, ngram_n)
            .select(
                F.col("_gid").alias("_id"),
                F.explode(F.slice("grams", 1, _MAX_TOKENS)).alias("_tok"),
            )
            .select("_id", F.xxhash64("_tok").alias("_h"))
        )
    else:
        tokens = df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.slice(F.split(F.lower(F.col(text_col)), r"\s+"), 1, _MAX_TOKENS)
            ).alias("_tok"),
        ).select("_id", F.xxhash64("_tok").alias("_h"))
    groups = bits // _PER_LONG
    # The packed-counter aggregates and the final bit-vote projection are
    # 64-term expression trees; building them one Column method call at a
    # time cost ~10k py4j round-trips (~3.5 s of driver time PER QUERY
    # CONSTRUCTION, measured r13). Each is now ONE SQL string handed to
    # F.expr — a single round-trip and parse producing the IDENTICAL
    # expression tree (optimized plan verified byte-equal modulo expr
    # ids, results bit-identical; the Column form is what these strings
    # transliterate).
    aggs = [
        F.expr(
            "sum("
            + " + ".join(
                f"shiftleft(shiftright(_h, {j * _PER_LONG + m}) & 1, {_COUNTER_BITS * m})"
                for m in range(_PER_LONG)
            )
            + ")"
        ).alias(f"_g{j}")
        for j in range(groups)
    ]
    sums = tokens.groupBy("_id").agg(*aggs, F.count(F.lit(1)).alias("_n"))
    counter_mask = (1 << _COUNTER_BITS) - 1
    packed = F.expr(
        " | ".join(
            f"(CASE WHEN (shiftright(_g{j}, {_COUNTER_BITS * m}) & {counter_mask})"
            f" * 2 > _n THEN shiftleft(CAST(1 AS BIGINT), {j * _PER_LONG + m})"
            f" ELSE CAST(0 AS BIGINT) END)"
            for j in range(groups)
            for m in range(_PER_LONG)
        )
    )
    return sums.select("_id", packed.alias("simhash"))


def simhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    band_bits: int = 16,
    max_hamming: int = 3,
    ngram_n: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on any identical bit-band, then
    exact Hamming ≤ max_hamming via xor + bit_count.

    bits/band_bits defaults give 4 bands of 16 bits: pigeonhole
    guarantees every pair within hamming 3 shares at least one band,
    and 2^16 buckets per band keeps bucket occupancy (and therefore the
    candidate-pair join) linear in corpus size.

    ``ngram_n`` selects n-gram sketch features (see
    ``simhash_signatures``) — use it whenever the downstream similarity
    is n-gram Jaccard; it keeps narrow-band configurations (needed for
    high max_hamming coverage) selective instead of flooding the
    candidate join with vocabulary-correlated background pairs."""
    sigs = simhash_signatures(df, text_col, id_col, bits, ngram_n=ngram_n)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    # bands unrolled statically (shiftright's shift amount must be a
    # Python int, not a Column) — as ONE parsed SQL string, not n_bands
    # Column-built structs (py4j round-trip economy, see
    # simhash_signatures)
    banded = sigs.select(
        "_id",
        "simhash",
        F.expr(
            "explode(array("
            + ", ".join(
                f"struct({b} AS band,"
                f" shiftright(simhash, {b * band_bits}) & {mask} AS bucket)"
                for b in range(n_bands)
            )
            + "))"
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bucket")
    # Same barrier as the MinHash band join: both self-join sides consume
    # banded, and without a persist the tokenize→hash-aggregate signature
    # pipeline runs twice. Rows are narrow (id, 2 longs, band). Lifetime
    # is generation-scoped via cachereg (next call releases this one).
    cachereg.begin("simhash")
    banded = cachereg.persist("simhash", banded)
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        # Hamming filter BEFORE the pair dedup: bit_count is map-side and
        # kills the (band-occupancy)² candidate mass where it is produced,
        # so the dropDuplicates shuffle only ever sees true near-dup
        # pairs. With small band spaces (recall-conservative gate
        # configs) this is the difference between shuffling ~10M rows
        # and ~10² at 5k docs — measured 38 s → ~3 s at sf0.1.
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_cross(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 5,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Incremental (cross-corpus) near-dup candidates: each ``incoming``
    document against the ``existing`` corpus — the dedup shape of a
    production ingest, where a new crawl batch is screened against
    petabytes of already-accepted data WITHOUT re-pairing the existing
    corpus with itself.

    Same banding machinery as ``minhash_lsh_candidates`` but the band
    join is between the two corpora's band entries, so cost is
    O(|incoming| + collisions), never O(|existing|²). At 100 TB the
    existing side's band entries are the precomputable, bucketed-by-
    (band, bucket) index a dedup service keeps warm; here both sides
    are built in one job.

    Output: (incoming_id, existing_id, est_jaccard), distinct pairs,
    estimate-filtered before the pair-dedup shuffle (collision mass
    dies map-side, as in the within-corpus path).
    """
    in_sigs = minhash_signatures(incoming, text_col, id_col, num_hashes, shingle_len)
    ex_sigs = minhash_signatures(existing, text_col, id_col, num_hashes, shingle_len)
    cachereg.begin("minhash_lsh_cross")
    in_bands = cachereg.persist(
        "minhash_lsh_cross", _band_entries(in_sigs, num_hashes, bands)
    )
    ex_bands = cachereg.persist(
        "minhash_lsh_cross", _band_entries(ex_sigs, num_hashes, bands)
    )
    l, r = in_bands.alias("l"), ex_bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket")),
        )
        .select(
            F.col("l._id").alias("incoming_id"),
            F.col("r._id").alias("existing_id"),
            (
                F.size(
                    F.filter(
                        F.zip_with(F.col("l.sig"), F.col("r.sig"), lambda a, b: a == b),
                        lambda x: x,
                    )
                ).cast("double")
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["incoming_id", "existing_id"])
    )


# ---------------------------------------------------------------- chunk dedup


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> DataFrame:
    """C4/CCNet-style duplicate-span removal: split every document's
    whitespace tokens into consecutive non-overlapping ``chunk_tokens``
    windows, keep only the corpus-wide FIRST occurrence of each exact
    chunk (ordered by (doc, chunk index)), and reassemble each document
    from its surviving chunks in original order.

    Returns ``(doc_id, n_chunks, n_kept, clean_text)`` — one row per
    input document (documents whose every chunk was dropped, or that
    had no tokens at all, come back with ``n_kept = 0`` and
    ``clean_text = ''``).

    Scale shape: tokenize/chunk is a pure map stage (whole-stage
    codegen, no UDF); first-occurrence election is ONE window shuffle
    keyed by the chunk hash (bounded key space, AQE handles a hot
    boilerplate chunk); reassembly is ONE groupBy on the doc id. The
    pair space is never materialized — cost is O(total tokens), not
    O(docs²), which is what makes paragraph-style dedup feasible at
    100 TB where pairwise comparison is not.
    """
    toks = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.ceil(F.size("toks") / F.lit(float(chunk_tokens)))
        .cast("int")
        .alias("n_chunks"),
    )
    # guard: sequence(0, -1) would DESCEND in Spark — empty docs get an
    # empty chunk array instead and rejoin at the end with clean_text ''
    chunk_arr = F.when(
        F.col("n_chunks") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("n_chunks") - 1),
            lambda i: F.array_join(
                F.slice("toks", i * chunk_tokens + 1, chunk_tokens), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chunked = base.select(
        "doc_id", "n_chunks", F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    )
    from pyspark.sql import Window

    first = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    kept = (
        chunked.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        base.select("doc_id", "n_chunks")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------- bloom filter


def _bloom_probes(key: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of k bit positions for a key — md5-derived so any engine
    reproduces them bit-for-bit (the first 8 md5 hex chars are a
    uniform 32-bit draw; ``m_bits`` must stay well under 2^32)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda s: F.conv(
            F.substring(
                F.md5(F.concat_ws("|", key.cast("string"), s.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % F.lit(m_bits),
    )


def bloom_bitmap(
    df: DataFrame,
    key_col: str = "content_md5",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom-filter bitmap over ``key_col`` as a TINY DataFrame
    of ``(word_idx int, word long)`` — at most ``m_bits/32`` rows, so a
    filter sized for billions of keys (10 bits/key ≈ 1% fp) is a few
    GiB of longs: broadcastable, persistable as parquet, and cheap to
    rebuild incrementally (bit_or of old and new bitmaps).

    The build is one map stage (k md5s per key, no UDF) plus ONE
    hash aggregation on ``word_idx`` — map-side partial bit_or does
    almost all the work, so shuffle volume is O(m_bits), independent
    of input row count.
    """
    probes = df.select(
        F.explode(_bloom_probes(F.col(key_col), m_bits, k_hashes)).alias("pos")
    )
    return (
        probes.select(
            (F.col("pos") / F.lit(32)).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    incoming: DataFrame,
    bloom: DataFrame,
    key_col: str = "content_md5",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Pre-filter for incremental dedup against a huge existing corpus:
    adds ``might_exist`` to ``incoming`` — false means DEFINITELY new
    (no false negatives, ever), true means probably-seen and worth the
    expensive exact anti-join / pair verification.

    At 100 TB this is the cheap first gate: the bitmap broadcast-joins
    (it is at most m_bits/32 rows), each incoming key is k probe rows,
    and the verdict folds back with one bool_and aggregation on the
    incoming key — the full existing corpus is never re-read. Routing
    only ``might_exist`` rows into ``minhash_lsh_cross`` /
    ``idempotent_append`` turns the per-batch cost from
    O(existing + incoming) into O(incoming + true-dup collisions).
    """
    probes = incoming.select(
        F.col(key_col).alias("_bk"),
        F.explode(_bloom_probes(F.col(key_col), m_bits, k_hashes)).alias("pos"),
    ).select(
        "_bk",
        (F.col("pos") / F.lit(32)).cast("int").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
    )
    verdicts = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "_bk",
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("hit"),
        )
        .groupBy("_bk")
        .agg(F.bool_and("hit").alias("might_exist"))
    )
    return incoming.join(
        verdicts, incoming[key_col] == verdicts["_bk"], "left"
    ).drop("_bk")


# ------------------------------------------------------- duplicated spans


def duplicated_window_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    min_occurrences: int = 2,
    cross_doc_only: bool = False,
    hash_windows: bool = False,
) -> DataFrame:
    """Exact duplicated-substring spans, the sliding-window form of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2022): every duplicated token run of length >= ``window_tokens``
    contains at least one duplicated exact window of that length, so
    marking duplicated windows and merging the adjacent hits per
    document recovers the maximal duplicated spans without a suffix
    array.

    Returns ``(doc_id, span_start, span_end, span_tokens, n_windows)``
    — one row per maximal duplicated span, token positions 0-based
    inclusive. ``min_occurrences`` is the corpus-wide occurrence bar
    for a window (within-doc repeats count); ``cross_doc_only=True``
    additionally requires the window to appear in >= 2 distinct docs.

    Scale shape: the explode emits one row per token position (O(total
    tokens), never O(docs²)); duplicate election is ONE shuffle keyed
    by the window, and the island merge is ONE shuffle keyed by the doc
    id. With the default exact windows the election shuffle carries the
    window text (O(corpus bytes · window_tokens / stride-1) — exact,
    gate-checkable); at corpus scale pass ``hash_windows=True`` to ship
    64-bit xxhash64 keys instead (a collision can only mint one false
    ``window_tokens``-long span per colliding pair, p ≈ 2^-64 — the
    C4 ``chunk_dedup`` above accepts the same trade on md5).
    A hot boilerplate window is a skewed election key: AQE's skew
    handling splits it, and ``collect_set`` in the cross-doc path is
    bounded by the distinct-doc count of that window.
    """
    from pyspark.sql import Window

    L = int(window_tokens)
    if L < 1:
        raise ValueError("window_tokens must be >= 1")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
    ).filter(F.size("_toks") >= L)
    tokens = F.col("_toks")
    wins = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - L),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, L)),
    )
    exploded = toks.select("doc_id", F.posexplode(wins).alias("pos", "win"))
    if hash_windows:
        exploded = exploded.select(
            "doc_id", "pos", F.xxhash64("win").alias("win")
        )
    we = Window.partitionBy("win")
    occ = F.count(F.lit(1)).over(we)
    hits = exploded.withColumn("_occ", occ)
    if cross_doc_only:
        hits = hits.withColumn("_nd", F.size(F.collect_set("doc_id").over(we)))
        hits = hits.filter(
            (F.col("_occ") >= min_occurrences) & (F.col("_nd") >= 2)
        )
    else:
        hits = hits.filter(F.col("_occ") >= min_occurrences)
    # maximal-span merge (r6 advice): two duplicated windows at pos p
    # and p' > p cover one contiguous duplicated region iff p' <= p + L
    # (their [pos, pos+L-1] intervals overlap or touch). All intervals
    # share length L and pos is unique per doc, so the running-max
    # interval merge reduces to a lag() gap test — stride-1 islands
    # (pos - row_number) would emit OVERLAPPING rows for gaps in 2..L,
    # double-counting span_tokens for callers that sum or cut spans.
    wd = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(wd)
    isl = hits.withColumn(
        "_new", F.when(gap.isNull() | (gap > L), 1).otherwise(0)
    ).withColumn(
        "_grp",
        F.sum("_new").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("doc_id", "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).alias("span_end"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_windows",
        )
    )


def edit_distance_join(
    df: DataFrame,
    max_dist: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT edit-distance similarity self-join — every pair with
    ``levenshtein(a, b) <= max_dist`` — via PassJoin segment indexing
    (Li, Deng, Feng 2011, "PASS-JOIN: A Partition-based Method for
    Similarity Joins"): partition each string into ``d+1`` contiguous
    segments; if ed(s, t) <= d, the edit script touches at most d of
    them, so at least one segment survives UNTOUCHED and appears in t
    verbatim, shifted by at most ±d (net indels before it). Candidates
    are therefore an EQUI-join on (claimed-length, segment-index,
    segment-text) — 100% recall by pigeonhole, no similarity sketch —
    then one levenshtein verify. Both Spark and DuckDB ship the same
    unit-cost levenshtein, which is what makes the operator
    oracle-checkable end to end.

    Returns ``(id_a, id_b, ed)`` with ``id_a < id_b``.

    Scale shape: the segment index is d+1 short rows per string; the
    probe side uses PassJoin's multi-match-aware substring selection —
    O(d²) SHORT substring keys per string instead of the naive
    (offset × segment × ±d) O(d³) enumeration, all map-side;
    candidates shuffle once on the segment key
    carrying IDS ONLY (full texts join back just for the verified
    candidate set). Strings shorter than d+1 chars can't be segmented;
    any qualifying partner is then <= 2d chars, so the <= 2d-char
    stragglers pair off in a tiny length-bucketed cross join (empty
    for real corpora at small d — documented cost O(|tiny|²)).
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    d = int(max_dist)
    parts = d + 1
    strs = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).cast("int").alias("__len"),
    )

    # segment bounds as SQL strings (r14, guide §7.3): the former
    # per-call Column chains (plus a 5-deep withColumn chain below,
    # each re-analyzing the accumulated plan) were ~2.5k py4j
    # round-trips per construction; the parsed trees are identical
    # (floor/Divide by the same double literal, CAST AS INT).
    fp = repr(float(parts))

    def _bound_sql(i: str, L: str) -> tuple[str, str]:
        start = f"CAST(floor({i} * {L} / {fp}D) AS INT)"
        nxt = f"CAST(floor(({i} + 1) * {L} / {fp}D) AS INT)"
        return start, f"({nxt} - {start})"

    seggable = strs.filter(F.col("__len") >= parts)
    segs = seggable.select(
        "__id", "__t",
        F.col("__len").alias("L"),
        F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
    )
    s_start, s_len = _bound_sql("i", "L")
    segs = segs.selectExpr(
        "__id AS sid", "L", "i",
        f"substring(__t, {s_start} + 1, {s_len}) AS seg",
    )

    probes = (
        seggable.select(
            "__id", "__t", "__len",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("o"),
        )
        .selectExpr("__id", "__t", "__len", "__len + o AS L")
        .filter(f"L >= {parts}")
        .select(
            "__id", "__t", "__len", "L",
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
        )
    )
    p_start, p_len = _bound_sql("i", "L")
    # multi-match-aware substring selection (the paper's Lemma 3; r6
    # verdict task 3): with Δ = |probe| − |indexed|, segment i (0-based)
    # of the indexed string can only match the probe at
    #   q ∈ [p − i, p + i] ∩ [p + Δ − (d−i), p + Δ + (d−i)]
    # — the prefix shift is bounded by the errors the first i segments
    # can absorb and the suffix shift by the last d−i. Per-probe key
    # count drops from (2d+1)(d+1)(2d+1) = O(d³) to O(d²) (~4.5× fewer
    # at d=3), fuzz-verified 100% recall vs the ±d window.
    probes = (
        probes.selectExpr(
            "__id", "__t", "__len", "L", "i",
            f"{p_start} AS p",
            f"{p_len} AS slen",
        )
        .selectExpr(
            "__id", "__t", "__len", "L", "i", "p", "slen",
            f"greatest(0, p - i, p + (__len - L) - ({d} - i)) AS qlo",
            f"least(__len - slen, p + i, p + (__len - L) + ({d} - i)) AS qhi",
        )
        .filter("qhi >= qlo")
        .select(
            "__id", "__t", "L", "i", "slen",
            F.explode(F.expr("sequence(qlo, qhi)")).alias("q"),
        )
        .selectExpr(
            "__id AS pid", "L", "i",
            "substring(__t, q + 1, slen) AS seg",
        )
    )

    cand = (
        segs.join(probes, ["L", "i", "seg"])
        .filter(F.col("sid") < F.col("pid"))
        .select("sid", "pid")
        .distinct()
    )

    tiny = strs.filter(F.col("__len") <= 2 * d)
    tiny_cand = (
        tiny.select(F.col("__id").alias("sid"), F.col("__len").alias("_la"))
        .crossJoin(
            tiny.select(F.col("__id").alias("pid"), F.col("__len").alias("_lb"))
        )
        .filter(
            (F.col("sid") < F.col("pid"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= d)
        )
        .select("sid", "pid")
    )

    a = strs.select(F.col("__id").alias("sid"), F.col("__t").alias("_ta"))
    b = strs.select(F.col("__id").alias("pid"), F.col("__t").alias("_tb"))
    # thresholded levenshtein = banded DP, O(d·n) per verify instead of
    # O(n²) (returns -1 above the bound — exact within it), the verify-
    # stage half of PassJoin's cost model
    return (
        cand.unionByName(tiny_cand)
        .distinct()
        .join(a, "sid")
        .join(b, "pid")
        .withColumn("ed", F.levenshtein("_ta", "_tb", d))
        .filter(F.col("ed") >= 0)
        .select(
            F.col("sid").alias("id_a"),
            F.col("pid").alias("id_b"),
            F.col("ed").cast("int").alias("ed"),
        )
    )
