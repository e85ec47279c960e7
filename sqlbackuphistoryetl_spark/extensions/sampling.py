"""Deterministic sampling and dataset mixing for training-data curation.

Training pipelines need samples that are (a) reproducible across runs,
engines, and partitionings, and (b) computable in one pass with no
global state. ``rand()`` fails (a) — its value depends on partition
layout and task retries. Everything here keys off ``md5`` of the row's
id instead: the hex digest is defined by the MD5 spec, so Spark, DuckDB,
and any other engine agree byte-for-byte, and a row's keep/drop fate is
a pure function of (id, salt) — stable under repartition, retry, and
re-run. Changing the salt draws an independent sample.

Scale notes (100 TB):
- ``hash_rate_filter`` is a stateless per-row predicate — map-side only,
  zero shuffle, pushes down past column pruning like any filter.
- ``stratified_sample`` shuffles once on the strata key, and Spark's
  WindowGroupLimit rewrite runs a PARTIAL top-k before that exchange —
  each input partition ships at most k rows per stratum, so even a
  mega-stratum never funnels its full row mass through the shuffle
  (asserted in tests/test_plans_physical.py).
- ``weighted_mix`` is a union of rate filters — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # first 8 md5 hex chars ≈ uniform 32-bit draw


def det_key(id_col: str, salt: str) -> Column:
    """Deterministic per-row draw: md5 of salt|id, as lowercase hex.
    Lexicographic order on the fixed-width hex string == numeric order
    on the underlying bits, so it can be compared/sorted as a string in
    any engine without integer-parsing (which engines disagree on)."""
    return F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))


def rate_threshold_hex(rate: float) -> str:
    """8-hex-char threshold such that P[md5 prefix < threshold] == rate
    (to 1/2^32). Clamped to [0, 1]."""
    n = int(max(0.0, min(1.0, rate)) * _HEX_SPACE)
    return "g" if n >= _HEX_SPACE else format(n, "08x")  # 'g' > any hex char


def hash_rate_filter(
    df: DataFrame, rate: float, id_col: str, salt: str = "s0"
) -> DataFrame:
    """Keep each row independently with probability ``rate``,
    deterministically in (id, salt). Map-side predicate; no shuffle."""
    if rate >= 1.0:
        return df
    thr = rate_threshold_hex(rate)
    return df.filter(F.substring(det_key(id_col, salt), 1, 8) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    salt: str = "s0",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — the k smallest md5
    draws, which is a uniform without-replacement sample of the stratum.
    Ties are impossible in practice (md5 collision); id breaks them
    deterministically anyway so the result is always a function of the
    input set only."""
    w = Window.partitionBy(*strata_cols).orderBy(
        det_key(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_srk", F.row_number().over(w))
        .filter(F.col("_srk") <= k)
        .drop("_srk")
    )


def global_sample_k(
    df: DataFrame,
    k: int,
    id_col: str,
    salt: str = "g0",
) -> DataFrame:
    """Exactly min(k, N) rows drawn uniformly without replacement from
    the WHOLE dataset — the k smallest md5 draws over all rows, so the
    sample is a pure function of (input set, salt): reproducible across
    engines, partitionings, and retries, and refreshable by changing the
    salt.

    Plan shape (the reason this exists as an operator): ``orderBy(key)
    .limit(k)`` compiles to ``TakeOrderedAndProject`` — every input
    partition keeps only its own top-k in a bounded heap and ships at
    most k rows to a single k·partitions merge. No global sort, no
    single-task window, no full-data shuffle; at 100 TB the network cost
    is O(k · partitions) rows regardless of input size. (The
    ``row_number() OVER (ORDER BY ...)`` formulation funnels every row
    through one task — the plan this avoids.)
    """
    return df.orderBy(det_key(id_col, salt).asc(), F.col(id_col).asc()).limit(k)


def weighted_mix(
    sources: list[tuple[str, DataFrame, float]],
    id_col: str,
    salt: str = "m0",
) -> DataFrame:
    """Mix datasets at per-source sampling rates: each (name, df, rate)
    contributes a deterministic ``rate`` fraction of its rows, tagged
    with ``source`` and ``epoch`` columns. The per-source salt is
    derived from the source name so sources draw independently even
    over shared ids.

    This is the rate-based form of training-mixture weighting ("books
    ×2.5 epochs, web ×0.3"): rate > 1 upsamples — floor(rate) full
    copies (epoch = 0..n-1) plus a deterministic Bernoulli(frac) draw
    of the remainder (epoch = n), each epoch drawing with its own salt.
    Expected multiplicity of every row is exactly ``rate``; still a
    union of map-side filters, no shuffle."""
    out: DataFrame | None = None
    for name, df, rate in sources:
        n_full = int(rate)
        parts = [(e, 1.0) for e in range(n_full)]
        frac = rate - n_full
        if frac > 0:
            parts.append((n_full, frac))
        for epoch, r in parts:
            s = hash_rate_filter(df, r, id_col, salt=f"{salt}|{name}|{epoch}")
            s = s.withColumn("source", F.lit(name)).withColumn(
                "epoch", F.lit(epoch)
            )
            out = s if out is None else out.unionByName(s)
    if out is None:
        raise ValueError("weighted_mix: no sources given")
    return out


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    salt: str = "w0",
) -> DataFrame:
    """Exactly min(k, N) rows drawn WITHOUT replacement with probability
    proportional to ``weight_col`` — the Efraimidis–Spirakis A-ES
    scheme: each row keys as ln(u)/w with u a deterministic uniform
    draw, and the k LARGEST keys are the sample (equivalent ordering to
    the textbook u^(1/w); the log form avoids pow's precision cliff for
    tiny weights).

    Deterministic in (input set, salt): u derives from the md5 key, so
    the sample survives repartition/retry/re-run and any engine
    reproduces it (ln on identical doubles — the tfidf transcendental
    precedent; rows whose keys differ by < 1 ulp could in principle
    flip between engines, vanishingly rare and caught by the oracle
    gate if it ever occurs).

    Plan: ``orderBy(key desc).limit(k)`` compiles to
    TakeOrderedAndProject — per-partition bounded heaps, O(k·parts)
    network, no global sort (the global_sample_k plan). Zero-weight
    rows never selected ahead of positive-weight rows (key −∞).
    """
    u = (
        F.conv(F.substring(det_key(id_col, salt), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(_HEX_SPACE + 1))  # u ∈ (0, 1]
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.log(u) / w).otherwise(F.lit(float("-inf")))
    return (
        df.withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_wkey")
    )


def _hashed_gram_buckets(
    docs: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """One ``(doc, bucket)`` row per unigram AND bigram occurrence,
    bucketed by the first 8 md5 hex chars mod ``n_buckets`` — the
    hashed bag-of-n-grams featurization of DSIR (Xie et al. 2023).
    md5 (not xxhash64) so any engine reproduces the buckets. The gram
    arrays are built from a BOUND words column (map-side, no shuffle;
    the gopher_repetition per-element-re-eval lesson)."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    toks = docs.select(
        F.col(id_col).alias("__doc"), *(extra_cols or []), words.alias("__w")
    )
    w = F.col("__w")
    tail = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(w, 1, tail).alias("a"), F.slice(w, 2, tail).alias("b")
        ),
        lambda p: F.concat_ws(" ", p["a"], p["b"]),
    )
    return toks.select(
        "__doc", *(extra_cols or []),
        F.explode(F.concat(w, bigrams)).alias("gram"),
    ).select(
        "__doc", *(extra_cols or []),
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long"),
            F.lit(int(n_buckets)),
        ).alias("bucket"),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): fit
    add-one-smoothed hashed bag-of-n-grams models on the TARGET (the
    distribution you want) and the RAW corpus, then weigh each raw doc
    by its gram-wise log probability ratio.

    Returns ``(doc_id, n_feats, logw_u)``: ``logw_u`` is the log-ratio
    sum in integer MICRO-NATS — each bucket's delta is rounded once,
    so the per-doc sum is an exact bigint, immune to float summation
    order (the repo determinism doctrine; see lm_filter).

    Scale shape: two corpus-shuffle hash aggregates (bucket counts,
    map-side combinable), a ≤ ``n_buckets``-row delta table that joins
    back BROADCAST, and one per-doc hash aggregate. Driver state is
    two scalar totals. No Python anywhere.
    """
    rawg = _hashed_gram_buckets(raw, n_buckets, text_col, id_col)
    tgtg = _hashed_gram_buckets(target, n_buckets, text_col, id_col)
    # one gram pass per corpus (r6 advice): the bucket tables are
    # <= n_buckets rows, so pin THEM and derive the scalar totals as
    # tiny sums over them — rawg is then evaluated once here and once
    # in the final per-doc join, never a third time for a count().
    # r14: BOTH corpora count through ONE source-tagged aggregation —
    # one checkpoint barrier + one scalar collect instead of two of
    # each (guide §2.1/§5: same shuffled bytes, half the eager jobs
    # serializing the driver). cq/cp per bucket are unchanged (rows
    # never mix across the tag), and a target-only bucket's cp rides
    # as 0 exactly where the old left join produced coalesce(NULL,0).
    both = rawg.select("bucket", F.lit(1).alias("_s")).unionByName(
        tgtg.select("bucket", F.lit(0).alias("_s"))
    )
    cnt = (
        both.groupBy("bucket")
        .agg(
            F.expr("sum(CASE WHEN _s = 1 THEN 1 ELSE 0 END)").alias("cq"),
            F.expr("sum(CASE WHEN _s = 0 THEN 1 ELSE 0 END)").alias("cp"),
        )
        .localCheckpoint(eager=True)
    )
    tot = cnt.agg(F.sum("cq"), F.sum("cp")).collect()[0]
    tq, tp = tot[0] or 0, tot[1] or 0
    # identical expression shape to the oracle: two double divisions,
    # one ln, one round — on exact integer inputs
    b = float(n_buckets)
    delta = cnt.filter(F.col("cq") >= 1).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("cp") + F.lit(1.0)) / F.lit(float(tp) + b))
                / ((F.col("cq") + F.lit(1.0)) / F.lit(float(tq) + b))
            )
            * F.lit(1_000_000.0),
            0,
        )
        .cast("long")
        .alias("du"),
    )
    return (
        rawg.join(F.broadcast(delta), "bucket")
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("du").alias("logw_u"),
        )
        .withColumnRenamed("__doc", id_col)
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR's selection step: Gumbel-top-k over the importance
    log-weights — sampling k docs WITHOUT replacement with probability
    proportional to their importance ratio (the Gumbel-max trick; the
    md5 draw makes it deterministic in (id, salt), same contract as
    ``weighted_sample_k``). ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — bounded per-partition heaps, no global
    sort. Returns ``(doc_id, n_feats, logw_u)`` for the selected k."""
    lw = dsir_logweights(raw, target, n_buckets, text_col, id_col)
    u = (
        F.conv(F.substring(det_key(id_col, salt), 1, 8), 16, 10).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(float(_HEX_SPACE))  # u ∈ (0, 1) strictly: gumbel finite
    gumbel = -F.log(-F.log(u))
    key = F.col("logw_u").cast("double") / F.lit(1_000_000.0) + gumbel
    return (
        lw.withColumn("_gkey", key)
        .orderBy(F.col("_gkey").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_gkey")
    )


def unimax_allocation(
    df: DataFrame,
    total_budget: int,
    max_epochs: int = 3,
    lang_col: str = "lang",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining").

    Splits a total training-token budget across languages as uniformly
    as possible, subject to a per-language repeat cap: no language may
    contribute more than ``max_epochs`` passes over its corpus. The
    classic waterfilling solution — walk languages in ascending order
    of capacity; a language whose cap is below the current fair share
    takes its full cap and donates the leftover to the rest — has a
    closed form over prefix sums, so the whole allocation is ONE window
    computation, not an iterative driver loop:

        capped(i)  <=>  cap_i * (n - i + 1) <= B - prefix_caps(i-1)

    (cross-multiplied integer comparison — no rational arithmetic, the
    same doctrine as ``gopher_quality_flags``). Uncapped languages
    split the remainder evenly: ``(B - sum capped caps) div n_uncapped``
    (integer floor; engines agree for non-negative operands).

    Scale notes: the per-language token counts are one hash-agg over
    the corpus (map-side partials); the waterfilling window then runs
    over ``n_languages`` rows — hundreds, not corpus-sized — so its
    single-task window is bounded and cheap. Overflow bound:
    ``cap * n_langs`` must fit int64 — fine through ~4e15 corpus
    tokens * 1000 languages.

    Output: one row per language —
    (lang, corpus_tokens, cap_tokens, is_capped, alloc_tokens).
    """
    cnt = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.sum(F.col(weight_col)).cast("bigint").alias("corpus_tokens")
    )
    cap = cnt.withColumn(
        "cap_tokens", F.col("corpus_tokens") * F.lit(int(max_epochs))
    )
    order = Window.orderBy("cap_tokens", "lang")
    everything = order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = F.lit(int(total_budget))
    w = (
        cap.withColumn("_pos", F.row_number().over(order))
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("cap_tokens").over(order.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(everything))
        .withColumn(
            "is_capped",
            (
                F.col("cap_tokens") * (F.col("_n") - F.col("_pos") + 1)
                <= b - F.col("_prefix")
            ).cast("int"),
        )
    )
    s = (
        w.withColumn("_m", F.sum("is_capped").over(everything))
        .withColumn(
            "_s_m",
            F.sum(
                F.when(F.col("is_capped") == 1, F.col("cap_tokens")).otherwise(0)
            ).over(everything),
        )
    )
    alloc = F.when(F.col("is_capped") == 1, F.col("cap_tokens")).otherwise(
        F.expr(f"({int(total_budget)} - _s_m) div (_n - _m)")
    )
    return s.select(
        "lang",
        "corpus_tokens",
        "cap_tokens",
        "is_capped",
        alloc.cast("bigint").alias("alloc_tokens"),
    )
