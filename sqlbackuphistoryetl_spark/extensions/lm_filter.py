"""CCNet-style n-gram language-model quality filtering (Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"): train a bigram LM over a reference corpus, score every
document's negative log-likelihood, and split each language into
head / middle / tail perplexity buckets. CCNet uses a pruned KenLM;
this is the same recipe re-expressed as Spark aggregates — the LM is a
count table, scoring is a pair of equi-joins, and the bucket split is
a per-language ntile.

Determinism doctrine (repo-wide): doubles only ever come from identical
IEEE ops on identical EXACT inputs. Per-bigram log-likelihoods are
rounded to integer MICRO-NATS (``round(1e6 * ln(...))`` as bigint), so
the per-document sum is an exact integer add — immune to float
summation order — and the per-doc NLL is ONE division of two exact
integers. ln() itself differs across engines only in the last ulp,
which moves the micro-nat rounding only within ~3e-9 of a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: micro-nat scale for integer log-likelihood accumulation
_MICRO = 1_000_000


def _doc_bigrams(
    docs: DataFrame, text_col: str, id_col: str, extra_cols: list[str]
) -> DataFrame:
    """One (doc, w1, w2) row per adjacent whitespace-token pair. The
    words array is bound to a real column BEFORE the zip — expressions
    referenced inside array lambdas re-evaluate per element (the
    gopher_repetition lesson), so the tokenizer must run once per doc,
    not once per position. arrays_zip of two bound slices is
    whole-stage-codegen'd; no shuffle here."""
    words = F.regexp_extract_all(
        F.col(text_col), F.lit(r"\S+"), F.lit(0)
    )
    toks = docs.select(
        F.col(id_col).alias("__doc"), *extra_cols, words.alias("__w")
    )
    w = F.col("__w")
    pairs = F.arrays_zip(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))).alias("w1"),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))).alias("w2"),
    )
    return toks.select(
        "__doc", *extra_cols, F.explode(pairs).alias("p")
    ).select(
        "__doc", *extra_cols,
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, int]:
    """``(bigram_counts, context_counts, vocab_size)`` from a reference
    corpus: ``c12(w1, w2)`` bigram occurrences, ``c1(w1)`` context
    occurrences (bigram LEFT positions — the last token of a doc is not
    a context), and the distinct-token vocabulary size.

    Both count tables are hash aggregates with map-side partial
    combine — the corpus shuffles once as (w1, w2) pairs and once as
    contexts, never as documents. ``min_count`` prunes rare bigrams
    from the table (CCNet ships a PRUNED KenLM for exactly this
    reason); pruned pairs score as unseen. vocab_size is the one
    scalar that returns to the driver.
    """
    big = _doc_bigrams(docs, text_col, id_col, [])
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    if min_count > 1:
        c12 = c12.filter(F.col("c12") >= min_count)
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    vocab = (
        docs.select(F.explode(words).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    return c12, c1, int(vocab)


def score_nll(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document add-one-smoothed bigram negative log-likelihood:

        nll(D) = (1/|B|) * SUM_{(w1,w2) in B} ln((c1 + V) / (c12 + 1))

    with B the doc's adjacent token pairs, V the vocab size, and unseen
    w1/pairs scoring c1 = 0 / c12 = 0 via the left joins. Every addend
    is rounded to integer micro-nats BEFORE summation (``nll_u`` is an
    exact bigint — float-order-free), and ``nll`` is that one integer
    divided by ``1e6 * n_bigrams``. Docs with < 2 tokens surface with
    ``n_bigrams = 0`` and a NULL nll.

    Scale shape: two equi-joins keyed by the bigram / the context —
    corpus-sized but combinable and AQE-skew-splittable; no driver
    state beyond V; no Python. The per-doc reduce is a hash aggregate.
    """
    keep = list(keep_cols or [])
    # keep_cols re-attach from the docs side after the per-doc reduce,
    # so the corpus-sized bigram frames don't carry them through the
    # two count joins (narrower shuffles)
    big = _doc_bigrams(docs, text_col, id_col, [])
    v = F.lit(int(vocab_size)).cast("long")
    scored = (
        big.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        .withColumn(
            "_ll_u",
            F.round(
                F.log(
                    (F.coalesce(F.col("c1"), F.lit(0)) + v)
                    / (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1))
                )
                * F.lit(_MICRO),
                0,
            ).cast("long"),
        )
    )
    # join back on __doc ONLY and carry keep_cols from the docs side
    # (r6 advice): a NULL keep value (e.g. lang NULL) never equi-matches
    # itself, so keying the join on it would resurface a scored doc as
    # n_bigrams = 0 and silently mis-bucket it downstream
    per_doc = scored.groupBy("__doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("_ll_u").alias("nll_u"),
    )
    all_docs = docs.select(
        F.col(id_col).alias("__doc"), *keep
    ).join(per_doc, ["__doc"], "left")
    return all_docs.select(
        F.col("__doc").alias(id_col),
        *keep,
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
            "n_bigrams"
        ),
        F.coalesce(F.col("nll_u"), F.lit(0).cast("long")).alias("nll_u"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("nll_u").cast("double")
            / (F.col("n_bigrams") * F.lit(_MICRO)).cast("double"),
        ).alias("nll"),
    )


def ccnet_bucket(
    scored: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's head/middle/tail split, PER LANGUAGE: rank docs by nll
    ascending (NULLs — unscorable short docs — last, then id for a
    total order) and ntile into ``n_buckets``. bucket 1 = head (most
    fluent under the LM). The window partitions by language, so the
    sort is per-lang distributed, never a single global task; at
    corpus scale swap the exact ntile for approx-percentile cutoffs
    (one scalar agg) — same recipe, sketched bounds."""
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("nll").asc_nulls_last(), F.col(id_col).asc())
    )
    names = {1: "head", 2: "middle", 3: "tail"}
    out = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    if n_buckets == 3:
        out = out.withColumn(
            "bucket_name",
            F.element_at(
                F.array(*[F.lit(names[i]) for i in (1, 2, 3)]), F.col("bucket")
            ),
        )
    return out


def ccnet_perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_count: int = 1,
    n_buckets: int = 3,
) -> DataFrame:
    """The one-call CCNet recipe with the corpus as its own reference
    LM (the common bootstrap when no curated reference exists): train,
    score, bucket. Returns one row per doc: ``(doc_id, lang,
    n_bigrams, nll_u, nll, bucket[, bucket_name])``."""
    c12, c1, v = train_bigram_lm(docs, text_col, id_col, min_count)
    scored = score_nll(
        docs, c12, c1, v, text_col, id_col, keep_cols=[lang_col]
    )
    return ccnet_bucket(scored, lang_col, id_col, n_buckets)


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 100,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information (Church &
    Hanks 1990, "Word Association Norms, Mutual Information, and
    Lexicography") — the classic corpus-statistics pass for surfacing
    multiword expressions ("San Francisco") and boilerplate phrases
    worth inspecting during curation.

        pmi(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) )
                    = ln( (c12 * N * N) / (B * c1 * c2) )

    with c12 the bigram count, c1/c2 full unigram counts, N total
    tokens, B total bigrams. The ratio is assembled as ONE fixed-shape
    double expression (numerator and denominator each a left-assoc
    product of exact-integer-valued doubles), so any engine computing
    the same shape lands on the same IEEE value; the result is rounded
    to integer MICRO-NATS (same doctrine as ``score_nll`` — ln differs
    across engines only in the last ulp, moving the rounding only
    within ~3e-9 of a boundary). ``min_count`` kills the degenerate
    hapax pairs that would otherwise own the top of any PMI ranking.

    Plan shape: unigram and bigram hash-aggs (map-side partials), two
    equi-joins on word keys to attach c1/c2, the two corpus totals ride
    in on a broadcast 1-row frame, and ``orderBy().limit(k)`` compiles
    to TakeOrderedAndProject — bounded per-partition heaps, no global
    sort. Ties break on (w1, w2) for a deterministic cut at rank k.
    """
    big = _doc_bigrams(docs, text_col, id_col, [])
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), F.lit(0))
    uni = docs.select(F.explode(words).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    c12 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .filter(F.col("c12") >= int(min_count))
    )
    totals = F.broadcast(
        uni.agg(F.sum("c").cast("bigint").alias("n_tok")).crossJoin(
            big.agg(F.count(F.lit(1)).cast("bigint").alias("n_big"))
        )
    )
    scored = (
        c12.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(totals)
        .withColumn(
            "pmi_u",
            F.round(
                F.log(
                    (F.col("c12").cast("double") * F.col("n_tok") * F.col("n_tok"))
                    / (F.col("n_big").cast("double") * F.col("c1") * F.col("c2"))
                )
                * 1_000_000.0
            ).cast("bigint"),
        )
    )
    return (
        scored.select("w1", "w2", "c12", "c1", "c2", "pmi_u")
        .orderBy(F.col("pmi_u").desc(), "w1", "w2")
        .limit(int(k))
    )
