"""Benchmark-contamination detection for training corpora.

The standard decontamination pass in LLM data pipelines: flag every
training document that shares at least one word n-gram with a held-out
benchmark/eval set. The engine-level shape mirrors the reference's
anti-join idempotency semantics (sql:33 ignore_dup_key — membership
against a keyed set decides a row's fate) lifted to set-of-ngrams
membership.

Scale shape (the part that must survive 100 TB):

- The benchmark side is tiny relative to the corpus (eval suites are
  thousands of docs, the corpus is billions) — its DISTINCT n-gram set
  is built once and **broadcast**, so the corpus-side probe is a
  map-side hash lookup: no shuffle ever carries corpus text or corpus
  grams. With a non-broadcastable benchmark, the same plan degrades to
  a shuffled hash join on the gram key (set ``broadcast_bench=False``).
- Corpus grams are deduped per document map-side (``array_distinct``
  before the explode), so the probe volume is bounded by distinct
  grams per doc, and the per-doc aggregate after the join is a
  map-side-partial count keyed by doc id.
- n is a parameter: production decontamination uses n=8..13 (spurious
  collisions vanish); the gate uses n=3 so the synthetic corpus
  actually exhibits overlap worth hash-checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_arrays(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(_id, grams): distinct word n-grams per doc, lowercased,
    whitespace-tokenized. Pure map-side higher-order functions — the
    token array is bound as a real column first (HOF lambdas have no
    CSE; referencing an unaliased array re-evaluates it per element)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda s: s != ""
    )
    bound = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    grams = F.when(
        F.size("_toks") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice("_toks", i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return bound.select("_id", grams.alias("_grams"))


def contamination_overlap(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per training doc: how many of its distinct word n-grams appear
    anywhere in the benchmark set.

    Returns (id_col, n_ngrams, n_contaminated, contaminated_frac) for
    EVERY train doc (zero-hit docs included — the caller turns the frac
    into a drop/keep threshold). ``contaminated_frac`` is an
    exact-int ÷ exact-int double, bit-identical across engines.
    """
    train_grams = _gram_arrays(train, text_col, id_col, n)
    bench_grams = (
        _gram_arrays(bench, text_col, id_col, n)
        # outer + isNotNull ≡ explode (elements never null): dodges
        # the InferFiltersFromGenerate size(_grams)>0 double-eval of
        # the gram build (r13; see dedup.py posting note)
        .select(F.explode_outer("_grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)

    # SINGLE corpus pass: per-doc total rides along each probe row
    # (explode_outer keeps zero-gram docs as one null-gram row), the
    # bench membership is a LEFT broadcast join marker, and one
    # map-side-partial aggregate per doc recovers (total, hits) — no
    # second gram computation, no join-back for zero-hit docs.
    probes = train_grams.select(
        "_id",
        F.size("_grams").alias("_n_ngrams"),
        F.explode_outer("_grams").alias("gram"),
    )
    out = (
        probes.join(bench_grams, "gram", "left")
        .groupBy("_id")
        .agg(
            F.first("_n_ngrams").alias("n_ngrams"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_ngrams",
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.greatest(F.col("n_ngrams"), F.lit(1))
            ).alias("contaminated_frac"),
        )
    )
    return out
