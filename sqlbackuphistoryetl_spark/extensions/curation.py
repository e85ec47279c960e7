"""Corpus-curation operators for training-data pipelines.

Four curation stages every large pretraining pipeline runs between raw
ingest and tokenization, each expressed as a declarative Spark plan:

- :func:`remove_boilerplate_lines` — CCNet/RefinedWeb-style removal of
  lines repeated across many documents (nav bars, cookie banners,
  license footers) while preserving intra-document line order.
- :func:`select_token_budget` — greedy best-first corpus selection
  under a global token budget (distributed prefix-sum, no single-task
  window).
- :func:`temperature_sample` — multilingual α-temperature sampling
  (rate ∝ count^α / count), the standard fix for low-resource-language
  starvation in mixture weighting.
- :func:`assign_split` — deterministic hash-based train/val/test
  assignment: a row's split is a pure function of (id, salt), stable
  under repartition, retry, and re-run.

Determinism contract (shared with ``extensions/sampling.py``): every
random draw is an md5 of (salt | id) so Spark and the DuckDB oracle
agree byte-for-byte; every threshold is derived from exact integer
arithmetic plus single correctly-rounded IEEE ops (sqrt, one division),
so the per-group rates are bit-identical across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.packing import global_cumsum
from sqlbackuphistoryetl_spark.extensions.sampling import det_key

_HEX_SPACE = 16 ** 8


# ------------------------------------------------------------ boilerplate


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
) -> DataFrame:
    """Strip lines whose trimmed form appears in ≥ ``min_docs`` distinct
    documents; empty/whitespace-only lines are never counted as
    boilerplate (they are structure, not content) and are kept.

    Output: (id_col, clean_text, kept_lines, removed_lines). Documents
    whose every line is boilerplate survive with ``clean_text = ''``.

    Plan shape at scale: posexplode → one (line) hash-aggregate for the
    line document-frequency (map-side partial combine carries (hash,
    count), never the raw corpus), an anti-join of lines against the
    heavy set, and one (doc) aggregate to reassemble. The heavy set is
    bounded above by total_lines / min_docs distinct values and in
    practice is tiny (true boilerplate repeats across thousands of
    docs) — AQE turns the anti-join into a broadcast when it fits.
    Reassembly state per doc is O(doc lines), never corpus-sized.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_norm", F.trim(F.col("_line")))
    heavy = (
        lines.filter(F.col("_norm") != "")
        .groupBy("_norm")
        .agg(F.count_distinct("_id").alias("_ldf"))
        .filter(F.col("_ldf") >= min_docs)
        .select("_norm")
    )
    kept = lines.join(heavy, "_norm", "left_anti")
    # array_sort on array<struct> orders by the leading field (_pos) —
    # unique per doc, so reassembly order is the original line order.
    reassembled = kept.groupBy("_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_lines"),
    )
    totals = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("_total"))
    return (
        totals.join(reassembled, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("kept_lines", F.lit(0)).cast("long").alias("kept_lines"),
            (F.col("_total") - F.coalesce("kept_lines", F.lit(0)))
            .cast("long")
            .alias("removed_lines"),
        )
    )


# ------------------------------------------------------------ token budget


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(doc_id, raw_bytes, zlib_bytes, ratio_ppm) — the "just compress
    it" quality signal (Gopher's repetition appendix; Dolma ships it
    as a first-class filter): template/boilerplate text compresses far
    below prose, and binary-ish noise barely compresses at all, so a
    single integer separates three failure modes the word-level stats
    miss. zlib level is PINNED and the ratio is integer parts-per-
    million, so the signal is deterministic across executors and
    engine-exact in the value hash. Python-bound (stdlib zlib is C,
    microseconds per doc) inside an Arrow ``mapInPandas`` with the
    standard explicit fan-out; NULL/empty text emits NULL stats.

    Not SQL-oracle-checkable (no engine-independent zlib exists in
    SQL) — the driver gate for this op is rows-only by design."""
    import zlib

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("raw_bytes", LongType(), True),
            StructField("zlib_bytes", LongType(), True),
            StructField("ratio_ppm", LongType(), True),
        ]
    )

    def _one(t):
        if t is None:
            return None, None, None
        raw = t.encode("utf-8")
        if not raw:
            return 0, None, None
        z = len(zlib.compress(raw, level))
        return len(raw), z, z * 1_000_000 // len(raw)

    def _batches(it):
        import pandas as pd

        for pdf in it:
            rows = pdf[text_col].map(_one)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": rows.map(lambda r: r[0]).astype("object"),
                    "zlib_bytes": rows.map(lambda r: r[1]).astype("object"),
                    "ratio_ppm": rows.map(lambda r: r[2]).astype("object"),
                }
            )

    return (
        df.select(id_col, text_col)
        # Python-bound stage: explicit fan-out (the r8 trap; guard-tested)
        .repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
        .mapInPandas(_batches, schema)
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    quality_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy best-first selection under a global token budget: walk the
    corpus in (quality desc, id asc) order and keep every document whose
    *inclusive* running token total still fits ``budget``.

    Equivalent SQL: ``sum(tokens) OVER (ORDER BY quality DESC, id)
    <= budget`` — but that window funnels the whole corpus through one
    task. This uses :func:`packing.global_cumsum`'s two-phase prefix sum
    (range repartition + O(partitions) offset job + per-partition
    windows), so cost is one shuffle regardless of corpus size.

    Output: input columns plus ``cum_tokens`` (inclusive running total).
    Note this is take-while, not knapsack: a huge top-quality doc that
    overflows the budget blocks lower-quality docs behind it — the
    standard corpus-selection semantics (budget cuts a quality
    threshold, it doesn't bin-pack).
    """
    if budget < 0:
        raise ValueError("budget must be non-negative")
    ordered = df.withColumn("_negq", -F.col(quality_col))
    c = global_cumsum(ordered, token_col, ["_negq", id_col], num_partitions)
    return (
        c.filter(F.col("cum_end") <= F.lit(int(budget)))
        .withColumnRenamed("cum_end", "cum_tokens")
        .drop("_negq")
    )


# ------------------------------------------------------- temperature mix


#: supported α values → how many nested sqrts build count^α. Each α is
#: a dyadic rational with ≤2 sqrt factors, so every engine computes the
#: identical double (sqrt is the ONLY correctly-rounded transcendental
#: IEEE 754 guarantees; pow() is not, and differs across libms).
_ALPHA_FACTORS: dict[float, tuple[int, ...]] = {
    0.25: (2,),       # sqrt(sqrt(x))
    0.5: (1,),        # sqrt(x)
    0.75: (1, 2),     # sqrt(x) · sqrt(sqrt(x))
}


def _pow_alpha(x: float, alpha: float) -> float:
    """x^α via composed IEEE sqrts — deterministic across engines (each
    step is correctly rounded on an identical input; the final product
    is one more identical IEEE multiply)."""
    out = 1.0
    for depth in _ALPHA_FACTORS[alpha]:
        v = x
        for _ in range(depth):
            v = math.sqrt(v)
        out *= v
    return out


def temperature_rates(
    counts: dict[str, int], target_total: int, alpha: float = 0.5
) -> dict[str, float]:
    """Per-group keep rates for α-temperature sampling: rate_g ∝
    count_g^α / count_g, scaled so expected total kept ≈ target_total
    (before per-group capping at 1.0). α ∈ {0.25, 0.5, 0.75} — the
    dyadic values computable from composed sqrts (see
    ``_ALPHA_FACTORS``); arbitrary α would need pow(), which no engine
    pair computes identically.

    Cross-engine determinism: weights are floor(count^α·scale_adj)
    where every factor is a correctly-rounded IEEE sqrt of an exactly
    representable double. The scale starts at 1e12 and steps down ×100
    until count·scale is exactly representable (< 2^53 — at 1e12 that
    bounds count ≤ ~9000; huge groups just use a coarser scale). floor
    of the identical double is exact, so Python, Spark's driver, and
    DuckDB derive bit-identical integer weights, exact integer sums,
    and a single identical IEEE division for the rate — provided the
    oracle mirrors the same scale and sqrt composition.
    """
    if alpha not in _ALPHA_FACTORS:
        raise ValueError(
            f"alpha must be one of {sorted(_ALPHA_FACTORS)} (dyadic sqrt-"
            f"composable values); got {alpha}"
        )
    scale = 1e12
    # keep count·scale exactly representable as a double
    while counts and max(counts.values()) * scale >= 2 ** 53:
        scale /= 1e2
    weights = {
        g: int(math.floor(_pow_alpha(c * scale, alpha))) for g, c in counts.items()
    }
    denom = sum(weights.values())
    rates = {}
    for g, c in counts.items():
        if c == 0 or denom == 0:
            rates[g] = 0.0
            continue
        rates[g] = min(1.0, (target_total * weights[g]) / (denom * c))
    return rates


def _rate_to_hex(rate: float) -> str:
    n = int(math.floor(rate * float(_HEX_SPACE)))
    return "g" if n >= _HEX_SPACE else format(n, "08x")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    target_total: int,
    id_col: str,
    salt: str = "temp0",
    alpha: float = 0.5,
) -> DataFrame:
    """α-temperature sampling over ``group_col`` (typically language):
    groups are kept at rate ∝ count^α / count, so dominant groups are
    downsampled hard while rare groups are kept (capped at every row).
    Lower α flattens harder (α=0.25 near-equalizes, α=0.75 stays closer
    to natural proportions). The per-row draw is the deterministic md5
    key of ``extensions/sampling.py`` — reproducible across engines and
    runs.

    Plan: one tiny group-count aggregate collected to the driver (a few
    rows — group cardinality, not data), thresholds embedded as a
    literal CASE map, then a map-side filter. No data-sized shuffle.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("c")).collect()
    }
    rates = temperature_rates(counts, target_total, alpha)
    thr = F.lit(None).cast("string")
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(_rate_to_hex(r))).otherwise(thr)
    return df.filter(F.substring(det_key(id_col, salt), 1, 8) < thr)


# ------------------------------------------------------------- tvt split


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split0",
) -> DataFrame:
    """Append a ``split`` column assigning each row to one named bucket
    with the given probabilities, as a pure function of (id, salt).

    Hash-based (not sorted/sliced) so the assignment is stable when the
    corpus grows: adding documents never moves an existing document
    between splits — the property that keeps eval sets frozen across
    corpus versions. Map-side CASE over cumulative md5 thresholds; no
    shuffle.
    """
    total = sum(w for _, w in weights)
    if not math.isclose(total, 1.0, abs_tol=1e-9):
        raise ValueError(f"split weights must sum to 1, got {total}")
    draw = F.substring(det_key(id_col, salt), 1, 8)
    cum = 0.0
    expr = F.lit(weights[-1][0])  # fallback = last bucket (covers rounding)
    cases: list[tuple[str, str]] = []
    for name, w in weights[:-1]:
        cum += w
        cases.append((name, _rate_to_hex(cum)))
    for name, thr in reversed(cases):
        expr = F.when(draw < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


# --------------------------------------------------------- outlier trim


def robust_outlier_bounds(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust bounds median ± k·MAD (median absolute
    deviation) — the outlier fence quality filters prefer over
    mean ± k·σ because a heavy tail corrupts the mean/σ themselves.

    Output: (group_col, med, mad, lo, hi).

    Two grouped exact percentiles (median of values, then median of
    absolute deviations) with a broadcast join between them — group
    cardinality rows, never data-sized. Exact ``percentile`` matches
    DuckDB's ``quantile_cont`` bit-for-bit on integer inputs (the
    token_percentiles precedent); the fence arithmetic is single IEEE
    ops on those identical scalars. At 100 TB swap ``percentile`` for
    ``percentile_approx`` per that precedent.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, 0.5).alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).select(
        group_col,
        F.abs(F.col(value_col).cast("double") - F.col("med")).alias("_ad"),
        "med",
    )
    mad = dev.groupBy(group_col, "med").agg(
        F.percentile("_ad", 0.5).alias("mad")
    )
    return mad.select(
        group_col,
        "med",
        "mad",
        (F.col("med") - F.lit(k) * F.col("mad")).alias("lo"),
        (F.col("med") + F.lit(k) * F.col("mad")).alias("hi"),
    )


def trim_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies within the group's
    median ± k·MAD fence. Broadcast join of the tiny bounds dim +
    map-side filter — the corpus never shuffles."""
    bounds = robust_outlier_bounds(df, group_col, value_col, k)
    return (
        df.join(F.broadcast(bounds), group_col)
        .filter(
            (F.col(value_col).cast("double") >= F.col("lo"))
            & (F.col(value_col).cast("double") <= F.col("hi"))
        )
        .drop("med", "mad", "lo", "hi")
    )


# ------------------------------------------------------- per-group caps


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_cols: list[str],
) -> DataFrame:
    """Keep at most ``n`` rows per group, best-first in ``order_cols``
    (e.g. quality desc) — the RefinedWeb-style per-domain cap that stops
    a single spammy domain from dominating the corpus.

    ``order_cols`` must make the order total (append a unique id) or
    the cap boundary is nondeterministic.

    Plan: rank window on the group key; Spark's WindowGroupLimit
    rewrite runs a PARTIAL top-n inside each input partition BEFORE the
    exchange, so a mega-group ships at most n rows per upstream
    partition — the same pre-shuffle bound `stratified_sample` relies
    on (asserted in tests/test_plans_physical.py).
    """
    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c[1:]).desc() if c.startswith("-") else F.col(c).asc()
          for c in order_cols]
    )
    return (
        df.withColumn("_cap_rk", F.row_number().over(w))
        .filter(F.col("_cap_rk") <= n)
        .drop("_cap_rk")
    )


# ------------------------------------------------------- RAG chunking


def chunk_documents(
    df: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size character windows with optional
    overlap — the RAG-ingestion chunker. Output: (id_col, chunk_id,
    chunk_start, chunk_text); chunk_start is the 0-based char offset,
    chunks advance by ``chunk_chars − overlap`` so consecutive chunks
    share ``overlap`` chars. The final chunk is ragged; empty docs
    yield no chunks.

    Entirely map-side (sequence → substring, whole-stage codegen): no
    shuffle, no UDF. At 100 TB output size is
    O(corpus · chunk/(chunk−overlap)) — the overlap multiplier is
    explicit in the plan, not hidden.
    """
    if chunk_chars <= 0:
        raise ValueError("chunk_chars must be positive")
    if not 0 <= overlap < chunk_chars:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_chars")
    step = chunk_chars - overlap
    # ceil((len − overlap)/step), clamped to ≥1 for any non-empty doc
    # (a doc shorter than the overlap is still one chunk). Integer div —
    # no double round-trip.
    n_chunks = F.when(F.length(text_col) <= 0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.expr(
                f"(length({text_col}) - {overlap} + {step - 1}) div {step}"
            ).cast("int"),
        )
    )
    # sequence(0, -1) would DESCEND (Spark auto-steps); empty docs need
    # an explicitly empty index array
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    out = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idxs,
                lambda i: F.struct(
                    i.alias("chunk_id"),
                    (i * step).alias("chunk_start"),
                    F.substring(
                        F.col(text_col), i * step + 1, chunk_chars
                    ).alias("chunk_text"),
                ),
            )
        ).alias("c"),
    )
    return out.select(
        id_col, "c.chunk_id", "c.chunk_start", "c.chunk_text"
    )


def assign_split_leakage_safe(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split0",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: documents connected by any chain of near-dup pairs
    draw their split from the GROUP's canonical id, so a train doc's
    paraphrase can never sit in test. Documents in no pair fall back to
    their own id — identical to :func:`assign_split` for them (growth
    stability preserved).

    Plan: connected components over the pair set (extensions/
    clustering.py — O(diameter) keyed joins on pairs, never corpus-
    sized), one left join of the tiny component map onto the corpus,
    then the same map-side md5 CASE as ``assign_split`` keyed on
    coalesce(component, own id).
    """
    from sqlbackuphistoryetl_spark.extensions.clustering import (
        connected_components,
    )

    comp = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("node").alias(id_col), F.col("comp").alias("_split_key")
    )
    keyed = df.join(comp, id_col, "left").withColumn(
        "_split_key", F.coalesce("_split_key", F.col(id_col))
    )
    out = assign_split(keyed, "_split_key", weights=weights, salt=salt)
    return out.drop("_split_key")
