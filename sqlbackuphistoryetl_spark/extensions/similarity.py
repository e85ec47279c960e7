"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k, queries broadcast against
  the corpus — the correctness baseline. Dot products via
  zip_with/aggregate (JVM higher-order functions, no Python).
- ``rp_lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path.
  Each vector gets a b-bit sign sketch from deterministic pseudo-random
  hyperplanes; candidates only form inside matching buckets (optionally
  multi-probe via band splits), then exact cosine re-ranks.

Scale notes: brute force is O(Q × N) — fine for small Q (broadcast),
never for Q ≈ N. The LSH variant's shuffle is O(N × bands) rows of
(id, bucket) — linear, and the per-bucket candidate join is bounded by
bucket occupancy; skewed buckets are split by AQE.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions import cachereg
from sqlbackuphistoryetl_spark.functions.exprcache import column_memo


#: bare-identifier test for the expr-string fast paths below: a column
#: that *prints* as a plain attribute name can be embedded in a parsed
#: SQL string verbatim (the parse yields the same UnresolvedAttribute)
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _sql_ref(c) -> str | None:
    """SQL text for a column argument when it is (or prints as) a plain
    identifier; None for compound expressions, which keep the Column
    build. Every internal call site passes a bare ``F.col(name)``."""
    name = c if isinstance(c, str) else c._jc.toString()
    return name if _IDENT.match(name) else None


def _dot(a, b):
    # cast BEFORE multiplying: float32 elements widen exactly to double,
    # so the products (and therefore cosines) are bit-comparable with
    # any engine that computes in double — a float32 multiply followed
    # by a cast bakes in ~1e-7 relative error that can flip a rounded
    # 6dp digit at the oracle compare.
    #
    # Construction fast path (r14, guide §7.3): ONE parsed SQL string
    # instead of ~175 py4j round-trips of higher-order-function Column
    # calls. The parse yields the identical ArrayAggregate/ZipWith tree
    # (0.0D is the double literal F.lit(0.0) embeds; CAST is the same
    # Cast node) — plan-pinned by tests/test_plans_physical.py.
    ra, rb = _sql_ref(a), _sql_ref(b)
    if ra and rb:
        return F.expr(
            f"aggregate(zip_with({ra}, {rb}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            "(acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    r = _sql_ref(v)
    if r:
        return F.expr(
            f"sqrt(aggregate(transform({r}, x -> "
            "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, "
            "(a, x) -> a + x))"
        )
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )


def _spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrives in
    fewer partitions (a small-file corpus lands in 1-2 splits), which
    would serialize the CPU-bound sketch/norm map stage on one core.
    No-op on well-split inputs (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key_col)
    return df


def _unit(v):
    """L2-normalized copy of an array<float> column (double elements).

    Higher-order functions are interpreted with no cross-iteration CSE,
    so naively embedding ``_norm(v)`` in the element lambda re-evaluates
    the full aggregate per element — O(dims²) per vector. The outer
    single-element ``transform`` here is an expression-level let-binding:
    the norm is evaluated once per row and the inner lambda references
    the bound variable. (The hot approximate paths don't normalize at
    all — they ship a scalar norm column and score ``dot/(na·nb)``.)"""
    return F.get(
        F.transform(
            F.array(_norm(v)),
            lambda n: F.transform(v, lambda x: x.cast("double") / n),
        ),
        0,
    )


def with_cosine(df: DataFrame, left_vec: str, right_vec: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out,
        _dot(F.col(left_vec), F.col(right_vec))
        / (_norm(F.col(left_vec)) * _norm(F.col(right_vec))),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (cosine, self excluded).

    Output: query_id, neighbor_id, cosine, rank — deterministic
    tie-break by neighbor id.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("q_vec"), F.col("c_vec"))
                    / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive / dense-retrieval training
    (the in-batch-negatives refinement of Karpukhin et al. 2020, DPR):
    for each query vector, the top-k most-similar corpus vectors with a
    DIFFERENT label, each annotated with how close it sits to the
    query's best same-label positive:

        margin = cos(query, best positive) - cos(query, negative)

    Small (or negative) margins are the hard negatives worth training
    on; large margins are easy negatives. ONE scoring pass computes
    both sides: norms are hoisted to per-row columns BEFORE the pair
    join (the SemDeDup hoist — per-pair cost is one dot + one divide,
    and hoisting changes no IEEE value because each norm is the same
    ops on the same operands, just evaluated once), then a single
    query-partitioned Window both ranks the different-label rows and
    takes the same-label max (``pos``) over the whole partition —
    no second scoring pass, no rejoin. Queries ride in on a broadcast,
    so the pair stage is one broadcast-nested-loop join — the same
    shape as :func:`brute_force_topk`; swap it for the IVF/LSH
    candidate path at corpus scale.

    Determinism contract (oracle-gated): ranks use full-precision
    cosine (identical IEEE ops on identical inputs); emitted cosines
    and margins are rounded to 6 dp, ties break on neighbor id.

    Output: (query_id, neighbor_id, neighbor_label, cosine, rank,
    pos_cosine, margin) — ``pos_cosine``/``margin`` NULL when a query
    has no same-label positive.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("q_label"),
            F.col(vec_col).alias("q_vec"),
        ).withColumn("q_norm", _norm(F.col("q_vec")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("c_vec"),
    ).withColumn("c_norm", _norm(F.col("c_vec")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    is_neg = F.col("neighbor_label") != F.col("q_label")
    ranked = (
        scored.withColumn(
            "_pos_full",
            F.max(F.when(~is_neg, F.col("cosine"))).over(w_all),
        )
        .filter(is_neg)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        "query_id",
        "neighbor_id",
        "neighbor_label",
        F.round("cosine", 6).alias("cosine"),
        "rank",
        F.round("_pos_full", 6).alias("pos_cosine"),
        F.round(
            F.round("_pos_full", 6) - F.round("cosine", 6), 6
        ).alias("margin"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009,
    "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
    Learning Methods") — the standard way to combine heterogeneous
    retrieval systems (BM25 + dense ANN, multiple ANN probes, ...)
    without score calibration:

        rrf(d) = SUM_lists 1 / (k + rank_list(d))

    over the UNION of the input lists; a document missing from a list
    contributes nothing for it. k=60 is the published default that
    damps the head of each list.

    Determinism contract: each ``1/(k + rank)`` is one IEEE division of
    exact integers, and the per-document sum folds the lists in ARGUMENT
    ORDER (double addition is not associative), so any engine summing in
    the same list order lands on the same double. Ties at a top-n cut
    break on the id.

    Inputs are top-N lists — per-system bounded frames; the heavy
    lifting (BM25 scoring, ANN search) happens upstream in the systems
    being fused. The merge is a UNION + one hash-aggregate pivot on the
    id (equi full-outer joins can't broadcast in Spark, so the naive
    N−1 join chain sort-merges even bounded lists; the union shape is
    one exchange total and indifferent to N). Each list is assumed to
    rank a document at most once.

    Output: ``(id_col, rank_1..rank_N, rrf)`` with ranks NULL where a
    list didn't retrieve the document.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col),
            F.col(rank_col).cast("bigint").alias("_rank"),
            F.lit(i).alias("_list"),
        )
        for i, r in enumerate(rankings, start=1)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    # one parsed expr per pivot column / one for the fused sum instead
    # of per-list Column chains (r14, guide §7.3): CASE WHEN is the
    # exact CaseWhen node F.when builds; 1.0D/{k}D are the double
    # literals F.lit embeds; the + chain keeps the same left-assoc
    # fold order (doubles are not associative — the determinism
    # contract above pins argument order).
    merged = u.groupBy(id_col).agg(
        *[
            F.expr(f"max(CASE WHEN _list = {i} THEN _rank END)").alias(
                f"rank_{i}"
            )
            for i in range(1, len(rankings) + 1)
        ]
    )
    score = F.expr(
        " + ".join(
            f"coalesce(1.0D / ({float(k)}D + rank_{i}), 0.0D)"
            for i in range(1, len(rankings) + 1)
        )
    )
    out = merged.withColumn("rrf", score)
    if topn is not None:
        out = out.orderBy(F.col("rrf").desc(), id_col).limit(int(topn))
    return out


def _rp_sketch(vec, planes: int, dims: int):
    """b-bit random-hyperplane sign sketch. Plane weights are the
    deterministic hash h(plane, dim) mapped to [-1, 1] — reproducible
    across executors with zero data movement."""
    def weight(p: int, d):
        h = F.xxhash64(F.lit(p), d)
        return (F.pmod(h, F.lit(2001)).cast("double") - 1000.0) / 1000.0

    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.lit(dims - 1)),
                    lambda x, d: (x.cast("double") * weight(p, d)),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            > 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for p in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _rp_sketch_vectorized(planes: int, seed: int = 41):
    """Arrow-batched sign sketch: one numpy matmul per batch against a
    deterministic Gaussian plane matrix (the textbook cosine-LSH
    distribution). This is the sanctioned Pandas-UDF fast path: the
    pure-JVM higher-order-function sketch is interpreted per element
    (planes × dims lambda evals per row) and measured 4× slower at 200k
    × 64-dim vectors; a batched matmul stays in BLAS."""
    from pyspark.sql.types import LongType

    # Plane matrix built lazily ONCE per python worker (keyed by dims —
    # unknown until the first batch arrives) instead of per Arrow batch.
    plane_cache: dict = {}

    @F.pandas_udf(LongType())
    def sketch(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # batch × dims
        planes_mat = plane_cache.get(mat.shape[1])
        if planes_mat is None:
            planes_mat = (
                np.random.RandomState(seed).standard_normal((mat.shape[1], planes))
            )
            plane_cache[mat.shape[1]] = planes_mat
        signs = mat @ planes_mat > 0
        out = np.zeros(len(v), dtype=np.int64)
        for p in range(planes):
            out |= signs[:, p].astype(np.int64) << p
        return pd.Series(out)

    return sketch


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    band_bits: int = 8,
    dims: int = 64,
    sketch: str = "vectorized",
) -> DataFrame:
    """Approximate top-k: candidates share at least one sketch band,
    exact cosine re-ranks within candidates.

    Cosine is scored as ``dot(a,b)/(na·nb)`` with the norms computed
    ONCE per row map-side (scalar column shipped through the band join)
    — one dot product + one multiply per candidate pair, and the values
    are bit-identical to ``brute_force_topk``'s ``dot/(|a||b|)``.

    Cache note (self-join path only): the banded frame is persisted
    because both join sides consume it; the cache block lives until the
    session ends — long-lived sessions issuing many calls should
    ``spark.catalog.clearCache()`` between them (callers own the cache
    lifetime; the rows carry the full vector once per band).

    ``sketch``: "vectorized" (default — Arrow-batched numpy matmul) or
    "jvm" (pure built-in higher-order functions, zero Python in the
    plan; slower at scale but UDF-free)."""
    n_bands = planes // band_bits
    mask = (1 << band_bits) - 1
    sketch_fn = (
        _rp_sketch_vectorized(planes)
        if sketch == "vectorized"
        else (lambda c: _rp_sketch(c, planes, dims))
    )

    def banded(df, id_alias, vec_alias, n_alias):
        # Raw vector + scalar norm (computed once per row, before the
        # band explode) — the float array ships at half the width of a
        # normalized double array, and no per-element division runs.
        sk = _spread(df, id_col).select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            _norm(F.col(vec_col)).alias(n_alias),
            sketch_fn(F.col(vec_col)).alias("sketch"),
        )
        # bands unrolled statically — shiftright needs an int shift
        # amount. ONE parsed SQL string for the whole band array (r14,
        # guide §7.3): the per-band F.struct/F.shiftright listcomp was
        # ~5k py4j round-trips per construction (the bulk of
        # ann_lsh_topk's serial driver cost); named_struct/shiftright/&
        # parse to the identical CreateNamedStruct/ShiftRight/BitwiseAnd
        # nodes with the same int literals.
        bands_sql = "array(" + ", ".join(
            f"named_struct('band', {b}, 'bucket', "
            f"shiftright(sketch, {b * band_bits}) & {mask})"
            for b in range(n_bands)
        ) + ")"
        return sk.select(
            id_alias,
            vec_alias,
            n_alias,
            F.explode(F.expr(bands_sql)).alias("bb"),
        ).select(id_alias, vec_alias, n_alias, "bb.band", "bb.bucket")

    if queries is corpus:
        # Self-join (near-dup over the whole corpus): sketch the corpus
        # once, persist the banded rows (full vector + scalar norm,
        # replicated once per band — NOT narrow), and rename for the
        # query side — halves the sketch/scan work vs two independent
        # pipelines. Cache lifetime is generation-scoped via cachereg:
        # the next call releases this one's blocks.
        cachereg.begin("rp_lsh_topk")
        cb = cachereg.persist(
            "rp_lsh_topk", banded(corpus, "neighbor_id", "c_vec", "c_n")
        )
        qb = cb.select(
            F.col("neighbor_id").alias("query_id"),
            F.col("c_vec").alias("q_vec"),
            F.col("c_n").alias("q_n"),
            "band",
            "bucket",
        )
    else:
        qb = banded(queries, "query_id", "q_vec", "q_n")
        cb = banded(corpus, "neighbor_id", "c_vec", "c_n")
    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _nearest_centroids_udf(centroids, n_probe: int):
    """pandas_udf: vector → array of the ``n_probe`` nearest centroid
    ids by cosine (batched numpy matmul against the broadcast centroid
    matrix, rows L2-normalized once)."""
    from pyspark.sql.types import ArrayType, IntegerType

    cmat = np.vstack(centroids).astype(np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @F.pandas_udf(ArrayType(IntegerType()))
    def nearest(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cmat.T  # batch × n_centroids
        if n_probe == 1:
            idx = np.argmax(sims, axis=1)[:, None]
        else:
            idx = np.argpartition(-sims, min(n_probe, sims.shape[1] - 1), axis=1)[
                :, :n_probe
            ]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return nearest


def train_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    sample_rows_per_centroid: int = 64,
) -> list[list[float]]:
    """Lloyd's k-means on a corpus sample — the production coarse
    quantizer for ``ivf_topk`` (its docstring's "train real k-means
    centroids on a sample" path).

    Everything heavy stays distributed: assignment is the same
    Arrow-batched broadcast-matmul used by IVF itself, and the centroid
    update is a (cell, dim) hash aggregation over the posexploded
    sample — O(sample · dims) narrow rows per iteration, never the full
    corpus. Only the n_centroids × dims centroid matrix ever reaches the
    driver. Deterministic: hash-ordered init, fixed sample seed.

    Empty cells keep their previous centroid (standard Lloyd's fix);
    cosine-metric assignment matches IVF's probe metric so trained cells
    minimize the quantity the probe actually uses.
    """
    target_rows = n_centroids * sample_rows_per_centroid
    total = corpus.count()
    frac = min(1.0, target_rows / max(1, total))
    sample = (
        corpus.sample(fraction=frac, seed=41) if frac < 1.0 else corpus
    ).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.xxhash64(F.col(id_col).cast("string")).alias("_rnd"),
    )
    sample = _spread(sample, "_id").persist()
    try:
        init = sample.orderBy("_rnd").limit(n_centroids).collect()
        centroids = [list(r["_vec"]) for r in init]
        if len(centroids) < n_centroids:
            n_centroids = len(centroids)  # degenerate tiny corpus
        dims = len(centroids[0])
        for _ in range(iters):
            assign = _nearest_centroids_udf(centroids, 1)
            sums = (
                sample.select(
                    # n_probe=1 ⇒ single-element array; getItem avoids a
                    # second generator in the select (one per select max)
                    assign(F.col("_vec")).getItem(0).alias("cell"),
                    F.posexplode(F.col("_vec")).alias("pos", "x"),
                )
                .groupBy("cell", "pos")
                .agg(F.sum(F.col("x").cast("double")).alias("s"),
                     F.count(F.lit(1)).alias("n"))
                .collect()
            )
            new = [[None] * dims for _ in range(n_centroids)]
            counts = [0] * n_centroids
            for r in sums:
                new[r["cell"]][r["pos"]] = r["s"] / r["n"]
                counts[r["cell"]] = r["n"]
            centroids = [
                new[c] if counts[c] > 0 else centroids[c]
                for c in range(n_centroids)
            ]
        return centroids
    finally:
        sample.unpersist(blocking=False)


def sampled_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic sampled coarse quantizer for :func:`ivf_topk`:
    first ``n_centroids`` corpus vectors by xxhash64 order — effectively
    random, reproducible. A ``sample_fraction`` pre-sample feeds a
    per-partition top-``n_centroids`` heap on the hash order so the full
    corpus is never heap-scanned; tiny corpora (sample < n_centroids)
    fall back to the full heap scan. Train once and REUSE across probe
    calls — re-sampling per query batch was the worst bench ratio in
    round 3 (1.57×, pure quantizer overhead)."""
    ordered = corpus.select(
        F.col(id_col).alias("_cid"),
        F.col(vec_col).alias("_cvec"),
        F.xxhash64(F.col(id_col).cast("string")).alias("_rnd"),
    )
    sample_fraction = 0.02
    sample = (
        ordered.sample(fraction=sample_fraction, seed=41)
        .orderBy("_rnd")
        .limit(n_centroids)
        .collect()
    )
    if len(sample) < n_centroids:
        sample = ordered.orderBy("_rnd").limit(n_centroids).collect()
    return [list(r["_cvec"]) for r in sample]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 256,
    n_probe: int = 8,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the cell-probing
    alternative to ``rp_lsh_topk``.

    Coarse quantizer: ``n_centroids`` vectors sampled deterministically
    from the corpus (first ids by xxhash64 order — effectively random,
    reproducible) and broadcast. Corpus vectors are assigned to their
    single nearest cell; each query probes its ``n_probe`` nearest
    cells; candidates meet through a cell-id equi-join and exact cosine
    re-ranks them.

    Scale: assignment is one Arrow-batched matmul pass (O(N·C) flops,
    no shuffle); the probe join shuffles O(N + Q·n_probe) narrow rows
    keyed by cell id — never N·Q. Recall/cost tunes with n_probe.
    Centroid skew (a hot cell) is AQE's skew-join case. For 100 TB,
    pass ``centroids=train_centroids_kmeans(corpus, ...)`` — real
    Lloyd's iterations on a sample, trained once and reused across
    probe calls; the default sampled quantizer keeps one-shot calls
    cheap.

    Centroid pick: a ``sample_fraction`` pre-sample (deterministic with
    the fixed seed) feeds a per-partition top-``n_centroids`` heap on
    the hash order — the full corpus is never heap-scanned; tiny
    corpora (sample < n_centroids) fall back to the full heap scan.
    """
    if centroids is None:
        centroids = sampled_centroids(
            corpus, n_centroids, id_col=id_col, vec_col=vec_col
        )
    else:
        n_centroids = len(centroids)

    assign1 = _nearest_centroids_udf(centroids, 1)
    assign_p = _nearest_centroids_udf(centroids, n_probe)

    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_n"),
        F.explode(assign1(F.col(vec_col))).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_n"),
        F.explode(assign_p(F.col(vec_col))).alias("cell"),
    )
    # No pair dedup needed: each corpus vector lives in exactly one cell
    # (single-nearest assignment) and a query's probed cells are
    # distinct, so a (query, neighbor) pair meets at most once — a
    # dropDuplicates would only add a shuffle.
    cand = q.join(c, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.withColumn(
        "cosine", _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Persist the IVF inverted file: the corpus assigned to its nearest
    cell, written as parquet PARTITIONED BY cell, vectors stored with
    their precomputed norms. Returns the trained centroid list (write it
    wherever the caller keeps model state; ``ivf_probe_index`` takes it
    back verbatim).

    This is the production IVF shape (FAISS build/search split): the
    O(N·C) assignment matmul runs ONCE at build, and every probe after
    that reads ONLY its probed cells via parquet partition pruning —
    per-query-batch cost is O(probed cells), independent of corpus
    size. ``ivf_topk`` re-assigns the corpus per call and stays the
    one-shot convenience path.
    """
    if centroids is None:
        centroids = sampled_centroids(
            corpus, n_centroids, id_col=id_col, vec_col=vec_col
        )
    assign1 = _nearest_centroids_udf(centroids, 1)
    inverted = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_n"),
        F.explode(assign1(F.col(vec_col))).alias("cell"),
    )
    # One file per cell directory: without the repartition every shuffle
    # partition writes a sliver into every cell dir (partitions × cells
    # tiny files — measured 3× slower probes from open/footer overhead
    # at gate scale; at 100 TB it's a small-files incident). A hot cell
    # is one big file — columnar scan handles that fine.
    inverted.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    return centroids


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted inverted file (``ivf_build_index``): each query
    visits its ``n_probe`` nearest cells; exact cosine re-ranks the
    candidates. Identical output to ``ivf_topk`` with the same
    centroids (norms and cosines are the same IEEE expressions, stored
    vs recomputed).

    The scan is filtered to the UNION of probed cells — a bounded
    Q·n_probe-element IN-list on the PARTITION column, so the parquet
    reader prunes unprobed cell directories entirely (asserted in
    tests/test_plans_physical.py). At partial probe over a big corpus
    that is the difference between reading N rows and reading
    N·n_probe/C rows; the per-query equi-join then narrows each query
    to exactly its own cells.
    """
    assign_p = _nearest_centroids_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_n"),
        F.explode(assign_p(F.col(vec_col))).alias("cell"),
    )
    inverted = spark.read.parquet(path)
    if n_probe < len(centroids):
        # Bounded collect: Q·n_probe cell ids (probe batches are small
        # by contract — this is a serving-path operator), deduped
        # driver-side so the IN-list prunes partitions at scan planning
        # time. q is pinned first: the collect and the candidate join
        # both consume it, and without the barrier the O(Q·C)
        # assignment matmul would run twice. Skipped at full probe:
        # every cell is read anyway.
        q = q.localCheckpoint(eager=True)
        probed = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
        inverted = inverted.filter(F.col("cell").isin(probed))
    # No pair dedup: assignment is single-nearest-cell (one cell per
    # corpus vector) and a query's probed cells are distinct, so a
    # (query, neighbor) pair meets through the cell equi-join at most
    # once — a dropDuplicates here would be a pure extra shuffle on the
    # serving path.
    cand = q.join(inverted, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cosine", _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_n") * F.col("c_n"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    band_bits: int = 8,
    dims: int = 64,
    sketch: str = "vectorized",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) above a
    threshold, via the same LSH bucketing (never N²).

    Dedicated pair path rather than ``rp_lsh_topk(corpus, corpus)``:
    the ``id_a < id_b`` predicate is applied AT the band join (half the
    candidate pairs, each scored once instead of twice) and there is no
    top-k window — a threshold filter needs no per-query row_number,
    which at corpus scale was the dominant cost (one window partition
    per vector).

    Cosine is ``dot(a,b)/(na·nb)`` with norms materialized once per row
    map-side — bit-identical to ``brute_force_topk``'s values, so pairs
    at the threshold boundary agree with the exact path. Cache note: the
    banded frame (vector + scalar norm, once per band) is persisted for
    the self-join and lives until session end — callers own the cache
    lifetime (``spark.catalog.clearCache()`` between bulk calls)."""
    from pyspark import StorageLevel

    n_bands = planes // band_bits
    mask = (1 << band_bits) - 1
    sketch_fn = (
        _rp_sketch_vectorized(planes)
        if sketch == "vectorized"
        else (lambda c: _rp_sketch(c, planes, dims))
    )
    banded = (
        _spread(corpus, id_col).select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            _norm(F.col(vec_col)).alias("_n"),
            sketch_fn(F.col(vec_col)).alias("sketch"),
        )
        .select(
            "_id",
            "_vec",
            "_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright("sketch", b * band_bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("bucket"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("_id", "_vec", "_n", "bb.band", "bb.bucket")
    )
    cachereg.begin("embedding_near_dup")
    banded = cachereg.persist("embedding_near_dup", banded)
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._vec").alias("a_vec"),
            F.col("r._vec").alias("b_vec"),
            (F.col("l._n") * F.col("r._n")).alias("_nn"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cosine", _dot(F.col("a_vec"), F.col("b_vec")) / F.col("_nn"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    topk_fn=None,
) -> DataFrame:
    """k-NN majority-vote label prediction per query vector.

    The standard semantic-quality/classifier primitive of an embedding
    curation pipeline: each query takes the modal label among its k
    nearest corpus neighbors (cosine, self excluded). Deterministic
    throughout — neighbor rank ties break by neighbor id, vote ties by
    smallest label.

    ``topk_fn(corpus, queries, k)`` supplies the neighbor stage
    (defaults to exact ``brute_force_topk``; pass a lambda wrapping
    ``rp_lsh_topk`` / ``ivf_topk`` for the approximate scale path —
    voting is agnostic to how neighbors were found).

    Output: query_id, predicted_label, votes, top_cosine.
    """
    if topk_fn is None:
        topk_fn = lambda c, q, kk: brute_force_topk(  # noqa: E731
            c, q, k=kk, id_col=id_col, vec_col=vec_col
        )
    nn = topk_fn(corpus, queries, k)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_lbl")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "_lbl")
        .agg(F.count(F.lit(1)).alias("votes"), F.max("cosine").alias("top_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_lbl").asc()
    )
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "query_id",
            F.col("_lbl").alias("predicted_label"),
            "votes",
            F.round("top_cosine", 6).alias("top_cosine"),
        )
    )


def scalar_quantize_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = 256,
) -> DataFrame:
    """Per-dimension int8 scalar-quantization profile — the calibration
    + audit artifact of compressing a float32 vector store 4× (the
    standard first move when 100 TB of embeddings won't fit the serving
    tier). Two corpus passes, both inherent:

    1. calibration — per-dim ``min``/``max`` via one posexplode + one
       map-side-partial hash aggregate (shuffle carries dims rows per
       task, never vectors);
    2. audit — codes recomputed map-side with the (tiny, broadcast)
       per-dim calibration joined back on ``dim``; the output is the
       per-dim code SUM as a long plus code min/max — exact integers,
       so the profile is reproducible bit-for-bit in any engine (a
       float reconstruction-error mean is neither).

    Code formula, mirrored verbatim in the oracle so both engines run
    the identical IEEE double sequence:
    ``floor((x - vmin) / (vmax - vmin) * (n_levels - 1) + 0.5)``;
    degenerate dims (vmax == vmin) code to 0. Consumers dequantize as
    ``vmin + code · (vmax - vmin) / (n_levels - 1)``.

    Output: (dim, vmin, vmax, n, code_sum, code_min, code_max).
    """
    x = df.select(F.posexplode(F.col(vec_col)).alias("dim", "_f")).select(
        "dim", F.col("_f").cast("double").alias("x")
    )
    calib = x.groupBy("dim").agg(
        F.min("x").alias("vmin"), F.max("x").alias("vmax")
    )
    coded = x.join(F.broadcast(calib), "dim").select(
        "dim",
        "vmin",
        "vmax",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.floor(
                (F.col("x") - F.col("vmin"))
                / (F.col("vmax") - F.col("vmin"))
                * F.lit(float(n_levels - 1))
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("code"),
    )
    return coded.groupBy("dim", "vmin", "vmax").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("code").alias("code_sum"),
        F.min("code").alias("code_min"),
        F.max("code").alias("code_max"),
    )


def label_centroid_sums(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-(label, dimension) EXACT quantized component sums — the
    engine-portable form of per-class centroids (class-balance/drift
    monitoring, semantic-cluster summaries, IVF warm-start seeds).

    Components are quantized to integers map-side
    (``floor(x·scale + 0.5)`` — pure IEEE ops, identical everywhere)
    and summed as longs, so the result is bit-identical regardless of
    aggregation order — a float centroid mean never is. Consumers
    divide ``qsum / (n · scale)`` for the real centroid.

    One posexplode + one map-side-partial hash aggregate keyed by
    (label, dim): at 100 TB the shuffle carries only
    |labels|·dims partial rows per task, not vectors.

    Output: (label_col, dim, qsum, n).
    """
    exploded = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    ).select(
        label_col,
        "dim",
        F.floor(F.col("_x").cast("double") * scale + F.lit(0.5))
        .cast("long")
        .alias("_q"),
    )
    return exploded.groupBy(label_col, "dim").agg(
        F.sum("_q").alias("qsum"), F.count(F.lit(1)).alias("n")
    )


def covariance_sums(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_scale: int = 1000,
    impl: str = "arrow",
) -> DataFrame:
    """Exact quantized second-moment sums for distributed PCA: every
    pairwise product Σ x_i·x_j over the corpus, plus per-dim sums and
    the vector count — the sufficient statistics a driver-side
    eigendecomposition needs, in ONE corpus pass.

    Components quantize to ``floor(x·q_scale + 0.5)`` integers; both
    implementations produce BIT-IDENTICAL integer sums (asserted in
    tests), so the oracle gate holds for either:

    - ``impl="arrow"`` (default): per-Arrow-batch int64 Gram matrix via
      one numpy matmul (the sanctioned vectorized-UDF path, same as the
      RP-LSH sketch) — each batch reduces to d·(d+1)/2+d+1 partial rows
      before anything shuffles. Measured ~20× the JVM form at 200k×64d
      (1.7 s vs 35 s): the corpus never materializes its N·d² product
      terms.
    - ``impl="jvm"``: nested-transform product generation + one
      map-side-partial hash-aggregate — no Python at all; same
      O(partitions·d²) wire cost but pays N·d² codegen'd term rows
      through the partial aggregate.

    Overflow bound: |x|≤1, q_scale=1e3 ⇒ each product ≤ 1e6;
    2^63/1e6 ≈ 9.2e12 vectors before a sum can overflow.

    Output rows (exact integers, engine-reproducible):
      (i, j,  s)  for 0 ≤ i ≤ j < d  — Σ xq_i · xq_j
      (i, -1, s)                      — Σ xq_i   (per-dim sums)
      (-1, -1, n)                     — vector count
    """
    if impl == "arrow":
        return _covariance_sums_arrow(df, vec_col, q_scale)
    d = F.size(F.col(vec_col))
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(q_scale)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    base = df.select(xq.alias("_xq"), d.alias("_d"))
    prod_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.col("_d") - 1),
            lambda i: F.transform(
                F.sequence(i, F.col("_d") - 1),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at("_xq", i + 1) * F.element_at("_xq", j + 1)
                    ).alias("v"),
                ),
            ),
        )
    )
    dim_structs = F.transform(
        F.sequence(F.lit(0), F.col("_d") - 1),
        lambda i: F.struct(
            i.cast("int").alias("i"),
            F.lit(-1).alias("j"),
            F.element_at("_xq", i + 1).alias("v"),
        ),
    )
    count_struct = F.array(
        F.struct(
            F.lit(-1).alias("i"), F.lit(-1).alias("j"), F.lit(1).cast("long").alias("v")
        )
    )
    all_terms = base.select(
        F.explode(F.concat(prod_structs, dim_structs, count_struct)).alias("t")
    )
    return (
        all_terms.groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum("t.v").alias("s"))
    )


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_scale: int = 1000,
):
    """Distributed PCA: covariance from :func:`covariance_sums` (one
    corpus pass), eigendecomposition driver-side on the d×d matrix
    (numpy — bookkeeping-sized, the IVF-centroid precedent), top-k
    eigenvectors broadcast back as literals, projection map-side.

    Returns (projected_df, explained_variance): projected_df has
    (id_col, proj array<double> length k); explained_variance is the
    top-k eigenvalue list (descending). Deterministic for a fixed
    input set: the covariance is exact integers and eigh is run on the
    identical matrix every time; eigenvector SIGN is normalized (first
    nonzero component positive) so projections don't flip between runs.
    """
    import numpy as np

    sums = {(r["i"], r["j"]): r["s"] for r in covariance_sums(
        df, vec_col, id_col, q_scale).collect()}
    n = sums.pop((-1, -1))
    if n < 2:
        raise ValueError("pca_project needs at least 2 vectors")
    d = max(i for i, j in sums) + 1
    mean = np.array([sums[(i, -1)] / n for i in range(d)])
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(i, d):
            e_xy = sums[(i, j)] / n
            cov[i, j] = cov[j, i] = e_xy - mean[i] * mean[j]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]  # d × k
    # sign normalization: first nonzero component of each PC positive
    for c in range(comps.shape[1]):
        nz = np.nonzero(comps[:, c])[0]
        if len(nz) and comps[nz[0], c] < 0:
            comps[:, c] = -comps[:, c]
    explained = [float(vals[o]) for o in order]

    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    proj_cols = []
    for c in range(comps.shape[1]):
        w = F.array(*[F.lit(float(comps[i, c])) for i in range(d)])
        # dot((xq - mean), w) via zip_with + aggregate — JVM-side
        centered = F.zip_with(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(q_scale)) + F.lit(0.5)
                ),
            ),
            mean_arr,
            lambda xq, m: xq - m,
        )
        proj_cols.append(
            F.aggregate(
                F.zip_with(centered, w, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    out = df.select(F.col(id_col), F.array(*proj_cols).alias("proj"))
    return out, explained


def _covariance_sums_arrow(
    df: DataFrame, vec_col: str, q_scale: int
) -> DataFrame:
    """Arrow path for :func:`covariance_sums`: one exact int64 X'X per
    batch (numpy integer matmul — no floating point in the reduction),
    emitted as (i, j, v) partial rows; the final groupBy sums
    O(batches·d²) tiny rows. Quantization runs the identical IEEE
    sequence as the JVM/oracle forms: float32 → float64, ·q_scale,
    +0.5, floor."""
    import numpy as np
    import pandas as pd

    schema = "i int, j int, v long"
    scale = float(q_scale)

    def gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * scale + 0.5
            ).astype(np.int64)
            d = X.shape[1]
            G = X.T @ X  # exact int64
            iu, ju = np.triu_indices(d)
            sums = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(d), [-1]]).astype("int32"),
                    "j": np.concatenate(
                        [ju, np.full(d, -1), [-1]]
                    ).astype("int32"),
                    "v": np.concatenate([G[iu, ju], sums, [len(X)]]),
                }
            )

    partials = df.select(vec_col).mapInPandas(gram, schema=schema)
    return partials.groupBy("i", "j").agg(F.sum("v").alias("s"))


def embedding_cross_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    band_bits: int = 8,
    dims: int = 64,
    sketch: str = "vectorized",
) -> DataFrame:
    """Semantic benchmark decontamination: every (corpus, bench) pair
    with cosine ≥ threshold, via the cross-corpus LSH band join — the
    embedding-space sibling of ``decontam.contamination_overlap``
    (which screens exact n-grams; paraphrased leakage slips that net,
    survives this one).

    Cross-join shape, not self-join: both sides are sketched map-side,
    candidates only form inside matching (band, bucket) cells, so cost
    is O(|corpus| + |bench| + collisions) — the bench side is tiny in
    practice and its band entries broadcast. No top-k window (a
    threshold screen needs no per-query ranking), and the exact-cosine
    filter runs where candidates are produced, before the pair-dedup
    shuffle.

    Output: (corpus_id, bench_id, cosine), distinct pairs.
    """
    n_bands = planes // band_bits
    mask = (1 << band_bits) - 1
    sketch_fn = (
        _rp_sketch_vectorized(planes)
        if sketch == "vectorized"
        else (lambda c: _rp_sketch(c, planes, dims))
    )

    def banded(df: DataFrame, side: str) -> DataFrame:
        return (
            _spread(df, id_col)
            .select(
                F.col(id_col).alias(f"{side}_id"),
                F.col(vec_col).alias(f"{side}_vec"),
                _norm(F.col(vec_col)).alias(f"{side}_n"),
                sketch_fn(F.col(vec_col)).alias("sketch"),
            )
            .select(
                f"{side}_id", f"{side}_vec", f"{side}_n",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.shiftright("sketch", b * band_bits)
                                .bitwiseAND(F.lit(mask))
                                .alias("bucket"),
                            )
                            for b in range(n_bands)
                        ]
                    )
                ).alias("bb"),
            )
            .select(f"{side}_id", f"{side}_vec", f"{side}_n", "bb.band", "bb.bucket")
        )

    cachereg.begin("embedding_cross_contamination")
    c = cachereg.persist("embedding_cross_contamination", banded(corpus, "corpus"))
    b = F.broadcast(banded(bench, "bench"))
    cos = _dot(F.col("corpus_vec"), F.col("bench_vec")) / (
        F.col("corpus_n") * F.col("bench_n")
    )
    return (
        c.join(b, ["band", "bucket"])
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(threshold))
        .dropDuplicates(["corpus_id", "bench_id"])
        .select("corpus_id", "bench_id", F.col("cosine"))
    )


# ------------------------------------------------------------- SemDeDup


def strata_centroids(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(cell, centroid)`` — a deterministic, engine-replicable pseudo-
    quantizer: centroid ``i`` is the vector whose ``md5(id)`` is minimal
    within the ``id % k`` stratum. Effectively a random k-sample (md5 is
    a uniform draw), reproducible bit-for-bit by any engine with md5 —
    which is what lets :func:`semdedup_prune`'s clustering be
    oracle-checked, unlike k-means. One hash aggregate, no sort.

    Numeric ids stratify by ``id % k`` (the gate-checked arithmetic);
    string/uuid ids — which ``pmod`` would reject with an
    AnalysisException far from this call site (r6 advice) — stratify by
    the first 8 md5 hex digits mod k instead, still deterministic and
    engine-replicable (DuckDB: ``('0x' || substr(md5(id), 1, 8))::bigint
    % k``)."""
    id_type = corpus.schema[id_col].dataType.simpleString()
    if id_type in {"tinyint", "smallint", "int", "bigint"}:
        cell = F.pmod(F.col(id_col), F.lit(k))
    else:
        cell = F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(k),
        )
    return corpus.groupBy(cell.cast("int").alias("cell")).agg(
        F.min_by(F.col(vec_col), F.md5(F.col(id_col).cast("string"))).alias(
            "centroid"
        )
    )


#: per-cell row cap before the gram matrix goes BLOCKED (r14, VERDICT
#: guard): a full n×n double matrix at the default 20k cap is ≤3.2 GB —
#: the documented worker-memory line. Cells above the cap compute the
#: same verdicts in cap×cap blocks (memory bounded by the same 3.2 GB,
#: work unchanged), so a skewed or mis-sized cell degrades to
#: slower-but-exact instead of OOMing the Python worker (§5). Cells
#: KNOWN to be huge should pick ``pair_backend="jvm"``, which
#: distributes the pair work (AQE skew-join splits hot cells).
_SEMDEDUP_CELL_CAP_CONF = "spark.sqlbackuphistoryetl.semdedup.maxCellRows"
_SEMDEDUP_CELL_CAP_DEFAULT = 20000


def _semdedup_pair_prune_numpy(
    corpus: DataFrame,
    cell_col,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The vectorized intra-cluster prune: one exchange keyed by the
    cell id, then a per-cell numpy gram matrix (``X @ X.T``) that emits
    ``(id, cell, keep)`` directly — see :func:`semdedup_prune`'s
    ``pair_backend`` docs for the trade and the measured numbers.

    ``keep[j] = not exists i: id_i < id_j and cos(i, j) >= threshold``
    — ``<`` on ids matches Spark's comparator (numeric order; strings
    compare as UTF-8 bytes, which is UTF8String order). Duplicate ids
    never prune each other (strict ``<``), same as the join form.

    Cells larger than ``_SEMDEDUP_CELL_CAP_CONF`` rows compute the same
    verdicts block-by-block (see the conf docstring) — worker memory is
    bounded by cap² regardless of cell size.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    assigned = corpus.select(
        F.col(id_col).alias("_sid"),
        F.col(vec_col).alias("_svec"),
        cell_col.alias("cell"),
    )
    schema = StructType(
        [
            StructField(id_col, assigned.schema["_sid"].dataType),
            StructField("cell", assigned.schema["cell"].dataType),
            StructField("keep", BooleanType()),
        ]
    )
    thr = float(threshold)
    cap = max(
        1,
        int(
            corpus.sparkSession.conf.get(
                _SEMDEDUP_CELL_CAP_CONF, str(_SEMDEDUP_CELL_CAP_DEFAULT)
            )
        ),
    )

    def _prune_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        out = pd.DataFrame(
            {id_col: pdf["_sid"], "cell": pdf["cell"]}
        )
        if n == 0:
            out["keep"] = pd.Series([], dtype=bool)
            return out
        ids = pdf["_sid"].tolist()
        if isinstance(ids[0], str):
            # dense ranks under UTF-8-byte order = UTF8String order
            ranks = {v: i for i, v in enumerate(sorted(set(ids), key=str.encode))}
            rank = np.asarray([ranks[v] for v in ids], dtype=np.int64)
        else:
            rank = np.asarray(ids)
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["_svec"]],
            dtype=np.float64,
        )
        norms = np.sqrt((x * x).sum(axis=1))
        if (norms == 0.0).any():
            # ANSI parity: the JVM pair join divides by na*nb and a
            # zero norm raises DIVIDE_BY_ZERO there — fail identically
            # instead of minting a NaN verdict the join form never had.
            raise ArithmeticError(
                "semdedup_prune: zero-norm vector (division by zero)"
            )
        if n <= cap:
            cos = (x @ x.T) / np.outer(norms, norms)
            hit = (cos >= thr) & (rank[:, None] < rank[None, :])
            out["keep"] = ~hit.any(axis=0)
            return out
        # blocked form: identical comparisons, ≤ cap² matrix at a time
        hit_any = np.zeros(n, dtype=bool)
        for j0 in range(0, n, cap):
            j1 = min(j0 + cap, n)
            hj = np.zeros(j1 - j0, dtype=bool)
            for i0 in range(0, n, cap):
                i1 = min(i0 + cap, n)
                cos = (x[i0:i1] @ x[j0:j1].T) / np.outer(
                    norms[i0:i1], norms[j0:j1]
                )
                hj |= (
                    (cos >= thr)
                    & (rank[i0:i1][:, None] < rank[j0:j1][None, :])
                ).any(axis=0)
            hit_any[j0:j1] = hj
        out["keep"] = ~hit_any
        return out

    return assigned.groupBy("cell").applyInPandas(_prune_cell, schema)


def semdedup_prune(
    corpus: DataFrame,
    k_clusters: int = 16,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    assignment: str = "auto",
    pair_backend: str = "auto",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster the embedding space, then
    prune near-duplicates WITHIN each cluster only — the cluster
    restriction is what bounds the pairwise stage to O(Σ n_c²) instead
    of O(N²), the published trade that makes semantic dedup feasible at
    corpus scale.

    Returns ``(vec_id, cell, keep)`` — one row per input vector;
    ``keep = false`` iff a LOWER-id vector in the same cluster has
    cosine >= ``threshold`` (min-id representative election, the same
    deterministic keep-one rule as the exact-dedup path).

    Clustering is pluggable: the default :func:`strata_centroids` is
    deterministic and oracle-replicable (the gate path); pass
    ``centroids=[(cell, vec), ...]`` from
    :func:`train_centroids_kmeans` for real Lloyd's cells in
    production — the prune semantics are identical.

    Scale shape: assignment is one map-side pass — at small k a
    broadcast centroid LITERAL folded inside whole-stage codegen (no
    shuffle, no UDF; the oracle-checked gate path), above ~64 centroids
    the same Arrow-batched numpy matmul the IVF quantizer uses (a k×d
    literal would mint k·d codegen expressions); both elect (cos desc,
    cell asc). Nothing driver-side beyond the k×d centroid table.

    ``pair_backend`` selects the intra-cluster pair stage:

    - ``"numpy"`` (and ``"auto"``, the default): ONE shuffle keyed by
      the cell id into a per-cell Arrow-batched numpy gram matrix
      (``X @ X.T`` — the published SemDeDup recipe computes exactly
      this per-cluster similarity matrix), which also emits ``keep``
      directly, so the whole prune is scan → assignment → one
      exchange → one vectorized group stage. This replaced the JVM
      pair join in the r13 optimization round (guide §4.2: hand whole
      batches to vectorized native code): the join evaluated a 64-dim
      zip_with/aggregate dot per PAIR in interpreted higher-order
      lambdas, and its three-consumer shape (both join sides + the
      keep join) re-ran the interpreted assignment three times —
      measured at sf0.1 (5k docs, k=16, ~778k pairs): the
      from-checkpoint prune 12.07 s → ~2.8 s, semdedup_text_prune
      16.7 s → 4.7 s and semdedup_prune 4.4 s → 2.2 s end-to-end,
      6 Exchanges → 2 in both plans
      (plans/r13/semdedup_*_{before,after}.txt). Output is identical:
      ``keep`` is a discrete verdict with a documented margin band
      around ``threshold`` (nearest same-cell cosines sit ≳0.05 away
      at the gate scales), so the ≤1-ulp summation-order difference
      between numpy's pairwise sums and the JVM fold can never flip
      it — verified against the DuckDB oracle at both driver scales
      and by the jvm-vs-numpy equality test. Zero-norm vectors raise
      (ArithmeticException parity with the ANSI JVM division).
    - ``"jvm"``: the original cell-keyed pair join + distinct + keep
      left-join, all JVM built-ins (kept for plan comparability and
      as the no-Python fallback; a hot cell is AQE's skew-join case
      there).

    Per-cell memory in the numpy stage is O(cell²) booleans +
    O(cell·d) doubles — bounded by the published k ≈ n/312 sizing
    exactly like the pair join's per-key output was.
    """
    if centroids is None:
        rows = strata_centroids(corpus, k_clusters, id_col, vec_col).collect()
        centroids = [(int(r["cell"]), list(r["centroid"])) for r in rows]
    if not centroids:
        raise ValueError("empty corpus: no centroids")
    if assignment not in ("auto", "literal", "arrow"):
        raise ValueError(f"unknown assignment strategy: {assignment}")
    if pair_backend not in ("auto", "numpy", "jvm"):
        raise ValueError(f"unknown pair backend: {pair_backend}")
    ordered = sorted(centroids)

    v = F.col(vec_col)
    if assignment == "literal" or (assignment == "auto" and len(ordered) <= 64):
        # ONE parsed SQL string, not k·d F.lit round-trips (py4j
        # economy, r13 — ~1000 calls / ~1.9 s at 16 cells × 64 dims).
        # CAST('repr' AS DOUBLE) is Double.parseDouble of Python's
        # shortest round-trip repr — the exact same double F.lit made —
        # and constant-folds to the identical literal array. Non-finite
        # components (impossible for means of finite vectors, guarded
        # anyway) keep the original Column build, whose F.lit embeds
        # them exactly.
        if all(math.isfinite(float(x)) for _, vec in ordered for x in vec):
            carr = F.expr(
                "array("
                + ", ".join(
                    f"struct({int(cell)} AS cell, CAST(array("
                    + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
                    + ") AS ARRAY<DOUBLE>) AS cvec)"
                    for cell, vec in ordered
                )
                + ")"
            )
        else:
            carr = F.array(
                *[
                    F.struct(
                        F.lit(int(cell)).alias("cell"),
                        F.array(*[F.lit(float(x)) for x in vec])
                        .cast("array<double>")
                        .alias("cvec"),
                    )
                    for cell, vec in ordered
                ]
            )
        # let-bind the doc norm (see _unit: HOF lambdas have no cross-
        # iteration CSE), score every centroid once, then fold an argmax
        # — strict '>' keeps the FIRST (lowest cell) on an exact tie,
        # matching the oracle's (cos desc, cell asc) election.
        scored = F.transform(
            carr,
            lambda c: F.struct(
                c["cell"].alias("cell"),
                (_dot(v, c["cvec"]) / (_norm(v) * _norm(c["cvec"]))).alias(
                    "cos"
                ),
            ),
        )
        best = F.aggregate(
            scored,
            F.struct(F.lit(-1).alias("cell"), F.lit(-2.0).alias("cos")),
            lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
        )
        cell_col = best["cell"]
    else:
        # numpy argmax picks the FIRST max → lowest list index → lowest
        # cell after the sort: same tie election as the literal path.
        nearest = _nearest_centroids_udf([vec for _, vec in ordered], 1)
        cell_labels = F.array(*[F.lit(int(cell)) for cell, _ in ordered])
        cell_col = F.element_at(cell_labels, F.get(nearest(v), 0) + 1)
    if pair_backend in ("auto", "numpy"):
        return _semdedup_pair_prune_numpy(
            corpus, cell_col, float(threshold), id_col, vec_col
        )

    # The norm is computed ONCE per vector here and carried through the
    # pair join: HOF lambdas are interpreted per element, so evaluating
    # _norm per PAIR would triple the pair stage's lambda evals for a
    # bit-identical result (same expression, same rounding — only the
    # evaluation count changes). Measured 3.1 s -> ~1 s at sf0.1.
    assigned = corpus.select(
        F.col(id_col).alias("_sid"),
        F.col(vec_col).alias("_svec"),
        cell_col.alias("cell"),
    ).withColumn("_snorm", _norm(F.col("_svec")))

    a = assigned.select(
        F.col("cell"),
        F.col("_sid").alias("_ida"),
        F.col("_svec").alias("_va"),
        F.col("_snorm").alias("_na"),
    )
    b = assigned.select(
        F.col("cell"),
        F.col("_sid").alias("_idb"),
        F.col("_svec").alias("_vb"),
        F.col("_snorm").alias("_nb"),
    )
    pruned = (
        a.join(b, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .withColumn(
            "_cos",
            _dot(F.col("_va"), F.col("_vb"))
            / (F.col("_na") * F.col("_nb")),
        )
        .filter(F.col("_cos") >= F.lit(float(threshold)))
        .select(F.col("_idb").alias("_pruned_id"))
        .distinct()
    )
    return (
        assigned.join(
            pruned, assigned["_sid"] == pruned["_pruned_id"], "left"
        )
        .select(
            F.col("_sid").alias(id_col),
            "cell",
            F.col("_pruned_id").isNull().alias("keep"),
        )
    )


# --------------------------------------------------------- product quant

def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 256,
    sample: int = 10_000,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Product-quantization codebooks: split the vector into ``m``
    subspaces and k-means each (Jégou et al. 2011 — with IVF, THE
    memory architecture for web-scale ANN: a 64-dim float vector
    becomes ``m`` bytes). Codebooks train on a deterministic
    md5-ordered sample collected driver-side (standard PQ practice —
    codebooks are a few KB of model, not data; the corpus itself never
    leaves the executors) and refine with ``iters`` Lloyd steps in
    numpy. Returns ``m × k × (dim/m)`` nested lists."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    x = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m
    k = min(k, n)
    books = []
    for j in range(m):
        sub = x[:, j * sd : (j + 1) * sd]
        cent = sub[:k].copy()  # md5-ordered sample = deterministic init
        for _ in range(iters):
            d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                sel = sub[assign == c]
                if len(sel):
                    cent[c] = sel.mean(axis=0)
        books.append(cent.tolist())
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each subvector's nearest-centroid index.
    Vectorized numpy inside an Arrow ``mapInPandas`` (the argmin over
    ``k`` centroids per subspace is a dense numeric kernel — the
    documented Pandas-UDF exception; at k=256 a JVM expression tree
    would be thousands of codegen nodes). Explicit fan-out before the
    Python stage, per the guard doctrine."""
    import numpy as np

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sd = books[0].shape[1]

    def _batches(it):
        import pandas as pd

        for pdf in it:
            x = np.asarray(
                [list(v) for v in pdf[vec_col]], dtype=np.float64
            )
            if len(x) == 0:
                yield pd.DataFrame({id_col: pdf[id_col], "codes": []})
                continue
            codes = np.empty((len(x), m), dtype=np.int64)
            for j, cent in enumerate(books):
                sub = x[:, j * sd : (j + 1) * sd]
                d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes.tolist())}
            )

    return (
        emb.select(id_col, vec_col)
        .repartition(emb.sparkSession.sparkContext.defaultParallelism, id_col)
        .mapInPandas(_batches, f"{id_col} long, codes array<int>")
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query precomputes
    its ``m × k`` lookup table driver-side (tiny — the query side is
    always small), the table broadcasts as a literal column, and
    scoring is a pure JVM fold — ``zip_with(codes, table)`` +
    ``element_at`` — so the corpus-sized side never touches Python and
    the scan stays one projection + one TakeOrderedAndProject per
    query. Returns (query_id, neighbor_id, adc, rank)."""
    import numpy as np

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sd = books[0].shape[1]
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    ).collect()
    spark = codes.sparkSession
    tables = []
    for r in qrows:
        q = np.asarray(list(r["_q"]), dtype=np.float64)
        table = [
            ((q[j * sd : (j + 1) * sd][None, :] - cent) ** 2)
            .sum(axis=1)
            .tolist()
            for j, cent in enumerate(books)
        ]
        tables.append((r["query_id"], table))
    qdf = spark.createDataFrame(
        tables, "query_id long, _table array<array<double>>"
    )
    scored = codes.crossJoin(F.broadcast(qdf)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.aggregate(
            F.zip_with(
                "codes", "_table",
                lambda c, t: F.element_at(t, c.cast("int") + 1),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


def ivf_pq_encode(
    emb: DataFrame,
    coarse_centroids: list,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, codes): the full IVF-PQ index entry — nearest coarse
    centroid, then the RESIDUAL (x − centroid) PQ-encoded (Jégou 2011:
    residual encoding is what makes m bytes enough; raw-vector PQ
    wastes its precision re-describing the cell). One vectorized numpy
    pass computes both (same Arrow/fan-out doctrine as
    :func:`pq_encode`). Partition the output by ``cell`` on write and
    a probe prunes to n_probe partitions — the ``ivf_build_index``
    storage layout applies unchanged."""
    import numpy as np

    coarse = np.asarray(coarse_centroids, dtype=np.float64)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sd = books[0].shape[1]

    def _batches(it):
        import pandas as pd

        for pdf in it:
            x = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if len(x) == 0:
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "cell": [], "codes": []}
                )
                continue
            d = ((x[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
            cell = d.argmin(axis=1)
            resid = x - coarse[cell]
            codes = np.empty((len(x), m), dtype=np.int64)
            for j, cent in enumerate(books):
                sub = resid[:, j * sd : (j + 1) * sd]
                dj = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = dj.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cell.tolist(),
                    "codes": list(codes.tolist()),
                }
            )

    return (
        emb.select(id_col, vec_col)
        .repartition(emb.sparkSession.sparkContext.defaultParallelism, id_col)
        .mapInPandas(_batches, f"{id_col} long, cell int, codes array<int>")
    )


def ivf_pq_topk(
    index: DataFrame,
    coarse_centroids: list,
    codebooks: list,
    queries: DataFrame,
    n_probe: int = 8,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search over an :func:`ivf_pq_encode` index: each query
    probes its ``n_probe`` nearest cells with a PER-CELL lookup table
    built from the query's residual against that cell (driver-side —
    n_queries × n_probe × m × k floats, model-sized). The probe list
    broadcasts as (query_id, cell, table) rows, the join on ``cell``
    prunes the corpus to the probed cells (partition pruning when the
    index is cell-partitioned parquet), and scoring is the same pure
    JVM zip_with/element_at fold as :func:`pq_adc_topk`."""
    import numpy as np

    coarse = np.asarray(coarse_centroids, dtype=np.float64)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sd = books[0].shape[1]
    spark = index.sparkSession
    probes = []
    for r in queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    ).collect():
        q = np.asarray(list(r["_q"]), dtype=np.float64)
        dc = ((q[None, :] - coarse) ** 2).sum(axis=1)
        order = np.argsort(dc, kind="stable")[:n_probe]
        for cell in order:
            resid = q - coarse[cell]
            table = [
                ((resid[j * sd : (j + 1) * sd][None, :] - cent) ** 2)
                .sum(axis=1)
                .tolist()
                for j, cent in enumerate(books)
            ]
            probes.append((r["query_id"], int(cell), table))
    pdf = spark.createDataFrame(
        probes, "query_id long, cell int, _table array<array<double>>"
    )
    scored = index.join(F.broadcast(pdf), "cell").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.col("cell"),
        F.aggregate(
            F.zip_with(
                "codes", "_table",
                lambda c, t: F.element_at(t, c.cast("int") + 1),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("adc"),
    )
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


# -------------------------------------------------- text -> vector bridge


@column_memo
def _embed_grams_column(include_bigrams: bool):
    """Unigram(+bigram) gram array over the bound token array ``__w``
    — pure in the bigram flag; memoized (r13 construction economy;
    exprcache doc)."""
    w = F.col("__w")
    if not include_bigrams:
        return w
    tail = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(w, 1, tail).alias("a"), F.slice(w, 2, tail).alias("b")
        ),
        lambda p: F.concat_ws(" ", p["a"], p["b"]),
    )
    return F.concat(w, bigrams)


@column_memo
def _embed_dense_column(dim: int):
    """Bucket map ``m`` + sum-of-squares ``ss`` → L2-normalized dense
    vector — pure in ``dim``; memoized."""
    m, ss = F.col("m"), F.col("ss")
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            ss > 0,
            F.coalesce(m[i.cast("long")], F.lit(0)).cast("double")
            / F.sqrt(ss.cast("double")),
        ).otherwise(F.lit(0.0)),
    )


def embed_hashed_text(
    docs: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    word_pattern: str = r"\S+",
    include_bigrams: bool = True,
) -> DataFrame:
    """Deterministic feature-hashed n-gram embeddings (Weinberger et
    al. 2009, "Feature Hashing for Large Scale Multitask Learning") —
    the bridge that lets the WHOLE vector stack (semdedup_prune,
    rp_lsh_topk, embedding_cross_contamination, ivf_*) run END-TO-END
    from raw text with no external model: unigrams (+ bigrams) hash to
    ``bucket = md5[0:8] mod dim`` with a ±1 sign from the 9th md5
    nibble's top bit, signed counts accumulate per bucket (exact
    integers), and the dense vector is the L2-normalized count array.

    Returns ``(id_col, n_grams, embedding array<double>)`` — one row
    per input doc; empty/NULL text gives ``n_grams = 0`` and the zero
    vector (never NULL, never NaN). md5 (not xxhash64) so ANY engine
    reproduces the buckets; the signed-sum-then-single-divide shape
    keeps every element a correctly-rounded function of exact integers
    (no float accumulation order anywhere), so two engines produce
    bit-identical vectors.

    Scale shape: gram explosion is map-side; one shuffle on
    (id, bucket) for the signed counts, one on id for assembly — both
    key-parallel, no Python, no driver state. The dense array is
    ``dim`` doubles per doc; keep dim at the hundreds for dedup
    bridging (hash collisions are the accepted trade of the method).
    """
    if dim < 2:
        raise ValueError("dim must be >= 2")
    words = F.regexp_extract_all(F.col(text_col), F.lit(word_pattern), F.lit(0))
    toks = docs.select(F.col(id_col).alias("__id"), words.alias("__w"))
    grams = _embed_grams_column(include_bigrams)
    h = F.md5("gram")
    # explode_outer + isNotNull ≡ explode here (elements are never
    # null), minus InferFiltersFromGenerate's size(grams)>0 filter,
    # which would re-evaluate the tokenizer+bigram build a second time
    # below the exchange (the r13 posting-build lesson, dedup.py).
    sparse = (
        toks.select("__id", F.explode_outer(grams).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .select(
            "__id",
            F.pmod(
                F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                F.lit(int(dim)),
            ).alias("bucket"),
            F.when(
                F.substring(h, 9, 1).isin(*"01234567"), F.lit(1)
            ).otherwise(F.lit(-1)).alias("sign"),
        )
        .groupBy("__id", "bucket")
        .agg(F.sum("sign").alias("v"), F.count(F.lit(1)).alias("n"))
    )
    assembled = sparse.groupBy("__id").agg(
        F.sum("n").alias("n_grams"),
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))
        ).alias("m"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    dense = _embed_dense_column(int(dim))
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(assembled, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce(
                dense,
                F.array_repeat(F.lit(0.0), int(dim)),
            ).alias("embedding"),
        )
    )
