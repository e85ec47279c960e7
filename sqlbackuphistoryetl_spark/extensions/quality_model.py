"""Trainable document-quality classifier (fastText-style linear model
over the engine's own quality signals), on Spark MLlib.

The heuristic quality features in ``functions/textfns.py`` (length,
punctuation/stopword ratios, repetition, entropy, surprisal) are the
standard *inputs* to a learned quality gate: label a seed set (e.g.
curated reference docs = 1, raw crawl = 0), fit a logistic model, score
the whole corpus, threshold. This module wires that loop Spark-first:

- features assemble from ANY numeric columns (the caller picks which
  engine signals to use);
- training is MLlib ``LogisticRegression`` — distributed L-BFGS, no
  driver-side data movement beyond the coefficient vector;
- scoring is a fitted-pipeline transform — one map-side pass, vector
  assembly + a dot product per row.

Determinism note: L-BFGS over floats is NOT bit-reproducible across
partitionings, so the model itself has no DuckDB oracle (documented
rows-only territory); what IS asserted in tests: separable planted
labels recover with high accuracy, scoring is a pure map (no shuffle),
and coefficients' signs match the planted signal direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_quality_model(
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.0,
):
    """Fit the quality classifier. Returns a fitted PipelineModel whose
    ``transform`` adds ``quality_prob`` (P[label=1]) and
    ``quality_pred``."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    va = VectorAssembler(
        inputCols=feature_cols, outputCol="_features", handleInvalid="keep"
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        probabilityCol="_prob",
        predictionCol="quality_pred",
        rawPredictionCol="_raw",
    )
    return Pipeline(stages=[va, lr]).fit(labeled)


def score_with_weights(
    docs: DataFrame,
    weights: dict[str, float],
    intercept: float,
    quantize_dp: int | None = None,
) -> DataFrame:
    """Score with EXPLICIT frozen coefficients: input columns +
    ``quality_prob`` ∈ [0,1] + ``quality_pred``.

    The linear term is a plain codegen'd expression (one dot product per
    row, summed in ``weights`` iteration order; nulls scored as 0).
    With ``quantize_dp`` set, the pre-sigmoid logit is quantized to that
    many decimal places via ``floor(z·10^dp + 0.5)/10^dp`` — pure IEEE
    double ops that are bit-identical in every engine — so a SQL oracle
    computing the same features sees the exact same sigmoid input (the
    tfidf/entropy transcendental doctrine: quantize the transcendental's
    INPUT, round its output).
    """
    z = F.lit(float(intercept))
    for c, w in weights.items():
        z = z + F.lit(float(w)) * F.coalesce(F.col(c).cast("double"), F.lit(0.0))
    if quantize_dp is not None:
        scale = float(10**quantize_dp)
        z = F.floor(z * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return docs.withColumn("quality_prob", prob).withColumn(
        "quality_pred", (F.col("quality_prob") >= 0.5).cast("double")
    )


def score_quality(model, docs: DataFrame) -> DataFrame:
    """Score a corpus with a FITTED model: input columns +
    ``quality_prob`` ∈ [0,1] + ``quality_pred``.

    Scoring deliberately does NOT call ``model.transform``: the fitted
    coefficients are unrolled into a plain codegen'd sigmoid expression
    via :func:`score_with_weights`. Besides keeping the whole scoring
    pass inside whole-stage codegen (no vector UDT columns), this
    sidesteps a Spark 4.1 serialization hazard —
    ``ProbabilisticClassificationModel.transform``'s prediction lambda
    captures the session's ObservationManager, which is not
    serializable once any ``Observation`` has been registered on the
    session (our ETL merge path registers them; observed as
    ``Task not serializable: ObservationManager`` only in whole-suite
    runs).
    """
    lr = model.stages[-1]
    feature_cols = list(model.stages[0].getInputCols())
    coefs = list(lr.coefficients.toArray())
    return score_with_weights(
        docs,
        dict(zip(feature_cols, (float(w) for w in coefs))),
        float(lr.intercept),
    )


def quality_feature_frame(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The engine's standard quality signals as a numeric feature frame
    ready for :func:`train_quality_model`: token count, chars/token,
    punctuation ratio, stopword ratio (en), plus char entropy — joined
    on the doc id (entropy needs its own aggregate pass)."""
    from sqlbackuphistoryetl_spark.functions.textfns import (
        char_entropy_profile,
        punct_count,
        stopword_hits,
        whitespace_token_count,
    )

    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        whitespace_token_count(text_col).cast("double").alias("f_tokens"),
        (
            F.length(text_col).cast("double")
            / F.greatest(whitespace_token_count(text_col), F.lit(1)).cast("double")
        ).alias("f_chars_per_tok"),
        (
            punct_count(text_col).cast("double")
            / F.greatest(F.length(text_col), F.lit(1)).cast("double")
        ).alias("f_punct_ratio"),
        (
            stopword_hits(text_col, "en").cast("double")
            / F.greatest(whitespace_token_count(text_col), F.lit(1)).cast("double")
        ).alias("f_stopword_ratio"),
    )
    ent = char_entropy_profile(docs, text_col, id_col).select(
        id_col, F.col("entropy_bits").alias("f_entropy")
    )
    return base.join(ent, id_col, "left").fillna({"f_entropy": 0.0})


QUALITY_FEATURES = [
    "f_tokens", "f_chars_per_tok", "f_punct_ratio",
    "f_stopword_ratio", "f_entropy",
]
