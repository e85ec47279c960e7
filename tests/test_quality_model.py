"""MLlib-backed quality classifier (extensions/quality_model.py):
planted-signal recovery, map-side scoring, feature-frame wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.quality_model import (
    QUALITY_FEATURES,
    quality_feature_frame,
    score_quality,
    train_quality_model,
)


def _labeled_corpus(spark):
    """Planted signal: 'good' docs are English-ish sentences; 'bad'
    docs are punctuation-heavy gibberish."""
    good = [(i, "the quick brown fox is a good and clean document "
             f"with many of the usual words in it number {i}", 1.0)
            for i in range(60)]
    bad = [(1000 + i, "@@!! ###" + "%$" * (i % 7 + 3) + " zzkqj !!", 0.0)
           for i in range(60)]
    return spark.createDataFrame(good + bad, ["doc_id", "text", "label"])


def test_quality_model_recovers_planted_signal(spark):
    docs = _labeled_corpus(spark)
    feats = quality_feature_frame(docs).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    # small L2: the planted classes are perfectly separable, and an
    # UNregularized logistic optimum diverges (coefficients → ∞) —
    # L-BFGS then stops at a path-dependent point, which made this test
    # order-dependent inside the full suite. Regularized, the optimum
    # is unique and strongly convex: same model from any state.
    model = train_quality_model(feats, QUALITY_FEATURES, reg_param=0.01)
    scored = score_quality(model, feats)
    acc = scored.filter(
        (F.col("quality_pred") == F.col("label"))
    ).count() / scored.count()
    assert acc >= 0.95
    probs = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert probs[0] > 0.8 and probs[1000] < 0.2


def test_scoring_is_map_side(spark):
    from tests.test_plans_physical import _explain

    docs = _labeled_corpus(spark)
    feats = quality_feature_frame(docs).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    model = train_quality_model(feats, QUALITY_FEATURES)
    # scoring a feature frame (already materialized) adds no exchange
    frozen = spark.createDataFrame(feats.collect(), feats.schema)
    plan = _explain(score_quality(model, frozen))
    assert "Exchange" not in plan


def test_empty_features_rejected(spark):
    docs = _labeled_corpus(spark)
    with pytest.raises(ValueError):
        train_quality_model(docs, [])
