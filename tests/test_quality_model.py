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


def test_score_with_weights_matches_hand_sigmoid(spark):
    """Frozen-weights scoring (the r6 quality_model_score gate path) is
    a pure function of its coefficient dict: verify against a
    driver-side numpy sigmoid, including null→0 feature handling and
    the 6dp logit quantization."""
    import math

    from sqlbackuphistoryetl_spark.extensions.quality_model import (
        score_with_weights,
    )

    rows = [(1, 2.0, 0.5), (2, -1.0, None), (3, 0.0, 3.25)]
    df = spark.createDataFrame(rows, ["id", "fa", "fb"])
    w = {"fa": 0.7, "fb": -1.3}
    out = {
        r["id"]: (r["quality_prob"], r["quality_pred"])
        for r in score_with_weights(df, w, 0.25, quantize_dp=6).collect()
    }
    for rid, fa, fb in rows:
        z = 0.25 + 0.7 * fa + -1.3 * (fb if fb is not None else 0.0)
        zq = math.floor(z * 1e6 + 0.5) / 1e6
        want = 1.0 / (1.0 + math.exp(-zq))
        got_prob, got_pred = out[rid]
        assert got_prob == pytest.approx(want, abs=1e-12)
        assert got_pred == (1.0 if want >= 0.5 else 0.0)


def test_score_quality_delegates_to_unrolled_weights(spark):
    """score_quality(model, ·) must equal score_with_weights on the
    model's own coefficients — pinning the refactor seam."""
    from sqlbackuphistoryetl_spark.extensions.quality_model import (
        score_with_weights,
    )

    docs = _labeled_corpus(spark)
    feats = quality_feature_frame(docs).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    model = train_quality_model(feats, QUALITY_FEATURES, reg_param=0.01)
    lr = model.stages[-1]
    w = dict(zip(QUALITY_FEATURES, (float(x) for x in lr.coefficients.toArray())))
    a = {r["doc_id"]: r["quality_prob"]
         for r in score_quality(model, feats).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in score_with_weights(feats, w, float(lr.intercept)).collect()}
    assert a == b
