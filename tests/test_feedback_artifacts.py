"""Feedback ingestion ordering + quality-model artifact round-trip."""

import datetime

from azure_based_pii_redactor_spark.engine.feedback import (
    load_training_feedback,
)
from azure_based_pii_redactor_spark.engine.schema import (
    TRAINING_FEEDBACK_SCHEMA,
)
from azure_based_pii_redactor_spark.kernel.training import (
    get_training_feedback,
)
from azure_based_pii_redactor_spark.quality.artifacts import (
    save_models,
    verify_roundtrip,
)


def test_feedback_load_orders_by_timestamp(spark):
    ts = datetime.datetime
    rows = [
        # deliberately shuffled on disk: newest first
        ("x", "t", 0.5, "incorrect", 0.9, "", ts(2024, 5, 1), "s2"),
        ("x", "t", 0.5, "correct", 0.9, "", ts(2024, 1, 1), "s1"),
    ]
    df = spark.createDataFrame(rows, TRAINING_FEEDBACK_SCHEMA)
    fb = load_training_feedback(spark, df)
    assert [f["user_decision"] for f in fb] == ["correct", "incorrect"]
    # latest-wins: the May 'incorrect' must decide (0.05)
    score, found = get_training_feedback("x", "t", fb)
    assert found and score == 0.05


def test_feedback_roundtrip_from_parquet(spark, tmp_path):
    ts = datetime.datetime
    rows = [("a", "e", 0.1, "correct", 1.0, "ctx", ts(2024, 2, 2), "s")]
    p = str(tmp_path / "fb")
    spark.createDataFrame(rows, TRAINING_FEEDBACK_SCHEMA).write.parquet(p)
    fb = load_training_feedback(spark, p)
    assert fb[0]["entity_text"] == "a" and fb[0]["user_decision"] == "correct"


def test_model_artifacts_roundtrip(spark, tmp_path):
    base = str(tmp_path / "models")
    save_models(spark, base)
    assert verify_roundtrip(spark, base)
    # artifact shape sanity: trigram table covers the live vocab
    lt = spark.read.parquet(f"{base}/langid_trigrams")
    assert lt.count() > 1000
    assert spark.read.parquet(f"{base}/lm_bigrams").count() > 200


def test_feedback_missing_required_column_fails_loudly(spark):
    """A renamed/mis-cased feedback column must raise, not silently
    disable every human correction downstream."""
    import pytest

    from azure_based_pii_redactor_spark.engine.feedback import (
        load_training_feedback,
    )

    bad = spark.createDataFrame(
        [("x", "email", "correct")],
        "entityText string, entity_type string, decision string",
    )
    with pytest.raises(ValueError, match="missing required columns"):
        load_training_feedback(spark, bad)
