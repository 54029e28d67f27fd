"""DSIR-style importance selection (engine/operators/dsir.py): the
integer-exact lean score the driver oracle checks, and the
paper-faithful float log-ratio + Gumbel-top-k resampler (pytest-pinned:
floats cannot be hashed cross-engine)."""

import pytest
from pyspark.sql import functions as F

import azure_based_pii_redactor_spark.engine.operators.dsir as dsir


def _corpus(spark):
    """Controlled corpus: targets speak 'alpha beta gamma'; raw doc 0
    is target-like, raw docs 1-2 are junk-only.  All tokens hash to
    DISTINCT md5 buckets mod 256 (verified; 'noise' was rejected -- it
    collides with 'alpha' in bucket 251, which flipped a junk token
    target-leaning), so bucket stats are exactly knowable and the
    deterministic collisions stay out of the arithmetic."""
    rows = [
        (100, "alpha beta gamma alpha beta", True),
        (101, "gamma alpha beta gamma", True),
        (0, "alpha beta alpha", False),
        (1, "junk spam junk spam", False),
        (2, "spam fuzz junk", False),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_t boolean"
    )


def test_lean_score_integer_semantics(spark):
    d = _corpus(spark)
    scores = {
        r.doc_id: r.score
        for r in dsir.dsir_lean_score(d, "is_t", keep_cols=()).collect()
    }
    # target docs are never candidates
    assert set(scores) == {0, 1, 2}
    # doc 0's tokens all live in target-leaning buckets (+1 each);
    # junk/spam/noise never appear in the target => raw-leaning (-1)
    assert scores[0] == 3
    assert scores[1] == -4
    assert scores[2] == -3
    # top-k is (score DESC, id ASC), deterministic
    top = dsir.dsir_select_topk(
        dsir.dsir_lean_score(d, "is_t"), k=2
    ).collect()
    assert [r.doc_id for r in top] == [0, 2]


def test_lean_score_plan_shape(spark):
    """Scale pins: bucket stats flow back via BROADCAST hash join, the
    totals are a 1-row broadcast (nested-loop is fine at 1 row), no
    cartesian product, no Python eval in the plan."""
    d = _corpus(spark)
    plan = (
        dsir.dsir_lean_score(d, "is_t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    tplan = (
        dsir.dsir_select_topk(dsir.dsir_lean_score(d, "is_t"), k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in tplan


def test_importance_weights_rank_and_smoothing(spark):
    d = _corpus(spark)
    w = {
        r.doc_id: r.log_weight
        for r in dsir.dsir_importance_weights(d, "is_t").collect()
    }
    assert set(w) == {0, 1, 2}
    # target-like doc outweighs junk docs; all weights finite (the
    # add-alpha smoothing keeps unseen-in-target buckets off -inf)
    assert w[0] > w[1] and w[0] > w[2]
    import math

    assert all(math.isfinite(v) for v in w.values())
    # the lean score is the sign-quantized twin: ordering agrees on
    # this corpus
    s = {
        r.doc_id: r.score
        for r in dsir.dsir_lean_score(d, "is_t").collect()
    }
    assert sorted(w, key=w.get) == sorted(s, key=lambda k: (s[k], -k))


def test_resample_deterministic_gumbel(spark):
    d = _corpus(spark)
    weights = dsir.dsir_importance_weights(d, "is_t")
    a = [r.doc_id for r in dsir.dsir_resample(weights, k=2, seed=7).collect()]
    b = [r.doc_id for r in dsir.dsir_resample(weights, k=2, seed=7).collect()]
    assert a == b and len(a) == 2 and len(set(a)) == 2  # no replacement
    # a HEAVILY weighted doc wins under any seed: push doc 0's weight up
    boosted = weights.withColumn(
        "log_weight",
        F.when(F.col("doc_id") == 0, F.col("log_weight") + 1e6)
        .otherwise(F.col("log_weight")),
    )
    for seed in range(5):
        top = dsir.dsir_resample(boosted, k=1, seed=seed).collect()
        assert top[0].doc_id == 0
    # k > corpus returns everything, once
    assert sorted(
        r.doc_id for r in dsir.dsir_resample(weights, k=10).collect()
    ) == [0, 1, 2]


def test_driver_leg_constants_sane():
    """The driver leg's stand-in target modulus differs from
    decontamination's (two stand-in subsets, not the same docs), and
    k is below the smallest shipped corpus."""
    import azure_based_pii_redactor_spark.engine.operators.textstats as ts

    assert dsir.DSIR_TARGET_MOD != ts.EVAL_MOD
    assert dsir.DSIR_TOP_K <= 50


def test_select_threshold_scale_path(spark):
    """The threshold form of selection: kept fraction ~ keep_frac
    (over-keeping only, ties all kept), exact boundary invariant
    (every kept score >= every dropped score), deterministic, and a
    plain Filter plan -- no Sort / rank window / TakeOrdered."""
    scores = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
    )
    kept = dsir.dsir_select_threshold(scores, keep_frac=0.1)
    rows = kept.collect()
    n = len(rows)
    # >= the asked fraction, within one tie-class of it (score has 97
    # distinct values over 1000 rows -> one class is ~11 rows)
    assert 100 <= n <= 125
    min_kept = min(r.score for r in rows)
    dropped_max = (
        scores.filter(F.col("score") < min_kept)
        .agg(F.max("score"))
        .collect()[0][0]
    )
    assert dropped_max < min_kept
    assert scores.count() == n + scores.filter(
        F.col("score") < min_kept
    ).count()  # kept = everything at/above the cutoff, nothing else
    # deterministic: same frame, same selection
    again = sorted(r.doc_id for r in
                   dsir.dsir_select_threshold(scores, 0.1).collect())
    assert again == sorted(r.doc_id for r in rows)
    # plan: plain Filter, no global order anywhere
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "TakeOrderedAndProject" not in plan
    # degenerate inputs: empty frame -> empty, keep all -> all
    empty = scores.filter(F.col("score") < 0)
    assert dsir.dsir_select_threshold(empty, 0.5).count() == 0
    assert dsir.dsir_select_threshold(scores, 1.0).count() == 1000
