"""Answer-quality judge tests (scoring/answer_quality.py:8-59 contract)."""

from __future__ import annotations

from deep_reason_spark.operators.scoring import answer_quality


def _score(spark, gen, ref, ctx):
    df = spark.createDataFrame(
        [(gen, ref, ctx)],
        "generated_answer string, real_answer string, context string")
    return answer_quality(df).collect()[0]


def test_perfect_answer_scores_ten(spark):
    r = _score(spark, "the moon orbits earth", "the moon orbits earth",
               "the moon orbits earth every month")
    assert r.consistency == 1.0 and r.similarity == 1.0 and r.completeness == 1.0
    assert r.score == 10.0


def test_disjoint_answer_scores_zero(spark):
    r = _score(spark, "bananas are yellow", "relativity bends spacetime",
               "physics text about relativity and spacetime")
    assert r.similarity == 0.0 and r.completeness == 0.0
    assert r.score < 3.4  # only (partial) consistency can contribute


def test_hallucination_lowers_consistency_only(spark):
    # answer repeats the reference but adds tokens absent from the context
    r = _score(spark, "gravity pulls objects downwards zorblex",
               "gravity pulls objects downwards",
               "notes that gravity pulls objects downwards")
    assert r.similarity < 1.0  # extra token breaks exact jaccard
    assert r.completeness == 1.0
    assert r.consistency == 0.8  # 4 of 5 tokens grounded in context


def test_empty_strings_score_zero(spark):
    r = _score(spark, "", "", "")
    assert r.score == 0.0


def test_scale_bounds(spark):
    r = _score(spark, "alpha beta gamma", "alpha delta", "alpha beta")
    for c in ("consistency", "similarity", "completeness"):
        assert 0.0 <= r[c] <= 1.0
    assert 0.0 <= r.score <= 10.0
