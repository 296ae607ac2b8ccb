"""longest_name — the engine-wide display-name reduction must be
deterministic on equal-length ties and associative (a two-level
incremental merge must pick the same winner as a one-level full pass),
or incremental maintenance diverges from the full rebuild it claims to
equal exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_reason_spark.functions.names import longest_name


def _winner(spark, names):
    df = spark.createDataFrame([(1, n) for n in names], "id int, name string")
    return df.groupBy("id").agg(
        longest_name("name").alias("w")).collect()[0]["w"]


def test_longest_wins(spark):
    assert _winner(spark, ["ab", "abcd", "abc"]) == "abcd"


def test_equal_length_tie_is_deterministic_lexicographic_max(spark):
    # equal lengths: greatest string wins, regardless of row order
    assert _winner(spark, ["alpha", "zeta1", "gamma"]) == "zeta1"
    assert _winner(spark, ["zeta1", "gamma", "alpha"]) == "zeta1"


def test_two_level_merge_equals_one_level(spark):
    """Associativity: reduce two halves then merge the winners == reduce
    all rows at once — the exact shape of the incremental title merge
    (old state max re-merged with the batch max)."""
    names = ["delta", "omega", "kappa", "aa", "zzzzz"]
    full = _winner(spark, names)
    w1 = _winner(spark, names[:2])
    w2 = _winner(spark, names[2:])
    merged = _winner(spark, [w1, w2])
    assert merged == full == "zzzzz"
