"""Token-budget batching tests (reference kg_agent/utils.py:49-81 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_reason_spark.functions.batching import (
    assign_batches_cumsum,
    assign_batches_grouped,
)


def _df(spark, tokens):
    rows = [("g", i, t) for i, t in enumerate(tokens)]
    return spark.createDataFrame(rows, "grp string, seq int, tokens int")


def test_greedy_packing_exact(spark):
    # budget 10: [4, 4, 4] -> batches [0, 0, 1] (third would overflow)
    out = assign_batches_grouped(_df(spark, [4, 4, 4]), ["grp"], ["seq"],
                                 "tokens", 10).orderBy("seq").collect()
    assert [r.batch_id for r in out] == [0, 0, 1]


def test_greedy_never_overflows_budget(spark):
    tokens = [3, 9, 2, 8, 1, 1, 1, 7, 5, 5, 5, 2]
    out = assign_batches_grouped(_df(spark, tokens), ["grp"], ["seq"],
                                 "tokens", 10)
    sums = (out.groupBy("batch_id").agg(F.sum("tokens").alias("s"),
                                        F.count("*").alias("n")).collect())
    assert all(r.s <= 10 for r in sums)


def test_oversize_item_is_solo_batch(spark):
    # reference raises on a single item > budget (utils.py:64-66);
    # we isolate it instead — never fatal, and it shares a batch with nobody
    out = assign_batches_grouped(_df(spark, [4, 25, 4]), ["grp"], ["seq"],
                                 "tokens", 10).orderBy("seq").collect()
    ids = [r.batch_id for r in out]
    assert ids[0] != ids[1] and ids[1] != ids[2]


def test_batches_are_dense_and_ordered(spark):
    tokens = [5, 5, 5, 5, 5, 5]
    out = assign_batches_grouped(_df(spark, tokens), ["grp"], ["seq"],
                                 "tokens", 10).orderBy("seq").collect()
    assert [r.batch_id for r in out] == [0, 0, 1, 1, 2, 2]


def test_cumsum_variant_never_overshoots_by_more_than_one_item(spark):
    tokens = [3, 9, 2, 8, 1, 1, 1, 7, 5, 5, 5, 2]
    out = assign_batches_cumsum(_df(spark, tokens), ["grp"], ["seq"],
                                "tokens", 10)
    sums = out.groupBy("batch_id").agg(F.sum("tokens").alias("s"),
                                       F.max("tokens").alias("mx")).collect()
    assert all(r.s - r.mx < 10 for r in sums)  # ≤ budget before the last item


def test_multiple_groups_independent(spark):
    rows = [("a", 0, 6), ("a", 1, 6), ("b", 0, 6), ("b", 1, 3)]
    df = spark.createDataFrame(rows, "grp string, seq int, tokens int")
    out = {(r.grp, r.seq): r.batch_id
           for r in assign_batches_grouped(df, ["grp"], ["seq"], "tokens", 10).collect()}
    assert out[("a", 0)] == 0 and out[("a", 1)] == 1  # 6+6 > 10 → split
    assert out[("b", 0)] == 0 and out[("b", 1)] == 0  # 6+3 ≤ 10 → together
