"""Token-budget batch assignment (SURVEY.md A2).

Reference semantics reproduced (deep-reason ``kg_agent/utils.py:49-81``):
greedily pack items into batches whose token total stays ≤ budget; a new
batch starts when the next item would overflow. The reference RAISES if a
single item exceeds the budget; at corpus scale a poison item must not kill
the job, so an oversize item is placed alone in its own batch and counted.

Two implementations, same contract:
- ``assign_batches_grouped``: exact greedy fold per group via
  ``applyInPandas`` (the greedy reset is inherently sequential, so the
  group — a document, a repo — is the parallelism unit);
- ``assign_batches_cumsum``: shuffle-free approximation
  ``floor(cumsum/budget)`` — batches may undershoot the budget but never
  overshoot it by more than one item; right when exact packing doesn't
  matter (it rarely does for LLM batching).

In the flagship pipeline the Arrow batch size plays this role
(SURVEY.md §2.10); this operator exists for parity and for callers that
batch by token counts explicitly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_batches_grouped(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Exact greedy packing per group (reference fold, utils.py:60-78):
    adds ``batch_id`` (int, dense per group in order)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField("batch_id", IntegerType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        batch, acc, ids = 0, 0, []
        for t in pdf[tokens_col]:
            t = int(t)
            if acc > 0 and acc + t > budget:
                batch += 1
                acc = 0
            # oversize item: alone in its batch (reference raises,
            # utils.py:64-66 — dropped-to-solo here, never fatal)
            ids.append(batch)
            acc += t
            if t > budget:
                batch += 1
                acc = 0
        pdf["batch_id"] = pd.Series(ids, dtype="int32")
        return pdf

    return df.groupBy(*group_cols).applyInPandas(pack, out_schema)


def assign_batches_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Windowed approximation: batch_id = floor((cumsum − tokens) / budget);
    one shuffle, no Python."""
    w = (
        Window.partitionBy(*group_cols).orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "batch_id",
        F.floor((F.sum(tokens_col).over(w) - F.col(tokens_col)) / F.lit(budget))
        .cast("int"),
    )
