"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship pipeline shape (chunk → extract triples → hot-
              predicate aggregate) over the sf0.001 documents corpus.
``queries`` — one entry per implemented operator from SURVEY.md §2 (plus
              the training-data-pipeline operators), from the registry in
              ``deep_reason_spark.queries``.
``oracle_sql`` — DuckDB-equivalent SQL per query, value-parity verified
              locally at sf0.001 and sf0.01 (see tests/test_oracle_parity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deep_reason_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the KG-construction shape
    (corpus → chunks → triples → predicate aggregation) end-to-end."""
    from deep_reason_spark.queries_text import q_kg_predicate_counts

    return q_kg_predicate_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
