"""Shared Spark fixture for the test suite (session-scoped, local mode)."""

from __future__ import annotations

import pytest

from deep_reason_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="deep_reason_spark-tests", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
