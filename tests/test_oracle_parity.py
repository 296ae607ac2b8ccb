"""Replica of the driver's correctness gate: every queries() entry must
match its oracle_sql() DuckDB result exactly (columns sorted by name, rows
sorted by all columns, values equal) at sf0.001."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from deep_reason_spark.oracle_check import run_parity
from deep_reason_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


def test_registry_consistency():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 30
    assert entrymod.queries().keys() == QUERIES.keys()
    assert entrymod.oracle_sql().keys() == ORACLES.keys()
    # the dict order IS the driver sweep order, derived mechanically from
    # the CORRECTNESS_r*.json artifacts (VERDICT r4 task 1). Assert the
    # rotation INVARIANTS rather than a hand-pinned list:
    from deep_reason_spark.queries import (
        _PLAN_CHANGED_THIS_ROUND,
        _driver_green_history,
    )
    order = list(QUERIES)
    hist = _driver_green_history()
    n_front = len(_PLAN_CHANGED_THIS_ROUND) + sum(
        1 for q in QUERIES if q not in hist)
    # 1. plan-changed / never-green queries lead the sweep
    assert set(order[:n_front]) >= _PLAN_CHANGED_THIS_ROUND
    # 2. freshness: any query whose newest driver-green row predates the
    #    newest recorded round sits inside the driver's 50-row prefix
    latest = max((r[-1] for r in hist.values()), default=0)
    stale = [q for q in QUERIES
             if hist.get(q, [0])[-1] < latest or q not in hist]
    for q in stale:
        assert order.index(q) < 50, (
            f"{q} has stale driver evidence but sits outside the prefix")
    # 3. only queries green in the newest round may fall off the end
    for q in order[50:]:
        assert hist.get(q) and hist[q][-1] == latest \
            and q not in _PLAN_CHANGED_THIS_ROUND, (
            f"{q} lacks newest-round green evidence yet fell off the prefix")
    from deep_reason_spark.queries import SWEEP_UNLISTED
    assert SWEEP_UNLISTED == []


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"predicate", "n_triples", "n_subjects"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    res = run_parity(spark, SF_DIR, [name])
    if name not in ORACLES:
        # oracle-less queries get an explicit rows-only marker, never a
        # silent pass (ADVICE r1: the old branch was unconditionally true)
        assert res[name] and res[name][0].startswith("no oracle"), res[name]
    else:
        assert res[name] == [], f"{name}: {res[name][:3]}"


# The CLAUDE.md contract's SECOND scale. Opt-in (SPARK_GRAFT_PARITY_SF01=1)
# because it adds ~10 min to every pytest run; the committed
# scripts/parity_sweep.py runs the same gate for all queries in driver
# sweep order and records the artifact (VERDICT r3 task 3).
@pytest.mark.skipif(not os.environ.get("SPARK_GRAFT_PARITY_SF01"),
                    reason="sf0.01 parity leg: set SPARK_GRAFT_PARITY_SF01=1 "
                           "or run scripts/parity_sweep.py")
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf01(spark, name):
    res = run_parity(spark, SF01_DIR, [name])
    if name not in ORACLES:
        assert res[name] and res[name][0].startswith("no oracle"), res[name]
    else:
        assert res[name] == [], f"{name}: {res[name][:3]}"
