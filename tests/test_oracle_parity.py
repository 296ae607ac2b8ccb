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
    # the dict order IS the driver sweep order — new/changed queries must
    # lead (driver records only a ~50-row prefix; VERDICT r3 task 1)
    assert list(QUERIES)[:5] == ["t9_topic_aspects", "rag_ivf_retrieval",
                                 "e1_apply_edits", "e2_edit_metrics",
                                 "ga1_chain_relationships"]
    # every query must be CONSCIOUSLY placed: unlisted ones are auto-
    # prepended (import never fails — driver safety) but flagged here
    from deep_reason_spark.queries import SWEEP_UNLISTED
    assert SWEEP_UNLISTED == [], (
        f"place {SWEEP_UNLISTED} in _SWEEP_ORDER (new queries go FIRST)")


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
