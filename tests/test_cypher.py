"""Cypher-subset compiler tests — pattern chaining, property filters,
aggregation, and the validator's precise rejections (the deterministic
re-expression of baseline/langchain_baseline_graph.py's
generate → validate → execute loop)."""

from __future__ import annotations

import pytest

from deep_reason_spark.operators.cypher import CypherError, run_cypher

EDGES = [
    ("ada", "engine", "developed"), ("alan", "engine", "developed"),
    ("ada", "acme", "works at"), ("engine", "store", "depends on"),
    ("grace", "store", "developed"),
]
NODES = [("ada", "Ada Lovelace", "person"), ("alan", "Alan Turing", "person"),
         ("grace", "Grace Hopper", "person"),
         ("engine", "Query Engine", "project"),
         ("store", "Vector Store", "project"), ("acme", "Acme Labs", "org")]


@pytest.fixture(scope="module")
def g(spark):
    e = spark.createDataFrame(EDGES, "source string, target string, description string")
    n = spark.createDataFrame(NODES, "id string, title string, type string")
    return e, n


def test_single_hop_projection(spark, g):
    e, n = g
    out = run_cypher(
        "MATCH (a)-[:developed]->(p) RETURN a.title AS dev, p.title AS proj",
        e, n)
    assert {(r.dev, r.proj) for r in out.collect()} == {
        ("Ada Lovelace", "Query Engine"), ("Alan Turing", "Query Engine"),
        ("Grace Hopper", "Vector Store")}


def test_two_hop_with_where_and_count(spark, g):
    e, n = g
    out = run_cypher(
        "MATCH (a)-[:developed]->(p)-[:depends on]->(q) "
        "WHERE q.title = 'Vector Store' "
        "RETURN q.title AS dep, count(DISTINCT a) AS n_devs", e, n)
    [row] = out.collect()
    assert (row.dep, row.n_devs) == ("Vector Store", 2)


def test_starts_with_and_order_limit(spark, g):
    e, n = g
    out = run_cypher(
        "MATCH (a)-[:developed]->(p) WHERE a.title STARTS WITH 'A' "
        "RETURN a.title AS dev ORDER BY dev LIMIT 1", e, n)
    assert [r.dev for r in out.collect()] == ["Ada Lovelace"]


def test_global_count_without_keys(spark, g):
    e, n = g
    [row] = run_cypher(
        "MATCH (a)-[:developed]->(p) RETURN count(a) AS n", e, n).collect()
    assert row.n == 3


def test_id_filter_needs_no_nodes_table(spark, g):
    e, _ = g
    out = run_cypher(
        "MATCH (a)-[:developed]->(p) WHERE p.id = 'engine' "
        "RETURN a.id AS who", e)
    assert {r.who for r in out.collect()} == {"ada", "alan"}


@pytest.mark.parametrize("bad,msg", [
    ("FOO (a)-[:x]->(b) RETURN a.id", "must be MATCH"),
    ("MATCH (a)-[:x]->(a) RETURN a.id", "repeated node variables"),
    ("MATCH (a {id:'x'})-[:p]->(b) RETURN a.id", "unsupported node syntax"),
    ("MATCH (a)-[:p]->(b) WHERE a.id > '3' RETURN a.id", "unsupported WHERE"),
    ("MATCH (a)-[:p]->(b) RETURN z.id", "unknown variable"),
    ("MATCH (a)-[:p]->(b) RETURN sum(a)", "unsupported RETURN item"),
    ("MATCH (a)-[:p]->(b) RETURN a.id ORDER BY b.zzz", "not a RETURN alias"),
])
def test_validator_rejects_with_precise_errors(spark, g, bad, msg):
    e, n = g
    with pytest.raises(CypherError, match=msg):
        run_cypher(bad, e, n)


def test_property_query_without_nodes_raises(spark, g):
    e, _ = g
    with pytest.raises(CypherError, match="no nodes table"):
        run_cypher("MATCH (a)-[:developed]->(p) RETURN a.title AS t", e)
