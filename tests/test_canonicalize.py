"""Connected-components / canonicalization tests — the reference's own
3-community fixture graph, hub-skew salting equivalence, long paths,
isolated nodes (SURVEY.md §5 items 1,4; FIXTURES.md F5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_reason_spark.operators.canonicalize import (
    build_similarity_edges,
    canonicalize_entities,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _components(spark, pairs, **kw):
    rows = connected_components(_edges(spark, pairs), **kw).collect()
    comp: dict[str, set] = {}
    for r in rows:
        comp.setdefault(r.component, set()).add(r.node)
    return {frozenset(v) for v in comp.values()}


def test_reference_three_community_graph(spark):
    # exact fixture of deep_reason/tests/test_community_chains.py:24-42
    pairs = [("A", "B"), ("B", "C"), ("C", "D"),
             ("E", "F"), ("F", "G"), ("G", "H"),
             ("I", "J"), ("J", "K"), ("K", "L")]
    comps = _components(spark, pairs)
    assert comps == {
        frozenset("ABCD"), frozenset("EFGH"), frozenset("IJKL")
    }


def test_labels_are_component_minimum(spark):
    pairs = [("n3", "n2"), ("n2", "n9"), ("n7", "n8")]
    rows = connected_components(_edges(spark, pairs)).collect()
    lab = {r.node: r.component for r in rows}
    assert lab["n3"] == lab["n2"] == lab["n9"] == "n2"
    assert lab["n7"] == lab["n8"] == "n7"


def test_long_path_converges_logarithmically(spark):
    # path of 64 nodes — naive propagation needs 63 rounds; star algorithm
    # must finish well under max_iter=12 (threshold 0 forces the
    # DISTRIBUTED regime: this test exists to cover the round machinery)
    pairs = [(f"p{i:03d}", f"p{i + 1:03d}") for i in range(63)]
    rows = connected_components(_edges(spark, pairs), max_iter=12,
                                small_graph_threshold=0).collect()
    assert {r.component for r in rows} == {"p000"}
    assert len(rows) == 64


def test_driver_and_distributed_regimes_agree(spark):
    """r5 two-regime CC: the bounded union-find path must be row-identical
    to the distributed star rounds on the same graph (mixed components,
    a hub, a long path, isolated-free)."""
    pairs = (
        [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(20)]
        + [("hub", f"leaf{i:03d}") for i in range(100)]
        + [("q1", "q2"), ("q2", "q3")]
    )
    e = _edges(spark, pairs)
    small = sorted((r.node, r.component) for r in
                   connected_components(e).collect())
    dist = sorted((r.node, r.component) for r in
                  connected_components(
                      e, small_graph_threshold=0).collect())
    assert small == dist


def test_star_hub_salted_equals_unsalted(spark):
    # hub of degree 500 (FIXTURES.md F5 case b): salting must not change
    # the answer, only the shuffle shape
    pairs = [("hub", f"leaf{i:04d}") for i in range(500)] + [("x1", "x2")]
    unsalted = _components(spark, pairs, salt=0, small_graph_threshold=0)
    salted = _components(spark, pairs, salt=8, small_graph_threshold=0)
    assert unsalted == salted
    assert len(unsalted) == 2


def test_blocking_builds_linear_not_quadratic_edges(spark):
    ents = spark.createDataFrame(
        [(f"id{i}", "Same Name!") for i in range(100)]
        + [("solo", "Unique Thing")],
        "entity_id string, canonical_name string",
    )
    e = build_similarity_edges(ents)
    # star per block: |block|-1 edges, not |block|^2
    assert e.count() == 99


def test_canonicalize_entities_end_to_end(spark):
    ents = spark.createDataFrame(
        [("e1", "Query Engine"), ("e2", "query engine"), ("e3", "Query-Engine"),
         ("e4", "Vector Store"), ("e5", None)],
        "entity_id string, canonical_name string",
    )
    m = {r.entity_id: r.canonical_id
         for r in canonicalize_entities(ents).collect()}
    assert m["e1"] == m["e2"] == m["e3"] == "e1"
    assert m["e4"] == "e4"
    assert m["e5"] == "e5"  # unmatchable → self


def test_isolated_nodes_label_self(spark):
    ents = spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta")], "entity_id string, canonical_name string"
    )
    m = {r.entity_id: r.canonical_id for r in canonicalize_entities(ents).collect()}
    assert m == {"a": "a", "b": "b"}
