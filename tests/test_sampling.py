"""Chain-sampling tests — a port of the reference's own unittest properties
(deep_reason/tests/test_community_chains.py:56-119) onto the DataFrame
sampler, plus the G1 endpoint-rejection rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_reason_spark.operators.sampling import (
    all_simple_paths,
    bidirectional,
    chains_with_descriptions,
    community_chains,
    frontier_walk,
    sample_chains,
)

# the reference's fixture: 3 chain-shaped communities A-B-C-D / E-F-G-H / I-J-K-L
PAIRS = [("A", "B"), ("B", "C"), ("C", "D"),
         ("E", "F"), ("F", "G"), ("G", "H"),
         ("I", "J"), ("J", "K"), ("K", "L")]
COMMUNITIES = [(0, ["A", "B", "C", "D"]), (1, ["E", "F", "G", "H"]),
               (2, ["I", "J", "K", "L"])]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(PAIRS, "src string, dst string")


@pytest.fixture(scope="module")
def comms(spark):
    return spark.createDataFrame(
        COMMUNITIES, "community_id bigint, entity_ids array<string>")


def _connected(chain, pairs):
    es = {frozenset(p) for p in pairs}
    return all(frozenset(chain[i: i + 2]) in es for i in range(len(chain) - 1))


def test_chain_length_exact(spark, edges, comms):
    # test_community_chains.py:56-75: every chain has the exact node count
    out = community_chains(edges, comms, chain_length=3,
                           chains_per_community=5).collect()
    assert len(out) > 0
    assert all(len(r.chain) == 3 for r in out)


def test_path_validity(spark, edges, comms):
    # test_community_chains.py:77-102: consecutive nodes are connected
    out = community_chains(edges, comms, chain_length=3,
                           chains_per_community=10).collect()
    assert all(_connected(r.chain, PAIRS) for r in out)


def test_uniqueness_up_to_reversal(spark, edges, comms):
    # test_community_chains.py:104-119: no chain appears in both directions
    out = [tuple(r.chain) for r in
           community_chains(edges, comms, chain_length=3,
                            chains_per_community=100).collect()]
    seen = set()
    for c in out:
        assert c not in seen and tuple(reversed(c)) not in seen
        seen.add(c)


def test_community_scoping(spark, edges, comms):
    # chains never cross communities
    out = community_chains(edges, comms, chain_length=3,
                           chains_per_community=100).collect()
    groups = {0: set("ABCD"), 1: set("EFGH"), 2: set("IJKL")}
    for r in out:
        assert set(r.chain) <= groups[r.community_id]


def test_full_length_chain_per_community(spark, edges, comms):
    # each 4-node path community has exactly ONE 4-chain (up to reversal)
    out = community_chains(edges, comms, chain_length=4,
                           chains_per_community=100).collect()
    assert len(out) == 3
    assert {tuple(r.chain) for r in out} == {
        ("A", "B", "C", "D"), ("E", "F", "G", "H"), ("I", "J", "K", "L")}


def test_endpoint_rejection(spark):
    # G1 rule (gen_agent/sampling.py:151-158): chains whose endpoints are
    # directly connected are rejected — on a triangle, no 3-chain survives
    tri = spark.createDataFrame(
        [("X", "Y"), ("Y", "Z"), ("Z", "X"), ("Z", "W")], "src string, dst string")
    kept = sample_chains(tri, chain_length=3, n_chains=100).collect()
    chains = {tuple(r.chain) for r in kept}
    for c in chains:
        assert frozenset((c[0], c[-1])) not in {frozenset(p) for p in
                                                [("X", "Y"), ("Y", "Z"),
                                                 ("Z", "X"), ("Z", "W")]}
    without = sample_chains(tri, chain_length=3, n_chains=100,
                            reject_connected_endpoints=False).count()
    assert without > len(chains)


def test_sampling_is_deterministic(spark, edges):
    a = [tuple(r.chain) for r in sample_chains(edges, 3, 4, seed=7).collect()]
    b = [tuple(r.chain) for r in sample_chains(edges, 3, 4, seed=7).collect()]
    c = [tuple(r.chain) for r in sample_chains(edges, 3, 4, seed=8).collect()]
    assert a == b
    assert len(a) == 4
    assert a != c or len(set(map(tuple, (a, c)))) == 1  # different seed may reorder


def test_frontier_is_capped_on_dense_graph(spark):
    """Scale-safety (VERDICT r1 #3): on a dense graph the walk must stay
    bounded by the frontier cap, never enumerate all simple paths. K10 has
    10·9·8·7 = 5040 directed 4-node simple paths; with cap=30 every step's
    output is ≤ 30 rows by construction (orderBy+limit) and the final
    frontier obeys the cap."""
    k10 = spark.createDataFrame(
        [(f"v{i}", f"v{j}") for i in range(10) for j in range(i + 1, 10)],
        "src string, dst string",
    )
    walked = frontier_walk(k10, chain_length=4, frontier_cap=30, seed=1)
    assert walked.count() <= 30
    # the plan enforces the per-step bound: one top-K (TakeOrdered) per step
    plan = walked._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") >= 3  # L-1 capped steps
    # sanity: enumeration really is exponential here (cap avoided ~5k rows)
    assert all_simple_paths(k10, 4).count() == 5040 // 2  # deduped reversal


def test_sample_chains_valid_on_dense_graph(spark):
    k8 = spark.createDataFrame(
        [(f"v{i}", f"v{j}") for i in range(8) for j in range(i + 1, 8)],
        "src string, dst string",
    )
    pairs = [(f"v{i}", f"v{j}") for i in range(8) for j in range(i + 1, 8)]
    out = sample_chains(k8, chain_length=4, n_chains=5, frontier_cap=20,
                        reject_connected_endpoints=False).collect()
    assert 0 < len(out) <= 5
    assert all(len(r.chain) == 4 and len(set(r.chain)) == 4 for r in out)
    assert all(_connected(r.chain, pairs) for r in out)


def test_descriptions_lookup_defaults(spark, edges):
    ents = spark.createDataFrame(
        [("b", "B", "node bee", "letter"), ("c", "C", "node see", "letter")],
        "_ignore string, title string, description string, type string",
    ).drop("_ignore")
    chains = all_simple_paths(edges, 3).limit(2)
    out = chains_with_descriptions(chains, ents).collect()
    for r in out:
        for n in r.nodes:
            if n.node in ("B", "C"):
                assert n.description.startswith("node ")
            else:
                assert n.description == ""  # empty-default on miss
