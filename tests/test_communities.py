"""Community detection / reports / local search (operators/communities.py,
plans/graph_search.py) — the 3-community fixture asserts the known
partition (the shape the reference consumes from communities.parquet,
gen_agent/sampling.py:357,390-393)."""

import pytest
from pyspark.sql import functions as F

from deep_reason_spark.operators.communities import (
    community_reports,
    detect_communities,
    global_search_reports,
    pack_communities,
    prune_edges,
)
from deep_reason_spark.plans.graph_search import local_search_context

# three communities: {1,2,3} tight triangle, {10,11} strong pair, {20}
# isolated-by-pruning; weak cross edges (weight 1) must be cut; node 30 is
# a hub touching everything and must not glue the communities together
_EDGES = [
    (1, 2, 9), (2, 3, 8), (1, 3, 7),          # community A
    (10, 11, 9),                              # community B
    (3, 10, 1), (11, 20, 1),                  # weak cross edges → pruned
    (30, 1, 9), (30, 2, 9), (30, 3, 9),       # hub 30: degree 6 > cap
    (30, 10, 9), (30, 11, 9), (30, 20, 9),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(_EDGES, "src bigint, dst bigint, weight bigint")


def test_three_community_partition(spark, edges):
    asg = detect_communities(edges, weight_col="weight",
                             min_weight=2, max_degree=4)
    got = {r["entity_id"]: r["community_id"] for r in asg.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 30: 30}


def test_weak_edges_alone_do_not_merge(spark, edges):
    # without the degree cap the hub glues everything into one component
    asg = detect_communities(edges, weight_col="weight", min_weight=2)
    comps = {r["community_id"] for r in asg.collect()}
    assert comps == {1}


def test_pack_communities_shape_and_cap(spark, edges):
    asg = detect_communities(edges, weight_col="weight",
                             min_weight=2, max_degree=4)
    packed = {r["community_id"]: (r["entity_ids"], r["n_members"])
              for r in pack_communities(asg).collect()}
    assert packed[1] == ([1, 2, 3], 3)
    assert packed[10] == ([10, 11], 2)
    capped = {r["community_id"]: r["entity_ids"]
              for r in pack_communities(asg, max_members=2).collect()}
    assert capped[1] == [1, 2]  # capped members, still sorted
    # n_members stays the TRUE size even when the array is capped
    full = {r["community_id"]: r["n_members"]
            for r in pack_communities(asg, max_members=2).collect()}
    assert full[1] == 3


def test_community_reports_rollup(spark, edges):
    kept = prune_edges(edges, weight_col="weight", min_weight=2, max_degree=4)
    asg = detect_communities(edges, weight_col="weight",
                             min_weight=2, max_degree=4)
    rep = {r["community_id"]: r for r in
           community_reports(asg, kept, top_members=2).collect()}
    a = rep[1]
    assert a["n_members"] == 3 and a["n_internal_edges"] == 3
    assert a["total_weight"] == 24 and a["title"] == "community_1"
    # internal degrees all 2 → tie broken on smallest member id
    assert a["top_members"] == "1_2"
    assert 0.0 <= a["rating"] <= 10.0
    lone = rep[20]
    assert lone["n_internal_edges"] == 0 and lone["top_members"] == ""
    assert lone["rating"] == 0.0


def test_global_search_reads_reports(spark, edges):
    kept = prune_edges(edges, weight_col="weight", min_weight=2, max_degree=4)
    asg = detect_communities(edges, weight_col="weight",
                             min_weight=2, max_degree=4)
    ranked = global_search_reports(
        community_reports(asg, kept), k=2).collect()
    assert [r["community_id"] for r in ranked] == [1, 10]  # by rating desc
    assert [r["rank"] for r in ranked] == [1, 2]


def test_local_search_context_rows(spark, edges):
    anchors = spark.createDataFrame([(1,)], "anchor bigint")
    units = spark.createDataFrame(
        [(1, 100, 5.0), (1, 101, 9.0), (1, 102, 7.0), (1, 103, 1.0),
         (2, 200, 4.0)],
        "entity_id bigint, unit_id bigint, score double")
    ctx = local_search_context(anchors, edges, units, top_rel=2, top_units=2)
    rows = sorted(ctx.collect(), key=lambda r: (r["kind"], r["rank"]))
    rel = [r for r in rows if r["kind"] == "relation"]
    tu = [r for r in rows if r["kind"] == "text_unit"]
    # node 1 edges: (2,9) (3,7) (30,9) → top-2 by weight desc, neighbor asc
    assert [(r["ref_id"], r["score"], r["rank"]) for r in rel] == [
        (2, 9.0, 1), (30, 9.0, 2)]
    assert [(r["ref_id"], r["rank"]) for r in tu] == [(101, 1), (102, 2)]


def test_drift_search_primer_then_local(spark, edges):
    from deep_reason_spark.operators.communities import community_reports
    from deep_reason_spark.plans.graph_search import drift_search_context
    kept = prune_edges(edges, weight_col="weight", min_weight=2, max_degree=4)
    asg = detect_communities(edges, weight_col="weight",
                             min_weight=2, max_degree=4)
    units = spark.createDataFrame(
        [(1, 100, 5.0), (2, 200, 4.0), (10, 300, 7.0)],
        "entity_id bigint, unit_id bigint, score double")
    ctx = drift_search_context(
        community_reports(asg, kept), asg, kept, edges, units,
        top_communities=2, anchors_per_community=1, top_rel=2, top_units=1)
    rows = ctx.collect()
    # primer picks communities 1 and 10 (highest ratings); top members by
    # internal degree, tie -> smallest id: anchors 1 and 10
    assert {(r["community_id"], r["anchor"]) for r in rows} == {(1, 1), (10, 10)}
    kinds = {(r["anchor"], r["kind"]) for r in rows}
    assert (1, "relation") in kinds and (1, "text_unit") in kinds
    # anchor 10's relations rank over the FULL edge table (hub 30 included)
    rel10 = sorted([(r["rank"], r["ref_id"]) for r in rows
                    if r["anchor"] == 10 and r["kind"] == "relation"])
    assert rel10 == [(1, 11), (2, 30)]  # weight 9 ties -> smaller neighbor first


def test_basic_search_posting_list_topk(spark):
    from deep_reason_spark.plans.graph_search import basic_search_context
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta"), (3, "alpha"),
         (4, "delta epsilon")],
        "doc_id bigint, text string")
    qs = spark.createDataFrame([(7, "alpha beta gamma")],
                               "question_id int, question string")
    rows = sorted(basic_search_context(qs, docs, top_k=2).collect(),
                  key=lambda r: r["rank"])
    assert [(r["doc_id"], r["score"], r["rank"]) for r in rows] == [
        (1, 3, 1), (2, 2, 2)]


def test_empty_and_degenerate_inputs(spark):
    """Empty edge sets and no-hit questions must yield empty/singleton
    results, not errors — the resume/incremental paths hit these shapes."""
    from deep_reason_spark.plans.graph_search import (
        basic_search_context,
        drift_search_context,
        generate_questions,
    )
    empty_e = spark.createDataFrame([], "src bigint, dst bigint, weight bigint")
    assert detect_communities(empty_e, weight_col="weight").count() == 0
    nodes = spark.createDataFrame([(1,), (2,)], "node bigint")
    asg = detect_communities(empty_e, all_nodes=nodes, weight_col="weight")
    assert sorted((r.entity_id, r.community_id) for r in asg.collect()) == [
        (1, 1), (2, 2)]  # singletons label themselves
    kept = prune_edges(empty_e, weight_col="weight", min_weight=2, max_degree=4)
    reps = community_reports(asg, kept).collect()
    assert {r.rating for r in reps} == {0.0}
    assert pack_communities(asg).count() == 2
    units = spark.createDataFrame([], "entity_id bigint, unit_id bigint, score double")
    er = community_reports(detect_communities(empty_e, weight_col="weight"), kept)
    assert drift_search_context(er, asg, kept, empty_e, units).count() == 0
    docs = spark.createDataFrame([(1, "alpha")], "doc_id bigint, text string")
    qs = spark.createDataFrame([(1, "zzz qqq")], "question_id int, question string")
    assert basic_search_context(qs, docs).count() == 0
    assert generate_questions(empty_e).count() == 0


def test_prune_edges_dedupes_unweighted_duplicates(spark):
    # ADVICE r3: weight_col=None must count one weight-1 edge per DISTINCT
    # (src, dst) pair — duplicate rows must not inflate report rollups
    dup = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 2), (2, 3)], "src bigint, dst bigint")
    kept = prune_edges(dup).collect()
    pairs = sorted((r.src, r.dst, r.weight) for r in kept)
    assert pairs == [(1, 2, 1), (2, 3, 1)]
    # and min_weight > 1 keeps the old all-dropped semantics (each distinct
    # pair has weight exactly 1)
    assert prune_edges(dup, min_weight=2).count() == 0
