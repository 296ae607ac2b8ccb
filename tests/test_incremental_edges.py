"""Incremental edge-aggregate maintenance — merging per-batch edge tables
(and re-keying after a canonical relabel) must equal the full build_edges
recompute EXACTLY, including the bounded provenance sample (min per hash
bucket is associative and the bucket id is recoverable from the member)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_reason_spark.datagen import alias_dict_df, generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples
from deep_reason_spark.operators.graph import (
    apply_relabel,
    build_edges,
    incremental_edge_update,
    merge_edge_tables,
)
from deep_reason_spark.operators.linking import link_triples

TRIPLE_COLS = ("src string, dst string, predicate string, document_id string, "
               "order_id bigint, subject_canonical string, "
               "object_canonical string")


def _rows(df):
    return sorted(
        (r["id"], r["human_readable_id"], r["source"], r["target"],
         r["description"], r["weight"], tuple(r["text_unit_ids"]))
        for r in df.collect()
    )


def _names_of(canonical):
    return (
        canonical.select(F.col("src").alias("canonical_id"),
                         F.col("subject_canonical").alias("name"))
        .unionByName(canonical.select(F.col("dst").alias("canonical_id"),
                                      F.col("object_canonical").alias("name")))
        .groupBy("canonical_id")
        .agg(F.max_by("name", F.length("name")).alias("name"))
        .localCheckpoint()
    )


def test_merge_equals_full_on_real_extraction(spark):
    triples = extract_triples(chunk_repo_files(generate_repo_files(spark, 60)))
    linked = link_triples(triples, alias_dict_df(spark))
    canonical = (
        linked.withColumn("src", F.col("subject_id"))
        .withColumn("dst", F.col("object_id"))
    ).localCheckpoint()
    names = _names_of(canonical)
    part_a = canonical.where(F.pmod(F.xxhash64("document_id"), F.lit(2)) == 0)
    part_b = canonical.where(F.pmod(F.xxhash64("document_id"), F.lit(2)) != 0)

    full = build_edges(canonical, names=names)
    merged = merge_edge_tables(
        build_edges(part_a, names=names),
        build_edges(part_b, names=names),
        names=names,
    )
    assert _rows(merged) == _rows(full)


def test_relabel_collisions_remerge_exactly(spark):
    t = spark.createDataFrame(
        [("a", "x", "r", "d1", 1, "a", "x"),
         ("b", "x", "r", "d2", 1, "b", "x"),     # b→a collides with row 1
         ("b", "y", "r", "d2", 2, "b", "y"),
         ("x", "b", "s", "d3", 1, "x", "b")],
        TRIPLE_COLS,
    )
    relabel = spark.createDataFrame([("b", "a")], "rep string, final string")
    relabelled = t.replace({"b": "a"}, subset=["src", "dst"]) \
        .replace({"b": "a"}, subset=["subject_canonical", "object_canonical"])
    names = _names_of(relabelled)
    got = apply_relabel(build_edges(t, names=names), relabel, names=names)
    want = build_edges(relabelled, names=names)
    assert _rows(got) == _rows(want)


def test_incremental_update_composes_with_cc_delta(spark):
    """End-to-end: a late similarity edge merges two components; the CC
    delta map re-keys the old edge table while the late triple batch
    (already keyed by the new canonical map) folds in — equal to the full
    recompute over every triple under the final map."""
    from deep_reason_spark.operators.canonicalize import incremental_components

    old_labels = spark.createDataFrame(
        [("n1", "n1"), ("n2", "n1"), ("n3", "n3")], "node string, component string")
    sim_batch = spark.createDataFrame([("n2", "n3")], "src string, dst string")
    new_labels, delta = incremental_components(
        old_labels, sim_batch, return_delta=True)
    assert {(r["rep"], r["final"]) for r in delta.collect()} == {("n3", "n1")}
    assert {(r["node"], r["component"]) for r in new_labels.collect()} == {
        ("n1", "n1"), ("n2", "n1"), ("n3", "n1")}

    batch1 = spark.createDataFrame(
        [("n1", "n3", "rel", "d1", 1, "n1", "n3"),
         ("n1", "n3", "rel", "d1", 2, "n1", "n3"),
         ("n3", "n1", "rel", "d2", 1, "n3", "n1")],
        TRIPLE_COLS,
    )
    batch2 = spark.createDataFrame(  # keyed by the NEW map (n3 → n1)
        [("n1", "n1", "rel", "d3", 1, "n1", "n1"),
         ("n1", "n4", "rel", "d3", 2, "n1", "n4")],
        TRIPLE_COLS,
    )
    full_relabelled = (
        batch1.replace({"n3": "n1"},
                       subset=["src", "dst", "subject_canonical",
                               "object_canonical"])
        .unionByName(batch2)
    )
    names = _names_of(full_relabelled)
    got = incremental_edge_update(
        build_edges(batch1, names=names), batch2,
        relabel_map=delta, names=names)
    want = build_edges(full_relabelled, names=names)
    assert _rows(got) == _rows(want)


def test_routed_update_equals_full_recompute(spark):
    """``affected_ids`` routing: the untouched stored bulk passes through
    AS STORED while batch-colliding / title-affected rows re-aggregate —
    the result must equal the full ``build_edges`` recompute over every
    triple, including ``human_readable_id`` re-rendering for entities whose
    max-by-length title changed when the batch added a longer surface."""
    triples = extract_triples(chunk_repo_files(generate_repo_files(spark, 60)))
    linked = link_triples(triples, alias_dict_df(spark))
    canonical = (
        linked.withColumn("src", F.col("subject_id"))
        .withColumn("dst", F.col("object_id"))
    ).localCheckpoint()
    is_batch = F.pmod(F.xxhash64("document_id"), F.lit(10)) == 0
    base = canonical.where(~is_batch).localCheckpoint()
    batch = canonical.where(is_batch).localCheckpoint()
    # stored edges render with the titles known at base time; the update
    # passes the refreshed full-corpus titles (the plan's new_titles)
    old = build_edges(base, names=_names_of(base)).localCheckpoint()
    full_names = _names_of(canonical)
    affected = (
        batch.select(F.col("src").alias("aid"))
        .unionByName(batch.select(F.col("dst").alias("aid")))
        .distinct().localCheckpoint()
    )
    got = incremental_edge_update(
        old, batch, names=full_names, affected_ids=affected)
    want = build_edges(canonical, names=full_names)
    assert _rows(got) == _rows(want)


def test_node_tables_ride_the_merged_edges(spark):
    """Closes the incremental loop for the NODES table: degree is not
    associative from per-batch node aggregates, but build_nodes_from_edges
    over the (exactly-merged) edges table equals the full corpus-scale
    build — so node maintenance costs one edge-scale pass per batch too."""
    from deep_reason_spark.operators.graph import (
        build_nodes,
        build_nodes_from_edges,
    )

    triples = extract_triples(chunk_repo_files(generate_repo_files(spark, 40)))
    linked = link_triples(triples, alias_dict_df(spark))
    canonical = (
        linked.withColumn("src", F.col("subject_id"))
        .withColumn("dst", F.col("object_id"))
    ).localCheckpoint()
    names = _names_of(canonical)
    part_a = canonical.where(F.pmod(F.xxhash64("document_id"), F.lit(2)) == 0)
    part_b = canonical.where(F.pmod(F.xxhash64("document_id"), F.lit(2)) != 0)
    merged = merge_edge_tables(
        build_edges(part_a, names=names),
        build_edges(part_b, names=names),
        names=names,
    )
    titles = names.select(F.col("canonical_id"), F.col("name").alias("title"))
    got = {r["id"]: (r["frequency"], r["degree"])
           for r in build_nodes_from_edges(merged, titles).collect()}
    want = {r["id"]: (r["frequency"], r["degree"])
            for r in build_nodes(canonical).collect()}
    assert got == want


def test_degree_widening_covers_neighbor_merges(spark):
    """A component merge (rep → final) DECREASES deg(u) for any u adjacent
    to BOTH — yet u is in no batch and no relabel row, so routing
    combined_degree on the bare affected set leaves u's other rows stale.
    The widened set D = affected ∪ neighbors(reps), the degree-state fold
    and the state-probe decoration must together equal the full
    ``add_combined_degree`` recompute; the bare set must NOT (the negative
    control documents why the widening exists)."""
    from deep_reason_spark.operators.graph import (
        add_combined_degree,
        combined_degree_from_state,
        degrees_from_edges,
        incremental_degrees,
        widen_degree_affected,
    )

    stored = spark.createDataFrame(
        [("u", "rep", "r", "d1", 1, "u", "rep"),
         ("u", "fin", "r", "d2", 1, "u", "fin"),
         ("w", "u", "r", "d3", 1, "w", "u"),      # w: both endpoints ∉ bare
         ("x", "rep", "r", "d4", 1, "x", "rep")],  # x: neighbor of rep only
        TRIPLE_COLS,
    )
    relabel = spark.createDataFrame([("rep", "fin")], "rep string, final string")
    relabelled = stored.replace({"rep": "fin"},
                                subset=["src", "dst", "subject_canonical",
                                        "object_canonical"])
    names = _names_of(relabelled)
    empty_batch = spark.createDataFrame([], TRIPLE_COLS)

    old = add_combined_degree(build_edges(stored, names=names)).localCheckpoint()
    want = add_combined_degree(build_edges(relabelled, names=names))
    want_rows = sorted((r["source"], r["target"], r["weight"],
                        r["combined_degree"]) for r in want.collect())

    def fold(aff):
        pass_rows, touched = incremental_edge_update(
            old, empty_batch, relabel_map=relabel, names=names,
            affected_ids=aff, return_split=True)
        new_degs = incremental_degrees(degrees_from_edges(old), touched, aff)
        got = pass_rows.unionByName(
            combined_degree_from_state(touched, new_degs))
        return got, new_degs

    bare = relabel.select(F.col("rep").alias("aid")).unionByName(
        relabel.select(F.col("final").alias("aid"))).distinct().localCheckpoint()
    widened = widen_degree_affected(
        old.select("source", "target"), bare, relabel_map=relabel,
    ).localCheckpoint()
    assert {r["aid"] for r in widened.collect()} == {"rep", "fin", "u", "x"}

    got, new_degs = fold(widened)
    got_rows = sorted((r["source"], r["target"], r["weight"],
                       r["combined_degree"]) for r in got.collect())
    assert got_rows == want_rows
    # the folded degree state equals a from-scratch derivation
    assert sorted(map(tuple, new_degs.collect())) == \
        sorted(map(tuple, degrees_from_edges(want).collect()))

    # negative control: the BARE set leaves (w, u) with the stale stored
    # combined_degree (deg(u) was 3, is now 2)
    stale, _ = fold(bare)
    stale_rows = sorted((r["source"], r["target"], r["weight"],
                         r["combined_degree"]) for r in stale.collect())
    assert stale_rows != want_rows
    assert ("w", "u", 1.0, 4) in stale_rows      # stored cd: old deg(u)=3
    assert ("w", "u", 1.0, 3) in got_rows        # true cd: deg(u) dropped to 2


def test_merge_without_names_uses_key_fallback(spark):
    t = spark.createDataFrame(
        [("a", "x", "r", "d1", 1, "a", "x")], TRIPLE_COLS)
    merged = merge_edge_tables(build_edges(t), build_edges(t))
    row = merged.collect()[0]
    assert row["human_readable_id"] == "a r x"
    assert row["weight"] == 2.0  # same batch twice: weights sum
