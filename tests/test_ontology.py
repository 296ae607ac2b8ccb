"""Ontology + KgStructure tests — output contract of the reference's
ontology_refining/kg_refining stages (kg_agent/schemes.py:25-61), produced
by order-free aggregation (SURVEY.md §7 hard-part (d))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_reason_spark.datagen import (
    alias_dict_df,
    entity_types_df,
    generate_repo_files,
)
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples
from deep_reason_spark.operators.linking import link_triples
from deep_reason_spark.operators.ontology import build_kg_structure, build_ontology


@pytest.fixture(scope="module")
def linked(spark):
    triples = extract_triples(chunk_repo_files(generate_repo_files(spark, 80)))
    return link_triples(triples, alias_dict_df(spark)).localCheckpoint()


def test_ontology_tables_contract(spark, linked):
    onodes, orels, oconns = build_ontology(linked, entity_types_df(spark))
    assert set(onodes.columns) == {"node_id", "entity"}
    assert set(orels.columns) == {"relation_id", "relation_name"}
    assert set(oconns.columns) == {"node_id_1", "node_id_2", "relation_id"}

    classes = {r.entity for r in onodes.collect()}
    assert classes <= {"person", "organization", "project", "place", "entity"}
    assert "person" in classes and "project" in classes

    rels = orels.collect()
    ids = sorted(r.relation_id for r in rels)
    assert ids == list(range(1, len(rels) + 1))  # dense, deterministic
    names = [r.relation_name for r in sorted(rels, key=lambda r: r.relation_id)]
    assert names == sorted(names)  # numbered in sort order

    # every connection references existing classes and relations
    n_bad = (
        oconns.join(onodes.select(F.col("node_id").alias("node_id_1")),
                    "node_id_1", "left_anti").count()
        + oconns.join(onodes.select(F.col("node_id").alias("node_id_2")),
                      "node_id_2", "left_anti").count()
        + oconns.join(orels.select("relation_id"), "relation_id", "left_anti").count()
    )
    assert n_bad == 0


def test_ontology_connection_semantics(spark, linked):
    _, orels, oconns = build_ontology(linked, entity_types_df(spark))
    rid = {r.relation_name: r.relation_id for r in orels.collect()}
    conns = {(r.node_id_1, r.relation_id, r.node_id_2) for r in oconns.collect()}
    # vocabulary guarantees: people develop projects, people work at orgs
    if "developed" in rid:
        assert ("class:person", rid["developed"], "class:project") in conns
    assert ("class:person", rid["works at"], "class:organization") in conns


def test_ontology_is_parallelism_invariant(spark, linked):
    """Order-free: the same ontology at 1 partition and 16 partitions."""
    et = entity_types_df(spark)
    a = build_ontology(linked.repartition(1), et)
    b = build_ontology(linked.repartition(16), et)
    for x, y in zip(a, b):
        assert x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0


def test_kg_structure_fk_integrity(spark, linked):
    et = entity_types_df(spark)
    onodes, orels, oconns = build_ontology(linked, et)
    # canonical triples stand-in: use linked ids directly as canonical
    canonical = (
        linked.withColumn("src", F.col("subject_id"))
        .withColumn("dst", F.col("object_id"))
    )
    kg_nodes, kg_triplets = build_kg_structure(canonical, et, orels)
    assert set(kg_nodes.columns) == {"node_id", "entity_name", "ontology_node_id"}
    assert set(kg_triplets.columns) == {
        "kg_subject_id", "kg_object_id", "ontology_nodes_connection_id"}
    # every kg triplet endpoint is a kg node
    missing = (
        kg_triplets.join(kg_nodes.select(F.col("node_id").alias("kg_subject_id")),
                         "kg_subject_id", "left_anti").count()
        + kg_triplets.join(kg_nodes.select(F.col("node_id").alias("kg_object_id")),
                           "kg_object_id", "left_anti").count()
    )
    assert missing == 0
    # connection ids decompose into existing classes and relation ids
    parts = kg_triplets.select(
        F.split("ontology_nodes_connection_id", r"\|").alias("p")
    ).select(
        F.col("p")[0].alias("c1"), F.col("p")[1].cast("int").alias("rid"),
        F.col("p")[2].alias("c2"),
    )
    bad = parts.join(orels.select(F.col("relation_id").alias("rid")),
                     "rid", "left_anti").count()
    assert bad == 0


def test_pipeline_writes_ontology_tables(spark, tmp_path):
    from deep_reason_spark.plans.kg_pipeline import run_kg_pipeline

    out = str(tmp_path / "kg")
    run_kg_pipeline(spark, generate_repo_files(spark, 60), alias_dict_df(spark),
                    out, n_buckets=4, entity_types=entity_types_df(spark))
    for t in ["ontology_nodes", "ontology_relations", "ontology_connections",
              "kg_nodes", "kg_triplets"]:
        assert spark.read.parquet(f"{out}/{t}").count() > 0
    # typed graph nodes: people got class person
    nodes = spark.read.parquet(f"{out}/nodes")
    ada = nodes.where(F.col("title") == "Ada Lovelace").collect()
    if ada:
        assert ada[0].type == "person"


def test_relation_registry_scale_guard_fires(spark):
    """The dense numbering is a single-task sort — valid only at vocabulary
    scale; exceeding the bound must fail loudly at materialization (and the
    guard must survive Catalyst optimization)."""
    import pytest
    from deep_reason_spark.operators.ontology import build_ontology

    triples = spark.createDataFrame(
        [(f"s{i}", f"o{i}", f"pred_{i}") for i in range(5)],
        "subject_id string, object_id string, predicate string")
    types = spark.createDataFrame([], "entity_id string, type string")
    _, orels, _ = build_ontology(triples, types, max_relations=3)
    with pytest.raises(Exception, match="vocabulary-scale"):
        orels.collect()
    # below the bound the numbering is dense and deterministic
    _, ok, _ = build_ontology(triples, types, max_relations=10)
    rows = {r.relation_name: r.relation_id for r in ok.collect()}
    assert rows == {f"pred_{i}": i + 1 for i in range(5)}
