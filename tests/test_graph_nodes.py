"""Equivalence of the corpus-scale and edge-scale node builders."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_reason_spark.datagen import alias_dict_df, generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples
from deep_reason_spark.operators.graph import (
    build_edges,
    build_nodes,
    build_nodes_from_edges,
)
from deep_reason_spark.operators.linking import link_triples


def test_edge_scale_nodes_equal_corpus_scale_nodes(spark):
    triples = extract_triples(chunk_repo_files(generate_repo_files(spark, 80)))
    linked = link_triples(triples, alias_dict_df(spark)).localCheckpoint()
    # identity canonicalization for the comparison
    canonical = (
        linked.withColumn("src", F.col("subject_id"))
        .withColumn("dst", F.col("object_id"))
    ).localCheckpoint()

    corpus_scale = build_nodes(canonical)
    edge_agg = build_edges(canonical)
    titles = (
        linked.select(F.col("subject_id").alias("canonical_id"),
                      F.col("subject_canonical").alias("canonical_name"))
        .union(linked.select("object_id", "object_canonical"))
        .groupBy("canonical_id")
        .agg(F.max_by("canonical_name", F.length("canonical_name")).alias("title"))
    )
    edge_scale = build_nodes_from_edges(edge_agg, titles)

    a = corpus_scale.orderBy("id").collect()
    b = {r.id: r for r in edge_scale.collect()}
    assert len(a) == len(b)
    for r in a:
        e = b[r.id]
        assert e.title == r.title
        assert e.frequency == r.frequency
        assert e.degree == r.degree
        assert e.description == r.description
