"""Graph materialization — nodes/edges tables in the GraphRAG-parquet shape
the reference consumes back (SURVEY.md §1.3; FIXTURES.md F6).

Columns mirror what deep-reason actually reads:
- entities: id/title/type/frequency/degree (``gen_agent/sampling.py:200-221``)
  + description (``:204``);
- relationships: source/target/description/weight/combined_degree/
  text_unit_ids (``gen_agent/sampling.py:280-289``).

Metrics are computed columns (SURVEY.md A9): degree = distinct neighbors,
frequency = mention count, combined_degree = deg(src)+deg(dst) — all
partial-aggregation-friendly groupBys. Description merging (A10) is the
deterministic analogue of the reference's LLM summarize-descriptions prompt
(``prompts/graphrag_prompts/index/summarize_descriptions.py:6-20``):
collect distinct predicates an entity participates in, sorted, concatenated.

Everything here is shuffle-minimal: one groupBy per metric, joins of
aggregate (small) tables back onto the edge list; AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_edges(canonical_triples: DataFrame) -> DataFrame:
    """(subject_canonical_id, predicate, object_canonical_id, provenance)
    → edges table (F6): one row per (source, target, predicate) with weight
    = supporting-triple count and provenance chunk list."""
    agg = (
        canonical_triples.groupBy("src", "dst", "predicate")
        .agg(
            F.count("*").alias("weight_cnt"),
            F.array_sort(
                F.array_distinct(
                    F.collect_list(F.concat_ws("#", "document_id", "order_id"))
                )
            ).alias("text_unit_ids"),
            F.min("subject_canonical").alias("source_name"),
            F.min("object_canonical").alias("target_name"),
        )
    )
    return agg.select(
        F.md5(F.concat_ws("|", "src", "predicate", "dst")).alias("id"),
        F.concat_ws(" ", "source_name", "predicate", "target_name").alias(
            "human_readable_id"
        ),
        F.col("src").alias("source"),
        F.col("dst").alias("target"),
        F.col("predicate").alias("description"),
        F.col("weight_cnt").cast("double").alias("weight"),
        "text_unit_ids",
    )


def add_combined_degree(edges: DataFrame) -> DataFrame:
    """combined_degree = degree(source) + degree(target)
    (consumed at gen_agent/sampling.py:287)."""
    ends = edges.select(F.col("source").alias("node"), F.col("target").alias("other")) \
        .union(edges.select(F.col("target").alias("node"), F.col("source").alias("other")))
    deg = ends.distinct().groupBy("node").agg(F.count("*").alias("deg"))
    return (
        edges.join(deg.withColumnRenamed("node", "source")
                      .withColumnRenamed("deg", "_sdeg"), "source")
        .join(deg.withColumnRenamed("node", "target")
                 .withColumnRenamed("deg", "_tdeg"), "target")
        .withColumn("combined_degree", (F.col("_sdeg") + F.col("_tdeg")).cast("bigint"))
        .drop("_sdeg", "_tdeg")
    )


def build_nodes(canonical_triples: DataFrame, entity_types: DataFrame | None = None) -> DataFrame:
    """nodes table (F6): id/title/type/description/frequency/degree.

    - title: the longest canonical surface (most complete identifier);
    - type: from an optional (canonical_id, type) table, else 'entity';
    - description: sorted distinct predicates the entity participates in
      (deterministic A10 summarization);
    - frequency: total mentions; degree: distinct neighbors.
    """
    as_subject = canonical_triples.select(
        F.col("src").alias("id"), F.col("subject_canonical").alias("name"),
        F.col("predicate"), F.col("dst").alias("nbr"),
    )
    as_object = canonical_triples.select(
        F.col("dst").alias("id"), F.col("object_canonical").alias("name"),
        F.col("predicate"), F.col("src").alias("nbr"),
    )
    both = as_subject.unionByName(as_object)
    nodes = both.groupBy("id").agg(
        F.max_by("name", F.length("name")).alias("title"),
        F.concat_ws("; ", F.array_sort(F.array_distinct(F.collect_list("predicate"))))
            .alias("description"),
        F.count("*").alias("frequency"),
        F.count_distinct("nbr").alias("degree"),
    )
    if entity_types is not None:
        nodes = nodes.join(
            F.broadcast(entity_types.select(F.col("canonical_id").alias("id"), "type")),
            "id", "left",
        ).withColumn("type", F.coalesce("type", F.lit("entity")))
    else:
        nodes = nodes.withColumn("type", F.lit("entity"))
    return nodes.select("id", "title", "type", "description", "frequency", "degree")


def induced_subgraph(edges: DataFrame, members: DataFrame) -> DataFrame:
    """Community subgraph induction (G4, gen_agent/sampling.py:397-407):
    keep edges whose BOTH endpoints are members — two broadcast semi-joins."""
    m = members.select(F.col(members.columns[0]).alias("node")).distinct()
    return (
        edges.join(F.broadcast(m.withColumnRenamed("node", "source")), "source", "semi")
        .join(F.broadcast(m.withColumnRenamed("node", "target")), "target", "semi")
    )
