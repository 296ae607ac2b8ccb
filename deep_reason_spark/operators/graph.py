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


MAX_TEXT_UNITS = 100  # provenance sample cap per edge


def build_edges(canonical_triples: DataFrame) -> DataFrame:
    """(subject_canonical_id, predicate, object_canonical_id, provenance)
    → edges table (F6): one row per (source, target, predicate) with weight
    = supporting-triple count and a BOUNDED provenance sample.

    An unbounded collect_list of supporting chunks dies on hot edges (an
    edge seen in 10^7 chunks would collect 10^7 strings into one executor
    row); provenance is therefore rank-filtered to the first
    ``MAX_TEXT_UNITS`` units per edge BEFORE the final aggregation, while
    ``weight`` still counts every supporting triple."""
    from pyspark.sql import Window

    keyed = canonical_triples.select(
        "src", "dst", "predicate", "subject_canonical", "object_canonical",
        F.concat_ws("#", "document_id", "order_id").alias("_tu"),
    )
    # ONE full shuffle: rank + total count in the same window partition,
    # then aggregate only the surviving ≤ MAX_TEXT_UNITS rows per edge
    wp = Window.partitionBy("src", "dst", "predicate")
    w = wp.orderBy("_tu", "subject_canonical", "object_canonical")
    ranked = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .withColumn("_cnt", F.count("*").over(wp))
        .where(F.col("_rn") <= MAX_TEXT_UNITS)
    )
    agg = ranked.groupBy("src", "dst", "predicate").agg(
        F.max("_cnt").alias("weight_cnt"),
        F.min("subject_canonical").alias("source_name"),
        F.min("object_canonical").alias("target_name"),
        F.array_sort(F.array_distinct(F.collect_list("_tu"))).alias("text_unit_ids"),
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
        # collect_set, not collect_list: map-side partial aggregation keeps
        # the per-group state at |distinct predicates|, not |rows| — a hub
        # entity with 10^7 mentions must not buffer 10^7 strings
        F.concat_ws("; ", F.array_sort(F.collect_set("predicate")))
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


def build_nodes_from_edges(
    edge_agg: DataFrame,
    titles: DataFrame,
    entity_types: DataFrame | None = None,
) -> DataFrame:
    """Edge-scale node build — same output as ``build_nodes`` without any
    corpus-scale pass: frequency = Σ adjacent edge weights (each supporting
    triple counts once per side), degree = distinct neighbors, description =
    distinct adjacent predicates; titles come from the (canonical_id, title)
    map (``titles``: the longest canonical surface per entity)."""
    ends = edge_agg.select(
        F.col("source").alias("id"), F.col("target").alias("nbr"),
        "weight", "description",
    ).unionByName(edge_agg.select(
        F.col("target").alias("id"), F.col("source").alias("nbr"),
        "weight", "description",
    ))
    per_node = ends.groupBy("id").agg(
        F.sum("weight").cast("bigint").alias("frequency"),
        F.count_distinct("nbr").alias("degree"),
        F.concat_ws("; ", F.array_sort(F.collect_set("description")))
        .alias("description"),
    )
    nodes = per_node.join(F.broadcast(titles.select(F.col("canonical_id").alias("id"),
                                                    "title")), "id", "left")
    nodes = nodes.withColumn("title", F.coalesce("title", F.col("id")))
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
