"""GraphRAG local-search context assembly (VERDICT r2 task 8).

The reference ships four GraphRAG query modes; global search (A8) was
already implemented. This adds LOCAL search
(``prompts/graphrag_prompts/query/local_search_system_prompt.py:1-69``):
anchor entities → their relationship neighborhood + the top text units per
entity, assembled into ranked context rows the answer prompt consumes.

Deterministic contract: per anchor, keep the top-R relationships by weight
(ties: smallest neighbor) and the top-T text units by unit score (ties:
smallest unit id); emit one row per context item with its kind and rank.

Scale shape: anchors are a question-scale table → broadcast onto the edge
and text-unit scans; per-anchor top-k are windows over the anchor-filtered
(small) slices, never global sorts; the corpus-side tables are scanned
once each with pushed-down projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deep_reason_spark.functions.broadcast import broadcast_if_small


def local_search_context(
    anchors: DataFrame,
    edges: DataFrame,
    text_units: DataFrame,
    top_rel: int = 5,
    top_units: int = 3,
) -> DataFrame:
    """→ (anchor, kind, ref_id, score, rank) context rows.

    ``anchors``: one ``anchor`` column (entity ids).
    ``edges``: (src, dst, weight) — treated undirected.
    ``text_units``: (entity_id, unit_id, score) — per-entity unit scores.
    kind='relation' rows carry the neighbor as ref_id and the edge weight
    as score; kind='text_unit' rows carry the unit id and unit score."""
    a = broadcast_if_small(anchors.select("anchor").distinct())
    und = edges.select(
        F.col("src").alias("anchor"), F.col("dst").alias("neighbor"), "weight"
    ).unionByName(
        edges.select(
            F.col("dst").alias("anchor"), F.col("src").alias("neighbor"),
            "weight")
    )
    wr = Window.partitionBy("anchor").orderBy(
        F.desc("score"), F.asc("ref_id"))
    rel = (
        und.join(a, "anchor")
        .select("anchor", F.col("neighbor").alias("ref_id"),
                F.col("weight").cast("double").alias("score"))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_rel)
        .select("anchor", F.lit("relation").alias("kind"), "ref_id",
                "score", "rank")
    )
    units = (
        text_units.select(F.col("entity_id").alias("anchor"),
                          F.col("unit_id").alias("ref_id"),
                          F.col("score").cast("double").alias("score"))
        .join(a, "anchor")
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_units)
        .select("anchor", F.lit("text_unit").alias("kind"), "ref_id",
                "score", "rank")
    )
    return rel.unionByName(units).select(
        "anchor", "kind", "ref_id", "score", F.col("rank").cast("int").alias("rank"))
