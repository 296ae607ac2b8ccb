"""GraphRAG query modes beyond global search (VERDICT r2 tasks 8 + missing
#3). The reference ships FOUR modes
(``prompts/graphrag_prompts/query/*.py``); global search (A8 +
``global_search_reports``) was already implemented. This module adds the
other three:

- **local_search_context** (``local_search_system_prompt.py:1-69``):
  anchor entities → their relationship neighborhood + the top text units
  per entity, assembled into ranked context rows.
- **drift_search_context** (``drift_search_system_prompt.py:1-167``):
  DRIFT = global primer → local follow-ups. Deterministic contract: the
  primer ranks community reports (the global-search reduce) and picks the
  top communities; follow-up anchors are each community's top members by
  internal degree; the local phase assembles per-anchor context exactly
  like local search, tagged with its community.
- **basic_search_context** (``basic_search_system_prompt.py``): vanilla
  text RAG — posting-list full-text top-k per question, context rows with
  the doc scores.

Deterministic contract throughout: every top-k orders on (score DESC,
id ASC); scores are exact counts/weights so both engines rank identically.

Scale shape: anchors/questions/primer outputs are query-scale → broadcast
onto the corpus-side scans; per-anchor top-k are windows over the
anchor-filtered (small) slices, never global sorts; the corpus-side
tables are scanned once each with pushed-down projections.
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


def drift_anchors(
    reports: DataFrame,
    assignments: DataFrame,
    kept_edges: DataFrame,
    top_communities: int = 2,
    anchors_per_community: int = 2,
) -> DataFrame:
    """DRIFT primer → follow-up anchors: rank communities via the
    global-search reduce, then pick each top community's most central
    members (internal degree desc, entity id asc; members with no internal
    edge rank by id — a singleton community anchors on its sole member).
    → (community_id, anchor)."""
    from deep_reason_spark.operators.communities import global_search_reports

    # communities-scale top-k; pinned so the byte gate below estimates a
    # materialized frame instead of re-running the report rollup
    primer = global_search_reports(reports, k=top_communities).select(
        "community_id").localCheckpoint()
    asg_s = assignments.select(F.col("entity_id").alias("src"),
                               F.col("community_id").alias("_cs"))
    asg_d = assignments.select(F.col("entity_id").alias("dst"),
                               F.col("community_id").alias("_cd"))
    internal = (
        kept_edges.join(asg_s, "src").join(asg_d, "dst")
        .where(F.col("_cs") == F.col("_cd"))
        .select(F.col("_cs").alias("community_id"), "src", "dst")
    )
    ideg = (
        internal.select("community_id", F.col("src").alias("entity_id"))
        .union(internal.select("community_id", F.col("dst").alias("entity_id")))
        .groupBy("community_id", "entity_id").agg(F.count("*").alias("_deg"))
    )
    members = (
        assignments.join(broadcast_if_small(primer), "community_id")
        .join(ideg, ["community_id", "entity_id"], "left")
        .withColumn("_deg", F.coalesce("_deg", F.lit(0)))
    )
    w = Window.partitionBy("community_id").orderBy(
        F.desc("_deg"), F.asc("entity_id"))
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= anchors_per_community)
        .select("community_id", F.col("entity_id").alias("anchor"))
        # query-scale; consumed twice downstream (context join + gate
        # estimate) — pin once
        .localCheckpoint()
    )


def drift_search_context(
    reports: DataFrame,
    assignments: DataFrame,
    kept_edges: DataFrame,
    edges: DataFrame,
    text_units: DataFrame,
    top_communities: int = 2,
    anchors_per_community: int = 2,
    top_rel: int = 5,
    top_units: int = 3,
) -> DataFrame:
    """DRIFT search: global primer (ranked community reports) → per-anchor
    local context → (community_id, anchor, kind, ref_id, score, rank).
    The local phase runs over the FULL relationship table (``edges``), not
    just the pruned community-internal set — follow-ups may leave the
    community, which is the point of DRIFT."""
    anchors = drift_anchors(reports, assignments, kept_edges,
                            top_communities, anchors_per_community)
    ctx = local_search_context(
        anchors.select("anchor"), edges, text_units, top_rel, top_units)
    return (
        ctx.join(broadcast_if_small(anchors), "anchor")
        .select("community_id", "anchor", "kind", "ref_id", "score", "rank")
    )


def generate_questions(edges: DataFrame, n: int = 5) -> DataFrame:
    """Question generation (``question_gen_system_prompt.py``):
    deterministic contract for "candidates representing the most important
    themes in the data" — the N strongest relationships, templated so each
    candidate references both named entities (the prompt's instruction) →
    (question_id, question).

    Scale shape: global top-n via orderBy+limit (TakeOrderedAndProject);
    the rank window touches only n rows."""
    topn = edges.orderBy(
        F.desc("weight"), F.asc("src"), F.asc("dst")).limit(n)
    w = Window.orderBy(F.desc("weight"), F.asc("src"), F.asc("dst"))
    return (
        topn.withColumn("question_id", F.row_number().over(w).cast("int"))
        .select(
            "question_id",
            F.format_string(
                "What is the relationship between %s and %s?",
                F.col("src").cast("string"), F.col("dst").cast("string"),
            ).alias("question"),
        )
    )


def basic_search_context(
    questions: DataFrame,
    documents: DataFrame,
    top_k: int = 5,
) -> DataFrame:
    """Basic search (vanilla text RAG): posting-list full-text scores,
    top-k docs per question with their scores as ranked context rows
    → (question_id, doc_id, score, rank)."""
    from deep_reason_spark.plans.rag_pipeline import fulltext_scores

    hits = fulltext_scores(questions, documents)
    w = Window.partitionBy("question_id").orderBy(
        F.desc("ft_score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .select("question_id", "doc_id",
                F.col("ft_score").cast("bigint").alias("score"), "rank")
    )
