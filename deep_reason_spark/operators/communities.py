"""Community detection + index-side community reports (VERDICT r2 tasks
5-6; SURVEY.md §2.7 extension).

The reference CONSUMES GraphRAG's ``communities.parquet``
(``gen_agent/sampling.py:357,390-393``: community_id → entity_ids) and
``community_reports.parquet``
(``prompts/graphrag_prompts/index/community_report.py:6-153``: title /
summary / rating-shaped rows read by global search and
``notebooks/graph_analysis.ipynb`` cell 5) but builds neither — GraphRAG's
Leiden clustering does. This module makes the engine self-contained with a
DETERMINISTIC dataflow analogue:

- **detect_communities** — modularity-style cut, then connected
  components: drop weak edges (weight < min_weight) and hub-incident edges
  (endpoint degree > max_degree on the weight-filtered graph), label the
  remaining components with their min node id (the large-star/small-star
  CC operator, O(log n) rounds), singletons label themselves. Hub removal
  is what keeps a co-occurrence graph from collapsing into one giant
  component — the same role Leiden's resolution parameter plays, but
  reproducible and fully oracle-able (recursive-CTE transitive closure).
- **community_reports** — per-community rollup in the consumed report
  shape: member count, internal edge count/weight, top members by internal
  degree, a rating on the reference's 0-10 scale.
- **global_search_reports** — the A8 global-search reduce reading those
  reports: rank by rating, keep top-k (query side of
  ``global_search_*_system_prompt.py``).

Scale shape: degree/weight pruning is two partial-aggregable groupBys; CC
is the salted O(log n)-round operator (canonicalize.py); reports are
groupBys + one bounded window; nothing collects an unbounded list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deep_reason_spark.operators.canonicalize import connected_components


def prune_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    min_weight: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """The modularity-style cut → (src, dst, weight) kept edges.

    Keeps edges with weight ≥ min_weight whose BOTH endpoints have degree
    ≤ max_degree on the weight-filtered undirected graph. Degrees are
    computed once on the symmetric edge set (one groupBy).

    With ``weight_col=None`` each DISTINCT (src, dst) pair counts as one
    weight-1 edge — duplicate input rows are deduped so they cannot inflate
    community_reports' internal edge/degree rollups (ADVICE r3); callers
    wanting multiplicity as weight must pre-aggregate and pass
    ``weight_col``."""
    if weight_col is None:
        e = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .distinct()
            .withColumn("weight", F.lit(1))
        )
        if min_weight > 1:  # every distinct pair weighs exactly 1
            e = e.limit(0)
    else:
        e = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"),
            F.col(weight_col).alias("weight"),
        ).where(F.col("weight") >= min_weight)
    if max_degree is None:
        return e
    und = e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy("src").agg(F.count("*").alias("_d"))
    return (
        e.join(deg.withColumnRenamed("src", "_s"), e["src"] == F.col("_s"))
        .where(F.col("_d") <= max_degree).drop("_s", "_d")
        .join(deg.withColumnRenamed("src", "_t"), e["dst"] == F.col("_t"))
        .where(F.col("_d") <= max_degree).drop("_t", "_d")
    )


def detect_communities(
    edges: DataFrame,
    all_nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    min_weight: int = 1,
    max_degree: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """→ (entity_id, community_id): community = min entity id of the
    pruned-graph component; entities with no surviving edge are their own
    community. ``all_nodes`` (one ``node`` column) fixes the label universe;
    defaults to every endpoint of the UNPRUNED edge set."""
    kept = prune_edges(edges, src, dst, weight_col, min_weight, max_degree)
    cc = connected_components(kept, "src", "dst", salt=salt)
    if all_nodes is None:
        all_nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node"))).distinct()
        )
    return (
        all_nodes.select("node").distinct()
        .join(cc, "node", "left")
        .select(
            F.col("node").alias("entity_id"),
            F.coalesce("component", F.col("node")).alias("community_id"),
        )
    )


def pack_communities(assignments: DataFrame, max_members: int = 1000) -> DataFrame:
    """(entity_id, community_id) → the consumed ``communities.parquet``
    shape (community_id, entity_ids, n_members). Member arrays are CAPPED
    (rank-windowed) — a hub community must not build an unbounded array."""
    w = Window.partitionBy("community_id").orderBy("entity_id")
    ranked = assignments.withColumn("_rn", F.row_number().over(w))
    packed = (
        ranked.where(F.col("_rn") <= max_members)
        .groupBy("community_id")
        .agg(F.array_sort(F.collect_list("entity_id")).alias("entity_ids"))
    )
    sizes = assignments.groupBy("community_id").agg(
        F.count("*").alias("n_members"))
    return packed.join(sizes, "community_id")


def community_reports(
    assignments: DataFrame,
    kept_edges: DataFrame,
    top_members: int = 4,
) -> DataFrame:
    """Index-side per-community report rows (community_report.py:6-153
    shape, deterministic): (community_id, title, n_members,
    n_internal_edges, total_weight, top_members, rating).

    top_members = highest internal degree (ties: smallest id), joined
    with "_" in rank order via the bounded array_sort trick (no unbounded
    collect). rating = min(10, ln(1 + total internal weight)) rounded 2 —
    the reference's 0-10 importance scale."""
    asg_s = assignments.select(F.col("entity_id").alias("src"),
                               F.col("community_id").alias("_cs"))
    asg_d = assignments.select(F.col("entity_id").alias("dst"),
                               F.col("community_id").alias("_cd"))
    internal = (
        kept_edges.join(asg_s, "src").join(asg_d, "dst")
        .where(F.col("_cs") == F.col("_cd"))
        .select(F.col("_cs").alias("community_id"), "src", "dst", "weight")
    )
    edge_stats = internal.groupBy("community_id").agg(
        F.count("*").alias("n_internal_edges"),
        F.sum("weight").cast("bigint").alias("total_weight"),
    )
    sizes = assignments.groupBy("community_id").agg(
        F.count("*").alias("n_members"))
    ideg = (
        internal.select("community_id", F.col("src").alias("member"))
        .union(internal.select("community_id", F.col("dst").alias("member")))
        .groupBy("community_id", "member").agg(F.count("*").alias("_deg"))
    )
    wm = Window.partitionBy("community_id").orderBy(
        F.desc("_deg"), F.asc("member"))
    tops = (
        ideg.withColumn("_rn", F.row_number().over(wm))
        .where(F.col("_rn") <= top_members)
        .groupBy("community_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "member"))),
                    lambda x: x["member"].cast("string"),
                ), "_",
            ).alias("top_members")
        )
    )
    return (
        sizes.join(edge_stats, "community_id", "left")
        .join(tops, "community_id", "left")
        .select(
            "community_id",
            F.concat(F.lit("community_"),
                     F.col("community_id").cast("string")).alias("title"),
            "n_members",
            F.coalesce("n_internal_edges", F.lit(0)).alias("n_internal_edges"),
            F.coalesce("total_weight", F.lit(0).cast("bigint")).alias("total_weight"),
            F.coalesce("top_members", F.lit("")).alias("top_members"),
            F.round(
                F.least(F.lit(10.0),
                        F.log(F.lit(1.0) + F.coalesce("total_weight",
                                                      F.lit(0)).cast("double"))),
                2,
            ).alias("rating"),
        )
    )


def global_search_reports(reports: DataFrame, k: int = 10) -> DataFrame:
    """A8 global search wired to the index-side reports: the reduce phase
    ranks report rows by rating (ties: smallest community) and keeps the
    top-k — the deterministic contract of
    ``global_search_reduce_system_prompt`` over report batches.

    Scale shape: the global top-k runs as orderBy+limit
    (TakeOrderedAndProject — per-partition partial top-k, no single-task
    window over all reports); the rank window then touches only k rows."""
    topk = reports.orderBy(F.desc("rating"), F.asc("community_id")).limit(k)
    w = Window.orderBy(F.desc("rating"), F.asc("community_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))
