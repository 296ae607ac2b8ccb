"""Entity canonicalization — connected components over a similarity-edge
DataFrame (SURVEY.md §2.7 G5).

The reference performs entity merging *inside the LLM* ("always use the
most complete identifier", deep-reason ``prompts/kg_prompts.py:25,42``;
KG-refine merges duplicate nodes, ``kg_agent/chains.py:100-110``). Our
engine makes it a dataflow operator: build similarity edges cheaply
(blocking, never O(n²) pairs), then run connected components and pick one
canonical representative per component.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame joins — converges in O(log n) rounds regardless of component
diameter, which is what survives 10^12-node graphs (naive label
propagation needs O(diameter) rounds). TWO-REGIME (r5): an edge set at or
below ``SMALL_CC_EDGES`` undirected edges skips the rounds entirely and
labels on the driver via bounded union-find — the distributed rounds are
pure fixed stage latency at that size (AQE-of-CC, in spirit: pick the
physical strategy from the measured input, exactly like the broadcast
byte gate).

Scale hardening (north rule):
- ``localCheckpoint()`` every iteration truncates lineage — without it the
  plan grows exponentially and the driver OOMs around round 10;
- hub entities (a node with 10^4+ similarity neighbors) make the per-node
  min-neighbor aggregation hot: partial (map-side) aggregation already
  splits that, and ``salt`` adds an explicit two-phase
  ``groupBy(node, salt) → groupBy(node)`` reduction for the extreme case;
- the join of edges against per-node minima is skew-split by AQE
  (``spark.sql.adaptive.skewJoin.enabled``, on in our session factory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Two-regime execution (r5): at or below this many UNDIRECTED edges the
# component labeling runs as driver-side union-find — one bounded collect
# + one createDataFrame — instead of the iterative star rounds. The
# distributed algorithm's per-round cost is 4-5 sequential stages (two
# star shuffles, a distinct, a checkpoint, a convergence agg): pure fixed
# latency that dominates small graphs (a 1.5k-edge pruned community graph
# measured 9.6 s of rounds vs <0.5 s of union-find). The collect is
# BOUNDED by this knob (not an unbounded driver loop): ~64k edges ≈ a few
# MB on the driver. Above the threshold the O(log n)-round operator runs
# unchanged — the regime that survives 10^12 nodes. Module global, read
# at call time (deployment/test knob, CLAUDE.md gate convention).
SMALL_CC_EDGES = 65_536


def _min_by_key(df: DataFrame, key: str, val: str, salt: int) -> DataFrame:
    """min(val) per key; optionally salted two-phase (explicit hot-key path)."""
    if salt <= 1:
        return df.groupBy(key).agg(F.min(val).alias("_m"))
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64(val), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.min(val).alias("_pm"))
    )
    return partial.groupBy(key).agg(F.min("_pm").alias("_m"))


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set, deduped, self-loops dropped, as (u, v)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(b: DataFrame, salt: int) -> DataFrame:
    """large-star: every neighbor v > u links to min(N(u) ∪ {u})."""
    mins = _min_by_key(b, "u", "v", salt).withColumnRenamed("u", "_u")
    m = b.join(mins, b["u"] == F.col("_u")).select(
        "u", "v", F.least(F.col("_m"), F.col("u")).alias("m")
    )
    return m.where(F.col("v") > F.col("u")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )


def _small_star(b: DataFrame, salt: int) -> DataFrame:
    """small-star: neighbors v ≤ u (and u itself) link to the local min."""
    down = b.where(F.col("v") <= F.col("u"))
    mins = _min_by_key(down, "u", "v", salt).withColumnRenamed("u", "_u")
    withm = down.join(mins, down["u"] == F.col("_u")).select(
        "u", "v", F.col("_m").alias("m")
    )
    out = withm.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        withm.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _driver_union_find(b: DataFrame) -> DataFrame:
    """Small-graph regime: exact min-label union-find over the collected
    (bounded — see SMALL_CC_EDGES) edge set. Identical output contract to
    the distributed rounds: component = min node id, every node labeled.
    Smaller-root-wins union keeps each tree's root at the component min at
    all times (every node starts as its own root, so the global min is a
    root and never loses a merge); UTF-8 byte order equals code-point
    order, so Python string comparison matches Spark's."""
    pairs = [(r["u"], r["v"])
             for r in b.where(F.col("u") < F.col("v")).collect()]
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru == rv:
            continue
        if rv < ru:
            ru, rv = rv, ru
        parent[rv] = ru
    labels = sorted((x, find(x))
                    for x in {n for uv in pairs for n in uv})
    from pyspark.sql.types import StructField, StructType
    dt = b.schema["u"].dataType
    schema = StructType(
        [StructField("node", dt), StructField("component", dt)])
    return b.sparkSession.createDataFrame(labels, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    salt: int = 0,
    small_graph_threshold: int | None = None,
) -> DataFrame:
    """→ (node, component) where component = min node id of the component.

    Isolated endpoints appear (every node seen in ``edges`` gets a label);
    callers union isolated nodes back with label = own id.

    ``small_graph_threshold``: undirected-edge count at or below which the
    driver union-find regime runs instead of the distributed rounds
    (default: module global SMALL_CC_EDGES; pass 0 to force the
    distributed path, e.g. in tests of the round machinery)."""
    if small_graph_threshold is None:
        small_graph_threshold = SMALL_CC_EDGES
    b = _canon_edges(edges, src, dst).localCheckpoint()
    # node set derived from the checkpointed bidirectional set so the input
    # plan is executed exactly once
    nodes = b.select("u").distinct()
    # data-adaptive parallelism: a CC iteration on a small (or shrinking)
    # edge set must not pay 2×cores-worth of empty shuffle partitions; at
    # 10^12 scale the same formula spreads ~1M edges per partition
    n_edges = b.count()
    if n_edges == 0:
        return b.select(F.col("u").alias("node"), F.col("v").alias("component"))
    if n_edges <= 2 * small_graph_threshold:  # b is bidirectional
        return _driver_union_find(b)
    parts = max(1, min(512, n_edges // 1_000_000 + 1))
    # the intermediate dedups/repartitions bound row inflation between the
    # two star passes — essential on 10^9-edge graphs, pure per-round stage
    # latency on small ones (the star groupBys dedup for free: min() is
    # duplicate-insensitive); b2's trailing distinct keeps the per-round
    # edge set canonical either way
    big = n_edges > 1_000_000
    if b.rdd.getNumPartitions() > parts:
        b = b.repartition(parts, "u").localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        e1 = _large_star(b, salt)
        if big:
            e1 = e1.distinct()
        mid = e1.union(e1.select(F.col("v").alias("u"), F.col("u").alias("v")))\
            .where(F.col("u") != F.col("v"))
        if big:
            mid = mid.distinct()
        e2 = _small_star(mid, salt)
        b2 = (
            e2.union(e2.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        if big:
            b2 = b2.repartition(parts, "u")
        b2 = b2.localCheckpoint()  # truncate lineage each round
        sig = b2.agg(
            F.count("*").alias("n"),
            # decimal sum: overflow-proof under ANSI mode (Spark 4 default)
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        b = b2
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])

    # final state is a star forest pointing at component minima
    labels = _min_by_key(b, "u", "v", salt).select(
        F.col("u").alias("node"), F.col("_m").alias("component")
    )
    return (
        nodes.join(labels, nodes["u"] == labels["node"], "left")
        .select(
            F.col("u").alias("node"),
            F.least(F.coalesce("component", F.col("u")), F.col("u")).alias("component"),
        )
    )


def incremental_components(
    old_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    salt: int = 0,
    small_graph_threshold: int | None = None,
    return_delta: bool = False,
) -> DataFrame:
    """Exact incremental connected components: fold a batch of NEW edges
    into an existing ``(node, component)`` labeling (component = min member
    id, the invariant every CC entry point here maintains) and return the
    labeling of the union graph — identical to a full recompute, while
    touching only the delta (the new edges and the labels table; never the
    historical EDGE set).

    The reference refreshes its graph by feeding new triplets plus the
    ``current_graph`` back through an LLM refine chain (deep-reason
    ``kg_agent/chains.py:99-135``) — O(graph) work per batch. The dataflow
    analogue contracts each already-known component to its label: map both
    endpoints of every new edge through ``old_labels`` (unknown nodes map
    to themselves), drop edges that fall inside one component, run CC on
    that contracted graph (batch-scale — the two-regime operator labels a
    typical micro-batch on the driver), then compose the old labeling with
    the delta labeling.

    Exactness: old label = min of its members, the delta CC takes the min
    over representative ids, and ``min(min(A), min(B), new nodes…)`` is the
    min over the merged component — so composed labels equal the full
    recompute's.

    Scale shape (10^9-row labels table): ``old_labels`` is scanned exactly
    twice — once probing the broadcast batch-endpoint set, once applying
    the broadcast ``rep → final`` delta map — no shuffle of the labels
    table, no scan of historical edges. Callers pass a storage-backed
    ``old_labels`` (parquet read / checkpoint); batch-scale frames are
    pinned + byte-gated here per the CLAUDE.md broadcast rule.

    ``return_delta=True`` additionally returns the batch-scale relabel map
    ``(rep, final)`` — every representative whose label CHANGED this batch
    — as ``(labels, delta_map)``; downstream aggregates keyed by canonical
    id re-key through it (``operators/graph.py::incremental_edge_update``)
    instead of diffing two labels-table snapshots.
    """
    from deep_reason_spark.functions.broadcast import broadcast_if_small

    e = new_edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
        & (F.col(src) != F.col(dst))
    )
    endpoints = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()  # pin: consumed by the gate, the probe, the anti
    )
    # labels of batch endpoints: stream the big labels table past the
    # broadcast endpoint set (inner), then anti-derive the unseen nodes
    hits = (
        old_labels.join(broadcast_if_small(endpoints), "node")
        .select("node", "component")
        .localCheckpoint()
    )
    misses = endpoints.join(broadcast_if_small(hits), "node", "left_anti")
    ep_map = (
        hits.select("node", F.col("component").alias("rep"))
        .unionByName(misses.select("node", F.col("node").alias("rep")))
        .localCheckpoint()  # pin: probed twice (u and v sides) + gated
    )
    gated = broadcast_if_small(ep_map)
    contracted = (
        e.join(gated.withColumnRenamed("node", "u")
               .withColumnRenamed("rep", "ru"), "u")
        .join(gated.withColumnRenamed("node", "v")
              .withColumnRenamed("rep", "rv"), "v")
        .select(F.col("ru").alias("src"), F.col("rv").alias("dst"))
        .where(F.col("ru") != F.col("rv"))
    )
    delta = connected_components(
        contracted, salt=salt, small_graph_threshold=small_graph_threshold
    ).localCheckpoint()  # batch-scale; composed into both output legs
    delta_map = broadcast_if_small(
        delta.select(F.col("node").alias("rep"), F.col("component").alias("_f"))
    )
    updated_old = (
        old_labels.join(delta_map, old_labels["component"] == F.col("rep"),
                        "left")
        .select(
            "node",
            F.coalesce("_f", old_labels["component"]).alias("component"),
        )
    )
    new_labels = (
        misses.join(delta_map, misses["node"] == F.col("rep"), "left")
        .select("node", F.coalesce("_f", F.col("node")).alias("component"))
    )
    out = updated_old.unionByName(new_labels)
    if return_delta:
        changed = delta.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("rep"), F.col("component").alias("final"))
        return out, changed
    return out


def normalize_name(col):
    """Blocking key: lowercase, collapse non-alphanumerics."""
    return F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " ")


def build_similarity_edges(
    entities: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "canonical_name",
    extra_edges: DataFrame | None = None,
) -> DataFrame:
    """Similarity edges via *blocking*, never pairwise O(n²):

    every id sharing a normalized-name block links to the block's min id
    (a star per block — |block| edges, not |block|²). Extra edge sources
    (alias links, LSH buckets, embedding neighbors) union in."""
    keyed = entities.select(
        F.col(id_col).alias("id"), normalize_name(F.col(name_col)).alias("_blk")
    ).where(F.length(F.trim("_blk")) > 0).distinct()
    reps = keyed.groupBy("_blk").agg(F.min("id").alias("_rep"))
    star = (
        keyed.join(reps, "_blk")
        .where(F.col("id") != F.col("_rep"))
        .select(F.col("id").alias("src"), F.col("_rep").alias("dst"))
    )
    if extra_edges is not None:
        star = star.unionByName(extra_edges.select("src", "dst"))
    return star


def canonicalize_entities(
    linked_nodes: DataFrame,
    id_col: str = "entity_id",
    name_col: str = "canonical_name",
    extra_edges: DataFrame | None = None,
    salt: int = 0,
) -> DataFrame:
    """→ (entity_id, canonical_id): every entity mapped to its component
    representative (min id). Entities in no similarity edge map to
    themselves."""
    edges = build_similarity_edges(linked_nodes, id_col, name_col, extra_edges)
    cc = connected_components(edges, salt=salt)
    all_ids = linked_nodes.select(F.col(id_col).alias("node")).distinct()
    # cc is consulted once per downstream reference; labels are
    # entity-scale (small), so materialize them once
    cc = cc.localCheckpoint()
    return (
        all_ids.join(cc, "node", "left")
        .select(
            F.col("node").alias("entity_id"),
            F.coalesce("component", F.col("node")).alias("canonical_id"),
        )
    )
