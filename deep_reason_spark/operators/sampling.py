"""Chain sampling over the entity graph — iterative DataFrame joins.

Reference semantics reproduced (SURVEY.md §2.7 G1-G4):
- G1 random-walk chain sampling (``gen_agent/sampling.py:119-173``): start
  nodes chosen pseudo-randomly, walk without revisiting, REJECT chains
  whose endpoints are directly connected, dedup chains up to reversal
  (``sampling.py:140-144``);
- G3 community chains (``sampling.py:337-477``): all simple paths of an
  exact length within each community's induced subgraph, capped per
  community;
- G4 subgraph induction (``sampling.py:397-407``): membership semi-joins.

Spark-first design: the walk is L-2 frontier⋈edges joins with an
``array_contains`` cycle check — never a driver-resident graph (the
reference loads graphml into networkx; at 10^12 edges only iterative joins
survive). Randomness is ``xxhash64(path, seed)`` ranking: deterministic for
a given seed, uniform across chains, reproducible across cluster sizes —
Spark's ``rand()`` is partition-dependent and would break resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bidirectional(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def all_simple_paths(edges: DataFrame, chain_length: int) -> DataFrame:
    """All simple paths with exactly ``chain_length`` NODES (undirected,
    deduped up to reversal) → DataFrame(chain array<string>).

    L-2 chained joins, cycle check via array_contains — the dataflow
    equivalent of nx.all_simple_paths(cutoff=L-1) keep-exact-length
    (gen_agent/sampling.py:416-431)."""
    if chain_length < 2:
        raise ValueError("chain_length must be >= 2")
    b = bidirectional(edges).localCheckpoint()
    paths = b.select(F.array("src", "dst").alias("chain"))
    for _ in range(chain_length - 2):
        step = b.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
        paths = (
            paths.join(step, F.element_at("chain", -1) == F.col("_s"))
            .where(~F.array_contains("chain", F.col("_d")))
            .select(F.concat("chain", F.array("_d")).alias("chain"))
        )
    # uniqueness up to reversal (sampling.py:140-144, frozenset-of-direction)
    canonical = F.when(
        F.col("chain") <= F.reverse("chain"), F.col("chain")
    ).otherwise(F.reverse("chain"))
    return paths.select(canonical.alias("chain")).distinct()


def _chain_rank(seed: int) -> list:
    """Deterministic pseudo-random ordering key for a chain: md5 of the
    joined path + seed. md5 is bit-identical in Spark and DuckDB, so the
    same ranking (and therefore the same sample) is reproducible in the
    SQL oracle; the joined string is the tie-break."""
    s = F.concat(F.array_join("chain", "|"), F.lit(f"#{seed}"))
    return [F.md5(s), F.array_join("chain", "|")]


def frontier_walk(
    edges: DataFrame,
    chain_length: int,
    frontier_cap: int,
    seed: int = 42,
) -> DataFrame:
    """Frontier-capped pseudo-random walk → DataFrame(chain array<string>).

    The reference samples chains by BOUNDED random walks (≤1000 attempts,
    gen_agent/sampling.py:119-173) — it never enumerates all simple paths,
    whose count is exponential in length on dense graphs. This is the
    dataflow equivalent: each step extends every frontier chain with the
    neighbors of its last node (cycle-checked), then keeps only the
    ``frontier_cap`` best chains by deterministic md5 rank. The frontier is
    ≤ frontier_cap rows AFTER EVERY STEP by construction (orderBy+limit =
    per-partition top-K + single merge), so the walk is O(cap × avg_degree)
    per step regardless of graph size — a 10⁴-degree hub costs one bounded
    fan-out, not an exponential blow-up."""
    b = bidirectional(edges).localCheckpoint()
    return _frontier_walk_over(b, chain_length, frontier_cap, seed)


def _frontier_walk_over(
    b: DataFrame, chain_length: int, frontier_cap: int, seed: int
) -> DataFrame:
    """Walk over an already-materialized bidirectional edge set (callers
    that also need ``b`` — e.g. endpoint rejection — pass it in, so the
    corpus-scale union+distinct runs exactly once)."""
    if chain_length < 2:
        raise ValueError("chain_length must be >= 2")
    rank = _chain_rank(seed)
    frontier = (
        b.select(F.array("src", "dst").alias("chain"))
        .orderBy(*rank).limit(frontier_cap)
    )
    for _ in range(chain_length - 2):
        step = b.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
        frontier = (
            frontier.join(step, F.element_at("chain", -1) == F.col("_s"))
            .where(~F.array_contains("chain", F.col("_d")))
            .select(F.concat("chain", F.array("_d")).alias("chain"))
            .orderBy(*rank).limit(frontier_cap)
        )
    return frontier


def sample_chains(
    edges: DataFrame,
    chain_length: int,
    n_chains: int,
    seed: int = 42,
    reject_connected_endpoints: bool = True,
    frontier_cap: int | None = None,
) -> DataFrame:
    """G1: pseudo-random sample of simple chains via a frontier-capped walk;
    rejects chains whose endpoints are directly connected
    (gen_agent/sampling.py:151-158). Deterministic for a given seed and
    reproducible across cluster sizes (md5 rank, not rand()/xxhash64 —
    md5 also exists in DuckDB, so the full sample is oracle-able)."""
    if frontier_cap is None:
        frontier_cap = max(n_chains * 8, 64)
    b = bidirectional(edges).localCheckpoint()
    paths = _frontier_walk_over(b, chain_length, frontier_cap, seed)
    # uniqueness up to reversal (sampling.py:140-144)
    canonical = F.when(
        F.col("chain") <= F.reverse("chain"), F.col("chain")
    ).otherwise(F.reverse("chain"))
    paths = paths.select(canonical.alias("chain")).distinct()
    if reject_connected_endpoints:
        ends = paths.select(
            "chain",
            F.element_at("chain", 1).alias("src"),
            F.element_at("chain", -1).alias("dst"),
        )
        paths = ends.join(b, ["src", "dst"], "left_anti").select("chain")
    return paths.orderBy(*_chain_rank(seed)).limit(n_chains).select("chain")


def community_chains(
    edges: DataFrame,
    communities: DataFrame,
    chain_length: int,
    chains_per_community: int,
    seed: int = 42,
) -> DataFrame:
    """G3: per community, all-simple-paths of exact length within the
    induced subgraph, pseudo-random cap per community.

    ``communities``: (community_id bigint, entity_ids array<string>) —
    the GraphRAG communities.parquet shape (FIXTURES.md F6)."""
    members = communities.select(
        "community_id", F.explode("entity_ids").alias("node")
    )
    b = bidirectional(edges)
    # G4 induction, community-tagged: both endpoints in the same community
    scoped = (
        b.join(members.withColumnRenamed("node", "src"), "src")
        .join(members.withColumnRenamed("node", "dst")
              .withColumnRenamed("community_id", "_c2"), "dst")
        .where(F.col("community_id") == F.col("_c2"))
        .select("community_id", "src", "dst")
    )
    paths = scoped.select("community_id", F.array("src", "dst").alias("chain"))
    for _ in range(chain_length - 2):
        step = scoped.select(F.col("community_id").alias("_cc"),
                             F.col("src").alias("_s"), F.col("dst").alias("_d"))
        paths = (
            paths.join(
                step,
                (F.element_at("chain", -1) == F.col("_s"))
                & (F.col("community_id") == F.col("_cc")),
            )
            .where(~F.array_contains("chain", F.col("_d")))
            .select("community_id", F.concat("chain", F.array("_d")).alias("chain"))
        )
    canonical = F.when(
        F.col("chain") <= F.reverse("chain"), F.col("chain")
    ).otherwise(F.reverse("chain"))
    deduped = paths.select("community_id", canonical.alias("chain")).distinct()
    from pyspark.sql import Window
    w = Window.partitionBy("community_id").orderBy(
        F.xxhash64(F.col("chain"), F.lit(seed)))
    return (
        deduped.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= chains_per_community)
        .select("community_id", "chain")
    )


def chains_with_descriptions(chains: DataFrame, entities: DataFrame) -> DataFrame:
    """J1: decorate chain nodes with entity descriptions — case-insensitive
    lookup, first match wins, empty-string defaults on miss
    (gen_agent/sampling.py:175-223).

    Scale shape (VERDICT r4 #1): ``entities`` is the deduped entities table
    (10^8+ rows at 100×) and must NEVER be broadcast whole. The sampled
    chains are query-scale, so the chain-node key set is broadcast into a
    SEMI-join that prunes the entities side down to the nodes actually on a
    chain BEFORE the first-match window; the pruned lookup then rides the
    shared byte gate."""
    from pyspark.sql import Window

    from deep_reason_spark.functions.broadcast import broadcast_if_small
    exploded = chains.select(
        "chain", F.posexplode("chain").alias("pos", "node")
    ).withColumn("_k", F.lower(F.col("node")))
    # chain-node key set: query-scale; pinned so the byte gates below (and
    # the semi-join broadcast) estimate/ship a materialized frame instead
    # of re-running the chain subplan (CLAUDE.md pin-before-gate rule)
    keys = exploded.select("_k").distinct().localCheckpoint()
    keyed = entities.select(
        F.lower(F.col("title")).alias("_k"), "title", "description", "type"
    ).join(broadcast_if_small(keys), "_k", "left_semi")
    w = Window.partitionBy("_k").orderBy("title")
    first = keyed.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1).drop("_rn").localCheckpoint()
    looked = exploded.join(broadcast_if_small(first), "_k", "left").select(
        "chain", "pos", "node",
        F.coalesce("description", F.lit("")).alias("description"),
        F.coalesce("type", F.lit("")).alias("type"),
    )
    return (
        looked.groupBy("chain")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "node", "description", "type"))
            ).alias("nodes")
        )
    )
