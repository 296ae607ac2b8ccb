"""Driver-contract queries, batch 4 — global-search map/reduce (A8),
set-operation semantics (U2), reshape (P8), rolling-hash fingerprinting,
embedding near-dup + IVF-cell ANN, and 2-hop path enumeration (G3).

Same Spark↔DuckDB parity rules as queries.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from deep_reason_spark.queries import load


# ---------------------------------------------------------------------------
# A8 — global-search map/reduce (query side): map = score points per
# community batch (0-100), reduce = merge top-k ranked points
# (prompts/graphrag_prompts/query/global_search_*_system_prompt.py)
# ---------------------------------------------------------------------------

def q_a8_global_search(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    # map phase: per (event_type, batch=user_id%8) score = bounded 0-100
    mapped = (
        e.withColumn("batch", F.pmod(F.col("user_id"), F.lit(8)))
        .groupBy("event_type", "batch")
        .agg(
            F.least(
                F.round(F.avg(F.col("value").cast("decimal(18,4)")), 2), F.lit(100.0)
            ).cast("double").alias("score"),
            F.count("*").alias("support"),
        )
    )
    # reduce phase: keep top-3 scored points per event_type
    w = Window.partitionBy("event_type").orderBy(F.desc("score"), F.asc("batch"))
    return (
        mapped.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("event_type", "batch", "score", "support",
                F.col("rank").cast("int").alias("rank"))
    )


ORACLE_A8 = """
WITH mapped AS (
  SELECT event_type, user_id % 8 AS batch,
         CAST(LEAST(ROUND(AVG(CAST(value AS DECIMAL(18,4))), 2), 100.0) AS DOUBLE) AS score,
         COUNT(*) AS support
  FROM events GROUP BY event_type, user_id % 8
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY score DESC, batch ASC) AS rank
  FROM mapped
)
SELECT event_type, batch, score, support, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# U2 — uniqueness up to reversal (gen_agent/sampling.py:140-144): undirected
# pair dedup via least/greatest canonical key
# ---------------------------------------------------------------------------

def q_u2_undirected_dedup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.least("l_partkey", "l_suppkey").alias("lo"),
        F.greatest("l_partkey", "l_suppkey").alias("hi"),
    )
    return pairs.groupBy("lo", "hi").agg(F.count("*").alias("n_occurrences"))


ORACLE_U2 = """
SELECT LEAST(l_partkey, l_suppkey) AS lo, GREATEST(l_partkey, l_suppkey) AS hi,
       COUNT(*) AS n_occurrences
FROM lineitem GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# P8 — field rename / struct reshape (examples/dataset_conversion.py:60-82)
# ---------------------------------------------------------------------------

def q_p8_rename_reshape(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("Priority_Class"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice"), 0).cast("double").alias("price_rounded"),
        ).alias("order_meta"),
    ).select(
        "order_id", "Priority_Class",
        F.col("order_meta.status").alias("status"),
        F.col("order_meta.price_rounded").alias("price_rounded"),
    )


ORACLE_P8 = """
SELECT o_orderkey AS order_id, o_orderpriority AS Priority_Class,
       o_orderstatus AS status,
       CAST(ROUND(o_totalprice, 0) AS DOUBLE) AS price_rounded
FROM orders
"""


# ---------------------------------------------------------------------------
# T5 — rolling-hash document fingerprint (polynomial fold over word hashes,
# base 31 mod 2^31-1 — identical md5-derived word hashes in both engines)
# ---------------------------------------------------------------------------

_M = 2147483647

_T5_SPARK = f"""
aggregate(
  split(text, ' '), 0L,
  (acc, w) -> pmod(acc * 31 + conv(substring(md5(w), 1, 8), 16, 10), {_M}L)
)
"""

def q_t5_rolling_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.expr(_T5_SPARK).cast("bigint").alias("fingerprint"))


ORACLE_T5 = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           [CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) FOR x IN words]),
         (acc, h) -> (acc * 31 + h) % {_M}
       ) AS BIGINT) AS fingerprint
FROM w
"""


# ---------------------------------------------------------------------------
# D6 — embedding-cosine near-duplicate pairs, sign-bucket prefiltered
# (the ANN blocking path: exact cosine only within a bucket)
# ---------------------------------------------------------------------------

def q_d6_embedding_neardup(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        F.expr("array_join(transform(slice(embedding, 1, 4), "
               "x -> CASE WHEN x >= 0 THEN 'p' ELSE 'n' END), '')").alias("bucket"),
    ).withColumn("nrm", F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
    a, b = e.alias("a"), e.alias("b")
    dot = "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.round(F.expr(dot) / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.3)
    )


ORACLE_D6 = """
WITH e AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
         array_to_string([CASE WHEN x >= 0 THEN 'p' ELSE 'n' END
                          FOR x IN list_slice(embedding, 1, 4)], '') AS bucket
  FROM embeddings
),
n AS (SELECT vec_id, v, bucket, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
               / (a.nrm * b.nrm), 6) AS cosine
  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT * FROM pairs WHERE cosine >= 0.3
"""


# ---------------------------------------------------------------------------
# V5 — IVF-cell ANN: search only the query's coarse cell (label = cell id)
# ---------------------------------------------------------------------------

def q_v5_ivf_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qcell"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    dot = "aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    pairs = (
        e.join(F.broadcast(q), (F.col("label") == F.col("qcell"))
               & (F.col("vec_id") != F.col("qid")))
        .select("qid", "vec_id",
                F.round(F.expr(dot) / (F.col("qn") * F.col("nrm")), 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2)
        .select("qid", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


ORACLE_V5 = """
WITH e AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
),
n AS (SELECT vec_id, label, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e),
q AS (SELECT vec_id AS qid, label AS qcell, v AS qv, nrm AS qn FROM n WHERE vec_id < 3),
pairs AS (
  SELECT q.qid, c.vec_id,
         ROUND(list_sum(list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2]))
               / (q.qn * c.nrm), 6) AS cosine
  FROM n c JOIN q ON c.label = q.qcell AND c.vec_id != q.qid
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 2
"""


# ---------------------------------------------------------------------------
# V6 — MULTI-PROBE IVF ANN top-k: rank the query against the coarse
# centroids (seeded per-label means), probe the NPROBE nearest cells, exact
# cosine only within probed cells. The scale path when single-cell IVF (V5)
# misses boundary neighbors: recall grows with NPROBE while the scan stays
# bounded by NPROBE/num_cells of the corpus. Centroid ranking uses the same
# exact-decimal folds as the topic assignment, so the probe set (and the
# full result) is engine-reproducible.
# ---------------------------------------------------------------------------

_V6_NPROBE = 3
_V6_K = 2


def q_v6_ivf_multiprobe(spark, sf_dir):
    from deep_reason_spark.functions.cosine import cosine_topk, explode_vec
    from deep_reason_spark.operators.topics import seeded_centroids
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("nrm", F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
    cents = seeded_centroids(load(spark, sf_dir, "embeddings"))
    # query → centroid ranking via the shared exact-decimal cosine_topk
    qex = explode_vec(
        load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 3),
        ["vec_id"], "embedding", aliases=["qid"])
    probed = cosine_topk(
        qex, cents, item_ids=["qid"], probe_ids=["label"], k=_V6_NPROBE,
        partition="item", score_name="ccos", item_val="val", probe_val="c",
    ).select("qid", "label")
    # exact cosine only inside probed cells
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nrm").alias("qvn"))
    dot = "aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    pairs = (
        e.join(F.broadcast(probed), "label")
        .join(F.broadcast(q), "qid")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id",
                F.round(F.expr(dot) / (F.col("qvn") * F.col("nrm")), 6)
                .alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _V6_K)
        .select("qid", "vec_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def _oracle_v6() -> str:
    from deep_reason_spark.functions.cosine import cosine_topk_sql
    from deep_reason_spark.queries_topics import _SQL_CENTS, _SQL_EX
    rank_cte = cosine_topk_sql(
        items="qex", probes="cents", item_ids=["qid"], probe_ids=["label"],
        k=_V6_NPROBE, partition="item", score_name="ccos",
        item_val="val", probe_val="c", out="ck_probe", prefix="pr_")
    return f"""
WITH {_SQL_EX},
{_SQL_CENTS},
qex AS (SELECT vec_id AS qid, dim, val FROM ex WHERE vec_id < 3),
{rank_cte},
probed AS (SELECT qid, label FROM ck_probe),
ev AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
  FROM embeddings
),
n AS (SELECT vec_id, label, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM ev),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qvn FROM n WHERE vec_id < 3),
pairs AS (
  SELECT q.qid, c.vec_id,
         ROUND(list_sum(list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2]))
               / (q.qvn * c.nrm), 6) AS cosine
  FROM n c
  JOIN probed p ON p.label = c.label
  JOIN q ON q.qid = p.qid
  WHERE c.vec_id != q.qid
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT qid, vec_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_V6_K}
"""


# ---------------------------------------------------------------------------
# V7 — incremental IVF index append: already-indexed vectors keep their
# stored cell assignment; a NEW batch is assigned against the SAME fixed
# coarse centroids (built from the indexed corpus only) and unioned in —
# the dataflow append_ivf_index() writes (plans/rag_pipeline.py; the
# filesystem append + untouched-base-files invariant is pinned in
# test_rag_pipeline.py). The result equals a full rebuild under the same
# centroids because nearest-centroid assignment is per-row independent —
# the oracle replays exactly that rebuild: base-seeded centroids, one
# shared-machinery assignment over the whole corpus.
# ---------------------------------------------------------------------------

def q_v7_ivf_append(spark, sf_dir):
    from deep_reason_spark.operators.topics import (
        assign_topics,
        seeded_centroids,
    )
    e = load(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") % 4 != 0)
    batch = e.where(F.col("vec_id") % 4 == 0)
    # centroids are FIXED at index-build time (query-scale k×d frame; pinned
    # once, both assignment passes reuse it — same convention as
    # build_ivf_index)
    cents = seeded_centroids(base).localCheckpoint()
    stored = assign_topics(base, cents)     # what the stored index holds
    appended = assign_topics(batch, cents)  # the batch-scale append pass
    return stored.unionByName(appended).select(
        F.col("vec_id").alias("doc_id"),
        F.col("topic").cast("int").alias("cell"),
        "cos",
    )


def _oracle_v7() -> str:
    from deep_reason_spark.functions.cosine import cosine_topk_sql
    from deep_reason_spark.queries_topics import _SQL_EX
    assign_cte = cosine_topk_sql(
        items="ex", probes="bcents", item_ids=["vec_id"], probe_ids=["label"],
        k=1, partition="item", score_name="cos",
        item_val="val", probe_val="c", out="ck_v7", prefix="v7_")
    return f"""
WITH {_SQL_EX},
bex AS MATERIALIZED (SELECT * FROM ex WHERE vec_id % 4 != 0),
bcents AS MATERIALIZED (
  SELECT label, dim,
         ROUND(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM bex GROUP BY label, dim
),
{assign_cte}
SELECT vec_id AS doc_id, CAST(label AS INT) AS cell, cos FROM ck_v7
"""


# ---------------------------------------------------------------------------
# CY — text2cypher execution (baseline/langchain_baseline_graph.py): the
# reference LLM-generates Cypher, validates and runs it on Neo4j; here a
# restricted-Cypher compiler runs the SAME query shapes directly on the
# engine's edges/nodes DataFrames. The fixture graph is TPC-H-derived:
# customer -[:from]-> nation -[:in_region]-> region.
# ---------------------------------------------------------------------------

def _cy_graph(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    c = load(spark, sf_dir, "customer")
    e1 = c.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("source"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("target"),
        F.lit("from").alias("description"),
    )
    e2 = n.select(
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("source"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("target"),
        F.lit("in_region").alias("description"),
    )
    nodes = (
        c.select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("id"),
                 F.col("c_name").alias("title"))
        .unionByName(n.select(
            F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("id"),
            F.col("n_name").alias("title")))
        .unionByName(r.select(
            F.concat(F.lit("r"), F.col("r_regionkey").cast("string")).alias("id"),
            F.col("r_name").alias("title")))
    )
    return e1.unionByName(e2), nodes


CY1 = ("MATCH (c)-[:from]->(n)-[:in_region]->(r) "
       "WHERE r.title = 'ASIA' "
       "RETURN n.title AS nation, count(c) AS n_customers "
       "ORDER BY n_customers DESC, nation LIMIT 10")

CY2 = ("MATCH (n)-[:in_region]->(r) "
       "RETURN r.title AS region, count(DISTINCT n) AS n_nations")


def q_cy1_text2cypher_agg(spark, sf_dir):
    from deep_reason_spark.operators.cypher import run_cypher
    edges, nodes = _cy_graph(spark, sf_dir)
    return run_cypher(CY1, edges, nodes)


ORACLE_CY1 = """
SELECT n.n_name AS nation, COUNT(c.c_custkey) AS n_customers
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY n_customers DESC, nation LIMIT 10
"""


def q_cy2_text2cypher_distinct(spark, sf_dir):
    from deep_reason_spark.operators.cypher import run_cypher
    edges, nodes = _cy_graph(spark, sf_dir)
    return run_cypher(CY2, edges, nodes)


ORACLE_CY2 = """
SELECT r.r_name AS region, COUNT(DISTINCT n.n_nationkey) AS n_nations
FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
"""


# ---------------------------------------------------------------------------
# G3 — exact-length simple paths (2-hop) on the nation-region graph:
# nation → region → nation, endpoints distinct (cycle check)
# ---------------------------------------------------------------------------

def q_g3_two_hop_paths(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
               & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
        .select(
            F.col("a.n_nationkey").alias("n1"),
            F.col("a.n_regionkey").alias("via_region"),
            F.col("b.n_nationkey").alias("n2"),
        )
    )


ORACLE_G3 = """
SELECT a.n_nationkey AS n1, a.n_regionkey AS via_region, b.n_nationkey AS n2
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
"""


# ---------------------------------------------------------------------------
# O1 — ontology relation registry: distinct relation classes, densely
# numbered in sort order (kg_agent/schemes.py:30-32 contract)
# ---------------------------------------------------------------------------

def q_o1_relation_registry(spark, sf_dir):
    from deep_reason_spark.queries_text import q_p3_trigram_triples
    t = q_p3_trigram_triples(spark, sf_dir)
    d = t.select(F.col("predicate").alias("relation_name")).distinct()
    # dense ids WITHOUT a single-partition global window (r3 review flag):
    # rank within first-character buckets (parallel bounded windows), then
    # add per-bucket offsets. Sorting by (first char, name) within buckets
    # IS global lexicographic order, so the ids equal a global ROW_NUMBER.
    # The offsets window runs over the bucket-count table — bounded by the
    # alphabet, never by the relation vocabulary.
    b = d.withColumn("_b", F.substring("relation_name", 1, 1))
    wb = Window.partitionBy("_b").orderBy("relation_name")
    local = b.withColumn("_lr", F.row_number().over(wb))
    counts = local.groupBy("_b").agg(F.count("*").alias("_n"))
    wo = (Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(wo), F.lit(0)))
    return (
        local.join(F.broadcast(offsets.select("_b", "_off")), "_b")
        .select((F.col("_off") + F.col("_lr")).cast("int").alias("relation_id"),
                "relation_name")
    )


def _oracle_o1() -> str:
    from deep_reason_spark.queries_text import ORACLE_P3
    return f"""
WITH tr AS ({ORACLE_P3}),
d AS (SELECT DISTINCT predicate AS relation_name FROM tr)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY relation_name) AS INT) AS relation_id,
       relation_name
FROM d
"""


# ---------------------------------------------------------------------------
# E1/E2 — KG-side knowledge-edit execution + evaluation. The reference's
# editor applies (subject, relation, target_new) edits to MODEL WEIGHTS
# (knowledge_editing/easy_edit/knowledge_editor.py — EasyEdit); the data-
# engine analogue rewrites/inserts the same edit records against the
# materialized edges table and reports the EasyEdit metric shapes
# (rewrite_acc / locality on 0-1 scales). Fixture: the TPC-H-derived
# nation -[in_region]-> region graph; rewrites for n_nationkey % 5 == 0,
# inserts (new 'sponsors' relation) for % 7 == 0.
# ---------------------------------------------------------------------------

def _edit_fixture(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    nid = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    edges = n.select(
        nid.alias("source"), F.lit("in_region").alias("description"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("target"),
    )
    rewrites = n.where(F.col("n_nationkey") % 5 == 0).select(
        nid.alias("source"), F.lit("in_region").alias("description"),
        F.lit("r0").alias("target"))
    inserts = n.where(F.col("n_nationkey") % 7 == 0).select(
        nid.alias("source"), F.lit("sponsors").alias("description"),
        F.lit("r4").alias("target"))
    return edges, rewrites.unionByName(inserts)


_SQL_EDIT_BASE = """
edges AS (
  SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS source,
         'in_region' AS description,
         'r' || CAST(n_regionkey AS VARCHAR) AS target
  FROM nation
),
edits AS (
  SELECT 'n' || CAST(n_nationkey AS VARCHAR) AS source,
         'in_region' AS description, 'r0' AS target
  FROM nation WHERE n_nationkey % 5 = 0
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'sponsors', 'r4'
  FROM nation WHERE n_nationkey % 7 = 0
),
e AS (
  SELECT source, description, MIN(target) AS new_target
  FROM edits GROUP BY source, description
),
updated AS (
  SELECT g.source, g.description,
         COALESCE(e.new_target, g.target) AS target,
         CASE WHEN e.new_target IS NOT NULL THEN 'rewritten'
              ELSE 'kept' END AS edit_status
  FROM edges g LEFT JOIN e ON e.source = g.source
                          AND e.description = g.description
),
ins AS (
  SELECT e.source, e.description, e.new_target AS target,
         'inserted' AS edit_status
  FROM e
  WHERE NOT EXISTS (SELECT 1 FROM edges g
                    WHERE g.source = e.source
                      AND g.description = e.description)
)"""


def q_e1_apply_edits(spark, sf_dir):
    from deep_reason_spark.operators.editing import apply_edits
    edges, edits = _edit_fixture(spark, sf_dir)
    return apply_edits(edges, edits).select(
        "source", "description", "target", "edit_status")


ORACLE_E1 = f"""
WITH {_SQL_EDIT_BASE}
SELECT source, description, target, edit_status FROM updated
UNION ALL
SELECT source, description, target, edit_status FROM ins
"""


def q_e2_edit_metrics(spark, sf_dir):
    from deep_reason_spark.operators.editing import apply_edits, edit_metrics
    edges, edits = _edit_fixture(spark, sf_dir)
    return edit_metrics(apply_edits(edges, edits), edges, edits)


ORACLE_E2 = f"""
WITH {_SQL_EDIT_BASE},
edited AS (
  SELECT source, description, target FROM updated
  UNION ALL
  SELECT source, description, target FROM ins
),
hit AS (
  SELECT e.* FROM e
  WHERE EXISTS (SELECT 1 FROM edited d
                WHERE d.source = e.source AND d.description = e.description
                  AND d.target = e.new_target)
),
non AS (
  SELECT g.* FROM edges g
  WHERE NOT EXISTS (SELECT 1 FROM e
                    WHERE e.source = g.source
                      AND e.description = g.description)
),
ok AS (
  SELECT n.* FROM non n
  WHERE EXISTS (SELECT 1 FROM edited d
                WHERE d.source = n.source AND d.description = n.description
                  AND d.target = n.target)
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edits,
       ROUND(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
             / (SELECT COUNT(*) FROM e), 4) AS rewrite_acc,
       CAST((SELECT COUNT(*) FROM non) AS BIGINT) AS n_non_edited,
       ROUND(CAST((SELECT COUNT(*) FROM ok) AS DOUBLE)
             / (SELECT COUNT(*) FROM non), 4) AS locality_acc
"""


# ---------------------------------------------------------------------------
# J3 — community membership map join: communities carry entity_ids arrays;
# explode membership and decorate with per-entity stats
# (gen_agent/sampling.py:366-399)
# ---------------------------------------------------------------------------

def q_j3_community_membership(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    comm = n.groupBy(F.col("n_regionkey").alias("community_id")).agg(
        F.array_sort(F.collect_list("n_name")).alias("entity_ids"))
    members = comm.select("community_id", F.explode("entity_ids").alias("member"))
    stats = (
        n.join(c, n["n_nationkey"] == c["c_nationkey"], "left")
        .groupBy("n_name").agg(F.count("c_custkey").alias("n_customers"))
    )
    return members.join(F.broadcast(stats),
                        members["member"] == stats["n_name"]).select(
        "community_id", "member", "n_customers")


ORACLE_J3 = """
WITH comm AS (
  SELECT n_regionkey AS community_id, list(n_name ORDER BY n_name) AS entity_ids
  FROM nation GROUP BY 1
),
m AS (SELECT community_id, UNNEST(entity_ids) AS member FROM comm),
stats AS (
  SELECT n_name, COUNT(c_custkey) AS n_customers
  FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT community_id, member, n_customers FROM m JOIN stats ON member = n_name
"""


# ---------------------------------------------------------------------------
# RAG — the full-text query lifecycle end-to-end (SURVEY.md §3.2):
# keywords → retrieval top-k → rerank (0-10, keep >2) → context packing →
# per-question context stats, mirrored completely in SQL
# ---------------------------------------------------------------------------

_RAG_QS = [(1, "spark query table window"), (2, "vector stream data hash"),
           (3, "zzz qqq nonexistent")]
_RAG_STOP = ("a", "the", "and", "of", "to", "in", "is", "it")


def q_rag_fulltext_lifecycle(spark, sf_dir):
    from deep_reason_spark.plans.rag_pipeline import (
        fulltext_branch,
        pack_context,
        rerank,
    )
    docs = load(spark, sf_dir, "documents")
    qs = spark.createDataFrame(_RAG_QS, "question_id int, question string")
    retrieved = fulltext_branch(qs, docs).groupBy("question_id", "doc_id").agg(
        F.array_sort(F.collect_set("branch")).alias("branches"))
    ctx = pack_context(rerank(retrieved, qs, docs), docs, char_budget=1200)
    return ctx.groupBy("question_id").agg(
        F.count("*").alias("n_context_docs"),
        F.round(F.sum("rerank_score"), 4).alias("total_score"),
    )


def _oracle_rag() -> str:
    vals = ", ".join(f"({i}, '{q}')" for i, q in _RAG_QS)
    stop = ", ".join(f"'{w}'" for w in _RAG_STOP)
    return f"""
WITH q(question_id, question) AS (VALUES {vals}),
kw AS (
  SELECT question_id,
         UNNEST(list_distinct(list_filter(string_split_regex(lower(question), '[^a-z0-9]+'),
                w -> length(w) > 1 AND w NOT IN ({stop})))) AS keyword
  FROM q
),
dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              w -> length(w) > 1)) AS term
    FROM documents)
),
hits AS (
  SELECT k.question_id, d.doc_id, COUNT(*) AS ft_score
  FROM dt d JOIN kw k ON k.keyword = d.term
  GROUP BY k.question_id, d.doc_id
),
top AS (
  SELECT question_id, doc_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY question_id
                                 ORDER BY ft_score DESC, doc_id ASC) AS rn
    FROM hits) WHERE rn <= 3
),
nkw AS (SELECT question_id, COUNT(*) AS n_kw FROM kw GROUP BY question_id),
matched AS (
  SELECT t.question_id, t.doc_id, COUNT(*) AS n_m
  FROM top t JOIN dt d ON d.doc_id = t.doc_id
             JOIN kw k ON k.question_id = t.question_id
                      AND k.keyword = d.term
  GROUP BY t.question_id, t.doc_id
),
scored AS (
  SELECT t.question_id, t.doc_id,
         ROUND(COALESCE(m.n_m, 0) * 10.0 / n.n_kw, 4) AS rerank_score
  FROM top t LEFT JOIN matched m ON m.question_id = t.question_id
                                AND m.doc_id = t.doc_id
             JOIN nkw n ON n.question_id = t.question_id
),
kept AS (SELECT * FROM scored WHERE rerank_score > 2),
packed AS (
  SELECT k.question_id, k.doc_id, k.rerank_score,
         SUM(LENGTH(d.text)) OVER (PARTITION BY k.question_id
                                   ORDER BY k.rerank_score DESC, k.doc_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS cum
  FROM kept k JOIN documents d ON d.doc_id = k.doc_id
),
ctx AS (SELECT * FROM packed WHERE cum <= 1200)
SELECT question_id, COUNT(*) AS n_context_docs,
       ROUND(SUM(rerank_score), 4) AS total_score
FROM ctx GROUP BY question_id
"""


# ---------------------------------------------------------------------------
# G1 — pseudo-random chain sampling via frontier-capped walk. Fully oracled:
# the md5 sampling rank is bit-identical in DuckDB, so the oracle replays the
# exact walk (capped frontier per step → reversal dedup → endpoint rejection
# → ranked top-n) as chained CTEs.
# ---------------------------------------------------------------------------

_G1_SEED = 42
_G1_CAP = 64  # frontier cap: exercised (step-1 fan-out is 100 > 64 at sf≥0.001)


def q_g1_chain_sampling(spark, sf_dir):
    from deep_reason_spark.operators.sampling import sample_chains
    n = load(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n"), F.lpad(F.col("n_nationkey").cast("string"), 2, "0"))
        .alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    chains = sample_chains(edges, chain_length=3, n_chains=10, seed=_G1_SEED,
                           reject_connected_endpoints=True,
                           frontier_cap=_G1_CAP)
    return chains.select(F.array_join("chain", "->").alias("chain"))


ORACLE_G1 = f"""
WITH e AS (
  SELECT 'n' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS src,
         'r' || CAST(n_regionkey AS VARCHAR) AS dst
  FROM nation
),
b AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
  ) WHERE src <> dst
),
f2 AS (
  SELECT [src, dst] AS chain FROM b
  ORDER BY md5(array_to_string([src, dst], '|') || '#{_G1_SEED}'),
           array_to_string([src, dst], '|')
  LIMIT {_G1_CAP}
),
f3 AS (
  SELECT list_append(f2.chain, b.dst) AS chain
  FROM f2 JOIN b ON b.src = f2.chain[-1]
  WHERE NOT list_contains(f2.chain, b.dst)
  ORDER BY md5(array_to_string(list_append(f2.chain, b.dst), '|') || '#{_G1_SEED}'),
           array_to_string(list_append(f2.chain, b.dst), '|')
  LIMIT {_G1_CAP}
),
canon AS (
  SELECT DISTINCT CASE WHEN chain <= list_reverse(chain) THEN chain
                       ELSE list_reverse(chain) END AS chain
  FROM f3
),
kept AS (
  SELECT chain FROM canon c
  WHERE NOT EXISTS (SELECT 1 FROM b
                    WHERE b.src = c.chain[1] AND b.dst = c.chain[-1])
)
SELECT array_to_string(chain, '->') AS chain
FROM kept
ORDER BY md5(array_to_string(chain, '|') || '#{_G1_SEED}'),
         array_to_string(chain, '|')
LIMIT 10
"""


# ---------------------------------------------------------------------------
# GA1 — gen_agent enrichment lifecycle (SURVEY.md §3.3, gen_agent/
# agent.py:342-504): sample chains from the graph (G1 frontier walk), then
# look up each CONSECUTIVE pair against the directed relationship table
# with the reference's reverse-direction fallback (J2,
# gen_agent/sampling.py:225-335) — the exact rows its inference prompt is
# built from. Fully oracled: the walk replays via the md5 rank (ORACLE_G1)
# and the pair lookup is two LEFT joins.
# ---------------------------------------------------------------------------

def q_ga1_chain_relationships(spark, sf_dir):
    from deep_reason_spark.operators.sampling import sample_chains
    n = load(spark, sf_dir, "nation")
    edges = n.select(
        F.concat(F.lit("n"), F.lpad(F.col("n_nationkey").cast("string"), 2, "0"))
        .alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    chains = sample_chains(edges, chain_length=3, n_chains=10, seed=_G1_SEED,
                           reject_connected_endpoints=True,
                           frontier_cap=_G1_CAP)
    pairs = chains.select(
        F.array_join("chain", "->").alias("chain"),
        F.expr("explode(sequence(1, size(chain) - 1))").alias("pos"),
        F.col("chain").alias("_c"),
    ).select(
        "chain", "pos",
        F.element_at("_c", F.col("pos")).alias("a"),
        F.element_at("_c", F.col("pos") + 1).alias("b"),
    )
    e = edges.distinct()
    fwd = e.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                   F.lit(1).alias("_f"))
    rev = e.select(F.col("dst").alias("a"), F.col("src").alias("b"),
                   F.lit(1).alias("_r"))
    return (
        pairs.join(fwd, ["a", "b"], "left").join(rev, ["a", "b"], "left")
        .select(
            "chain", "pos", "a", "b",
            F.when(F.col("_f").isNotNull(), F.lit("forward"))
            .when(F.col("_r").isNotNull(), F.lit("reversed"))
            .otherwise(F.lit("missing")).alias("direction"),
        )
    )


def _oracle_ga1() -> str:
    return f"""
WITH g1 AS (SELECT chain FROM ({ORACLE_G1})),
arr AS (SELECT chain, string_split(chain, '->') AS nodes FROM g1),
pairs AS (
  SELECT chain, CAST(i AS INT) AS pos,
         nodes[CAST(i AS INT)] AS a, nodes[CAST(i AS INT) + 1] AS b
  FROM arr, UNNEST(range(1, len(nodes))) AS t(i)
),
de AS (
  SELECT DISTINCT
         'n' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS src,
         'r' || CAST(n_regionkey AS VARCHAR) AS dst
  FROM nation
)
SELECT p.chain, p.pos, p.a, p.b,
       CASE WHEN f.src IS NOT NULL THEN 'forward'
            WHEN r.src IS NOT NULL THEN 'reversed'
            ELSE 'missing' END AS direction
FROM pairs p
LEFT JOIN de f ON f.src = p.a AND f.dst = p.b
LEFT JOIN de r ON r.dst = p.a AND r.src = p.b
"""


# ---------------------------------------------------------------------------
# U3 — multi-query planner + IVF vector retrieval + content dedup
# (rag/pipeline.py:275-334: planned = {question} ∪ sub-queries, retrieve
# top-k per planned query THROUGH the multi-probe IVF index, union, dedup
# by content). The deterministic feature-hash embedding, the centroid
# probing, the cell-pruned cosine and the dedup are all mirrored in SQL.
# ---------------------------------------------------------------------------

def q_u3_planned_vector(spark, sf_dir):
    from deep_reason_spark.plans.rag_pipeline import planned_vector_branch
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    qs = spark.createDataFrame(_RAG_QS, "question_id int, question string")
    return planned_vector_branch(qs, emb, docs).select("question_id", "doc_id")


def _oracle_u3() -> str:
    from deep_reason_spark.functions.cosine import cosine_topk_sql
    from deep_reason_spark.plans.rag_pipeline import NPROBE
    from deep_reason_spark.queries_topics import _SQL_ASSIGN, _SQL_EX
    vals = ", ".join(f"({i}, '{q}')" for i, q in _RAG_QS)
    stop = ", ".join(f"'{w}'" for w in _RAG_STOP)
    _probe_cte = cosine_topk_sql(
        items="qvec", probes="cents", item_ids=["question_id", "query_id"],
        probe_ids=["label"], k=NPROBE, partition="item", score_name="ccos",
        item_val="qcomp", probe_val="c", out="ck_probe", prefix="pb_")
    _u3_rank_cte = cosine_topk_sql(
        items="cand", probes="qvec", item_ids=["doc_id"],
        probe_ids=["question_id", "query_id"], k=3, partition="probe",
        score_name="cos", item_val="val", probe_val="qcomp",
        out="ck_hits", prefix="u3_", candidates="cdpairs")
    return f"""
WITH q(question_id, question) AS (VALUES {vals}),
kw AS (
  SELECT question_id,
         UNNEST(list_distinct(list_filter(string_split_regex(lower(question), '[^a-z0-9]+'),
                w -> length(w) > 1 AND w NOT IN ({stop})))) AS keyword
  FROM q
),
subs AS (
  SELECT question_id, query_id, keyword AS query_text FROM (
    SELECT question_id, keyword,
           ROW_NUMBER() OVER (PARTITION BY question_id ORDER BY keyword) AS query_id
    FROM kw
  ) WHERE query_id <= 3
),
planned AS (
  SELECT question_id, MIN(query_id) AS query_id, query_text FROM (
    SELECT question_id, 0 AS query_id, question AS query_text FROM q
    UNION ALL
    SELECT question_id, query_id, query_text FROM subs
  ) GROUP BY question_id, query_text
),
ptoks AS (
  SELECT question_id, query_id,
         UNNEST(list_filter(string_split_regex(lower(query_text), '[^a-z0-9]+'),
                            w -> length(w) > 1)) AS w
  FROM planned
),
comp AS (
  SELECT question_id, query_id,
         CAST(CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 64 AS INT) AS dim,
         CASE WHEN CAST(('0x' || substring(md5(w), 9, 1)) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM ptoks
),
qvec AS MATERIALIZED (
  SELECT question_id, query_id, dim, CAST(SUM(s) AS BIGINT) AS qcomp
  FROM comp GROUP BY question_id, query_id, dim
  HAVING CAST(SUM(s) AS BIGINT) != 0
),
{_SQL_EX},
{_SQL_ASSIGN},
cells AS (SELECT vec_id AS doc_id, topic AS cell FROM assign),
{_probe_cte},
cdpairs AS (
  SELECT p.question_id, p.query_id, c.doc_id
  FROM cells c
  JOIN (SELECT question_id, query_id, label AS cell FROM ck_probe) p
    ON p.cell = c.cell
),
cand AS (SELECT vec_id AS doc_id, dim, val FROM ex),
{_u3_rank_cte},
hits AS (SELECT question_id, doc_id FROM ck_hits),
fp AS (
  SELECT h.question_id, h.doc_id, md5(d.text) AS fp
  FROM hits h JOIN documents d USING (doc_id)
)
SELECT question_id, MIN(doc_id) AS doc_id FROM fp GROUP BY question_id, fp
"""


# ---------------------------------------------------------------------------
# S11/V7 — RAG IVF vector retrieval (the ENGINE's vector_branch): direct
# question vectors ranked against the coarse centroids, NPROBE nearest
# cells scanned via the materialized cell assignment, exact cosine only on
# candidate pairs (VERDICT r3 task 2 — the ES dense_vector index analogue,
# rag/en-es-index-body.yaml:31-36)
# ---------------------------------------------------------------------------

def q_rag_ivf_retrieval(spark, sf_dir):
    from deep_reason_spark.plans.rag_pipeline import vector_branch
    emb = load(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("question_vec"),
    )
    return vector_branch(qs, emb, top_k=3).select("question_id", "doc_id")


def _oracle_rag_ivf() -> str:
    from deep_reason_spark.functions.cosine import cosine_topk_sql
    from deep_reason_spark.plans.rag_pipeline import NPROBE
    from deep_reason_spark.queries_topics import _SQL_ASSIGN, _SQL_EX
    _probe_cte = cosine_topk_sql(
        items="qex", probes="cents", item_ids=["question_id"],
        probe_ids=["label"], k=NPROBE, partition="item", score_name="ccos",
        item_val="q", probe_val="c", out="ck_probe", prefix="pb_")
    _hit_cte = cosine_topk_sql(
        items="cand", probes="qex", item_ids=["doc_id"],
        probe_ids=["question_id"], k=3, partition="probe", score_name="cos",
        item_val="val", probe_val="q", candidates="cdpairs",
        out="ck_hits", prefix="hv_")
    return f"""
WITH {_SQL_EX},
{_SQL_ASSIGN},
cells AS (SELECT vec_id AS doc_id, topic AS cell FROM assign),
qex AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS question_id, dim, val AS q
  FROM ex WHERE vec_id < 3
),
{_probe_cte},
cdpairs AS (
  SELECT p.question_id, c.doc_id
  FROM cells c
  JOIN (SELECT question_id, label AS cell FROM ck_probe) p ON p.cell = c.cell
),
cand AS (SELECT vec_id AS doc_id, dim, val FROM ex),
{_hit_cte}
SELECT question_id, doc_id FROM ck_hits
"""


# ---------------------------------------------------------------------------
# AQ1 — answer-quality judge (scoring/answer_quality.py:8-59 contract:
# consistency/similarity/completeness → 0-10 score; deterministic
# token-overlap analogue of the LLM judge). Fixture: each doc's "generated
# answer" is judged against the next doc as reference+context.
# ---------------------------------------------------------------------------

def q_aq1_answer_quality(spark, sf_dir):
    from deep_reason_spark.operators.scoring import answer_quality
    d = load(spark, sf_dir, "documents")
    g = d.where(F.col("doc_id") < 50).select(
        "doc_id", F.col("text").alias("generated_answer"))
    r = d.select((F.col("doc_id") - 1).alias("doc_id"),
                 F.col("text").alias("real_answer"))
    pairs = g.join(r, "doc_id").withColumn("context", F.col("real_answer"))
    return answer_quality(pairs).select(
        "doc_id", "consistency", "similarity", "completeness", "score")


ORACLE_AQ1 = """
WITH pairs AS (
  SELECT g.doc_id, g.text AS gen, r.text AS ref
  FROM documents g JOIN documents r ON r.doc_id = g.doc_id + 1
  WHERE g.doc_id < 50
),
sets AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(gen), '[^a-z0-9]+'),
                                   w -> length(w) > 1)) AS gt,
         list_distinct(list_filter(string_split_regex(lower(ref), '[^a-z0-9]+'),
                                   w -> length(w) > 1)) AS rt
  FROM pairs
),
comp AS (
  SELECT doc_id,
         ROUND(CASE WHEN len(gt) > 0
               THEN CAST(len(list_intersect(gt, rt)) AS DOUBLE) / len(gt)
               ELSE 0 END, 4) AS consistency,
         ROUND(CASE WHEN len(list_distinct(list_concat(gt, rt))) > 0
               THEN CAST(len(list_intersect(gt, rt)) AS DOUBLE)
                    / len(list_distinct(list_concat(gt, rt)))
               ELSE 0 END, 4) AS similarity,
         ROUND(CASE WHEN len(rt) > 0
               THEN CAST(len(list_intersect(gt, rt)) AS DOUBLE) / len(rt)
               ELSE 0 END, 4) AS completeness
  FROM sets
)
SELECT doc_id, consistency, similarity, completeness,
       ROUND((consistency + similarity + completeness) * 10.0 / 3.0, 4) AS score
FROM comp
"""


EXTRA_QUERIES = {
    "rag_ivf_retrieval": q_rag_ivf_retrieval,
    "e1_apply_edits": q_e1_apply_edits,
    "e2_edit_metrics": q_e2_edit_metrics,
    "ga1_chain_relationships": q_ga1_chain_relationships,
    "rag_fulltext_lifecycle": q_rag_fulltext_lifecycle,
    "u3_planned_vector": q_u3_planned_vector,
    "aq1_answer_quality": q_aq1_answer_quality,
    "g1_chain_sampling": q_g1_chain_sampling,
    "j3_community_membership": q_j3_community_membership,
    "a8_global_search": q_a8_global_search,
    "u2_undirected_dedup": q_u2_undirected_dedup,
    "p8_rename_reshape": q_p8_rename_reshape,
    "t5_rolling_fingerprint": q_t5_rolling_fingerprint,
    "d6_embedding_neardup": q_d6_embedding_neardup,
    "v5_ivf_topk": q_v5_ivf_topk,
    "v6_ivf_multiprobe": q_v6_ivf_multiprobe,
    "v7_ivf_append": q_v7_ivf_append,
    "cy1_text2cypher_agg": q_cy1_text2cypher_agg,
    "cy2_text2cypher_distinct": q_cy2_text2cypher_distinct,
    "g3_two_hop_paths": q_g3_two_hop_paths,
    "o1_relation_registry": q_o1_relation_registry,
}


def extra_oracles() -> dict[str, str]:
    return {
        "rag_ivf_retrieval": _oracle_rag_ivf(),
        "e1_apply_edits": ORACLE_E1,
        "e2_edit_metrics": ORACLE_E2,
        "ga1_chain_relationships": _oracle_ga1(),
        "rag_fulltext_lifecycle": _oracle_rag(),
        "u3_planned_vector": _oracle_u3(),
        "aq1_answer_quality": ORACLE_AQ1,
        "g1_chain_sampling": ORACLE_G1,
        "j3_community_membership": ORACLE_J3,
        "a8_global_search": ORACLE_A8,
        "u2_undirected_dedup": ORACLE_U2,
        "p8_rename_reshape": ORACLE_P8,
        "t5_rolling_fingerprint": ORACLE_T5,
        "d6_embedding_neardup": ORACLE_D6,
        "v5_ivf_topk": ORACLE_V5,
        "v6_ivf_multiprobe": _oracle_v6(),
        "v7_ivf_append": _oracle_v7(),
        "cy1_text2cypher_agg": ORACLE_CY1,
        "cy2_text2cypher_distinct": ORACLE_CY2,
        "g3_two_hop_paths": ORACLE_G3,
        "o1_relation_registry": _oracle_o1(),
    }
