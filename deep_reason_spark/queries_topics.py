"""Driver-contract queries, batch 5 — topic modeling (VERDICT r1 missing #1).

Deterministic Spark analogue of the reference's BERTopic pipeline
(``topic_modeling/bertopic/topic_modeling.py``): TF-IDF over a
CountVectorizer-style vocabulary, nearest-seeded-centroid clustering of the
embeddings, c-TF-IDF top terms per topic, and the ``get_topic_info()``
shaped summary. Every stage is SQL-expressible, so all three queries are
fully DuckDB-oracled (exact decimal folds for dot products/norms; every
double rounded to 6 before hashing — CLAUDE.md parity rules).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from deep_reason_spark.functions.cosine import cosine_topk_sql
from deep_reason_spark.operators.topics import (
    MAX_DF_RATIO,
    MIN_DF,
    TOKEN_SPLIT,
    assign_topics,
    ctfidf_terms,
    seeded_centroids,
    tfidf,
    tokenize,
    topic_info,
)
from deep_reason_spark.queries import load

# ---------------------------------------------------------------------------
# shared oracle CTE fragments (kept in lockstep with operators/topics.py)
# ---------------------------------------------------------------------------

_SQL_TOKS = f"""
toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT}'),
                            w -> length(w) > 1)) AS term
  FROM documents
),
nd AS (SELECT COUNT(*) AS n FROM documents),
vocab AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
  HAVING COUNT(DISTINCT doc_id) >= {MIN_DF}
     AND COUNT(DISTINCT doc_id)
         <= CAST(FLOOR({MAX_DF_RATIO} * (SELECT n FROM nd)) AS BIGINT)
)"""

# exploded embedding values: (vec_id, label, dim 0-based, val double).
# MATERIALIZED: referenced 2-4x downstream (norms, dots, candidate scans) —
# DuckDB inlines multiply-referenced CTEs (CLAUDE.md oracle hygiene)
_SQL_EX = """
ex AS MATERIALIZED (
  SELECT vec_id, label, CAST(i AS INT) - 1 AS dim,
         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
)"""

# seeded centroids (mirrors operators/topics.py seeded_centroids: exact
# DECIMAL(28,10) folds, round 6) — shared with the multi-probe IVF oracle
# in queries_extra.py
_SQL_CENTS = """
cents AS MATERIALIZED (
  SELECT label, dim,
         ROUND(CAST(SUM(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM ex GROUP BY label, dim
)"""

# nearest-seeded-centroid assignment: the shared cosine CTE builder
# (functions/cosine.py) emits the byte-identical DuckDB computation that
# operators/topics.py assign_topics runs in Spark
_SQL_ASSIGN = _SQL_CENTS + ",\n" + cosine_topk_sql(
    items="ex", probes="cents", item_ids=["vec_id"], probe_ids=["label"],
    k=1, partition="item", score_name="cos", item_val="val", probe_val="c",
    out="ck_assign", prefix="as_",
) + """,
assign AS (SELECT vec_id, label AS topic, cos FROM ck_assign)"""

# c-TF-IDF per (topic, term) over the filtered vocabulary
_SQL_CTFIDF = """
kept AS (SELECT toks.doc_id, toks.term FROM toks JOIN vocab USING (term)),
tagged AS (
  SELECT a.topic, k.term FROM kept k JOIN assign a ON a.vec_id = k.doc_id
),
tf_tc AS (SELECT topic, term, COUNT(*) AS tf FROM tagged GROUP BY topic, term),
f_t AS (SELECT term, COUNT(*) AS ft FROM kept GROUP BY term),
consts AS (
  SELECT CAST((SELECT COUNT(*) FROM kept) AS DOUBLE)
         / CAST((SELECT COUNT(DISTINCT label) FROM embeddings) AS DOUBLE) AS a
),
cscore AS (
  SELECT tf_tc.topic, tf_tc.term,
         ROUND(tf_tc.tf * ln(1.0 + (SELECT a FROM consts) / f_t.ft), 6) AS score
  FROM tf_tc JOIN f_t USING (term)
),
topic_terms AS (
  SELECT topic, term, score, rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY topic
                                 ORDER BY score DESC, term ASC) AS rank
    FROM cscore
  ) WHERE rank <= 10
)"""


# ---------------------------------------------------------------------------
# T6 — per-document TF-IDF top terms
# ---------------------------------------------------------------------------

def q_t6_tfidf(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    scores = tfidf(d)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("doc_id", "term", "tfidf",
                F.col("rank").cast("bigint").alias("rank"))
    )


ORACLE_T6 = f"""
WITH {_SQL_TOKS},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(CAST((SELECT n FROM nd) AS DOUBLE) / vocab.df), 6)
           AS tfidf
  FROM tf JOIN vocab USING (term)
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# T7 — c-TF-IDF top terms per topic (seeded-centroid clustering)
# ---------------------------------------------------------------------------

def _spark_assignments(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return assign_topics(e, seeded_centroids(e))


def q_t7_topic_terms(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    toks = tokenize(d)
    n_docs = d.count()
    n_topics = e.select("label").distinct().count()
    asg = _spark_assignments(spark, sf_dir)
    return ctfidf_terms(toks, asg, n_docs, n_topics, top_n=10)


ORACLE_T7 = f"""
WITH {_SQL_TOKS},
{_SQL_EX},
{_SQL_ASSIGN},
{_SQL_CTFIDF}
SELECT topic, term, score, rank FROM topic_terms
"""


# ---------------------------------------------------------------------------
# T8 — get_topic_info() shape: (topic, doc_count, name)
# ---------------------------------------------------------------------------

def q_t8_topic_info(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    toks = tokenize(d)
    n_docs = d.count()
    n_topics = e.select("label").distinct().count()
    asg = _spark_assignments(spark, sf_dir).localCheckpoint()
    terms = ctfidf_terms(toks, asg, n_docs, n_topics, top_n=10)
    return topic_info(asg, terms).select(
        "topic", F.col("count").alias("doc_count"), "name")


ORACLE_T8 = f"""
WITH {_SQL_TOKS},
{_SQL_EX},
{_SQL_ASSIGN},
{_SQL_CTFIDF},
counts AS (SELECT topic, COUNT(*) AS doc_count FROM assign GROUP BY topic),
names AS (
  SELECT topic, string_agg(term, '_' ORDER BY rank) AS terms_joined
  FROM topic_terms WHERE rank <= 4 GROUP BY topic
)
SELECT c.topic, c.doc_count,
       CAST(c.topic AS VARCHAR) || '_' || COALESCE(n.terms_joined, '') AS name
FROM counts c LEFT JOIN names n USING (topic)
"""


# ---------------------------------------------------------------------------
# T9 — multi-aspect topic representations (VERDICT r3 task 4): the
# reference trains three aspects — KeyBERT-ish main name, POS, and
# MaximalMarginalRelevance diversity 0.5 — and exports the aspect columns
# in get_topic_info() (topic_modeling/bertopic/muli_aspect.py:12-27).
# Deterministic analogues: MMR greedily diversifies the c-TF-IDF top terms
# using cosine over their cross-topic score vectors; POS keeps noun-
# looking terms. The greedy loop unrolls to (name_terms − 1) CTE steps so
# the oracle replays the exact selection.
# ---------------------------------------------------------------------------

def _mmr_sql(n_select: int = 4, diversity: float = 0.5) -> str:
    """CTE chain mirroring operators/topics.py mmr_terms step-for-step.
    Emits mm_rel / mm_sims / mm_prev{i} / mm_step{i} and the final
    ``mm_sel`` (topic, term, sel_rank)."""
    w_rel = round(1.0 - diversity, 6)
    w_div = round(diversity, 6)
    parts = [f"""mm_rel AS MATERIALIZED (
  SELECT t.topic, t.term, t.rank, ROUND(t.score / m.mx, 6) AS rel
  FROM topic_terms t
  JOIN (SELECT topic, MAX(score) AS mx FROM topic_terms GROUP BY topic) m
    USING (topic)
),
mm_pairs AS (
  SELECT DISTINCT a.term AS t1, b.term AS t2
  FROM topic_terms a JOIN topic_terms b
    ON a.topic = b.topic AND a.term < b.term
),
mm_norms AS MATERIALIZED (
  SELECT term,
         sqrt(CAST(SUM(CAST(score * score AS DECIMAL(28,10))) AS DOUBLE)) AS n
  FROM topic_terms GROUP BY term
),
mm_dots AS (
  SELECT p.t1, p.t2,
         CAST(SUM(CAST(va.score * vb.score AS DECIMAL(28,10))) AS DOUBLE) AS dot
  FROM mm_pairs p
  JOIN topic_terms va ON va.term = p.t1
  JOIN topic_terms vb ON vb.term = p.t2 AND vb.topic = va.topic
  GROUP BY p.t1, p.t2
),
mm_half AS (
  SELECT d.t1, d.t2, ROUND(d.dot / (n1.n * n2.n), 6) AS sim
  FROM mm_dots d JOIN mm_norms n1 ON n1.term = d.t1
                 JOIN mm_norms n2 ON n2.term = d.t2
),
mm_sims AS MATERIALIZED (
  SELECT t1, t2, sim FROM mm_half
  UNION ALL
  SELECT t2 AS t1, t1 AS t2, sim FROM mm_half
),
mm_prev2 AS (SELECT topic, term, 1 AS sel_rank FROM mm_rel WHERE rank = 1)"""]
    for i in range(2, n_select + 1):
        parts.append(f"""mm_step{i} AS (
  SELECT topic, term, {i} AS sel_rank FROM (
    SELECT s.topic, s.term,
           ROW_NUMBER() OVER (PARTITION BY s.topic
                              ORDER BY s.mmr DESC, s.term ASC) AS rn
    FROM (
      SELECT r.topic, r.term,
             ROUND({w_rel} * r.rel - {w_div} * MAX(sm.sim), 6) AS mmr
      FROM mm_rel r
      JOIN mm_prev{i} sel ON sel.topic = r.topic
      JOIN mm_sims sm ON sm.t1 = r.term AND sm.t2 = sel.term
      WHERE NOT EXISTS (SELECT 1 FROM mm_prev{i} x
                        WHERE x.topic = r.topic AND x.term = r.term)
      GROUP BY r.topic, r.term, r.rel
    ) s
  ) WHERE rn = 1
),
mm_prev{i + 1} AS (
  SELECT * FROM mm_prev{i} UNION ALL SELECT * FROM mm_step{i}
)""")
    parts.append(f"mm_sel AS (SELECT * FROM mm_prev{n_select + 1})")
    return ",\n".join(parts)


def q_t9_topic_aspects(spark, sf_dir):
    from deep_reason_spark.operators.topics import topic_aspects
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    toks = tokenize(d)
    n_docs = d.count()
    n_topics = e.select("label").distinct().count()
    asg = _spark_assignments(spark, sf_dir).localCheckpoint()
    terms = ctfidf_terms(toks, asg, n_docs, n_topics, top_n=10).localCheckpoint()
    return topic_aspects(asg, terms).select(
        "topic", F.col("count").alias("doc_count"),
        "name", "mmr_name", "pos_name")


def _oracle_t9() -> str:
    from deep_reason_spark.operators.topics import (
        MMR_DIVERSITY,
        POS_NOUNISH,
    )
    return f"""
WITH {_SQL_TOKS},
{_SQL_EX},
{_SQL_ASSIGN},
{_SQL_CTFIDF},
{_mmr_sql(4, MMR_DIVERSITY)},
mm_names AS (
  SELECT topic, string_agg(term, '_' ORDER BY sel_rank) AS mmr_name
  FROM mm_sel GROUP BY topic
),
pos_names AS (
  SELECT topic, string_agg(term, '_' ORDER BY sel_rank) AS pos_name FROM (
    SELECT topic, term,
           ROW_NUMBER() OVER (PARTITION BY topic ORDER BY rank) AS sel_rank
    FROM topic_terms
    WHERE length(term) >= 4 AND NOT regexp_matches(term, '{POS_NOUNISH}')
  ) WHERE sel_rank <= 4 GROUP BY topic
),
counts AS (SELECT topic, COUNT(*) AS doc_count FROM assign GROUP BY topic),
names AS (
  SELECT topic, string_agg(term, '_' ORDER BY rank) AS terms_joined
  FROM topic_terms WHERE rank <= 4 GROUP BY topic
)
SELECT c.topic, c.doc_count,
       CAST(c.topic AS VARCHAR) || '_' || COALESCE(n.terms_joined, '') AS name,
       COALESCE(m.mmr_name, '') AS mmr_name,
       COALESCE(p.pos_name, '') AS pos_name
FROM counts c
LEFT JOIN names n USING (topic)
LEFT JOIN mm_names m USING (topic)
LEFT JOIN pos_names p USING (topic)
"""


TOPIC_QUERIES = {
    "t9_topic_aspects": q_t9_topic_aspects,
    "t6_tfidf": q_t6_tfidf,
    "t7_topic_terms": q_t7_topic_terms,
    "t8_topic_info": q_t8_topic_info,
}

TOPIC_ORACLES = {
    "t9_topic_aspects": _oracle_t9(),
    "t6_tfidf": ORACLE_T6,
    "t7_topic_terms": ORACLE_T7,
    "t8_topic_info": ORACLE_T8,
}
