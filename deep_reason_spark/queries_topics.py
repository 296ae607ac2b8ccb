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


TOPIC_QUERIES = {
    "t6_tfidf": q_t6_tfidf,
    "t7_topic_terms": q_t7_topic_terms,
    "t8_topic_info": q_t8_topic_info,
}

TOPIC_ORACLES = {
    "t6_tfidf": ORACLE_T6,
    "t7_topic_terms": ORACLE_T7,
    "t8_topic_info": ORACLE_T8,
}
