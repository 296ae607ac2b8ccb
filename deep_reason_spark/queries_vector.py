"""Driver-contract queries, batch 3 — similarity search over the
``embeddings`` table (S11 vector-search source, SURVEY.md §2.1; the ANN
operators a training-data pipeline needs at 100 TB).

Brute-force cosine is the correctness baseline; the sign-bucket (random-
hyperplane-style) LSH coarse partitioning is the scale path: at 10^9
vectors the bucket key becomes the shuffle/partition key and the exact
scan runs only within buckets.

Float parity note: dot products are folded in index order by both engines
(Spark ``aggregate`` over ``zip_with``; DuckDB ``list_sum`` over a list
comprehension), and every emitted score is rounded to 6 decimals, so the
≤1e-15 engine-order noise cannot flip a hashed value.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from deep_reason_spark.queries import load, load_rebalanced

_V = "transform(embedding, x -> cast(x as double))"
_DOT = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (a, x) -> a + x)"


def q_v1_cosine_topk(spark, sf_dir):
    # rebalanced scan: the interpreted per-row dot-product lambdas are the
    # cost, and the one-row-group embeddings file is a 2-task scan
    e = load_rebalanced(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_V).alias("v"),
    ).withColumn("nrm", F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = e.select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    pairs = (
        q.crossJoin(c)
        .where(F.col("qid") != F.col("cid"))
        .select(
            "qid", "cid",
            F.round(F.expr(_DOT) / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("qid", "cid", "cosine", "rank")
    )


ORACLE_V1 = """
WITH e AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
),
n AS (
  SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM e
),
pairs AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         ROUND(list_sum(list_transform(list_zip(q.v, c.v), p -> p[1] * p[2]))
               / (q.nrm * c.nrm), 6) AS cosine
  FROM n q, n c WHERE q.vec_id < 3 AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT qid, cid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
  FROM pairs
)
SELECT qid, cid, cosine, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3
"""


def q_v2_sign_buckets(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    bucket = F.expr(
        "array_join(transform(slice(embedding, 1, 6), "
        "x -> CASE WHEN x >= 0 THEN 'p' ELSE 'n' END), '')"
    )
    return (
        e.select(bucket.alias("bucket"), "vec_id")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec"))
    )


ORACLE_V2 = """
WITH b AS (
  SELECT vec_id,
         array_to_string([CASE WHEN x >= 0 THEN 'p' ELSE 'n' END
                          FOR x IN list_slice(embedding, 1, 6)], '') AS bucket
  FROM embeddings
)
SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec FROM b GROUP BY bucket
"""


def q_v3_norms(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(
            F.expr(f"sqrt(aggregate({_V}, 0D, (a, x) -> a + x * x))"), 6
        ).alias("l2_norm"),
        "label",
    )


ORACLE_V3 = """
SELECT vec_id,
       ROUND(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding])), 6) AS l2_norm,
       label
FROM embeddings
"""


def q_v4_label_centroids(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.expr("cast(element_at(embedding, 1) as double)"))
                    / F.count("*"), 6).alias("c0"),
            F.round(F.sum(F.expr("cast(element_at(embedding, 2) as double)"))
                    / F.count("*"), 6).alias("c1"),
        )
    )


ORACLE_V4 = """
SELECT label, COUNT(*) AS n,
       ROUND(SUM(CAST(embedding[1] AS DOUBLE)) / COUNT(*), 6) AS c0,
       ROUND(SUM(CAST(embedding[2] AS DOUBLE)) / COUNT(*), 6) AS c1
FROM embeddings GROUP BY label
"""


VECTOR_QUERIES = {
    "v1_cosine_topk": q_v1_cosine_topk,
    "v2_sign_buckets": q_v2_sign_buckets,
    "v3_norms": q_v3_norms,
    "v4_label_centroids": q_v4_label_centroids,
}

VECTOR_ORACLES = {
    "v1_cosine_topk": ORACLE_V1,
    "v2_sign_buckets": ORACLE_V2,
    "v3_norms": ORACLE_V3,
    "v4_label_centroids": ORACLE_V4,
}
