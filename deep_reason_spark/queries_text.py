"""Driver-contract queries, batch 2 — the KG pipeline demonstrated over the
driver's ``documents`` table, plus the training-data-pipeline operators
(dedup family, text analysis, full-text retrieval, multimodal plumbing).

Same parity rules as queries.py. The document corpus is lowercase
space-separated text, so the SQL-checkable pipeline demo uses word-window
chunking and trigram extraction; the *real* extractor (vocabulary contract,
alias resolution) lives in operators/extractor.py and is exercised by the
pytest golden-fixture gate — these queries prove the dataflow shapes against
an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from deep_reason_spark.queries import load, load_rebalanced

CHUNK_WORDS = 25
PREDICATE_WORDS = "('join','merge','scan','sort','group','filter')"
STOPWORDS = "('a','the')"


# ---------------------------------------------------------------------------
# S1/W3-inverse — word-window chunker over documents (chunk + sha256)
# ---------------------------------------------------------------------------

# `_words` is the pre-split token array: the r5 expression re-ran
# split(text, ' ') inside the transform lambda — once per CHUNK per row —
# because Spark does not hoist common subexpressions out of lambda bodies
# (guide §1.2 "per-task work"). Splitting once in a child projection makes
# every lambda reference an O(1) attribute lookup.
_CHUNK_EXPR = f"""
posexplode(
  CASE WHEN size(_words) > 0
       THEN transform(
              sequence(0, cast(ceil(size(_words) / {CHUNK_WORDS}.0) as int) - 1),
              i -> array_join(slice(_words, i * {CHUNK_WORDS} + 1, {CHUNK_WORDS}), ' '))
       ELSE array() END
) AS (order_id, chunk_text)
"""


def q_s1_chunk_documents(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split("text", " ").alias("_words"))
    return words.select("doc_id", F.expr(_CHUNK_EXPR)).select(
        "doc_id",
        F.col("order_id").cast("int").alias("order_id"),
        "chunk_text",
        F.sha2("chunk_text", 256).alias("chunk_sha256"),
    )


ORACLE_S1 = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (
  SELECT doc_id, CAST(i AS INT) AS order_id,
         array_to_string(list_slice(words, i * {CHUNK_WORDS} + 1, i * {CHUNK_WORDS} + {CHUNK_WORDS}), ' ') AS chunk_text
  FROM w, UNNEST(range(0, CAST(ceil(len(words) / {CHUNK_WORDS}.0) AS INT))) AS t(i)
)
SELECT doc_id, order_id, chunk_text, sha256(chunk_text) AS chunk_sha256 FROM c
"""


# ---------------------------------------------------------------------------
# W2 — neighbor context over document chunks (lag/lead per document)
# ---------------------------------------------------------------------------

def q_w2_doc_context(spark, sf_dir):
    from pyspark.sql import Window
    chunks = q_s1_chunk_documents(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("order_id")
    return chunks.select(
        "doc_id", "order_id",
        F.lag("chunk_sha256", 1).over(w).alias("left_sha"),
        F.lead("chunk_sha256", 1).over(w).alias("right_sha"),
    )


ORACLE_W2_DOC = f"""
WITH c AS ({ORACLE_S1})
SELECT doc_id, order_id,
       LAG(chunk_sha256) OVER w AS left_sha,
       LEAD(chunk_sha256) OVER w AS right_sha
FROM c WINDOW w AS (PARTITION BY doc_id ORDER BY order_id)
"""


# ---------------------------------------------------------------------------
# P3 — trigram triple extraction with provenance (flatten + tag,
# kg_agent/chains.py:383-387 shape, deterministic word-trigram contract)
# ---------------------------------------------------------------------------

# `_words` pre-split, as in _CHUNK_EXPR: the r5 expression re-ran
# split(text, ' ') INSIDE the filter lambda — once per word position per
# row, i.e. O(n_words²) full-text splits per document — plus three more
# whole-row splits in the output projection. The hoisted array makes the
# per-position predicate probe an O(1) element_at.
_TRIPLE_EXPR = f"""
explode(
  CASE WHEN size(_words) >= 3
       THEN filter(sequence(1, size(_words) - 2),
                   i -> element_at(_words, i + 1) IN {PREDICATE_WORDS})
       ELSE array() END
) AS pos
"""


def q_p3_trigram_triples(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split("text", " ").alias("_words"))
    return (
        words.select("doc_id", "_words", F.expr(_TRIPLE_EXPR))
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.expr("element_at(_words, cast(pos as int))").alias("subject"),
            F.expr("element_at(_words, cast(pos as int) + 1)").alias("predicate"),
            F.expr("element_at(_words, cast(pos as int) + 2)").alias("object"),
        )
    )


ORACLE_P3 = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id, CAST(i AS INT) AS pos,
       words[i] AS subject, words[i+1] AS predicate, words[i+2] AS object
FROM w, UNNEST(range(1, GREATEST(len(words) - 1, 1))) AS t(i)
WHERE words[i+1] IN {PREDICATE_WORDS}
"""


# ---------------------------------------------------------------------------
# KG flagship over documents: triples → hot-predicate counts (A11 shape)
# ---------------------------------------------------------------------------

def q_kg_predicate_counts(spark, sf_dir):
    t = q_p3_trigram_triples(spark, sf_dir)
    return (
        t.groupBy("predicate")
        .agg(F.count("*").alias("n_triples"),
             F.countDistinct("subject").alias("n_subjects"))
    )


ORACLE_KG_PRED = f"""
WITH tr AS ({ORACLE_P3})
SELECT predicate, COUNT(*) AS n_triples, COUNT(DISTINCT subject) AS n_subjects
FROM tr GROUP BY predicate
"""


# ---------------------------------------------------------------------------
# T1 — token stats
# ---------------------------------------------------------------------------

def q_t1_token_stats(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("n_tokens"),
        F.expr("size(array_distinct(split(text, ' ')))").alias("n_unique"),
    )


ORACLE_T1 = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique
FROM documents
"""


# ---------------------------------------------------------------------------
# T2 — quality scoring (length / stopword ratio / lexical diversity)
# ---------------------------------------------------------------------------

def q_t2_quality_score(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            f"size(filter(split(text, ' '), w -> w IN {STOPWORDS}))"
        ).alias("n_stopwords"),
        F.round(
            F.expr(f"size(filter(split(text, ' '), w -> w IN {STOPWORDS}))")
            / F.expr("size(split(text, ' '))"), 6
        ).alias("stopword_ratio"),
        F.round(
            F.expr("size(array_distinct(split(text, ' ')))")
            / F.expr("size(split(text, ' '))"), 6
        ).alias("lexical_diversity"),
    )


ORACLE_T2 = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(len(list_filter(words, w -> w IN {STOPWORDS})) AS INT) AS n_stopwords,
       ROUND(len(list_filter(words, w -> w IN {STOPWORDS})) * 1.0 / len(words), 6) AS stopword_ratio,
       ROUND(len(list_distinct(words)) * 1.0 / len(words), 6) AS lexical_diversity
FROM w
"""


# ---------------------------------------------------------------------------
# T3 — language-ID heuristic (marker-word n-gram scoring)
# ---------------------------------------------------------------------------

def q_t3_lang_guess(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    en = f"size(filter(split(text, ' '), w -> w IN {STOPWORDS}))"
    return d.select(
        "doc_id",
        F.expr(en).alias("en_markers"),
        F.expr(f"CASE WHEN {en} >= 2 THEN 'en-like' ELSE 'other' END").alias("lang_guess"),
    )


ORACLE_T3 = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (SELECT doc_id, CAST(len(list_filter(words, w -> w IN {STOPWORDS})) AS INT) AS en_markers FROM w)
SELECT doc_id, en_markers,
       CASE WHEN en_markers >= 2 THEN 'en-like' ELSE 'other' END AS lang_guess
FROM s
"""


# ---------------------------------------------------------------------------
# T4/D1 — fingerprint + exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

_FPRINT = "md5(regexp_replace(lower(text), '\\\\s+', ' '))"
_FPRINT_DUCK = "md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def q_d1_exact_dedup(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.expr(_FPRINT).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc"), F.count("*").alias("n_copies"))
    )


ORACLE_D1 = f"""
SELECT {_FPRINT_DUCK} AS fingerprint,
       MIN(doc_id) AS canonical_doc, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# D2 — n-gram Jaccard near-dup (blocked by source, never all-pairs).
# Within-block participation is HARD-CAPPED at D2_BLOCK_CAP docs per block
# (deterministic doc_id rank): a hot block at corpus scale costs at most
# cap² comparisons instead of |block|² (VERDICT r1 wrong #4). Unbounded
# exact verification belongs downstream of D4's LSH buckets, not here.
# ---------------------------------------------------------------------------

D2_BLOCK_CAP = 64


def q_d2_ngram_jaccard(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", "source",
        F.expr("array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)), "
               "i -> substring(text, i, 3)))").alias("shingles"),
    ).where(F.length("text") >= 3)
    w = Window.partitionBy("source").orderBy("doc_id")
    sh = (
        sh.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= D2_BLOCK_CAP)
        .drop("_rn")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.source") == F.col("b.source"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.expr("size(array_intersect(a.shingles, b.shingles))")
                / F.expr("size(array_union(a.shingles, b.shingles))"), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
    )


# shared CTE text: shingles → capped blocks → within-block jaccard pairs
# (reused verbatim by D7's clustering oracle)
_D2_CTES = f"""sh0 AS (
  SELECT doc_id, source,
         list_distinct([substring(text, i, 3)
                        FOR i IN range(1, GREATEST(length(text) - 1, 2))]) AS shingles
  FROM documents WHERE length(text) >= 3
),
sh AS (
  SELECT doc_id, source, shingles FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM sh0
  ) WHERE rn <= {D2_BLOCK_CAP}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
               len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
)"""

ORACLE_D2 = f"""
WITH {_D2_CTES}
SELECT * FROM pairs WHERE jaccard >= 0.5
"""


# ---------------------------------------------------------------------------
# D7 — near-dup CLUSTERING: verified pairs → connected components →
# keep-first representative. The end-to-end dedup shape a training-data
# pipeline actually runs (candidate blocking → verification → transitive
# grouping → one survivor per group); Spark side reuses the large-star/
# small-star CC operator, the oracle closes the pairs with a recursive CTE.
# ---------------------------------------------------------------------------

def q_d7_neardup_clusters(spark, sf_dir):
    from deep_reason_spark.operators.canonicalize import connected_components
    pairs = q_d2_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges)
    d = load(spark, sf_dir, "documents")
    out = d.select("doc_id").join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).cast("bigint").alias("cluster_id"),
    ).withColumn("keep", F.col("doc_id") == F.col("cluster_id"))


ORACLE_D7 = f"""
WITH RECURSIVE {_D2_CTES},
kept AS (SELECT doc_a, doc_b FROM pairs WHERE jaccard >= 0.5),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM kept
  UNION
  SELECT doc_b AS a, doc_a AS b FROM kept
),
reach(doc, anc) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.doc, e.b FROM reach r JOIN e ON e.a = r.anc
),
comp AS (SELECT doc, LEAST(doc, MIN(anc)) AS m FROM reach GROUP BY doc)
SELECT d.doc_id,
       COALESCE(c.m, d.doc_id) AS cluster_id,
       (d.doc_id = COALESCE(c.m, d.doc_id)) AS keep
FROM documents d LEFT JOIN comp c ON c.doc = d.doc_id
"""


# ---------------------------------------------------------------------------
# D3 — MinHash signatures (md5-based hash family, identical in both engines)
# ---------------------------------------------------------------------------

def q_d3_minhash_signatures(spark, sf_dir):
    """Same result as the r5 per-column array_min(transform(...)) form,
    restructured per guide §1.2/§4.1: that form re-split and re-dedup'd the
    text once per signature column AND ran 4 interpreted lambda passes per
    row (higher-order lambdas have no codegen — the d5 lesson). Exploding
    the distinct words once and taking the four MIN aggregates keeps the
    md5s inside whole-stage codegen with map-side partial aggregation
    (grouping key doc_id is the scan's natural clustering, so the shuffle
    carries 4 hashes per doc, not per word). explode_outer keeps a
    hypothetical null-text row exactly like the transform form did
    (null signatures, row retained)."""
    d = load_rebalanced(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        F.explode_outer(F.expr("array_distinct(split(text, ' '))")).alias("_w"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("_w")))).alias(f"sig{j}")
        for j in range(4)
    ]
    return w.groupBy("doc_id").agg(*aggs)


ORACLE_D3 = (
    "SELECT doc_id, "
    + ", ".join(
        f"list_min([md5('{j}:' || w) FOR w IN list_distinct(string_split(text, ' '))]) AS sig{j}"
        for j in range(4)
    )
    + " FROM documents"
)


# ---------------------------------------------------------------------------
# D4 — MinHash-LSH banding: bucket sizes + candidate-pair counts per band
# (band → bucket → join is the scale path; here we emit bucket stats so the
# output stays bounded at any corpus size)
# ---------------------------------------------------------------------------

def q_d4_lsh_buckets(spark, sf_dir):
    # one pass: the r5 union of two projections over the sigs subplan
    # re-computed the minhash signatures once per band (the union
    # duplicates the subtree — guide §2.4 "duplicated subtrees"); banding
    # via an in-row struct array + explode reads and hashes each doc once.
    sigs = q_d3_minhash_signatures(spark, sf_dir)
    allb = sigs.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     F.md5(F.concat("sig0", "sig1")).alias("bucket")),
            F.struct(F.lit(1).alias("band"),
                     F.md5(F.concat("sig2", "sig3")).alias("bucket")),
        )).alias("_bb"),
    ).select(F.col("_bb.band").alias("band"),
             F.col("_bb.bucket").alias("bucket"), "doc_id")
    return (
        allb.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .withColumn("n_candidate_pairs",
                    (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("bigint"))
    )


ORACLE_D4 = f"""
WITH sigs AS ({ORACLE_D3}),
b AS (
  SELECT 0 AS band, md5(sig0 || sig1) AS bucket, doc_id FROM sigs
  UNION ALL
  SELECT 1 AS band, md5(sig2 || sig3) AS bucket, doc_id FROM sigs
)
SELECT band, bucket, COUNT(*) AS n_docs,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_candidate_pairs
FROM b GROUP BY band, bucket HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# D5 — SimHash (16-bit, md5-derived bits — identical hash family both sides)
# ---------------------------------------------------------------------------

def q_d5_simhash(spark, sf_dir):
    """SimHash via explode + 16 conditional SUMs: Spark's higher-order
    lambdas are INTERPRETED (no codegen) — the earlier array-fold
    formulation spent 16 interpreted lambda evaluations per word and was
    the slowest headline query (6.6 s at sf0.1); the explode →
    partial-aggregated groupBy form keeps everything inside whole-stage
    codegen (measured 1.6 s, identical values, same oracle).
    bit j of the simhash is set iff more words have bit j set than not:
    2·Σ(bit_j) > n (⇔ the +1/−1 balance is > 0)."""
    d = load_rebalanced(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.expr("array_distinct(split(text, ' '))")).alias("w"),
    ).select(
        "doc_id",
        F.expr("cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint)").alias("h"),
    )
    sums = [
        F.sum(F.expr(f"(h div shiftleft(1L, {j})) % 2")).alias(f"c{j}")
        for j in range(16)
    ]
    agg = words.groupBy("doc_id").agg(F.count("*").alias("n"), *sums)
    assemble = " + ".join(
        f"CASE WHEN 2 * c{j} > n THEN shiftleft(1L, {j}) ELSE 0L END"
        for j in range(16)
    )
    return agg.select("doc_id", F.expr(assemble).cast("bigint").alias("simhash16"))


ORACLE_D5 = """
WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS words FROM documents),
bits AS (
  SELECT doc_id, j,
         list_sum([CASE WHEN (CAST(('0x' || substring(md5(w), 1, 8)) AS UBIGINT) >> j) % 2 = 1
                        THEN 1 ELSE -1 END FOR w IN words]) AS bal
  FROM w, UNNEST(range(0, 16)) AS t(j)
)
SELECT doc_id,
       CAST(SUM(CASE WHEN bal > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash16
FROM bits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# S10 — full-text keyword search source (multi_match → score → top-k,
# rag/pipeline.py:224-273)
# ---------------------------------------------------------------------------

def q_s10_fulltext_topk(spark, sf_dir):
    """Exercises the ENGINE's posting-list scorer (plans/rag_pipeline.py
    fulltext_scores): tokenize-once → keyword↔term equi-join → count, the
    dataflow form of ES multi_match (rag/pipeline.py:224-273). Top-10 is
    orderBy+limit (TakeOrderedAndProject), not a single-partition window."""
    from deep_reason_spark.plans.rag_pipeline import fulltext_scores
    d = load_rebalanced(spark, sf_dir, "documents")
    qs = spark.createDataFrame([(1, "spark query vector")],
                               "question_id int, question string")
    return (
        fulltext_scores(qs, d)
        .select("doc_id", F.col("ft_score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


ORACLE_S10 = """
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              w -> length(w) > 1)) AS term
    FROM documents)
),
kw(term) AS (VALUES ('spark'), ('query'), ('vector')),
hits AS (SELECT doc_id, COUNT(*) AS score FROM dt JOIN kw USING (term)
         GROUP BY doc_id)
SELECT doc_id, score FROM hits ORDER BY score DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# W5 — context packing: longest prefix under a char budget per source
# (rag/pipeline.py:417-455)
# ---------------------------------------------------------------------------

def q_w5_budget_prefix(spark, sf_dir):
    from pyspark.sql import Window
    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        # bigint on BOTH sides: DuckDB's SUM(int) is HUGEINT, which lands in
        # pandas as float64 and breaks the driver's string-hash ("250.0" vs
        # "250"). CAST AS BIGINT pins both engines to int64.
        d.withColumn("cum_chars", F.sum("n_chars").over(w).cast("bigint"))
        .where(F.col("cum_chars") <= 1000)
        .select("source", "doc_id", "cum_chars")
    )


ORACLE_W5 = """
WITH r AS (
  SELECT source, doc_id,
         CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_chars
  FROM documents
)
SELECT source, doc_id, cum_chars FROM r WHERE cum_chars <= 1000
"""


# ---------------------------------------------------------------------------
# P7 — dedup keep-first per group (rag/upload.py:97-113)
# ---------------------------------------------------------------------------

def q_p7_dedup_keep_first(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(F.min("doc_id").alias("first_doc"))


ORACLE_P7 = """
SELECT lang, source, MIN(doc_id) AS first_doc FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# A10 — grouped description merge (summarize_descriptions.py analogue)
# ---------------------------------------------------------------------------

def q_a10_description_merge(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.concat_ws("; ", F.array_sort(F.collect_set("lang"))).alias("langs_summary")
    )


ORACLE_A10 = """
SELECT source, string_agg(DISTINCT lang, '; ' ORDER BY lang) AS langs_summary
FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# M1 — multimodal plumbing: opaque binary payload + typed metadata
# (decode itself is stubbed per environment; the schema/bytes path is real)
# ---------------------------------------------------------------------------

def q_m1_binary_meta(spark, sf_dir):
    d = load_rebalanced(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.col("text").cast("binary")).alias("payload_bytes"),
        F.upper(F.substring(F.md5("text"), 1, 2)).alias("magic"),
    )


ORACLE_M1 = """
SELECT doc_id, octet_length(CAST(text AS BLOB)) AS payload_bytes,
       UPPER(substring(md5(text), 1, 2)) AS magic
FROM documents
"""


TEXT_QUERIES = {
    "s1_chunk_documents": q_s1_chunk_documents,
    "w2_doc_context": q_w2_doc_context,
    "p3_trigram_triples": q_p3_trigram_triples,
    "kg_predicate_counts": q_kg_predicate_counts,
    "t1_token_stats": q_t1_token_stats,
    "t2_quality_score": q_t2_quality_score,
    "t3_lang_guess": q_t3_lang_guess,
    "d1_exact_dedup": q_d1_exact_dedup,
    "d2_ngram_jaccard": q_d2_ngram_jaccard,
    "d7_neardup_clusters": q_d7_neardup_clusters,
    "d3_minhash_signatures": q_d3_minhash_signatures,
    "d4_lsh_buckets": q_d4_lsh_buckets,
    "d5_simhash": q_d5_simhash,
    "s10_fulltext_topk": q_s10_fulltext_topk,
    "w5_budget_prefix": q_w5_budget_prefix,
    "p7_dedup_keep_first": q_p7_dedup_keep_first,
    "a10_description_merge": q_a10_description_merge,
    "m1_binary_meta": q_m1_binary_meta,
}

TEXT_ORACLES = {
    "s1_chunk_documents": ORACLE_S1,
    "w2_doc_context": ORACLE_W2_DOC,
    "p3_trigram_triples": ORACLE_P3,
    "kg_predicate_counts": ORACLE_KG_PRED,
    "t1_token_stats": ORACLE_T1,
    "t2_quality_score": ORACLE_T2,
    "t3_lang_guess": ORACLE_T3,
    "d1_exact_dedup": ORACLE_D1,
    "d2_ngram_jaccard": ORACLE_D2,
    "d7_neardup_clusters": ORACLE_D7,
    "d3_minhash_signatures": ORACLE_D3,
    "d4_lsh_buckets": ORACLE_D4,
    "d5_simhash": ORACLE_D5,
    "s10_fulltext_topk": ORACLE_S10,
    "w5_budget_prefix": ORACLE_W5,
    "p7_dedup_keep_first": ORACLE_P7,
    "a10_description_merge": ORACLE_A10,
    "m1_binary_meta": ORACLE_M1,
}
