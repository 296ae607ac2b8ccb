"""RAG query pipeline — the reference's two-branch retrieve/rerank/answer
dataflow (deep-reason ``rag/pipeline.py:122-200``) as DataFrame transforms.

Reference topology reproduced (SURVEY.md §3.2):

  questions ──keywords_extractor──► full-text branch (ES multi_match top-k)
           └─planner──────────────► vector branch  (multi-query cosine top-k)
  fan-in joiner (union + content dedup) → reranker (score, keep > 2, sort)
  → context packing (longest prefix under token budget) → answer assembly
  → JSONL-style answers sink with anti-join resume.

Determinism: every LLM node is replaced by its deterministic contract —
keyword extraction = stopword-filtered distinct tokens (``rag/schemes.py:8-9``
dedups keywords), the planner's multi-query = question + per-keyword
queries (``rag/prompts.py:34-54`` plans sub-queries), the reranker score =
10× keyword-overlap ratio on a 0-10 scale with the reference's keep
threshold score > 2 (``rag/pipeline.py:391-393``), the answer = top
contexts formatted with their provenance (``rag/utils.py:64-67``).

Scale shape: questions are a small table → every question-side join
broadcasts; the corpus side is scanned once per branch with pushed-down
projections; top-k per question is a window, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ["a", "the", "and", "of", "to", "in", "is", "it"]
RETRIEVING_TOP_K = 3          # rag/pipeline.py:97
RERANK_KEEP_THRESHOLD = 2.0   # rag/pipeline.py:391-393
CONTEXT_CHAR_BUDGET = 1200    # analogue of max_input_tokens, rag/pipeline.py:96


def extract_keywords(questions: DataFrame) -> DataFrame:
    """question → exploded distinct keywords (A5 dedup, rag/schemes.py:8-9)."""
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return questions.select(
        "question_id",
        F.explode(
            F.expr(
                "array_distinct(filter(split(lower(question), '[^a-z0-9]+'),"
                f" w -> length(w) > 1 AND w NOT IN ({stop})))"
            )
        ).alias("keyword"),
    )


def fulltext_branch(questions: DataFrame, documents: DataFrame,
                    top_k: int = RETRIEVING_TOP_K) -> DataFrame:
    """Full-text retrieval (S10): score = matched-keyword count per doc,
    top-k per question. The keyword set is broadcast; the corpus scans once."""
    kw = extract_keywords(questions)
    hits = documents.join(
        F.broadcast(kw),
        F.col("text").contains(F.col("keyword")),
    ).groupBy("question_id", "doc_id").agg(F.count("*").alias("ft_score"))
    w = Window.partitionBy("question_id").orderBy(
        F.desc("ft_score"), F.asc("doc_id"))
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select("question_id", "doc_id", F.lit("fulltext").alias("branch"))
    )


def vector_branch(questions: DataFrame, embeddings: DataFrame,
                  top_k: int = RETRIEVING_TOP_K) -> DataFrame:
    """Vector retrieval (S11): cosine top-k of each question's embedding
    against the corpus. ``questions`` must carry ``question_vec``
    (array<double>); the question side is broadcast-scale."""
    def l2(col: str) -> F.Column:
        return F.expr(f"sqrt(aggregate({col}, 0D, (a, x) -> a + x * x))")

    cand = embeddings.select(
        F.col("vec_id").alias("doc_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn("cn", l2("v"))
    q = questions.select(
        "question_id", F.col("question_vec").alias("qv")
    ).withColumn("qn", l2("qv"))
    pairs = cand.crossJoin(F.broadcast(q)).select(
        "question_id", "doc_id",
        (F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (a, x) -> a + x)")
         / (F.col("qn") * F.col("cn"))).alias("cos"),
    )
    w = Window.partitionBy("question_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select("question_id", "doc_id", F.lit("vector").alias("branch"))
    )


def join_branches(ft: DataFrame, vec: DataFrame) -> DataFrame:
    """Fan-in (U1/J4, rag/pipeline.py:336-347): union + dedup per question,
    remembering which branches produced each doc."""
    return (
        ft.unionByName(vec)
        .groupBy("question_id", "doc_id")
        .agg(F.array_sort(F.collect_set("branch")).alias("branches"))
    )


def rerank(retrieved: DataFrame, questions: DataFrame, documents: DataFrame,
           keep_threshold: float = RERANK_KEEP_THRESHOLD) -> DataFrame:
    """Deterministic reranker on the reference's 0-10 scale: score = 10 ×
    |question keywords present in doc| / |question keywords|; keep docs with
    score > threshold, sort desc (W4/P5, rag/pipeline.py:349-415)."""
    kw = extract_keywords(questions)
    nkw = kw.groupBy("question_id").agg(F.count("*").alias("n_kw"))
    matched = (
        retrieved.join(documents.select("doc_id", "text"), "doc_id")
        .join(F.broadcast(kw), "question_id")
        .where(F.col("text").contains(F.col("keyword")))
        .groupBy("question_id", "doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    scored = (
        retrieved.join(matched, ["question_id", "doc_id"], "left")
        .join(F.broadcast(nkw), "question_id")
        .select(
            "question_id", "doc_id", "branches",
            F.round(F.coalesce("n_matched", F.lit(0)) * 10.0 / F.col("n_kw"), 4)
            .alias("rerank_score"),
        )
    )
    return scored.where(F.col("rerank_score") > keep_threshold)


def pack_context(reranked: DataFrame, documents: DataFrame,
                 char_budget: int = CONTEXT_CHAR_BUDGET) -> DataFrame:
    """Context packing (W5, rag/pipeline.py:417-455): longest prefix of the
    ranked docs whose cumulative length stays under the budget."""
    w = (
        Window.partitionBy("question_id")
        .orderBy(F.desc("rerank_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        reranked.join(documents.select("doc_id", "text", "source"), "doc_id")
        .withColumn("cum_chars", F.sum(F.length("text")).over(w))
        .where(F.col("cum_chars") <= char_budget)
    )


def assemble_answers(context: DataFrame, questions: DataFrame) -> DataFrame:
    """Answer assembly (P9 doc→string formatting, rag/utils.py:64-67):
    provenance-prefixed fragments concatenated in rank order."""
    frag = context.select(
        "question_id", "rerank_score", "doc_id",
        F.format_string("[%s#%d] %s", F.col("source"), F.col("doc_id"),
                        F.substring("text", 1, 120)).alias("fragment"),
    )
    packed = (
        frag.groupBy("question_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("rerank_score")).alias("s"),
                                                F.col("doc_id").alias("d"),
                                                F.col("fragment").alias("f")))),
                    lambda x: x["f"],
                ), "\n",
            ).alias("answer_context"),
            F.count("*").alias("n_context_docs"),
        )
    )
    return questions.join(packed, "question_id", "left").select(
        "question_id", "question",
        F.coalesce("answer_context", F.lit("")).alias("answer_context"),
        F.coalesce("n_context_docs", F.lit(0)).alias("n_context_docs"),
    )


def run_rag_pipeline(
    questions: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame | None = None,
    answered: DataFrame | None = None,
) -> DataFrame:
    """End-to-end: both branches → join → rerank → pack → answers.

    ``answered``: optional prior answers table; already-answered questions
    are skipped via LEFT ANTI JOIN (U4 resume, rag/pipeline.py:536-545)."""
    if answered is not None:
        questions = questions.join(
            answered.select("question_id"), "question_id", "left_anti"
        )
    questions = questions.localCheckpoint()  # small; reused by every node
    ft = fulltext_branch(questions, documents)
    if embeddings is not None and "question_vec" in questions.columns:
        vec = vector_branch(questions, embeddings)
        retrieved = join_branches(ft, vec)
    else:
        retrieved = ft.groupBy("question_id", "doc_id").agg(
            F.array_sort(F.collect_set("branch")).alias("branches"))
    reranked = rerank(retrieved, questions, documents)
    context = pack_context(reranked, documents)
    return assemble_answers(context, questions)
