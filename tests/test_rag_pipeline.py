"""RAG pipeline tests — branch semantics, rerank threshold, budget packing,
anti-join resume (reference topology rag/pipeline.py:122-200)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_reason_spark.plans.rag_pipeline import (
    extract_keywords,
    fulltext_branch,
    hash_embed,
    join_branches,
    pack_context,
    plan_queries,
    planned_vector_branch,
    rerank,
    run_rag_pipeline,
    vector_branch,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _questions(spark):
    return spark.createDataFrame(
        [(1, "where is the spark table query"), (2, "vector stream data")],
        "question_id int, question string",
    )


def test_keywords_deduped_and_stopword_free(spark):
    kw = extract_keywords(_questions(spark)).collect()
    by_q = {}
    for r in kw:
        by_q.setdefault(r.question_id, []).append(r.keyword)
    assert sorted(by_q[1]) == ["query", "spark", "table", "where"]  # no 'the'/'is'
    assert len(by_q[1]) == len(set(by_q[1]))


def test_fulltext_branch_topk(spark, docs):
    out = fulltext_branch(_questions(spark), docs).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.question_id, []).append(r.doc_id)
    for q, ids in per_q.items():
        assert len(ids) <= 3  # retrieving_top_k=3, rag/pipeline.py:97
        assert len(ids) == len(set(ids))


def test_vector_branch_self_retrieval(spark, emb):
    # a question whose vector IS doc 5's embedding must retrieve doc 5 first
    qvec = emb.where(F.col("vec_id") == 5).select(
        F.lit(1).alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("question_vec"),
    )
    out = vector_branch(qvec, emb, top_k=1).collect()
    assert out[0].doc_id == 5


def test_fulltext_metadata_filter_pushed_down(spark, docs):
    # ES bool-filter analogue (rag/pipeline.py:258): predicate restricts the
    # corpus before scoring and reaches the parquet scan as a pushed filter
    qs = _questions(spark)
    filtered = fulltext_branch(qs, docs, doc_filter="lang = 'en'")
    hit_ids = [r.doc_id for r in filtered.collect()]
    langs = {r.lang for r in
             docs.where(F.col("doc_id").isin(hit_ids)).select("lang").collect()}
    assert langs <= {"en"}
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:200]


def test_rerank_threshold_and_scale(spark, docs):
    qs = _questions(spark)
    retrieved = join_branches(fulltext_branch(qs, docs),
                              fulltext_branch(qs, docs))
    scored = rerank(retrieved, qs, docs, keep_threshold=2.0)
    rows = scored.collect()
    assert all(r.rerank_score > 2.0 for r in rows)   # P5 filter
    assert all(0 <= r.rerank_score <= 10 for r in rows)  # 0-10 scale


def test_pack_context_budget(spark, docs):
    qs = _questions(spark)
    retrieved = join_branches(fulltext_branch(qs, docs), fulltext_branch(qs, docs))
    packed = pack_context(rerank(retrieved, qs, docs), docs, char_budget=300)
    assert packed.where(F.col("cum_chars") > 300).count() == 0


def test_end_to_end_and_resume(spark, docs, emb):
    qs = _questions(spark)
    answers = run_rag_pipeline(qs, docs, embeddings=None)
    rows = {r.question_id: r for r in answers.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_context_docs >= 1
    assert "[src" in rows[1].answer_context  # provenance-prefixed fragments

    # resume: question 1 already answered → only question 2 recomputed
    answered = spark.createDataFrame([(1,)], "question_id int")
    remaining = run_rag_pipeline(qs, docs, answered=answered)
    assert [r.question_id for r in remaining.collect()] == [2]


def test_plan_queries_is_question_union_subqueries(spark):
    # rag/pipeline.py:295 — planned = list({question, *sub_queries}); the
    # question is query_id 0, sub-queries capped at MAX_PLANNED
    planned = plan_queries(_questions(spark)).collect()
    by_q = {}
    for r in planned:
        by_q.setdefault(r.question_id, {})[r.query_id] = r.query_text
    assert by_q[1][0] == "where is the spark table query"
    subs = [t for qid, t in sorted(by_q[1].items()) if qid > 0]
    assert len(subs) == 3 and subs == sorted(subs)  # alphabetical, capped
    # set semantics: no duplicate texts
    assert len(set(by_q[1].values())) == len(by_q[1])


def test_hash_embed_sparse_and_deterministic(spark):
    qs = spark.createDataFrame([(1, "alpha beta alpha")],
                               "question_id int, question string")
    planned = plan_queries(qs)
    a = {(r.question_id, r.query_id, r.dim): r.q
         for r in hash_embed(planned).collect()}
    b = {(r.question_id, r.query_id, r.dim): r.q
         for r in hash_embed(planned).collect()}
    assert a == b and len(a) > 0
    assert all(v != 0 for v in a.values())  # cancelled buckets dropped
    # multiplicity counts: 'alpha' twice in the question → |component| 2
    assert any(abs(v) == 2 for v in a.values())


def test_planned_vector_branch_shape(spark, docs, emb):
    out = planned_vector_branch(_questions(spark), emb, docs).collect()
    per_q = {}
    for r in out:
        assert r.branch == "vector"
        per_q.setdefault(r.question_id, []).append(r.doc_id)
    for q, ids in per_q.items():
        assert len(ids) == len(set(ids))            # content-deduped
        assert len(ids) <= 4 * 3                    # ≤ (1+MAX_PLANNED)·top_k


def test_two_branch_union_marks_sources(spark, docs, emb):
    qs = _questions(spark).withColumn(
        "question_vec",
        F.expr("transform(sequence(1, 64), i -> cast(i as double) / 64)"),
    )
    answers = run_rag_pipeline(qs, docs, embeddings=emb)
    assert answers.count() == 2


def test_ivf_recall_matches_brute_force(spark, emb):
    """VERDICT r3 task 2: recall@k = 1.0 vs the brute-force verifier on the
    fixture corpus. The sf0.001 embeddings are near-uniform (no cluster
    structure), so true neighbors scatter across cells — nprobe=6 of 10
    cells is the measured 1.0-recall point here (a clustered production
    corpus reaches it far earlier; nprobe is the recall/cost knob). The
    nprobe = num_cells limit must equal brute force EXACTLY."""
    from deep_reason_spark.plans.rag_pipeline import vector_branch_exact

    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("int").alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("question_vec"),
    )
    exact_hits = {(r.question_id, r.doc_id)
                  for r in vector_branch_exact(qs, emb, top_k=3).collect()}
    assert len(exact_hits) == 15

    ivf6 = {(r.question_id, r.doc_id)
            for r in vector_branch(qs, emb, top_k=3, nprobe=6).collect()}
    assert len(ivf6 & exact_hits) / len(exact_hits) == 1.0

    n_cells = emb.select("label").distinct().count()
    ivf_all = {(r.question_id, r.doc_id)
               for r in vector_branch(qs, emb, top_k=3, nprobe=n_cells).collect()}
    assert ivf_all == exact_hits  # exhaustive probing == brute force


def test_vector_branches_never_scan_corpus_per_query(spark, docs, emb):
    """VERDICT r3 task 2 plan audit: neither vector branch may plan a
    crossJoin / nested-loop against the corpus — retrieval goes through the
    IVF cell equi-joins."""
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("question_vec"),
    )
    for df in (vector_branch(qs, emb),
               planned_vector_branch(_questions(spark), emb, docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_index_works_without_label_column(spark, emb):
    """r4 review: production embeddings carry no supervised `label` —
    the index must build from (vec_id, embedding) alone (deterministic
    hash seeding), and exhaustive probing must still equal brute force."""
    from deep_reason_spark.plans.rag_pipeline import (
        IVF_DEFAULT_CELLS,
        build_ivf_index,
        vector_branch,
        vector_branch_exact,
    )
    bare = emb.select("vec_id", "embedding")
    ivf = build_ivf_index(bare)
    qs = bare.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("question_vec"),
    )
    ivf_all = {(r.question_id, r.doc_id)
               for r in vector_branch(qs, bare, top_k=3, ivf=ivf,
                                      nprobe=IVF_DEFAULT_CELLS).collect()}
    exact = {(r.question_id, r.doc_id)
             for r in vector_branch_exact(qs, bare, top_k=3).collect()}
    assert ivf_all == exact


def test_ivf_cells_materialized_once(spark, emb, tmp_path):
    """VERDICT r4 task 2: the corpus-scale cell assignment is computed once
    per index BUILD, not once per consumer — build_ivf_index returns cells
    pinned to a disk-backed persist (or, with index_dir, a written-and-
    re-read partitioned parquet index), so both vector branches of one
    query batch read the materialized assignment instead of each re-running
    the assign_topics scan."""
    from deep_reason_spark.plans.rag_pipeline import (
        build_ivf_index,
        vector_branch,
    )

    bare = emb.select("vec_id", "embedding")
    cells, cents = build_ivf_index(bare)
    lvl = cells.storageLevel
    assert lvl.useDisk and lvl.useMemory  # MEMORY_AND_DISK pin, not lazy
    qs = bare.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("int").alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("question_vec"),
    )
    # every consumer plan scans the materialized assignment (an in-memory
    # relation), never the assignment's own aggregation subplan
    plan = vector_branch(qs, bare, ivf=(cells, cents)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan

    # deployment shape: the index written as a cell-partitioned table
    idx_dir = str(tmp_path / "ivf_index")
    cells2, cents2 = build_ivf_index(bare, index_dir=idx_dir)
    import os as _os
    assert any(d.startswith("cell=") for d in _os.listdir(idx_dir))
    got_disk = {(r.doc_id, r.cell) for r in cells2.collect()}
    got_mem = {(r.doc_id, r.cell) for r in cells.collect()}
    assert got_disk == got_mem
    plan2 = vector_branch(qs, bare, ivf=(cells2, cents2)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Parquet" in plan2 or "parquet" in plan2
    cells.unpersist()


def test_ivf_append_equals_rebuild_without_touching_base_files(
        spark, emb, tmp_path):
    """Incremental IVF maintenance (r5): folding a batch of new vectors
    into a stored index equals a full rebuild under the SAME centroids
    (per-row nearest-centroid is independent across vectors), and the
    append never reads or rewrites the indexed bulk — the base parquet
    files are byte-identical afterwards (append adds files only)."""
    import os as _os

    from deep_reason_spark.plans.rag_pipeline import (
        append_ivf_index,
        build_ivf_index,
        vector_branch,
    )
    from deep_reason_spark.operators.topics import assign_topics

    bare = emb.select("vec_id", "embedding")
    base = bare.where(F.col("vec_id") % 4 != 0)
    batch = bare.where(F.col("vec_id") % 4 == 0)
    idx_dir = str(tmp_path / "ivf_index")
    _, cents = build_ivf_index(base, index_dir=idx_dir)

    def _files():
        out = {}
        for root, _dirs, names in _os.walk(idx_dir):
            for n in names:
                if n.endswith(".parquet"):
                    p = _os.path.join(root, n)
                    out[p] = _os.path.getmtime(p)
        return out

    before = _files()
    appended = append_ivf_index(batch, cents, idx_dir)
    after = _files()
    # zero rescans/rewrites of the indexed bulk: every pre-append file
    # survives untouched; the batch arrives as strictly new files
    assert set(before) <= set(after)
    assert all(after[p] == m for p, m in before.items())
    assert set(after) - set(before)

    # table == full rebuild with the same fixed centroids
    got = {(r.doc_id, r.cell) for r in appended.collect()}
    want = {(r.vec_id, r.topic)
            for r in assign_topics(bare, cents).collect()}
    assert got == want

    # retrieval through the appended index finds batch vectors: a question
    # that IS a batch vector self-retrieves at rank 1
    qs = bare.where(F.col("vec_id") == 4).select(
        F.lit(1).alias("question_id"),
        F.expr("transform(embedding, x -> cast(x as double))")
        .alias("question_vec"),
    )
    hit = vector_branch(qs, bare, top_k=1, ivf=(appended, cents)).collect()
    assert hit[0].doc_id == 4
