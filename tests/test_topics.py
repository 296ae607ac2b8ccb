"""Topic-modeling operator tests (deterministic BERTopic analogue —
topic_modeling/bertopic/topic_modeling.py semantics; VERDICT r1 item 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deep_reason_spark.operators.topics import (
    assign_topics,
    ctfidf_terms,
    seeded_centroids,
    tfidf,
    tokenize,
    topic_info,
    vocabulary,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tokenize_lowercases_and_drops_short(spark):
    d = _docs(spark, [(0, "The Quick-Brown fox! a I ok42")])
    toks = {r.term for r in tokenize(d).collect()}
    assert toks == {"the", "quick", "brown", "fox", "ok42"}


def test_vocabulary_min_and_max_df(spark):
    # "common" in all 4 docs (> 0.8*4=3 → dropped); "rare" in 1 (< min_df 2
    # → dropped); "mid" in 2 → kept
    d = _docs(spark, [(i, "common mid") for i in range(2)]
              + [(2, "common rare"), (3, "common xx")])
    v = {r.term: r.df for r in vocabulary(tokenize(d), n_docs=4).collect()}
    assert v == {"mid": 2, "xx": 1} or v == {"mid": 2}  # xx df=1 dropped
    assert "common" not in v and "rare" not in v
    assert v == {"mid": 2}


def test_tfidf_prefers_distinctive_terms(spark):
    import math
    d = _docs(spark, [(0, "apple apple kiwi"), (1, "apple kiwi kiwi"),
                      (2, "apple banana cherry")])
    out = {(r.doc_id, r.term): r.tfidf for r in tfidf(d).collect()}
    # apple in all 3 docs > max_df floor(0.8·3)=2 → dropped (CountVectorizer
    # max_df semantics); cherry/banana df=1 < min_df 2 → dropped
    assert all(t != "apple" for _, t in out)
    assert all(t not in ("banana", "cherry") for _, t in out)
    # kiwi df=2: tfidf = tf · ln(3/2)
    assert out[(1, "kiwi")] == round(2 * math.log(3 / 2), 6)


def test_assignment_picks_nearest_centroid(spark):
    # two well-separated labels along orthogonal axes; each vector must be
    # assigned its own label's centroid, cos ≈ 1
    rows = [(0, [1.0, 0.0, 0.0], 0), (1, [0.9, 0.1, 0.0], 0),
            (2, [0.0, 1.0, 0.0], 1), (3, [0.0, 0.9, 0.1], 1)]
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    cents = seeded_centroids(e)
    asg = {r.vec_id: (r.topic, r.cos) for r in assign_topics(e, cents).collect()}
    assert asg[0][0] == 0 and asg[2][0] == 1
    assert all(c > 0.95 for _, c in asg.values())


def test_ctfidf_surfaces_topic_specific_terms(spark):
    d = _docs(spark, [(0, "solar panel energy"), (1, "solar grid energy"),
                      (2, "neural network model"), (3, "neural train model")])
    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
         (2, [0.0, 1.0], 1), (3, [0.1, 0.9], 1)],
        "vec_id bigint, embedding array<float>, label int")
    asg = assign_topics(e, seeded_centroids(e))
    terms = ctfidf_terms(tokenize(d), asg, n_docs=4, n_topics=2, top_n=3)
    top = {r.topic: r.term for r in terms.where(F.col("rank") == 1).collect()}
    assert top[0] in {"solar", "energy"}
    assert top[1] in {"neural", "model"}


def test_topic_info_shape_and_name(spark):
    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 1.0], 1)],
        "vec_id bigint, embedding array<float>, label int")
    d = _docs(spark, [(0, "alpha beta"), (1, "alpha gamma"), (2, "delta beta")])
    asg = assign_topics(e, seeded_centroids(e))
    terms = ctfidf_terms(tokenize(d), asg, n_docs=3, n_topics=2, top_n=5)
    info = {r.topic: r for r in topic_info(asg, terms).collect()}
    assert info[0]["count"] == 2 and info[1]["count"] == 1
    assert info[0].name.startswith("0_")


def test_ctfidf_constants_join_is_not_nested_loop(spark):
    # ADVICE r3: the 1-row constants frame must ride a literal-key
    # BroadcastHashJoin, not the BroadcastNestedLoopJoin a crossJoin plans
    d = _docs(spark, [(0, "solar panel energy"), (1, "solar grid energy"),
                      (2, "neural network model"), (3, "neural train model")])
    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
         (2, [0.0, 1.0], 1), (3, [0.1, 0.9], 1)],
        "vec_id bigint, embedding array<float>, label int")
    asg = assign_topics(e, seeded_centroids(e))
    terms = ctfidf_terms(tokenize(d), asg, n_docs=4, n_topics=2, top_n=3)
    plan = terms._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _terms_fixture(spark):
    # two topics, distinct scores; 'running'/'quickly' carry verb/adverb
    # suffixes for the POS heuristic
    rows = [
        (0, "solar", 9.0, 1), (0, "energy", 8.0, 2), (0, "panels", 7.0, 3),
        (0, "running", 6.0, 4), (0, "grid", 5.0, 5),
        (1, "neural", 9.0, 1), (1, "model", 8.0, 2), (1, "quickly", 7.0, 3),
        (1, "train", 6.0, 4), (1, "grid", 5.0, 5),
    ]
    return spark.createDataFrame(
        rows, "topic int, term string, score double, rank bigint")


def test_mmr_first_pick_is_top_term_and_selection_is_deterministic(spark):
    from deep_reason_spark.operators.topics import mmr_terms
    tt = _terms_fixture(spark)
    sel = {(r.topic, r.sel_rank): r.term
           for r in mmr_terms(tt, n_select=3).collect()}
    assert sel[(0, 1)] == "solar" and sel[(1, 1)] == "neural"
    assert len(sel) == 6  # 3 picks per topic, no gaps
    again = {(r.topic, r.sel_rank): r.term
             for r in mmr_terms(tt, n_select=3).collect()}
    assert sel == again


def test_mmr_zero_diversity_reduces_to_rank_order(spark):
    from deep_reason_spark.operators.topics import mmr_terms
    tt = _terms_fixture(spark)
    sel = {(r.topic, r.sel_rank): r.term
           for r in mmr_terms(tt, n_select=4, diversity=0.0).collect()}
    by_rank = {(r.topic, int(r.rank)): r.term
               for r in tt.where("rank <= 4").collect()}
    assert sel == by_rank


def test_pos_aspect_drops_suffixed_terms(spark):
    from deep_reason_spark.operators.topics import pos_terms
    tt = _terms_fixture(spark)
    sel = {}
    for r in pos_terms(tt, name_terms=4).collect():
        sel.setdefault(r.topic, []).append((r.sel_rank, r.term))
    assert [t for _, t in sorted(sel[0])] == ["solar", "energy", "panels", "grid"]
    assert [t for _, t in sorted(sel[1])] == ["neural", "model", "train", "grid"]


def test_topic_aspects_shape(spark):
    from deep_reason_spark.operators.topics import topic_aspects
    e = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [0.0, 1.0], 1)],
        "vec_id bigint, embedding array<float>, label int")
    d = _docs(spark, [(0, "alpha beta"), (1, "alpha gamma"), (2, "delta beta")])
    asg = assign_topics(e, seeded_centroids(e))
    terms = ctfidf_terms(tokenize(d), asg, n_docs=3, n_topics=2, top_n=5)
    rows = {r.topic: r for r in topic_aspects(asg, terms).collect()}
    assert set(rows[0].asDict()) == {"topic", "count", "name",
                                     "mmr_name", "pos_name"}


def test_mmr_two_regimes_equivalent(spark):
    """The driver greedy (candidate table ≤ SMALL_MMR_CANDIDATES) must make
    decision-for-decision the same selections as the distributed unrolled
    loop (small_threshold=0 forces it) — same rounded objective, same
    tie-breaks, same inner-join pickability. Run on the real sf0.001
    c-TF-IDF terms so scores carry full double precision, not round
    fixture values."""
    from deep_reason_spark.operators.topics import (
        assign_topics,
        ctfidf_terms,
        mmr_terms,
        seeded_centroids,
        tokenize,
    )
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    asg = assign_topics(e, seeded_centroids(e)).localCheckpoint()
    terms = ctfidf_terms(
        tokenize(d), asg, n_docs=d.count(),
        n_topics=e.select("label").distinct().count(), top_n=10,
    ).localCheckpoint()
    driver = {(r.topic, r.sel_rank): r.term
              for r in mmr_terms(terms, n_select=4).collect()}
    dist = {(r.topic, r.sel_rank): r.term
            for r in mmr_terms(terms, n_select=4,
                               small_threshold=0).collect()}
    assert driver == dist and driver
