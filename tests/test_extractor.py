"""Extractor tests — TRIPLETS_PROMPT contract rules + the P/R ≥ 0.95 gate
against golden fixtures (BASELINE.json metric; SURVEY.md §5 item 2)."""

from __future__ import annotations

from deep_reason_spark.datagen import generate_golden_triples, generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import (
    detect_mentions,
    extract_from_text,
    extract_triples,
)

KEY = ["subject", "predicate", "object", "document_id", "order_id", "content_sha256"]


def test_simple_fact():
    assert extract_from_text("Ada Lovelace developed Vector Store.") == [
        ("Ada Lovelace", "developed", "Vector Store")
    ]


def test_complex_fact_is_split():
    # kg_prompts.py:21 — "John, position, engineer in Google" must split
    out = extract_from_text("Tony Hoare is an engineer in Acme Labs.")
    assert out == [
        ("Tony Hoare", "position", "engineer"),
        ("Tony Hoare", "works at", "Acme Labs"),
    ]


def test_alias_resolves_to_most_complete_identifier_same_chunk():
    # kg_prompts.py:25,42 — entity consistency
    text = "Ada Lovelace designed Graph Kernel. Ada improved Graph Kernel."
    out = extract_from_text(text)
    assert ("Ada Lovelace", "improved", "Graph Kernel") in out
    assert all(s != "Ada" for s, _, _ in out)


def test_alias_resolves_via_left_context():
    out = extract_from_text("Ada maintains Cache Layer.",
                            left_text="Ada Lovelace works at Acme Labs.")
    assert out == [("Ada Lovelace", "maintains", "Cache Layer")]


def test_unresolvable_alias_kept_as_is():
    out = extract_from_text("Ada maintains Cache Layer.")
    assert out == [("Ada", "maintains", "Cache Layer")]


def test_filler_yields_nothing():
    assert extract_from_text("the build completed without warnings.") == []


def test_none_entity_banned():
    # kg_prompts.py:24 — never emit 'none' as an entity
    assert extract_from_text("None depends on Query Engine.") == []


def test_seven_word_cap():
    # subject+predicate+object must stay ≤ 7 words (kg_prompts.py:18)
    text = "Alpha Beta Gamma Delta Epsilon collaborates with Zeta Eta."
    assert extract_from_text(text) == []


def test_pr_gate_against_golden(spark):
    """The headline correctness gate: P/R ≥ 0.95 vs generated golden triples."""
    n = 400
    chunks = chunk_repo_files(generate_repo_files(spark, n))
    extracted = extract_triples(chunks).select(*KEY).distinct().cache()
    golden = generate_golden_triples(spark, n).select(*KEY).distinct().cache()
    tp = extracted.join(golden, KEY, "inner").count()
    n_ext, n_gold = extracted.count(), golden.count()
    assert n_gold > 500
    precision = tp / n_ext
    recall = tp / n_gold
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"


def test_provenance_joins_back_to_chunk(spark):
    """Every triple's (document_id, order_id) exists in chunks and carries
    the file's sha256 (SURVEY.md §5 property 3)."""
    chunks = chunk_repo_files(generate_repo_files(spark, 60)).cache()
    triples = extract_triples(chunks)
    orphans = triples.join(
        chunks.select("document_id", "order_id", "content_sha256"),
        ["document_id", "order_id", "content_sha256"],
        "left_anti",
    ).count()
    assert orphans == 0


def test_vectorized_batch_equals_reference_implementation(spark):
    """The vectorized batch path must emit exactly what the pure per-chunk
    reference implementation (extract_from_text) emits."""
    chunks = chunk_repo_files(generate_repo_files(spark, 60)).localCheckpoint()
    vec = extract_triples(chunks).select(*KEY)
    rows = chunks.select("text", "left_text", "document_id", "order_id",
                         "content_sha256").collect()
    ref = [
        (s, p, o, r.document_id, r.order_id, r.content_sha256)
        for r in rows
        for s, p, o in extract_from_text(r.text, r.left_text)
    ]
    ref_df = spark.createDataFrame(ref, KEY)
    assert vec.exceptAll(ref_df).count() == 0
    assert ref_df.exceptAll(vec).count() == 0


def test_mention_detection_jvm_side(spark):
    chunks = chunk_repo_files(generate_repo_files(spark, 40)).cache()
    mentions = detect_mentions(chunks)
    assert mentions.count() > 0
    # plan must not contain a Python eval for this operator
    plan = mentions._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_jvm_and_python_engines_agree(spark):
    """The Catalyst extraction path must be row-for-row identical to the
    vectorized mapInPandas path (same contract, two engines)."""
    from deep_reason_spark.datagen import generate_repo_files
    from deep_reason_spark.operators.chunker import chunk_repo_files
    from deep_reason_spark.operators.extractor import extract_triples

    chunks = chunk_repo_files(generate_repo_files(spark, 150)).localCheckpoint()
    jvm = extract_triples(chunks, engine="jvm")
    py = extract_triples(chunks, engine="python")
    assert jvm.count() > 0
    assert jvm.exceptAll(py).count() == 0
    assert py.exceptAll(jvm).count() == 0


def test_default_extraction_path_is_jvm_only(spark):
    """engine='jvm' (the default) keeps extraction inside codegen: no
    Python workers anywhere in the plan."""
    from deep_reason_spark.datagen import generate_repo_files
    from deep_reason_spark.operators.chunker import chunk_repo_files
    from deep_reason_spark.operators.extractor import extract_triples

    # checkpoint the synthetic corpus so the inspected plan contains ONLY
    # the chunk+extract path (datagen itself synthesizes via mapInPandas)
    corpus = generate_repo_files(spark, 20).localCheckpoint()
    df = extract_triples(chunk_repo_files(corpus))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan


def test_jvm_engine_does_not_fabricate_from_separator_bytes(spark):
    """Review regression: content containing U+001F (the group-packing
    separator) must never masquerade as regex groups in the jvm engine."""
    from deep_reason_spark.datagen import generate_repo_files  # noqa: F401
    from deep_reason_spark.operators.chunker import chunk_repo_files
    from deep_reason_spark.operators.extractor import extract_triples

    probe = spark.createDataFrame(
        [("r", "f", "c" * 40, "txt",
          "alpha \x1f beta \x1f gamma. Ada Lovelace developed Query Engine.")],
        "repo string, path string, commit string, lang string, content string")
    chunks = chunk_repo_files(probe).localCheckpoint()
    jvm = {(r.subject, r.predicate, r.object)
           for r in extract_triples(chunks, engine="jvm").collect()}
    py = {(r.subject, r.predicate, r.object)
          for r in extract_triples(chunks, engine="python").collect()}
    assert jvm == py == {("Ada Lovelace", "developed", "Query Engine")}
