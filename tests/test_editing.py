"""Editing-dataset conversion tests (dataset_conversion.py:30-90 semantics)."""

from __future__ import annotations

from deep_reason_spark.operators.editing import (
    EDITING_INPUT_SCHEMA,
    convert_to_editing_dataset,
)


def _results(spark, payloads):
    return spark.createDataFrame(
        [(p,) for p in payloads],
        f"knowledge_editing_input {EDITING_INPUT_SCHEMA}",
    )


def _obs(prompt, subject, target="t", lg=None, reasoning=None, alias=None,
         rel_spec=None):
    return {
        "prompt": prompt, "subject": subject, "target_new": target,
        "portability": {"logical_generalization": lg, "reasoning": reasoning,
                        "subject_aliasing": alias},
        "locality": {"relation_specificity": rel_spec},
    }


def test_lowercasing_and_subject_filter(spark):
    df = _results(spark, [
        [_obs("Ada Lovelace developed X", "Ada Lovelace")],   # kept (lowered)
        [_obs("something unrelated", "Missing Subject")],      # dropped (P6)
    ])
    rows = convert_to_editing_dataset(df).collect()
    assert len(rows) == 1
    assert rows[0].prompt == "ada lovelace developed x"
    assert rows[0].subject == "ada lovelace"


def test_list_payloads_exploded_and_nulls_skipped(spark):
    df = _results(spark, [
        [_obs("a b", "a"), None, _obs("c d", "c")],
        None,
    ])
    rows = convert_to_editing_dataset(df).collect()
    assert {r.subject for r in rows} == {"a", "c"}


def test_field_renames(spark):
    df = _results(spark, [[_obs("x y", "x", lg=["g1", "g2"], reasoning="r",
                                alias="al", rel_spec="rs")]])
    [row] = convert_to_editing_dataset(df).collect()
    assert row.portability.Local_Generalization == ["g1", "g2"]
    assert row.portability.Reasoning == "r"
    assert row.portability.Subject_Aliasing == "al"
    assert row.locality.Relation_Specificity == "rs"


def test_missing_generalization_becomes_empty_list(spark):
    df = _results(spark, [[_obs("x y", "x")]])
    [row] = convert_to_editing_dataset(df).collect()
    assert row.portability.Local_Generalization == []


def test_null_prompt_rows_are_kept(spark):
    # dataset_conversion.py keeps observations lacking a prompt; the
    # subject-in-prompt filter only applies when BOTH fields exist (ADVICE r1)
    df = _results(spark, [
        [_obs(None, "some subject")],   # kept: no prompt to filter against
        [_obs("a prompt", None)],       # kept: no subject to filter against
        [_obs("no match here", "xyz")], # dropped: both present, no substring
    ])
    rows = convert_to_editing_dataset(df).collect()
    assert len(rows) == 2
    assert {r.subject for r in rows} == {"some subject", None}


def test_apply_edits_rewrite_insert_keep(spark):
    from deep_reason_spark.operators.editing import apply_edits
    edges = spark.createDataFrame(
        [("a", "likes", "x", 3), ("b", "likes", "y", 1), ("c", "knows", "z", 2)],
        "source string, description string, target string, weight int")
    edits = spark.createDataFrame(
        [("a", "likes", "x2"),        # rewrite
         ("d", "likes", "w"),         # insert (no such edge)
         ("a", "likes", "x1")],       # conflict: min target wins -> x1
        "source string, description string, target string")
    out = {(r.source, r.description): (r.target, r.edit_status, r.weight)
           for r in apply_edits(edges, edits).collect()}
    assert out[("a", "likes")] == ("x1", "rewritten", 3)   # extras survive
    assert out[("b", "likes")] == ("y", "kept", 1)
    assert out[("c", "knows")] == ("z", "kept", 2)
    assert out[("d", "likes")] == ("w", "inserted", None)


def test_edit_metrics_rewrite_and_locality(spark):
    from deep_reason_spark.operators.editing import apply_edits, edit_metrics
    edges = spark.createDataFrame(
        [("a", "r", "x"), ("b", "r", "y"), ("c", "r", "z")],
        "source string, description string, target string")
    edits = spark.createDataFrame(
        [("a", "r", "x2"), ("d", "r", "w")],
        "source string, description string, target string")
    edited = apply_edits(edges, edges.limit(0).unionByName(edits))
    row = edit_metrics(edited, edges, edits).collect()[0]
    assert row.n_edits == 2 and row.rewrite_acc == 1.0
    assert row.n_non_edited == 2 and row.locality_acc == 1.0
    # a broken editor (drops an untouched edge) must show locality < 1
    from pyspark.sql import functions as F
    broken = edited.where(F.col("source") != "b")
    row2 = edit_metrics(broken, edges, edits).collect()[0]
    assert row2.locality_acc == 0.5
