"""Chunker unit tests — ordering, neighbor context, sha256 invariant,
document-boundary edge cases (SURVEY.md §5 item 1; FIXTURES.md F2)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deep_reason_spark.datagen import generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_single_chunk_document_has_null_context(spark):
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", "only one paragraph here.")])
    out = chunk_repo_files(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row.order_id == 0
    assert row.left_text is None and row.right_text is None
    assert row.document_id == "r/a:f.py"


def test_two_chunk_document_contexts(spark):
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", "first para.\n\nsecond para.")])
    out = {r.order_id: r for r in chunk_repo_files(df).collect()}
    assert out[0].left_text is None and out[0].right_text == "second para."
    assert out[1].left_text == "first para." and out[1].right_text is None


def test_empty_content_yields_no_chunks(spark):
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", ""),
                     ("r/a", "g.py", "d" * 40, "py", "   \n\n  ")])
    assert chunk_repo_files(df).count() == 0


def test_sha256_invariant_matches_python(spark):
    content = "alpha beta.\n\ngamma delta."
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", content)])
    rows = chunk_repo_files(df).select("content_sha256").distinct().collect()
    assert len(rows) == 1
    assert rows[0][0] == hashlib.sha256(content.encode()).hexdigest()


def test_oversized_paragraph_is_split_not_truncated(spark):
    big = "x" * 45000  # > 2 × 20000-char budget
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", big)])
    out = chunk_repo_files(df, max_chunk_chars=20000).orderBy("order_id").collect()
    assert [len(r.text) for r in out] == [20000, 20000, 5000]
    assert "".join(r.text for r in out) == big  # lossless


def test_regex_escaping_lone_s_line_survives(spark):
    # ADVICE r1 (high): under-escaped SQL literal turned the separator regex
    # into newline+'s*'+newline — a content line of 's' characters was eaten
    # as a separator. It must survive as content.
    content = "first para.\nsss\nstill first.\n\nsecond para."
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", content)])
    out = chunk_repo_files(df).orderBy("order_id").collect()
    assert [r.text for r in out] == ["first para.\nsss\nstill first.",
                                     "second para."]


def test_regex_escaping_whitespace_blank_line_splits(spark):
    # a "blank" line containing spaces/tabs is still a paragraph separator
    content = "first para.\n \t \nsecond para."
    df = _mk(spark, [("r/a", "f.py", "c" * 40, "py", content)])
    out = chunk_repo_files(df).orderBy("order_id").collect()
    assert [r.text for r in out] == ["first para.", "second para."]


def test_order_is_dense_per_document(spark):
    rf = generate_repo_files(spark, 80)
    chunks = chunk_repo_files(rf)
    bad = (
        chunks.groupBy("document_id")
        .agg(F.count("*").alias("n"), F.max("order_id").alias("mx"),
             F.min("order_id").alias("mn"))
        .where((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    assert bad == 0
