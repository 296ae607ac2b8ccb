"""Source reader tests — ObliQA / books_mx loader semantics
(deep_reason/utils.py:191-221) and the repo_files round trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.sources.readers import (
    chunks_to_repo_files,
    export_csv,
    read_books_mx,
    read_jsonl,
    read_obliqa,
    write_jsonl,
)


@pytest.fixture()
def obliqa_dir(tmp_path):
    d = tmp_path / "obliqa"
    d.mkdir()
    (d / "0.json").write_text(json.dumps([
        {"DocumentID": 11, "PassageID": "7.3.4", "Passage": "first passage", "ID": "a"},
        {"DocumentID": 11, "PassageID": "7.3.5", "Passage": "second passage", "ID": "b"},
        {"DocumentID": 3, "PassageID": "17.1", "Passage": "other doc", "ID": "c"},
    ]))
    (d / "1.json").write_text(json.dumps([
        {"DocumentID": 5, "PassageID": "1.1", "Passage": "file two", "ID": "d"},
    ]))
    return str(d)


def test_obliqa_order_per_file(spark, obliqa_dir):
    rows = read_obliqa(spark, obliqa_dir).collect()
    assert len(rows) == 4
    by_file0 = sorted(
        [r for r in rows if r.text != "file two"], key=lambda r: r.order_id)
    assert [r.order_id for r in by_file0] == [0, 1, 2]  # per-file enumeration
    assert by_file0[0].chapter_name == "7.3.4"
    assert by_file0[0].document_id == "11"
    [f2] = [r for r in rows if r.text == "file two"]
    assert f2.order_id == 0  # second file restarts at 0


def test_obliqa_file_idx_selection(spark, obliqa_dir):
    rows = read_obliqa(spark, obliqa_dir, file_idx=[1]).collect()
    assert [r.text for r in rows] == ["file two"]


def test_books_mx_order_resets_on_file_change(spark, tmp_path):
    p = tmp_path / "books.json"
    recs = [
        {"_source": {"paragraph": "p0", "metadata":
                     {"file_name": "bookA", "chapter": "c1", "idx": "A"}}},
        {"_source": {"paragraph": "p1", "metadata":
                     {"file_name": "bookA", "chapter": "c1", "idx": "A"}}},
        {"_source": {"paragraph": "q0", "metadata":
                     {"file_name": "bookB", "chapter": "c9", "idx": "B"}}},
    ]
    p.write_text(json.dumps(recs))
    rows = {(r.text): r for r in read_books_mx(spark, str(p)).collect()}
    assert rows["p0"].order_id == 0 and rows["p1"].order_id == 1
    assert rows["q0"].order_id == 0  # reset on file_name change
    assert rows["q0"].chapter_name == "c9" and rows["q0"].document_id == "B"


def test_roundtrip_chunks_to_repo_files(spark, obliqa_dir):
    chunks = read_obliqa(spark, obliqa_dir)
    rf = chunks_to_repo_files(chunks)
    rechunked = chunk_repo_files(rf)
    # per-document text SEQUENCE survives the round trip (obliqa order_id is
    # per source file — utils.py:197-203 — so absolute ids renumber, but
    # relative order within a document must hold)
    def seqs(rows, key):
        out = {}
        for r in sorted(rows, key=lambda r: (key(r), r.order_id)):
            out.setdefault(key(r), []).append(r.text)
        return out

    orig = seqs(chunks.collect(), lambda r: r.document_id)
    got = seqs(rechunked.collect(), lambda r: r.document_id)
    assert len(got) == len(orig)
    for doc, texts in orig.items():
        assert got[f"corpus:doc/{doc}"] == texts


def test_jsonl_sink_roundtrip_and_csv(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    p = str(tmp_path / "out.jsonl")
    write_jsonl(df, p)
    write_jsonl(spark.createDataFrame([(3, "z")], "id int, v string"), p)  # append
    back = read_jsonl(spark, p, "id int, v string")
    assert {r.id for r in back.collect()} == {1, 2, 3}
    export_csv(df, str(tmp_path / "out.csv"))
    assert spark.read.option("header", "true").csv(str(tmp_path / "out.csv")).count() == 2


def test_read_jsonl_missing_path_is_empty(spark, tmp_path):
    assert read_jsonl(spark, str(tmp_path / "nope"), "id int").count() == 0
