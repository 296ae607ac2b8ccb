"""Deterministic fuzz — nasty content (regex metachars, quotes,
backslashes, unicode, control chars) through the contract surfaces:
the chunker's lossless split, both extraction engines, and the
answer-quality judge's bounds. Seeded: failures reproduce exactly."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples
from deep_reason_spark.operators.scoring import answer_quality

_NASTY = [
    "\\n", "\\s", "\\", "'", '"', "''", "$1", "`", "{}", "[^a-z]", "(?i)",
    ".*", "a|b", "\t", "\r", "x1f\x1f", "é", "Ж", "日本", "𝔘𝔫𝔦", " ",
    "sss", " s ", "None", "none", "NONE.",
    "a \x1f b \x1f c.",  # group-packing separator bytes (review regression)
]


def _gen_contents(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 6)):
            kind = rng.random()
            if kind < 0.4:
                parts.append(rng.choice(_NASTY))
            elif kind < 0.7:
                parts.append("".join(rng.choice(string.printable)
                                     for _ in range(rng.randint(0, 40))))
            else:
                parts.append("Ada Lovelace developed Query Engine.")
            parts.append(rng.choice(["\n\n", "\n \n", " ", "\n", "!? ", ""]))
        out.append("".join(parts))
    return out


def _files(spark, contents):
    return spark.createDataFrame(
        [("r/f", f"p{i}.txt", "c" * 40, "txt", c) for i, c in enumerate(contents)],
        "repo string, path string, commit string, lang string, content string",
    )


def test_chunker_is_lossless_on_nasty_content(spark):
    """Concatenated chunk texts == the content minus separators: nothing is
    silently eaten (the r1 regex-escaping bug class), nothing duplicated."""
    import re
    contents = _gen_contents(120)
    chunks = chunk_repo_files(_files(spark, contents)).orderBy("path", "order_id")
    got: dict[str, list[str]] = {}
    for r in chunks.collect():
        got.setdefault(r.path, []).append(r.text)
    # contract = Java regex semantics: \s/\S are ASCII classes (no
    # UNICODE_CHARACTER_CLASS), so exotic unicode spaces (\xa0 …) are
    # CONTENT, not separators — mirror with re.ASCII
    sep = re.compile(r"\n\s*\n", re.ASCII)
    nonblank = re.compile(r"\S", re.ASCII)
    for i, c in enumerate(contents):
        expected = [p for p in sep.split(c) if nonblank.search(p)]
        assert got.get(f"p{i}.txt", []) == expected, f"content #{i}"


def test_both_extraction_engines_survive_and_agree_on_nasty_content(spark):
    contents = _gen_contents(120, seed=11)
    chunks = chunk_repo_files(_files(spark, contents)).localCheckpoint()
    jvm = extract_triples(chunks, engine="jvm")
    py = extract_triples(chunks, engine="python")
    assert jvm.exceptAll(py).count() == 0
    assert py.exceptAll(jvm).count() == 0
    # the planted sentences are still found among the noise
    assert jvm.where(F.col("predicate") == "developed").count() > 0


def test_answer_quality_bounds_on_nasty_strings(spark):
    rng = random.Random(3)
    texts = _gen_contents(60, seed=13)
    rows = [(texts[i], texts[rng.randrange(len(texts))],
             texts[rng.randrange(len(texts))]) for i in range(len(texts))]
    df = spark.createDataFrame(
        rows, "generated_answer string, real_answer string, context string")
    out = answer_quality(df).collect()
    assert len(out) == len(rows)
    for r in out:
        assert 0.0 <= r.score <= 10.0
        for c in ("consistency", "similarity", "completeness"):
            assert 0.0 <= r[c] <= 1.0


def test_apply_edits_invariants_on_random_graphs(spark):
    """Property: for ANY edge set and ANY edit set, the edit executor
    reports rewrite_acc == 1.0 and locality_acc == 1.0 (every edit lands;
    every untouched edge survives byte-identical), and emits exactly one
    row per (source, predicate) union key."""
    from deep_reason_spark.operators.editing import apply_edits, edit_metrics

    rng = random.Random(7)
    nodes = [f"v{i}" for i in range(30)]
    rels = ["likes", "knows", "cites"]
    edge_rows = list({(rng.choice(nodes), rng.choice(rels), rng.choice(nodes))
                      for _ in range(120)})
    edit_rows = [(rng.choice(nodes), rng.choice(rels), rng.choice(nodes))
                 for _ in range(40)]  # duplicates + conflicts on purpose
    edges = spark.createDataFrame(
        edge_rows, "source string, description string, target string")
    edits = spark.createDataFrame(
        edit_rows, "source string, description string, target string")
    edited = apply_edits(edges, edits).localCheckpoint()

    m = edit_metrics(edited, edges, edits).collect()[0]
    assert m.rewrite_acc == 1.0
    assert m.locality_acc == 1.0
    # one output row per (source, predicate, target)-key of the union:
    # kept/rewritten rows keep edge multiplicity per key; inserted add new
    n_keys = (edges.select("source", "description")
              .union(edits.select("source", "description"))
              .distinct().count())
    assert edited.select("source", "description").distinct().count() == n_keys
