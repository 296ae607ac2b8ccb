"""Shared cosine_topk machinery (functions/cosine.py) + byte-gated
broadcast (functions/broadcast.py): numerical correctness vs a NumPy
brute force, both window orientations, and both gate branches (forced
broadcast when small, shuffle fallback when the byte gate trips)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from deep_reason_spark.functions import broadcast as bc
from deep_reason_spark.functions.cosine import cosine_topk, explode_vec


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    items = [(i, [float(round(x, 3)) for x in rng.randn(8)]) for i in range(20)]
    probes = [(j, [float(round(x, 3)) for x in rng.randn(8)]) for j in range(3)]
    idf = spark.createDataFrame(items, "item_id int, v array<double>")
    pdf = spark.createDataFrame(probes, "probe_id int, v array<double>")
    return items, probes, idf, pdf


def _brute_topk(items, probes, k):
    out = {}
    for pid, pv in probes:
        scored = []
        for iid, iv in items:
            dot = sum(a * b for a, b in zip(pv, iv))
            cos = round(dot / (math.sqrt(sum(a * a for a in pv))
                               * math.sqrt(sum(a * a for a in iv))), 6)
            scored.append((cos, iid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[pid] = [(iid, cos) for cos, iid in scored[:k]]
    return out


def test_cosine_topk_matches_brute_force(spark, vecs):
    items, probes, idf, pdf = vecs
    ranked = cosine_topk(
        explode_vec(idf, ["item_id"], "v"),
        explode_vec(pdf, ["probe_id"], "v").withColumnRenamed("val", "p"),
        item_ids=["item_id"], probe_ids=["probe_id"], k=4,
        partition="probe", item_val="val", probe_val="p",
    )
    got = {}
    for r in ranked.orderBy("probe_id", "rank").collect():
        got.setdefault(r["probe_id"], []).append((r["item_id"], r["cos"]))
    assert got == _brute_topk(items, probes, 4)


def test_cosine_topk_item_partition_is_argmax_over_probes(spark, vecs):
    items, probes, idf, pdf = vecs
    ranked = cosine_topk(
        explode_vec(idf, ["item_id"], "v"),
        explode_vec(pdf, ["probe_id"], "v").withColumnRenamed("val", "p"),
        item_ids=["item_id"], probe_ids=["probe_id"], k=1,
        partition="item", item_val="val", probe_val="p",
    )
    got = {r["item_id"]: r["probe_id"] for r in ranked.collect()}
    per_probe = _brute_topk(probes, items, 1)  # swap sides: argmax per item
    expect = {iid: best[0][0] for iid, best in per_probe.items()}
    assert got == expect


def test_cosine_topk_rejects_val_collision(spark, vecs):
    _, _, idf, pdf = vecs
    with pytest.raises(ValueError):
        cosine_topk(explode_vec(idf, ["item_id"], "v"),
                    explode_vec(pdf, ["probe_id"], "v"),
                    ["item_id"], ["probe_id"], k=1)


def test_broadcast_gate_both_branches(spark, monkeypatch):
    """Default gate → the hint wrapper is applied (a new hinted frame);
    tripped gate → the input frame is returned UNCHANGED (no forced
    broadcast — AQE then owns the join strategy)."""
    small = spark.range(5).withColumn("s", F.lit("x"))
    assert bc.broadcast_if_small(small) is not small  # hint applied
    monkeypatch.setattr(bc, "BROADCAST_MAX_BYTES", 1)
    assert bc.broadcast_if_small(small) is small      # gate tripped


def test_topics_results_invariant_across_gate_branches(spark, monkeypatch):
    """tfidf values must be identical whether the corpus-derived vocab is
    broadcast (small corpus) or shuffle-joined (gate tripped) — the gate is
    a physical-plan knob, never a semantic one (VERDICT r2 #2)."""
    from deep_reason_spark.operators.topics import tfidf
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3 + f"tok{i % 7}") for i in range(30)],
        "doc_id int, text string")
    baseline = sorted(map(tuple, tfidf(docs).collect()))
    monkeypatch.setattr(bc, "BROADCAST_MAX_BYTES", 1)
    gated = sorted(map(tuple, tfidf(docs).collect()))
    assert gated == baseline


def test_cosine_topk_empty_probe_side(spark):
    items = explode_vec(
        spark.createDataFrame([(1, [1.0, 2.0])], "id int, v array<double>"),
        ["id"], "v")
    probes = explode_vec(
        spark.createDataFrame([], "pid int, v array<double>"),
        ["pid"], "v").withColumnRenamed("val", "p")
    assert cosine_topk(items, probes, ["id"], ["pid"], k=1,
                       probe_val="p").count() == 0
