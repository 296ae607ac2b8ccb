"""Broadcast-gate hygiene (VERDICT r4 tasks 3 + 5).

Two invariants:
1. No BARE ``F.broadcast`` on corpus/entity/dictionary-derived frames
   anywhere in the engine — every remaining bare site is an explicitly
   reviewed query-scale or vocabulary-bounded frame (allowlist below).
2. The ``estimate_bytes`` memo cannot serve a stale estimate after the
   storage behind a plan-identical scan is overwritten (epoch bump at
   write boundaries).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

import deep_reason_spark

SRC_ROOT = os.path.dirname(os.path.abspath(deep_reason_spark.__file__))

# Reviewed bare-broadcast sites: (basename, stripped source line). Every
# frame here is query-scale (questions, probe rankings, per-question
# aggregates), a TPC-H constant dim (nation/region), or vocabulary-bounded
# by construction (ontology_relations is assert-capped at MAX_RELATIONS).
# Adding a NEW bare F.broadcast means consciously extending this list — the
# default for anything corpus/entity/dictionary-derived is the byte gate
# (functions/broadcast.py, CLAUDE.md rule).
_ALLOWED_BARE = {
    # quarantined brute-force verifier: q = questions (query-scale)
    ("rag_pipeline.py", "pairs = cand.crossJoin(F.broadcast(q)).select("),
    # per-question keyword counts (query-scale)
    ("rag_pipeline.py", '.join(F.broadcast(nkw), "question_id")'),
    # ontology relations: vocabulary-bounded (MAX_RELATIONS assert)
    ("kg_pipeline.py", ".join(F.broadcast(orels),"),
    ("ontology.py", '.join(F.broadcast(ontology_relations), "relation_name")'),
    ("ontology.py", ".join(F.broadcast(ontology_relations),"),
    # TPC-H constant dims (25 nations / 5 regions)
    ("queries.py", 'c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])'),
    ("queries.py", '.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])'),
    # fixture-scale query/probe frames inside registered queries
    ("queries_extra.py", 'e.join(F.broadcast(q), (F.col("label") == F.col("qcell"))'),
    ("queries_extra.py", 'e.join(F.broadcast(probed), "label")'),
    ("queries_extra.py", '.join(F.broadcast(q), "qid")'),
    # two-phase dense numbering: offsets = one row per partition bucket
    ("queries_extra.py", 'local.join(F.broadcast(offsets.select("_b", "_off")), "_b")'),
    # per-community stat row (one row per community id in a limited frame)
    ("queries_extra.py", "return members.join(F.broadcast(stats),"),
    # the gate implementation itself
    ("broadcast.py", '"""F.broadcast(df) when the estimated payload fits every executor;'),
    ("broadcast.py", "return F.broadcast(df) if estimate_bytes(df) <= max_bytes else df"),
}


def test_no_unreviewed_bare_broadcasts():
    found = set()
    for dirpath, _dirs, files in os.walk(SRC_ROOT):
        if "__pycache__" in dirpath:
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            with open(os.path.join(dirpath, fname)) as fh:
                for line in fh:
                    if re.search(r"\bF\.broadcast\(", line):
                        found.add((fname, line.strip()))
    unreviewed = found - _ALLOWED_BARE
    assert not unreviewed, (
        "bare F.broadcast on an unreviewed frame — route it through "
        f"broadcast_if_small or extend the allowlist consciously: {unreviewed}")
    # the allowlist must not rot: every entry still exists in source
    gone = _ALLOWED_BARE - found
    assert not gone, f"stale allowlist entries (site removed/edited): {gone}"


def test_estimate_epoch_invalidates_after_overwrite(spark, tmp_path):
    """VERDICT r4 task 5: overwrite a table behind a plan-identical scan →
    the next gate estimate must be fresh, not the memoized pre-overwrite
    value."""
    from deep_reason_spark.functions import broadcast as bc

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(i, "x" * 8) for i in range(10)],
                          "id bigint, s string").write.parquet(path)
    first = bc.estimate_bytes(spark.read.parquet(path))
    # overwrite with a 100× payload behind the very same scan plan
    spark.createDataFrame([(i, "y" * 800) for i in range(100)],
                          "id bigint, s string") \
        .write.mode("overwrite").parquet(path)
    # without the bump the memo would serve `first` for the identical plan
    bc.bump_estimate_epoch()
    second = bc.estimate_bytes(spark.read.parquet(path))
    assert second > first * 10


def test_write_partitioned_bumps_epoch(spark, tmp_path):
    """The engine's own write boundary invalidates the memo (ADVICE r4)."""
    from deep_reason_spark.functions import broadcast as bc
    from deep_reason_spark.sources.checkpoint import write_partitioned

    path = str(tmp_path / "staged")
    df = spark.createDataFrame([(i % 2, "z" * 16) for i in range(20)],
                               "bucket int, s string")
    before = bc._ESTIMATE_EPOCH
    write_partitioned(df, path)
    assert bc._ESTIMATE_EPOCH > before


def test_attach_types_rides_the_gate(spark, monkeypatch):
    """VERDICT r4 task 3: the entity-type map broadcast is byte-gated, the
    hint survives the projections, and an over-gate map degrades to a
    non-broadcast join with identical results."""
    from deep_reason_spark.functions import broadcast as bc
    from deep_reason_spark.operators.ontology import attach_types

    triples = spark.createDataFrame(
        [("e1", "e2", "calls"), ("e2", "e3", "imports")],
        "subject_id string, object_id string, predicate string")
    types = spark.createDataFrame(
        [("e1", "module"), ("e3", "class")], "entity_id string, type string")

    open_plan = attach_types(triples, types)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in open_plan  # hint survives the projections

    expected = {("e1", "e2", "module", "entity"),
                ("e2", "e3", "entity", "class")}
    monkeypatch.setattr(bc, "BROADCAST_MAX_BYTES", 1)  # slam the gate shut
    got = {(r.subject_id, r.object_id, r.subject_type, r.object_type)
           for r in attach_types(triples, types).collect()}
    assert got == expected


def test_chain_decorate_never_broadcasts_entities_whole(spark, monkeypatch):
    """VERDICT r4 #1: chains_with_descriptions must survive an entities
    table too big to broadcast — the gate falls back to a shuffle join and
    the lookup semantics (first match, empty default) hold."""
    from deep_reason_spark.functions import broadcast as bc
    from deep_reason_spark.operators.sampling import chains_with_descriptions

    chains = spark.createDataFrame([(["A", "B"],)], "chain array<string>")
    ents = spark.createDataFrame(
        [("A", "desc-a", "t1"), ("a", "desc-dup", "t2"), ("Z", "zzz", "t3")],
        "title string, description string, type string")
    monkeypatch.setattr(bc, "BROADCAST_MAX_BYTES", 1)
    [row] = chains_with_descriptions(chains, ents).collect()
    by_node = {n.node: n for n in row.nodes}
    assert by_node["A"].description == "desc-a"  # first match ("A" < "a")
    assert by_node["B"].description == ""        # empty default on miss


def test_entity_prune_before_window(spark, monkeypatch):
    """The entities side is semi-joined down to chain-node keys BEFORE the
    first-match window and the gate — the lookup shipped to the join is
    bounded by the chain-node count, never the entities cardinality (the
    10^8-row table at 100×). Verified by recording the row counts of every
    frame that reaches the byte gate."""
    from deep_reason_spark.functions import broadcast as bc
    from deep_reason_spark.operators import sampling as sp

    chains = spark.createDataFrame([(["A"],)], "chain array<string>")
    ents = spark.createDataFrame(
        [(f"E{i}", f"d{i}", "t") for i in range(50)] + [("A", "da", "t")],
        "title string, description string, type string")
    gated_counts = []
    real_gate = bc.broadcast_if_small

    def recording_gate(df, max_bytes=None):
        gated_counts.append(df.count())
        return real_gate(df, max_bytes)

    monkeypatch.setattr(bc, "broadcast_if_small", recording_gate)
    out = sp.chains_with_descriptions(chains, ents)
    [row] = out.collect()
    assert row.nodes[0].description == "da"
    # every gated frame (key set + pruned lookup) is chain-node-bounded
    assert gated_counts and max(gated_counts) <= 1, gated_counts
