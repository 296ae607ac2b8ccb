"""Streaming KG maintenance — a document stream folded through
``stream_maintain_kg`` must leave the stored graph identical to a full
``run_graph_stage`` rebuild over the whole corpus, stay exactly-once across
restarts, and treat replayed (already-applied) micro-batches as no-ops
(the incremental fold is NOT idempotent — weights sum — so the marker
guard, not a re-run, carries the guarantee)."""

from __future__ import annotations

import os
import shutil

import pytest

from deep_reason_spark.datagen import alias_dict_df, generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples
from deep_reason_spark.plans.kg_pipeline import (
    GRAPH_TABLE_DIRS,
    run_graph_stage,
)
from deep_reason_spark.streaming.incremental import stream_maintain_kg


def _norm(v):
    return tuple(v) if isinstance(v, list) else v


def _table_rows(spark, out_dir, name):
    df = spark.read.parquet(os.path.join(out_dir, name))
    cols = sorted(c for c in df.columns if c != "bucket")
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


def test_streamed_kg_equals_full_rebuild_and_replay_noop(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    kg_dir = str(tmp_path / "kg")
    full_dir = str(tmp_path / "full")
    alias_dict = alias_dict_df(spark)

    full = generate_repo_files(spark, 60).localCheckpoint()
    wave1 = full.limit(36).localCheckpoint()
    wave2 = full.exceptAll(wave1).localCheckpoint()
    assert wave1.count() > 0 and wave2.count() > 0

    # wave 1 arrives → bootstrap micro-batch (full stage + state init)
    wave1.coalesce(2).write.mode("append").parquet(corpus_dir)
    q = stream_maintain_kg(spark, corpus_dir, kg_dir, alias_dict)
    q.awaitTermination(300)
    assert os.path.exists(os.path.join(kg_dir, "_applied_batch"))

    # wave 2 arrives; SAME checkpoint → one delta-only incremental fold
    wave2.coalesce(2).write.mode("append").parquet(corpus_dir)
    q2 = stream_maintain_kg(spark, corpus_dir, kg_dir, alias_dict)
    q2.awaitTermination(300)

    # the streamed graph equals a full rebuild over the whole corpus,
    # table for table (same bar as test_incremental_kg)
    run_graph_stage(
        spark, extract_triples(chunk_repo_files(full)), alias_dict, full_dir)
    after_waves = {}
    for name in GRAPH_TABLE_DIRS:
        after_waves[name] = _table_rows(spark, kg_dir, name)
        assert after_waves[name] == _table_rows(spark, full_dir, name), (
            f"table {name} diverged from full rebuild")

    # a third run with nothing new processes no batch — graph unchanged
    q3 = stream_maintain_kg(spark, corpus_dir, kg_dir, alias_dict)
    q3.awaitTermination(300)
    marker_before = open(os.path.join(kg_dir, "_applied_batch")).read()

    # wipe the streaming checkpoint → a NEW checkpoint lineage renumbers
    # and regroups batches, so batch ids are no longer comparable to the
    # applied marker: continuing could silently skip new documents or
    # double-fold applied ones (summed weights). The guard must REFUSE —
    # raise, and leave every table byte-identical.
    shutil.rmtree(os.path.join(kg_dir, "_kg_checkpoint"))
    q4 = stream_maintain_kg(spark, corpus_dir, kg_dir, alias_dict)
    with pytest.raises(Exception, match="checkpoint lineage"):
        q4.awaitTermination(300)
    assert open(os.path.join(kg_dir, "_applied_batch")).read() == marker_before
    for name in GRAPH_TABLE_DIRS:
        assert _table_rows(spark, kg_dir, name) == after_waves[name], (
            f"replayed batch mutated table {name}")


def _fake_checkpoint(tmp_path, qid="q-test-1"):
    import json

    ck = str(tmp_path / "ck")
    os.makedirs(ck, exist_ok=True)
    with open(os.path.join(ck, "metadata"), "w") as f:
        json.dump({"id": qid}, f)
    return ck


def test_bootstrap_crash_replay_rebootstraps_never_folds(spark, tmp_path):
    """The pending-bootstrap fence: a crash between the table moves and the
    applied-marker write must make the REPLAY re-bootstrap (idempotent full
    overwrite), never take the incremental branch — a fold of the same
    batch into the already-moved graph would double every summed weight."""
    from deep_reason_spark.streaming.incremental import _maintain_kg_batch

    alias = alias_dict_df(spark)
    corpus = generate_repo_files(spark, 40).localCheckpoint()
    files = corpus.limit(24).localCheckpoint()
    ck = _fake_checkpoint(tmp_path)
    out = str(tmp_path / "kg")

    _maintain_kg_batch(spark, files, 0, out_dir=out, checkpoint_dir=ck,
                       alias_dict=alias)
    clean = {n: _table_rows(spark, out, n) for n in GRAPH_TABLE_DIRS}
    assert open(os.path.join(out, "_applied_batch")).read() == "q-test-1:0"

    # simulate the worst crash window: every table already moved in
    # (entity_blocks present), pending flag on disk, marker NOT yet written
    os.unlink(os.path.join(out, "_applied_batch"))
    with open(os.path.join(out, "_bootstrap_pending"), "w") as f:
        f.write("0")
    _maintain_kg_batch(spark, files, 0, out_dir=out, checkpoint_dir=ck,
                       alias_dict=alias)
    for n in GRAPH_TABLE_DIRS:
        assert _table_rows(spark, out, n) == clean[n], (
            f"replayed bootstrap diverged (or double-folded) table {n}")
    assert not os.path.exists(os.path.join(out, "_bootstrap_pending"))

    # stale-pending cleanup: flag left by a crash AFTER the marker write
    # must not make the next NEW batch wipe the graph with a re-bootstrap
    with open(os.path.join(out, "_bootstrap_pending"), "w") as f:
        f.write("0")
    wave2 = corpus.exceptAll(files).localCheckpoint()
    assert wave2.count() > 0
    _maintain_kg_batch(spark, wave2, 1, out_dir=out, checkpoint_dir=ck,
                       alias_dict=alias)
    assert not os.path.exists(os.path.join(out, "_bootstrap_pending"))
    # the fold (not a re-bootstrap) happened: equals the full rebuild
    full_dir = str(tmp_path / "full")
    run_graph_stage(
        spark, extract_triples(chunk_repo_files(corpus)), alias, full_dir)
    for n in GRAPH_TABLE_DIRS:
        assert _table_rows(spark, out, n) == _table_rows(spark, full_dir, n)
