"""Streaming KG maintenance — a document stream folded through
``stream_maintain_kg`` must leave the stored graph identical to a full
``run_graph_stage`` rebuild over the whole corpus, stay exactly-once across
restarts, and treat replayed (already-applied) micro-batches as no-ops
(the incremental fold is NOT idempotent — weights sum — so the marker
guard, not a re-run, carries the guarantee)."""

from __future__ import annotations

import os
import shutil

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

    # wipe the streaming checkpoint → the next run replays everything as
    # batch 0 over the same files; the marker guard must make the replay a
    # NO-OP (a re-fold would double every summed edge weight)
    shutil.rmtree(os.path.join(kg_dir, "_kg_checkpoint"))
    q4 = stream_maintain_kg(spark, corpus_dir, kg_dir, alias_dict)
    q4.awaitTermination(300)
    assert open(os.path.join(kg_dir, "_applied_batch")).read() == marker_before
    for name in GRAPH_TABLE_DIRS:
        assert _table_rows(spark, kg_dir, name) == after_waves[name], (
            f"replayed batch mutated table {name}")
