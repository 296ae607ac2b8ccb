"""Streaming facade tests — incremental extraction equals the batch run;
exactly-once across restarts; watermarked window aggregation."""

from __future__ import annotations

import os

from deep_reason_spark.datagen import generate_repo_files
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples
from deep_reason_spark.streaming.incremental import (
    stream_extract_triples,
    windowed_event_counts,
)

KEY = ["subject", "predicate", "object", "document_id", "order_id"]


def test_incremental_equals_batch_and_exactly_once(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")

    full = generate_repo_files(spark, 60).localCheckpoint()
    wave1 = full.limit(30)
    wave1.write.mode("append").parquet(corpus_dir)
    q = stream_extract_triples(spark, corpus_dir, out_dir)
    q.awaitTermination(120)

    # second wave arrives; SAME checkpoint → only new files processed
    full.exceptAll(wave1).write.mode("append").parquet(corpus_dir)
    q2 = stream_extract_triples(spark, corpus_dir, out_dir)
    q2.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "triples")).select(*KEY)
    batch = extract_triples(chunk_repo_files(full)).select(*KEY)
    assert streamed.count() == batch.count()  # exactly-once, no dup waves
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # third run with nothing new appends nothing
    q3 = stream_extract_triples(spark, corpus_dir, out_dir)
    q3.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_dir, "triples")).count() == batch.count()


def test_replayed_batch_replaces_not_appends(spark, tmp_path):
    """A micro-batch replayed from the checkpoint (here: a wiped checkpoint
    re-runs batch 0 over the same files) must REPLACE its output partition,
    not append a duplicate — the dynamic-partition-overwrite sink contract
    (ADVICE r1: blind append was only at-least-once)."""
    import shutil

    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    files = generate_repo_files(spark, 40).localCheckpoint()
    files.write.mode("append").parquet(corpus_dir)

    q = stream_extract_triples(spark, corpus_dir, out_dir)
    q.awaitTermination(120)
    n_first = spark.read.parquet(os.path.join(out_dir, "triples")).count()

    # wipe the checkpoint → the next run re-processes everything as batch 0,
    # exactly like a replay after a mid-write failure
    shutil.rmtree(os.path.join(out_dir, "_stream_checkpoint"))
    q2 = stream_extract_triples(spark, corpus_dir, out_dir)
    q2.awaitTermination(120)
    n_replayed = spark.read.parquet(os.path.join(out_dir, "triples")).count()
    assert n_replayed == n_first  # replaced, not duplicated


def test_windowed_event_counts(spark, tmp_path):
    events_dir = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "wm")
    # use the driver's events table as the arriving stream
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{events_dir}/events.parquet").write.parquet(src)
    q = windowed_event_counts(spark, src, out_dir)
    q.awaitTermination(120)
    out = spark.read.parquet(os.path.join(out_dir, "event_counts"))
    # append mode emits only watermark-closed windows; availableNow leaves
    # the last open window in state — some rows must still have flushed
    assert set(out.columns) == {"window_start", "event_type", "n", "total_value"}
