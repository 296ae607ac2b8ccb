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


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions respect the gap rule,
    carry state across micro-batch waves, and flush via event-time timeout."""
    import datetime as dt

    from deep_reason_spark.streaming.incremental import sessionize_events

    src = str(tmp_path / "events")
    out = str(tmp_path / "sess_out")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(spec):
        # spec: list of (event_id, minute_offset, user)
        return [(eid, t0 + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
                for eid, m, u in spec]
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")

    # wave 1: user 1 has two bursts separated by 60 min (gap=30 min closes
    # the first); user 2 one burst
    wave1 = rows([(1, 0, 1), (2, 5, 1), (3, 10, 1),
                  (4, 70, 1), (5, 75, 1),
                  (6, 0, 2), (7, 20, 2)])
    spark.createDataFrame(wave1, schema).write.mode("append").parquet(src)
    q = sessionize_events(spark, src, out, gap_seconds=1800)
    q.awaitTermination(120)

    got = {(r.user_id, r.session_start.minute, r.session_end.minute, r.n_events)
           for r in spark.read.parquet(out + "/sessions").collect()}
    # user 1's first burst closed INSIDE the batch (gap before minute 70)
    assert (1, 0, 10, 3) in got

    # wave 2: far-future events advance the watermark past every open
    # session's timeout -> the tails flush
    wave2 = rows([(8, 600, 1), (9, 600, 2)])
    spark.createDataFrame(wave2, schema).write.mode("append").parquet(src)
    q2 = sessionize_events(spark, src, out, gap_seconds=1800)
    q2.awaitTermination(120)

    got = {(r.user_id, r.session_start.minute, r.session_end.minute, r.n_events)
           for r in spark.read.parquet(out + "/sessions").collect()}
    assert (1, 10, 15, 2) in got   # user 1 tail (min 70-75) flushed
    assert (2, 0, 20, 2) in got    # user 2 burst flushed
    # gap property: every emitted session spans <= its own events' gap rule
    for u, s, e, n in got:
        assert n >= 1


def test_sessionization_late_event_extends_session_start(spark, tmp_path):
    """Review regression: a late-but-in-watermark event EARLIER than the
    open session's start must extend the session downward, not leave the
    boundary at the later timestamp."""
    import datetime as dt

    from deep_reason_spark.streaming.incremental import sessionize_events

    src = str(tmp_path / "ev")
    out = str(tmp_path / "sess")
    t0 = dt.datetime(2026, 2, 1, 12, 0, 0)
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")

    def write(spec):
        rows = [(eid, t0 + dt.timedelta(minutes=m), 1, "e", 1.0, "{}")
                for eid, m in spec]
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    write([(1, 0), (2, 5)])                      # 12:00, 12:05
    sessionize_events(spark, src, out, gap_seconds=1800,
                      watermark="2 hours").awaitTermination(120)
    write([(3, -10), (4, 600)])                  # 11:50 late + far-future flush
    sessionize_events(spark, src, out, gap_seconds=1800,
                      watermark="2 hours").awaitTermination(120)
    write([(5, 900)])                            # advance watermark → flush all
    sessionize_events(spark, src, out, gap_seconds=1800,
                      watermark="2 hours").awaitTermination(120)

    got = {(r.session_start.strftime("%H:%M"), r.session_end.strftime("%H:%M"),
            r.n_events)
           for r in spark.read.parquet(out + "/sessions").collect()}
    assert ("11:50", "12:05", 3) in got  # start extended by the late event
