"""Structured-Streaming facade over the batch pipeline.

The reference has NO streaming (SURVEY.md §2.9) — everything is batch with
JSONL/hash-cache resume. Our engine's primary resume story is therefore the
checkpointed-batch ledger (sources/checkpoint.py). This module adds the
streaming facade SURVEY.md §2.9 anticipates: the chunk→extract path is
expressed as ``readStream → foreachBatch(batch pipeline) → exactly-once
sink``, so a corpus that *arrives* incrementally (files landing in an
Iceberg/parquet location) is processed incrementally with Spark's own
checkpoint tracking which input files were consumed.

Also provides the watermarked event-time windowed aggregation a streaming
deployment of the metrics side would use (late data bounded by watermark).
Both run with ``trigger(availableNow=True)`` in tests — same code path as a
continuous deployment, minus the daemon.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deep_reason_spark.datagen import REPO_FILES_SCHEMA
from deep_reason_spark.operators.chunker import chunk_repo_files
from deep_reason_spark.operators.extractor import extract_triples


def stream_extract_triples(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
):
    """repo_files parquet dir (files arriving over time) → triples parquet,
    exactly-once per input file via the streaming checkpoint.

    foreachBatch reuses the SAME batch operators (chunker + extractor), so
    stream and batch runs produce identical rows for identical input."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint")
    stream = (
        spark.readStream.schema(REPO_FILES_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent sink: a blind append is only at-least-once (a batch that
        # fails after a partial write is replayed from the checkpoint and
        # duplicates rows). Partitioning by batch_id with DYNAMIC partition
        # overwrite makes the replay REPLACE its own partition — exactly-once
        # per micro-batch without touching other batches' output.
        triples = extract_triples(chunk_repo_files(batch_df)).withColumn(
            "batch_id", F.lit(batch_id)
        )
        (
            triples.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "triples"))
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Watermarked tumbling-window counts over an event stream — the
    standard late-data-bounded streaming aggregation, in append mode."""
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "event_counts"))
        .option("checkpointLocation", os.path.join(out_dir, "_wm_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
