"""Corpus source readers and sinks (SURVEY.md §2.1).

Reference semantics reproduced:
- S1 ObliQA scan (``deep_reason/utils.py:191-204``): directory of JSON
  record files, each record (Passage, PassageID, DocumentID, ID) → Chunk
  rows; ``order_id`` = record index within its file;
- S2 books_mx scan (``deep_reason/utils.py:206-221``): nested
  ``_source.paragraph`` + ``_source.metadata.{file_name,chapter,idx}``;
  ``order_id`` resets whenever the file_name changes (i.e. dense index per
  file_name in record order);
- S7/S8 sinks: partitioned-table writes replacing the single-JSON /
  JSONL-append outputs (``kg_agent/agent.py:222-229``;
  ``rag/pipeline.py:669-682``) — idempotent per-partition, resumable;
- S13 CSV export (``scripts/es_to_csv.sh``): plain ``df.write.csv``.

Spark-first: order within a file is recovered with a window over an
explicit per-file record index captured AT READ TIME — JSON record order is
only meaningful within one file, so the window key is the file, matching
the reference's per-file enumeration. Entirely JVM-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

OBLIQA_SCHEMA = "DocumentID bigint, PassageID string, Passage string, ID string"

BOOKS_MX_SCHEMA = (
    "_source struct<paragraph: string, "
    "metadata: struct<file_name: string, chapter: string, idx: string>>"
)

CHUNK_SCHEMA_COLS = ["text", "chapter_name", "document_id", "order_id"]


def read_obliqa(spark: SparkSession, obliqa_dir: str,
                file_idx: list[int] | None = None) -> DataFrame:
    """ObliQA dir → chunks(text, chapter_name, document_id, order_id).

    order_id enumerates records per source FILE in record order (the
    reference's ``ix`` of the per-file iteration, utils.py:197-203)."""
    paths = (
        [os.path.join(obliqa_dir, f"{i}.json") for i in file_idx]
        if file_idx is not None else [obliqa_dir]
    )
    raw = (
        spark.read.schema(OBLIQA_SCHEMA)
        .option("multiLine", "true")
        .json(paths)
        .select(
            "*",
            F.input_file_name().alias("_file"),
            F.monotonically_increasing_id().alias("_seq"),
        )
    )
    w = Window.partitionBy("_file").orderBy("_seq")
    return raw.select(
        F.col("Passage").alias("text"),
        F.col("PassageID").cast("string").alias("chapter_name"),
        F.col("DocumentID").cast("string").alias("document_id"),
        (F.row_number().over(w) - 1).cast("int").alias("order_id"),
    )


def read_books_mx(spark: SparkSession, path: str) -> DataFrame:
    """books_mx JSON → chunks; order_id is dense per file_name in record
    order (the reference resets its counter on file_name change,
    utils.py:211-216 — equivalent to per-file_name enumeration when records
    of one file are contiguous, which the loader assumes)."""
    raw = (
        spark.read.schema(BOOKS_MX_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .select(
            F.col("_source.paragraph").alias("text"),
            F.col("_source.metadata.chapter").cast("string").alias("chapter_name"),
            F.col("_source.metadata.idx").cast("string").alias("document_id"),
            F.col("_source.metadata.file_name").alias("_fname"),
            F.monotonically_increasing_id().alias("_seq"),
        )
    )
    w = Window.partitionBy("_fname").orderBy("_seq")
    return raw.select(
        *CHUNK_SCHEMA_COLS[:3],
        (F.row_number().over(w) - 1).cast("int").alias("order_id"),
    )


def chunks_to_repo_files(chunks: DataFrame, repo: str = "corpus") -> DataFrame:
    """Adapt externally-loaded chunk rows to the pipeline's repo_files
    contract (repo, path, commit, lang, content): one file per document,
    paragraphs joined with blank lines — the chunker's exact inverse, so
    chunk boundaries and order survive a round trip."""
    per_doc = (
        chunks.groupBy("document_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("order_id", F.col("text").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                "\n\n",
            ).alias("content")
        )
    )
    return per_doc.select(
        F.lit(repo).alias("repo"),
        F.concat(F.lit("doc/"), F.col("document_id")).alias("path"),
        F.sha2(F.concat_ws("@", F.lit(repo), "document_id"), 256).substr(1, 40)
        .alias("commit"),
        F.lit("txt").alias("lang"),
        "content",
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """S8: one JSON line per row, append-as-completed (the reference's
    JSONL answer cache, rag/pipeline.py:669-682)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.schema(schema).json(path)
    except Exception:
        return spark.createDataFrame([], schema)


def export_csv(df: DataFrame, path: str) -> None:
    """S13: ES→CSV export analogue."""
    df.write.mode("overwrite").option("header", "true").csv(path)
