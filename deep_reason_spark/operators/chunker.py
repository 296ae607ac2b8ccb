"""Chunker — corpus → ordered chunk rows with neighbor context.

Reference semantics reproduced (SURVEY.md §2.5 W1/W2):
- chunk identity/order is ``(document_id, order_id)``
  (deep-reason ``kg_agent/chains.py:339,390``);
- each chunk carries its left/right neighbor *within the same document*
  (``kg_agent/schemes.py:8-13``, built at ``kg_agent/chains.py:345-356``);
- per-row invariant: ``sha256(content)`` of the originating file is carried
  through every downstream row (BASELINE.json input_hint; the reference
  keys its cache on a content hash, ``kg_agent/utils.py:101-114``).

Spark-first design: the whole stage is Catalyst-planned — a split +
posexplode (no Python), then ONE window over ``(document_id, order_id)``.
The input is explicitly repartitioned by ``repo`` first so (a) a repo's
files are co-located, (b) the window shuffle is the only shuffle, and
(c) partition checkpoints align with input slices (SURVEY.md §4 item 3).
At 10^12 files this stage is embarrassingly parallel: no driver state,
no skewed key (documents are the window key, and no document is large).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Paragraph separator: blank line. The reference's corpus loaders treat one
# JSON record as one chunk (deep_reason/utils.py:191-221); our engine owns
# the inverse step (file content → chunks), per SURVEY.md §7 step 2.
PARAGRAPH_SEP = r"\n\s*\n"

CHUNK_COLUMNS = [
    "document_id", "order_id", "chapter_name", "text", "left_text", "right_text",
    "repo", "path", "commit", "lang", "content_sha256",
]


def chunk_repo_files(
    repo_files: DataFrame,
    max_chunk_chars: int = 20000,
    repartition_by_repo: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """repo_files(repo, path, commit, lang, content) → chunks (FIXTURES.md F2).

    ``max_chunk_chars`` mirrors the reference baseline's 20 000-char merge
    cap (``baseline/langchain_baseline.py:53``): oversized paragraphs are
    hard-split so no single chunk exceeds the budget (the reference
    truncates; we keep the data and split, which is strictly lossless).
    """
    df = repo_files
    if repartition_by_repo:
        # Explicit co-location by repo hash (north rule). Spark's hash
        # partitioning on the column IS hash(repo) → pmod(numPartitions).
        df = df.repartition(*( [num_partitions] if num_partitions else [] ), "repo")

    df = df.withColumn("content_sha256", F.sha2(F.col("content"), 256))

    # paragraph split → ordered chunks; all JVM-side (split/posexplode),
    # then a second-level hard split of oversized paragraphs.
    para = df.select(
        "repo", "path", "commit", "lang", "content_sha256",
        F.concat_ws(":", "repo", "path").alias("document_id"),
        F.posexplode(F.split(F.col("content"), PARAGRAPH_SEP)).alias("para_id", "para"),
    ).where(F.length(F.trim(F.col("para"))) > 0)

    # hard-split long paragraphs into <= max_chunk_chars slices
    n_slices = F.greatest(
        F.lit(1), F.ceil(F.length("para") / F.lit(max_chunk_chars)).cast("int")
    )
    sliced = para.select(
        "repo", "path", "commit", "lang", "content_sha256", "document_id", "para_id",
        F.explode(F.sequence(F.lit(0), n_slices - 1)).alias("slice_id"),
        "para",
    ).withColumn(
        "text",
        F.expr(f"substring(para, slice_id * {max_chunk_chars} + 1, {max_chunk_chars})"),
    ).drop("para")

    w = Window.partitionBy("document_id").orderBy("para_id", "slice_id")
    chunks = (
        sliced
        .withColumn("order_id", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("left_text", F.lag("text", 1).over(w))
        .withColumn("right_text", F.lead("text", 1).over(w))
        .withColumn("chapter_name", F.try_element_at(F.split(F.col("path"), "/"), F.lit(-2)))
    )
    return chunks.select(*CHUNK_COLUMNS)
