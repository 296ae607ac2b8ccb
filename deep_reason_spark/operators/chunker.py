"""Chunker — corpus → ordered chunk rows with neighbor context.

Reference semantics reproduced (SURVEY.md §2.5 W1/W2):
- chunk identity/order is ``(document_id, order_id)``
  (deep-reason ``kg_agent/chains.py:339,390``);
- each chunk carries its left/right neighbor *within the same document*
  (``kg_agent/schemes.py:8-13``, built at ``kg_agent/chains.py:345-356``);
- per-row invariant: ``sha256(content)`` of the originating file is carried
  through every downstream row (BASELINE.json input_hint; the reference
  keys its cache on a content hash, ``kg_agent/utils.py:101-114``).

Spark-first design — ZERO-SHUFFLE chunking: a document is one input row, so
its ordered chunk list and every chunk's left/right neighbor are derived
*inside the row* with array expressions (split → per-paragraph oversize
slicing → flatten → posexplode, neighbors via try_element_at). No window,
no shuffle, no partition-boundary hazard (SURVEY.md §7 hard-part (c) is
eliminated rather than guarded). At 10^12 files the stage is a pure map
over the file scan; the only shuffle in the whole extraction path is the
optional up-front repartition that aligns tasks with checkpoint buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Paragraph separator: blank line. The reference's corpus loaders treat one
# JSON record as one chunk (deep_reason/utils.py:191-221); our engine owns
# the inverse step (file content → chunks), per SURVEY.md §7 step 2.
#
# This string is interpolated into a Spark SQL string LITERAL, which applies
# its own backslash unescaping before the regex engine sees it — so every
# regex backslash must be doubled here (like extractor._SENT_SPLIT_SQL).
# With single backslashes the literal '\n\s*\n' unescapes to newline+'s*'+
# newline: lines of 's' characters get eaten as separators (ADVICE r1, high).
PARAGRAPH_SEP = r"\\n\\s*\\n"

CHUNK_COLUMNS = [
    "document_id", "order_id", "chapter_name", "text", "left_text", "right_text",
    "repo", "path", "commit", "lang", "content_sha256",
]


def _pieces_expr(max_chunk_chars: int) -> str:
    """SQL expression: content → ordered array of chunk texts.

    Paragraph split, empties dropped, oversized paragraphs hard-split into
    ≤ max_chunk_chars slices (the reference baseline truncates at its
    20 000-char merge cap, ``baseline/langchain_baseline.py:53``; we split
    losslessly instead).

    A paragraph is kept iff it contains a non-whitespace character
    (``rlike '\\S'`` — ``trim()`` strips only ASCII spaces, so a tab-only
    "paragraph" would survive it; fuzz-tested)."""
    return f"""
    flatten(transform(
      filter(split(content, '{PARAGRAPH_SEP}'), p -> p rlike '\\\\S'),
      p -> transform(
             sequence(0, cast(ceil(length(p) / {max_chunk_chars}.0) as int) - 1),
             i -> substring(p, i * {max_chunk_chars} + 1, {max_chunk_chars}))
    ))
    """


def chunk_repo_files(
    repo_files: DataFrame,
    max_chunk_chars: int = 20000,
) -> DataFrame:
    """repo_files(repo, path, commit, lang, content) → chunks (FIXTURES.md F2).

    Shuffle-free: callers that want bucket-aligned output repartition the
    *input* (one shuffle of raw files) and this stage preserves it."""
    df = repo_files.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    with_pieces = df.select(
        "repo", "path", "commit", "lang", "content_sha256",
        F.concat_ws(":", "repo", "path").alias("document_id"),
        F.try_element_at(F.split(F.col("path"), "/"), F.lit(-2)).alias("chapter_name"),
        F.expr(_pieces_expr(max_chunk_chars)).alias("_pieces"),
    )
    exploded = with_pieces.select(
        "*", F.posexplode("_pieces").alias("order_id", "text")
    )
    return exploded.select(
        "document_id",
        F.col("order_id").cast("int").alias("order_id"),
        "chapter_name",
        "text",
        # neighbors are intra-row lookups (1-based try_element_at; index 0
        # is invalid even for the try_ variant, hence the guard)
        F.expr(
            "CASE WHEN order_id >= 1 THEN try_element_at(_pieces, order_id) END"
        ).alias("left_text"),
        F.expr("try_element_at(_pieces, order_id + 2)").alias("right_text"),
        "repo", "path", "commit", "lang", "content_sha256",
    )
