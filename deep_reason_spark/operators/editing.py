"""Knowledge-editing dataset conversion (SURVEY.md P6/P8).

Reference semantics reproduced (deep-reason
``examples/dataset_conversion.py:30-90``):
- explode single-or-list ``knowledge_editing_input`` payloads, dropping
  null/empty ones (:36-45);
- lowercase ``prompt`` and ``subject`` (:48-52);
- DROP rows whose subject is not a substring of the prompt (:54-57, the P6
  filter);
- rename portability/locality sub-fields: ``logical_generalization`` →
  ``Local_Generalization`` (always a list), ``reasoning`` → ``Reasoning``,
  ``subject_aliasing`` → ``Subject_Aliasing``, ``relation_specificity`` →
  ``Relation_Specificity`` (:59-82, the P8 reshape).

Input contract: one row per agent result with
``knowledge_editing_input array<struct<prompt, subject, target_new,
portability struct<logical_generalization array<string>, reasoning string,
subject_aliasing string>, locality struct<relation_specificity string>>>``.
Entirely JVM-side (explode + filters + struct rebuild): no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDITING_INPUT_SCHEMA = (
    "array<struct<prompt: string, subject: string, target_new: string, "
    "portability: struct<logical_generalization: array<string>, "
    "reasoning: string, subject_aliasing: string>, "
    "locality: struct<relation_specificity: string>>>"
)


def convert_to_editing_dataset(results: DataFrame,
                               input_col: str = "knowledge_editing_input") -> DataFrame:
    """agent results → flat editing-dataset rows (one per editing input)."""
    # The reference keeps observations lacking a prompt — it only skips
    # null/empty editing inputs (dataset_conversion.py:36-45); rows without
    # a prompt flow through with prompt=NULL.
    exploded = (
        results.where(F.col(input_col).isNotNull())
        .select(F.explode(input_col).alias("obs"))
        .where(F.col("obs").isNotNull())
    )
    lowered = exploded.select(
        F.lower(F.col("obs.prompt")).alias("prompt"),
        F.lower(F.col("obs.subject")).alias("subject"),
        F.col("obs.target_new").alias("target_new"),
        F.col("obs.portability").alias("_port"),
        F.col("obs.locality").alias("_loc"),
    )
    # P6: subject-in-prompt filter applies ONLY when both fields are present
    # (dataset_conversion.py:54-57); a missing prompt or subject passes.
    filtered = lowered.where(
        F.col("subject").isNull()
        | F.col("prompt").isNull()
        | F.col("prompt").contains(F.col("subject"))
    )
    # P8: field renames inside the nested structs (:59-82)
    return filtered.select(
        "prompt", "subject", "target_new",
        F.struct(
            F.coalesce(F.col("_port.logical_generalization"), F.array())
            .alias("Local_Generalization"),
            F.col("_port.reasoning").alias("Reasoning"),
            F.col("_port.subject_aliasing").alias("Subject_Aliasing"),
        ).alias("portability"),
        F.struct(
            F.col("_loc.relation_specificity").alias("Relation_Specificity"),
        ).alias("locality"),
    )
