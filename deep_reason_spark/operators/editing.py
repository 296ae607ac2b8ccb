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


def _collapsed_edits(edits: DataFrame, src: str, pred: str,
                     dst: str) -> DataFrame:
    """THE conflict-resolution rule, in one place: one edit per (subject,
    predicate) key, smallest target_new wins. apply_edits executes it and
    edit_metrics evaluates against it — they must never diverge."""
    return (
        edits.select(F.col(src).alias("_es"), F.col(pred).alias("_ep"),
                     F.col(dst).alias("_en"))
        .groupBy("_es", "_ep").agg(F.min("_en").alias("_en"))
    )


def apply_edits(
    edges: DataFrame,
    edits: DataFrame,
    src: str = "source",
    pred: str = "description",
    dst: str = "target",
) -> DataFrame:
    """KG-side knowledge-edit executor. The reference applies edits to
    MODEL WEIGHTS (``knowledge_editing/easy_edit/knowledge_editor.py`` —
    EasyEdit ROME/MEMIT surgery, out of a data engine's scope); the
    engine's graph analogue applies the same (subject, relation,
    target_new) edit records to the materialized edges table:

    - one edit per (subject, predicate) key — conflicting edit rows
      collapse deterministically to the smallest target_new;
    - an edit matching existing edges REWRITES their object
      (``edit_status = 'rewritten'``);
    - an edit matching nothing INSERTS a new edge (``'inserted'``);
    - every other edge passes through byte-identical (``'kept'``) — the
      reference's locality requirement (Relation_Specificity) holds by
      construction and is measured honestly by :func:`edit_metrics`.

    Scale shape: edits are a query-scale table → byte-gated broadcast
    against the edge-scale side; the pass-through never shuffles. Extra
    edge columns (weight, provenance, …) survive on kept/rewritten rows
    and are NULL on inserted rows."""
    from deep_reason_spark.functions.broadcast import broadcast_if_small

    # query-scale; pinned so it feeds the gate + both joins once
    e = _collapsed_edits(edits, src, pred, dst).localCheckpoint()
    joined = edges.join(
        broadcast_if_small(e),
        (F.col(src) == F.col("_es")) & (F.col(pred) == F.col("_ep")),
        "left",
    )
    updated = joined.select(
        *[c for c in edges.columns if c != dst],
        F.coalesce("_en", F.col(dst)).alias(dst),
        F.when(F.col("_en").isNotNull(), F.lit("rewritten"))
        .otherwise(F.lit("kept")).alias("edit_status"),
    )
    inserted = (
        e.join(edges.select(F.col(src).alias("_es"),
                            F.col(pred).alias("_ep")).distinct(),
               ["_es", "_ep"], "left_anti")
        .select(F.col("_es").alias(src), F.col("_ep").alias(pred),
                F.col("_en").alias(dst),
                F.lit("inserted").alias("edit_status"))
    )
    for c in edges.columns:
        if c not in (src, pred, dst):
            inserted = inserted.withColumn(c, F.lit(None))
    return updated.unionByName(inserted.select(*updated.columns))


def edit_metrics(
    edited: DataFrame,
    original: DataFrame,
    edits: DataFrame,
    src: str = "source",
    pred: str = "description",
    dst: str = "target",
) -> DataFrame:
    """One-row edit-evaluation summary in the reference's metric shape
    (EasyEdit reports rewrite_acc / locality on 0-1 scales;
    ``knowledge_editor.py`` collects them per edit):

    - ``rewrite_acc``: fraction of distinct edit keys whose (subject,
      predicate) now maps to target_new in the edited table;
    - ``locality_acc``: fraction of NON-edited original edges that
      survived byte-identical (measured against the original table, not
      assumed).

    Both computed distributed; rounded to 4 (parity rules)."""
    ekeys = _collapsed_edits(edits, src, pred, dst)
    hit = ekeys.join(
        edited.select(F.col(src).alias("_es"), F.col(pred).alias("_ep"),
                      F.col(dst).alias("_en")).distinct(),
        ["_es", "_ep", "_en"], "left_semi",
    )
    non_edited = original.join(
        ekeys.select(F.col("_es").alias(src), F.col("_ep").alias(pred)),
        [src, pred], "left_anti",
    ).select(src, pred, dst)
    surviving = non_edited.join(
        edited.select(src, pred, dst), [src, pred, dst], "left_semi")
    # one conditional aggregation over a tagged union — never a chain of
    # 1-row cross joins (the BNLJ shape the plan audits forbid)
    tagged = (
        ekeys.select(F.lit("edit").alias("_t"))
        .unionByName(hit.select(F.lit("hit").alias("_t")))
        .unionByName(non_edited.select(F.lit("non").alias("_t")))
        .unionByName(surviving.select(F.lit("ok").alias("_t")))
    )

    def _n(tag: str) -> F.Column:
        return F.sum(F.when(F.col("_t") == tag, 1).otherwise(0))

    return tagged.agg(
        _n("edit").alias("n_edits"),
        F.round(_n("hit") / _n("edit"), 4).alias("rewrite_acc"),
        _n("non").alias("n_non_edited"),
        F.round(_n("ok") / _n("non"), 4).alias("locality_acc"),
    )
