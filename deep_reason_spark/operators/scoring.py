"""Answer-quality scoring — deterministic analogue of the reference's 0-10
LLM judge (deep-reason ``scoring/answer_quality.py:8-59``).

The reference grades a generated answer against a reference answer and the
retrieval context on: (1) factual consistency with the context, (2) semantic
similarity to the reference answer, (3) completeness, (4) hallucinations
(folded into consistency here). The deterministic contract replaces the LLM
with token-overlap ratios on the same 0-10 scale:

- consistency  = |gen ∩ ctx| / |gen|      (tokens outside the context are
                                           treated as hallucinated)
- similarity   = |gen ∩ ref| / |gen ∪ ref| (Jaccard)
- completeness = |gen ∩ ref| / |ref|
- score        = round(10 · mean(the three), 4)

All set algebra is JVM-side (``array_intersect``/``array_union`` over
distinct token arrays) — per-row map work, no shuffle, no Python; scales as
a pure projection at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deep_reason_spark.operators.topics import TOKEN_SPLIT

# the ONE cross-engine tokenization contract (mirrored by every DuckDB
# oracle) — always reference TOKEN_SPLIT, never re-type the pattern
_TOKENS = (f"array_distinct(filter(split(lower({{col}}), '{TOKEN_SPLIT}'),"
           " w -> length(w) > 1))")


def _ratio(num: F.Column, den: F.Column) -> F.Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0))


def answer_quality(
    answers: DataFrame,
    gen_col: str = "generated_answer",
    ref_col: str = "real_answer",
    ctx_col: str = "context",
) -> DataFrame:
    """answers(+gen/ref/ctx string cols) → same rows + consistency,
    similarity, completeness, score (0-10, rounded to 4)."""
    with_sets = answers.withColumns({
        "_g": F.expr(_TOKENS.format(col=gen_col)),
        "_r": F.expr(_TOKENS.format(col=ref_col)),
        "_c": F.expr(_TOKENS.format(col=ctx_col)),
    })
    gc = F.size(F.array_intersect("_g", "_c"))
    gr = F.size(F.array_intersect("_g", "_r"))
    scored = with_sets.withColumns({
        "consistency": F.round(_ratio(gc, F.size("_g")), 4),
        "similarity": F.round(_ratio(gr, F.size(F.array_union("_g", "_r"))), 4),
        "completeness": F.round(_ratio(gr, F.size("_r")), 4),
    })
    return scored.withColumn(
        "score",
        F.round((F.col("consistency") + F.col("similarity")
                 + F.col("completeness")) * 10.0 / 3.0, 4),
    ).drop("_g", "_r", "_c")
