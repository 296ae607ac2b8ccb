"""Deterministic synthetic `repo_files` corpus + golden triples.

Implements FIXTURES.md F1/F2/F4: an Iceberg/parquet-shaped table
``(repo, path, commit, lang, content)`` whose text contains plantable
entity mentions drawn from ``vocab.py``, plus the golden
``expected_triples`` the extractor must recover at P/R ≥ 0.95.

Everything is derived from ``vocab.det_int`` (md5 of stable keys) — no RNG
state, so generation is reproducible across processes, partitions, and
Spark re-runs (the determinism property the reference gets from its md5
cache keys, deep-reason ``kg_agent/utils.py:101-114``).

Scale design: generation itself is a ``mapInPandas`` over ``spark.range``,
so fixture corpora of any size are produced distributed — there is no
driver-side materialization.

Skew (FIXTURES.md F1): repo index 0 receives ~10× the files of any other
repo, and the hub entity (vocab.HUB_ENTITY) appears in ~30% of fact
sentences — exercising the salted hot-predicate aggregation and hub-aware
connected-components paths.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from deep_reason_spark import vocab
from deep_reason_spark.vocab import (
    COMPLEX_PREDICATE,
    FILLER_SENTENCES,
    HUB_ENTITY,
    PEOPLE,
    POOLS,
    ROLES,
    SIMPLE_PREDICATES,
    det_int,
)

REPO_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"
GOLDEN_SCHEMA = (
    "subject string, predicate string, object string, "
    "document_id string, order_id int, content_sha256 string"
)

_LANGS = ["py", "md", "rs", "java", "txt"]
_PREDS = sorted(SIMPLE_PREDICATES)

# Synthetic entity names for the entity-GROWTH corpus regime. The base
# vocab saturates at ~1,080 entities, so at large n_files EVERY update
# batch touches every entity — the adversarial worst case for incremental
# maintenance (VERDICT r4 noted the routed passthrough moves ~0 rows
# there). Real web corpora grow entities with the corpus AND distribute
# them long-tail: a new document introduces a few entities of its own and
# links them to entities of nearby documents — it does not sample the
# whole catalog uniformly (uniform draws make every batch touch every
# entity, which is just the saturated regime again). `extra_entities`
# models that: half of the simple facts draw their SUBJECT from the
# file's own 8-id neighborhood and their OBJECT from its own or the next
# file's, over a generated pool of `extra_entities` names (pass
# 8 × n_files so the per-file neighborhoods tile the pool; a 10%-file
# batch then touches ~15% of the catalog — sparse). Names are letters-only
# capitalized pairs (they must match extractor.ENTITY_RE) and injective in
# k below 64,000,000.
_SYL = ["zor", "vek", "mul", "tar", "quo", "fen", "rish", "bal", "nog",
        "wex", "pim", "dru", "sav", "kol", "yen", "gar", "hax", "lom",
        "tiv", "ruz"]


def synth_entity(k: int) -> str:
    a = _SYL[k % 20] + _SYL[(k // 20) % 20] + _SYL[(k // 400) % 20]
    b = (_SYL[(k // 8000) % 20] + _SYL[(k // 160_000) % 20]
         + _SYL[(k // 3_200_000) % 20])
    return f"{a.capitalize()} {b.capitalize()}"


def _repo_for(file_id: int, n_repos: int) -> int:
    """Weighted repo assignment: repo 0 has weight 10, others weight 1."""
    total = n_repos - 1 + 10
    idx = det_int("repo-assign", file_id) % total
    return 0 if idx < 10 else idx - 9


def _pick(pool: list[str], *key: object) -> str:
    return pool[det_int(*key) % len(pool)]


def _build_file(
    file_id: int, n_files: int, extra_entities: int = 0,
) -> tuple[dict[str, Any], list[dict[str, Any]]]:
    """Pure function: file_id → (repo_files row, golden triple rows).
    ``extra_entities=0`` keeps the byte-stable base corpus; a positive
    value reroutes half of the simple facts to the growing synthetic
    entity pool (see ``synth_entity``)."""
    n_repos = max(2, n_files // 20)
    r = _repo_for(file_id, n_repos)
    repo = f"org{r % 7}/proj{r}"
    lang = _LANGS[det_int("lang", file_id) % len(_LANGS)]
    path = f"src/mod{det_int('mod', file_id) % 9}/file{file_id}.{lang}"
    commit_src = hashlib.md5(f"{repo}@{file_id}".encode()).hexdigest()
    commit = (commit_src + commit_src)[:40]

    # ~1% of files are empty (chunker edge case); they emit no triples.
    if det_int("empty", file_id) % 97 == 0:
        row = {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": ""}
        return row, []

    document_id = f"{repo}:{path}"
    # ~3 KB/file (source-file scale): 3-10 paragraphs × 4-10 sentences,
    # except a band of small files (1-2 paragraphs) for edge-case coverage
    small = det_int("small", file_id) % 10 == 0
    n_par = (1 + det_int("npar", file_id) % 2) if small \
        else (3 + det_int("npar", file_id) % 8)
    paragraphs: list[str] = []
    triples: list[dict[str, Any]] = []
    # person first-token -> (canonical, paragraph index of last FULL mention)
    full_mentions: dict[str, tuple[str, int]] = {}

    for p in range(n_par):
        n_sent = (1 + det_int("nsent", file_id, p) % 2) if small \
            else (4 + det_int("nsent", file_id, p) % 7)
        sentences: list[str] = []
        for s in range(n_sent):
            kind = det_int("kind", file_id, p, s) % 10
            if (kind < 7 and extra_entities
                    and det_int("sgrow", file_id, p, s) % 2 == 0):
                # entity-growth fact: long-tail locality — subject from the
                # file's own 8-id neighborhood, object from its own or the
                # next file's (cross-document edges without uniform
                # whole-catalog sampling)
                pred = _PREDS[det_int("pred", file_id, p, s) % len(_PREDS)]
                subj = synth_entity(
                    (8 * file_id + det_int("ssub", file_id, p, s) % 8)
                    % extra_entities)
                nbr = (file_id + det_int("snbr", file_id, p, s) % 2) % n_files
                obj = synth_entity(
                    (8 * nbr + det_int("sobj", file_id, p, s) % 8)
                    % extra_entities)
                if subj == obj:
                    obj = synth_entity(
                        (8 * nbr + (det_int("sobj", file_id, p, s) + 1) % 8)
                        % extra_entities)
                sentences.append(f"{subj} {pred} {obj}.")
                triples.append({"subject": subj, "predicate": pred, "object": obj,
                                "document_id": document_id, "order_id": p})
            elif kind < 7:  # simple fact
                pred = _PREDS[det_int("pred", file_id, p, s) % len(_PREDS)]
                spool, opool = SIMPLE_PREDICATES[pred]
                subj = _pick(POOLS[spool], "subj", file_id, p, s)
                obj = _pick(POOLS[opool], "obj", file_id, p, s)
                # hub-entity skew: ~30% of project-object facts hit the hub
                if opool == "PROJECTS" and det_int("hub", file_id, p, s) % 10 < 3:
                    obj = HUB_ENTITY
                if subj == obj:
                    obj = POOLS[opool][(POOLS[opool].index(obj) + 1) % len(POOLS[opool])]
                surface_subj = _maybe_alias(subj, spool, full_mentions, p, file_id, p, s, "s")
                surface_obj = _maybe_alias(obj, opool, full_mentions, p, file_id, p, s, "o")
                sentences.append(f"{surface_subj} {pred} {surface_obj}.")
                triples.append({"subject": subj, "predicate": pred, "object": obj,
                                "document_id": document_id, "order_id": p})
                _note_full(surface_subj, subj, spool, full_mentions, p)
                _note_full(surface_obj, obj, opool, full_mentions, p)
            elif kind < 8:  # complex fact → split into two triples
                subj = _pick(PEOPLE, "csubj", file_id, p, s)
                role = ROLES[det_int("role", file_id, p, s) % len(ROLES)]
                org = _pick(POOLS["ORGS"], "corg", file_id, p, s)
                phrase = COMPLEX_PREDICATE.format(role=role)
                sentences.append(f"{subj} {phrase} {org}.")
                triples.append({"subject": subj, "predicate": "position", "object": role,
                                "document_id": document_id, "order_id": p})
                triples.append({"subject": subj, "predicate": "works at", "object": org,
                                "document_id": document_id, "order_id": p})
                _note_full(subj, subj, "PEOPLE", full_mentions, p)
            else:  # filler: zero triples expected
                sentences.append(
                    FILLER_SENTENCES[det_int("fill", file_id, p, s) % len(FILLER_SENTENCES)] + "."
                )
        paragraphs.append(" ".join(sentences))

    content = "\n\n".join(paragraphs)
    sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
    for t in triples:
        t["content_sha256"] = sha
    row = {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
    return row, triples


def _maybe_alias(
    canonical: str,
    pool: str,
    full_mentions: dict[str, tuple[str, int]],
    par: int,
    *key: object,
) -> str:
    """Use the short alias ("Ada" for "Ada Lovelace") only if the full name
    was written in this or the previous paragraph — the window within which
    the extractor's most-complete-identifier rule must resolve it
    (kg_prompts.py:25,42; context window = chunk + left neighbor)."""
    if pool != "PEOPLE":
        return canonical
    first = canonical.split(" ")[0]
    prev = full_mentions.get(first)
    if prev and prev[0] == canonical and par - prev[1] <= 1 and det_int("alias", *key) % 4 == 0:
        return first
    return canonical


def _note_full(surface: str, canonical: str, pool: str,
               full_mentions: dict[str, tuple[str, int]], par: int) -> None:
    if pool == "PEOPLE" and surface == canonical:
        full_mentions[canonical.split(" ")[0]] = (canonical, par)


# ---------------------------------------------------------------------------
# Spark-side distributed generation
# ---------------------------------------------------------------------------

def generate_repo_files(spark, n_files: int, partitions: int | None = None,
                        extra_entities: int = 0):
    """Distributed deterministic corpus: spark.range → mapInPandas."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_build_file(int(i), n_files, extra_entities)[0]
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    rng = spark.range(n_files, numPartitions=partitions or max(8, n_files // 2000))
    return rng.mapInPandas(gen, REPO_FILES_SCHEMA)


def generate_golden_triples(spark, n_files: int, partitions: int | None = None,
                            extra_entities: int = 0):
    """Golden expected_triples table (FIXTURES.md F4), same derivation."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["subject", "predicate", "object", "document_id", "order_id", "content_sha256"]
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for i in pdf["id"]:
                rows.extend(_build_file(int(i), n_files, extra_entities)[1])
            yield pd.DataFrame(rows, columns=cols)

    rng = spark.range(n_files, numPartitions=partitions or max(8, n_files // 2000))
    return rng.mapInPandas(gen, GOLDEN_SCHEMA)


def alias_dict_df(spark):
    """Broadcast-side alias dictionary (FIXTURES.md F3)."""
    return spark.createDataFrame(
        vocab.alias_rows(), "alias string, entity_id string, canonical_name string, prior double"
    )


def entity_types_df(spark):
    """(entity_id, type) typing dictionary for ontology construction."""
    return spark.createDataFrame(
        vocab.entity_type_rows(), "entity_id string, type string"
    )
