"""Public extraction vocabulary — the deterministic analogue of the
reference's TRIPLETS_PROMPT contract (deep-reason ``prompts/kg_prompts.py:7-49``).

The reference defines extraction behaviorally through an LLM prompt: break
complex facts into simple triples, keep triples ≤ 7 words, subject/object
atomic, never emit 'none' entities, and always use the most complete
identifier for an entity ("John Doe", not "Joe"/"he").

Our engine makes that contract *deterministic*: entities are capitalized
token sequences, relations come from a fixed predicate vocabulary, and the
complex-fact split + alias→canonical resolution are explicit rules. The
synthetic corpus generator (``datagen.py``) and the extractor
(``operators/extractor.py``) both import THIS module and nothing from each
other, so P/R ≥ 0.95 on fixtures is a real measurement of the extractor,
not a tautology.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# Entities. Canonical identifiers are 1+ capitalized tokens; multi-token
# names have single-token alias forms (first token), exercising the
# "most complete identifier" consistency rule (kg_prompts.py:25,42).
# ---------------------------------------------------------------------------

PEOPLE = [
    "Ada Lovelace",
    "Alan Turing",
    "Grace Hopper",
    "Edsger Dijkstra",
    "Donald Knuth",
    "Barbara Liskov",
    "Margaret Hamilton",
    "John Mccarthy",
    "Frances Allen",
    "Tony Hoare",
]

_ORG_A = [
    "Acme", "Globex", "Initech", "Umbrella", "Hooli", "Vandelay", "Wayne",
    "Stark", "Tyrell", "Cyberdyne", "Wonka", "Soylent", "Oscorp", "Gringotts",
    "Monarch", "Aperture", "Rekall", "Weyland", "Zorin", "Duff",
]
_ORG_B = ["Labs", "Corp", "Systems", "Works", "Research", "Industries",
          "Enterprises", "Holdings", "Partners", "Group"]
ORGS = [f"{a} {b}" for a in _ORG_A for b in _ORG_B[:3]]  # 60 unique names

# Projects: a generated two-token name space (25 × 40 = 1000 names + the
# curated ones) so synthetic graphs have realistic entity cardinality —
# with a handful of entities every edge aggregate degenerates into one
# giant hot group, which is neither realistic nor a fair benchmark.
_PROJ_A = [
    "Query", "Vector", "Stream", "Graph", "Parser", "Cache", "Build", "Data",
    "Shuffle", "Metrics", "Index", "Lexer", "Planner", "Storage", "Compute",
    "Session", "Schema", "Token", "Buffer", "Batch", "Merge", "Columnar",
    "Adaptive", "Lineage", "Catalog",
]
_PROJ_B = [
    "Engine", "Store", "Router", "Kernel", "Toolkit", "Layer", "System",
    "Plane", "Service", "Agent", "Runtime", "Manager", "Daemon", "Worker",
    "Bridge", "Gateway", "Fabric", "Mesh", "Core", "Stack", "Pipeline",
    "Registry", "Broker", "Scheduler", "Optimizer", "Compiler", "Tracker",
    "Monitor", "Balancer", "Resolver", "Executor", "Allocator", "Encoder",
    "Decoder", "Sampler", "Profiler", "Validator", "Formatter", "Loader",
    "Writer",
]
PROJECTS = [f"{a} {b}" for a in _PROJ_A for b in _PROJ_B]  # 1000 names;
# "Query Engine" (index 0) is the planted HUB entity (skew path, F1)

PLACES = [
    "London",
    "Geneva",
    "Budapest",
    "Kyoto",
    "Oslo",
    "Toronto",
]

HUB_ENTITY = "Query Engine"

ALL_ENTITIES = PEOPLE + ORGS + PROJECTS + PLACES

ROLES = ["engineer", "researcher", "architect", "analyst"]

# ---------------------------------------------------------------------------
# Predicate vocabulary. Simple templates yield exactly one triple; the
# COMPLEX template yields two (the prompt's mandated split of
# "John, position, engineer in Google" → position + work-at,
# kg_prompts.py:21).
# ---------------------------------------------------------------------------

# predicate -> (subject pool name, object pool name)
SIMPLE_PREDICATES: dict[str, tuple[str, str]] = {
    "developed": ("PEOPLE", "PROJECTS"),
    "maintains": ("PEOPLE", "PROJECTS"),
    "designed": ("PEOPLE", "PROJECTS"),
    "improved": ("PEOPLE", "PROJECTS"),
    "works at": ("PEOPLE", "ORGS"),
    "collaborates with": ("PEOPLE", "PEOPLE"),
    "was born in": ("PEOPLE", "PLACES"),
    "depends on": ("PROJECTS", "PROJECTS"),
    "is part of": ("PROJECTS", "ORGS"),
    "funds": ("ORGS", "PROJECTS"),
}

COMPLEX_PREDICATE = "is an {role} in"  # → (s, position, role) + (s, works at, org)

# All predicates the extractor may emit (ontology relation classes).
ALL_PREDICATES = sorted(SIMPLE_PREDICATES) + ["position"]

# Filler sentences: no capitalized entities → must yield zero triples
# (precision test). Lowercase on purpose.
FILLER_SENTENCES = [
    "the build completed without warnings",
    "all checks passed on the first attempt",
    "latency stayed flat during the rollout",
    "the cache hit rate improved slightly",
    "no regressions were observed in the logs",
    "the migration finished ahead of schedule",
]

POOLS = {"PEOPLE": PEOPLE, "ORGS": ORGS, "PROJECTS": PROJECTS, "PLACES": PLACES}


def entity_id(canonical_name: str) -> str:
    """Deterministic uuid-like id for a canonical entity (stable across runs,
    mirrors the uuid `id` column of entities.parquet, SURVEY.md §1.3)."""
    h = hashlib.md5(canonical_name.encode("utf-8")).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def det_int(*parts: object) -> int:
    """Deterministic 64-bit integer from parts — the engine's substitute for
    RNG state (stable across processes/partitions; datagen + tests only)."""
    key = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "big")


ENTITY_TYPES = {"PEOPLE": "person", "ORGS": "organization",
                "PROJECTS": "project", "PLACES": "place"}


def entity_type_rows() -> list[tuple[str, str]]:
    """(entity_id, type) rows — the typing dictionary for ontology
    construction (entity classes, kg_agent/schemes.py:25-27)."""
    rows: list[tuple[str, str]] = []
    for pool, tname in ENTITY_TYPES.items():
        for name in POOLS[pool]:
            rows.append((entity_id(name), tname))
    return rows


def alias_rows() -> list[tuple[str, str, str, float]]:
    """(alias, entity_id, canonical_name, prior) rows for the broadcast
    alias dictionary (FIXTURES.md F3). Includes: the canonical form itself,
    the single-token alias of every multi-token entity (ambiguous when two
    entities share a first token), and a lowercase variant."""
    rows: list[tuple[str, str, str, float]] = []
    for name in ALL_ENTITIES:
        eid = entity_id(name)
        rows.append((name, eid, name, 1.0))
        toks = name.split(" ")
        if len(toks) > 1:
            # first-token alias; prior < 1 so canonical wins ties
            rows.append((toks[0], eid, name, 0.6))
    return rows
