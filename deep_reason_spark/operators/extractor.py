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
    "document_id string, order_id int, repo string, content_sha256 string"
)
# provenance is (document_id = repo:path, order_id, content_sha256); path is
# embedded in document_id and the commit is recoverable by joining the
# repo_files table — carrying both on every triple row inflated the
# corpus-scale write by ~40% for zero information

MENTIONS_SCHEMA_COLS = ["mention", "document_id", "order_id", "repo",
                        "content_sha256"]


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
        sent = sent.strip(_ASCII_WS)
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


PROV_COLS = ["document_id", "order_id", "repo", "content_sha256"]
OUT_COLS = ["subject", "predicate", "object", *PROV_COLS]
# sentence-trim contract: exactly the Java \s class (ASCII), in BOTH
# engines — pandas .str.strip() and Python .strip() are unicode-aware and
# would diverge on \xa0-style exotic spaces (fuzz-tested)
_ASCII_WS = " \t\n\r\x0b\x0c"
_TRIM_RE = r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$"
_MULTI_ENT_SQL = r"([A-Z][a-z]+(?: [A-Z][a-z]+)+)"
_SENT_SPLIT_SQL = r"(?<=[.!?])\\s+"


def _extract_batch_vectorized(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-batch extraction with pandas C-level regex (str.extract):
    sentences and context entities arrive pre-split from the JVM; the only
    Python-level loops are over the (small) canon dictionaries and the
    minority of single-token names needing alias resolution."""
    import numpy as np

    n = len(pdf)
    sent_lists = pdf["sentences"].tolist()
    counts = np.fromiter((len(s) for s in sent_lists), dtype="int64", count=n)
    chunk_idx = np.repeat(np.arange(n), counts)
    flat = pd.Series(
        [s for lst in sent_lists for s in lst], dtype="object"
    ).str.strip(_ASCII_WS)

    simple = flat.str.extract(_SIMPLE)
    comp = flat.str.extract(_COMPLEX)
    m_simple = simple[0].notna().to_numpy()
    m_comp = (~m_simple) & comp[0].notna().to_numpy()

    # most-complete-identifier maps, one per chunk (left context first,
    # then the chunk's own multi-token mentions — later wins)
    canons: list[dict[str, str]] = []
    for left_ents, text_ents in zip(pdf["left_entities"], pdf["text_entities"]):
        c: dict[str, str] = {}
        for full in left_ents:
            c[full.split(" ", 1)[0]] = full
        for full in text_ents:
            c[full.split(" ", 1)[0]] = full
        canons.append(c)

    def resolve(names: np.ndarray, idx: np.ndarray) -> np.ndarray:
        out = names.copy()
        for i in range(len(out)):
            s = out[i]
            if " " not in s:
                out[i] = canons[idx[i]].get(s, s)
        return out

    rows_s: list[tuple] = []
    si = chunk_idx[m_simple]
    subs = resolve(simple[0].to_numpy()[m_simple], si)
    objs = resolve(simple[2].to_numpy()[m_simple], si)
    preds = simple[1].to_numpy()[m_simple]

    ci = chunk_idx[m_comp]
    csubs = resolve(comp[0].to_numpy()[m_comp], ci)
    roles = comp[1].to_numpy()[m_comp]
    orgs = resolve(comp[2].to_numpy()[m_comp], ci)

    # assemble: simple triples + the mandated complex split (2 rows each)
    all_subj = np.concatenate([subs, csubs, csubs])
    all_pred = np.concatenate([preds, np.full(len(ci), "position", dtype=object),
                               np.full(len(ci), "works at", dtype=object)])
    all_obj = np.concatenate([objs, roles, orgs])
    all_idx = np.concatenate([si, ci, ci])

    out = pd.DataFrame({"subject": all_subj, "predicate": all_pred,
                        "object": all_obj})
    # contract filters (kg_prompts.py:18,24): ≤7 words, no 'none' entities
    words = (out["subject"].str.count(" ") + out["predicate"].str.count(" ")
             + out["object"].str.count(" ") + 3)
    ok = (
        (words <= _MAX_TRIPLE_WORDS)
        & (out["subject"].str.lower() != "none")
        & (out["object"].str.lower() != "none")
    ).to_numpy()
    out = out[ok].copy()
    keep_idx = all_idx[ok]
    for c in PROV_COLS:
        out[c] = pdf[c].to_numpy()[keep_idx]
    out["order_id"] = out["order_id"].astype("int32")
    return out[OUT_COLS]


# ---------------------------------------------------------------------------
# JVM-native extraction path — the same deterministic contract expressed
# entirely in Catalyst (regexp per sentence + array lambdas for the
# most-complete-identifier rule). "UDFs are the slow path": the default
# engine path keeps the whole extraction inside whole-stage codegen with no
# Python workers; the mapInPandas path below remains the LLM-shaped batch
# interface (and the contract LLMExtractor plugs into).
# ---------------------------------------------------------------------------

def _simple_sql_pattern() -> str:
    import re as _re
    preds = sorted(vocab.SIMPLE_PREDICATES, key=len, reverse=True)
    alt = "|".join(_re.escape(p) for p in preds)
    # passed through the Python API (F.regexp_extract), which takes the
    # regex VERBATIM — single escape, no SQL-literal unescaping layer
    return f"^({ENTITY_RE}) ({alt}) ({ENTITY_RE})\\.?$"


_COMPLEX_SQL = f"^({ENTITY_RE}) is an? ([a-z]+) in ({ENTITY_RE})\\.?$"


def _resolve_sql(col: str) -> str:
    """Most-complete-identifier rule as a SQL expression: a single-token
    name resolves to the LAST multi-token entity (left context first, then
    the chunk — later wins, matching the dict-overwrite semantics of the
    Python path) whose first token equals it."""
    return (
        f"CASE WHEN instr({col}, ' ') = 0 THEN "
        f"coalesce(try_element_at(filter(ents, "
        f"e -> substring_index(e, ' ', 1) = {col}), -1), {col}) "
        f"ELSE {col} END"
    )


def extract_triples_sql(chunks: DataFrame) -> DataFrame:
    """chunks → triples, zero Python: sentence explode → anchored regexp
    groups → complex-fact split via a struct array → contract filters.
    Row-for-row equivalent to the pandas path (equivalence-tested)."""
    prepared = chunks.select(
        *PROV_COLS,
        F.expr(f"split(text, '{_SENT_SPLIT_SQL}')").alias("sentences"),
        F.expr(
            f"concat(regexp_extract_all(coalesce(left_text, ''), '{_MULTI_ENT_SQL}', 1),"
            f" regexp_extract_all(text, '{_MULTI_ENT_SQL}', 1))"
        ).alias("ents"),
    )
    simple = _simple_sql_pattern()
    sents = (
        prepared.select(*PROV_COLS, "ents",
                        F.explode("sentences").alias("_raw"))
        .select(*PROV_COLS, "ents",
                F.regexp_replace(F.col("_raw"), _TRIM_RE, "").alias("sent"))
        .where(F.length("sent") > 0)
    )
    # ONE regex evaluation per pattern per sentence: pack the three groups
    # with an unprintable separator and split (six regexp_extract calls each
    # re-ran the full match — measured 14% slower end-to-end). A sentence
    # that doesn't match comes back unchanged → split size != 3. Sentences
    # that CONTAIN the separator are excluded up front (_clean): they can
    # never match the anchored entity patterns ([A-Za-z .?!] only), but
    # without the guard their own \\x1f bytes would masquerade as packed
    # groups and fabricate triples (found by review, regression-tested).
    sep = "\x1f"
    sents = sents.withColumn("_clean", F.instr(F.col("sent"), sep) == 0)
    ex = sents.select(
        *PROV_COLS, "ents", "_clean",
        F.split(F.regexp_replace("sent", simple, f"$1{sep}$2{sep}$3"), sep)
        .alias("_sp"),
        F.split(F.regexp_replace("sent", _COMPLEX_SQL, f"$1{sep}$2{sep}$3"), sep)
        .alias("_cp"),
    ).select(
        *PROV_COLS, "ents",
        F.expr("CASE WHEN _clean AND size(_sp) = 3 THEN _sp[0] ELSE '' END").alias("s1"),
        F.expr("CASE WHEN _clean AND size(_sp) = 3 THEN _sp[1] ELSE '' END").alias("p"),
        F.expr("CASE WHEN _clean AND size(_sp) = 3 THEN _sp[2] ELSE '' END").alias("o1"),
        F.expr("CASE WHEN _clean AND size(_cp) = 3 THEN _cp[0] ELSE '' END").alias("c1"),
        F.expr("CASE WHEN _clean AND size(_cp) = 3 THEN _cp[1] ELSE '' END").alias("role"),
        F.expr("CASE WHEN _clean AND size(_cp) = 3 THEN _cp[2] ELSE '' END").alias("org"),
    )
    triples_arr = F.expr(f"""
      CASE
        WHEN s1 != '' THEN array(
          named_struct('subject', {_resolve_sql('s1')},
                       'predicate', p,
                       'object', {_resolve_sql('o1')}))
        WHEN c1 != '' THEN array(
          named_struct('subject', {_resolve_sql('c1')},
                       'predicate', 'position', 'object', role),
          named_struct('subject', {_resolve_sql('c1')},
                       'predicate', 'works at',
                       'object', {_resolve_sql('org')}))
        ELSE array()
      END""")
    exploded = ex.select(*PROV_COLS, F.explode(triples_arr).alias("_t"))
    out = exploded.select(
        F.col("_t.subject").alias("subject"),
        F.col("_t.predicate").alias("predicate"),
        F.col("_t.object").alias("object"),
        *PROV_COLS,
    )
    return out.where(
        (F.expr("size(split(concat_ws(' ', subject, predicate, object), ' '))")
         <= _MAX_TRIPLE_WORDS)
        & (F.lower("subject") != "none")
        & (F.lower("object") != "none")
    )


def extract_triples(chunks: DataFrame, error_acc=None,
                    engine: str = "jvm") -> DataFrame:
    """chunks (FIXTURES.md F2) → triples with provenance (FIXTURES.md F4 + repo/path/commit).

    ``engine="jvm"`` (default): the deterministic contract entirely in
    Catalyst — no Python workers, whole-stage codegen end-to-end.
    ``engine="python"``: the vectorized mapInPandas batch path — the
    LLM-shaped interface (Arrow batch = the reference's token-budget batch)
    that LLMExtractor plugs into; also the row-isolated poison-row path.

    ``error_acc``: optional Spark accumulator counting chunks whose
    extraction raised (reference drops-and-logs, kg_agent/chains.py:286-292;
    python engine only — a Catalyst expression cannot raise per row).

    Arrow-volume discipline (python engine): sentence splitting and
    entity-mention scanning run JVM-side; the left context crosses into
    Python as its multi-token entity list only (alias resolution consumes
    nothing else, kg_prompts.py:25,42). The batch path is fully vectorized;
    if a batch fails, it falls back to per-row extraction so one poison row
    is dropped (and counted) instead of the batch."""
    if engine == "jvm":
        return extract_triples_sql(chunks)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({c: [] for c in OUT_COLS})
                continue
            try:
                yield _extract_batch_vectorized(pdf)
            except Exception:
                # row-isolated fallback: reference drops failed rows and
                # keeps going (kg_agent/chains.py:286-292)
                data: dict[str, list] = {c: [] for c in OUT_COLS}
                for i in range(len(pdf)):
                    row = pdf.iloc[i]
                    try:
                        triples = extract_from_text(
                            " ".join(row["sentences"]),
                            context_entities=list(row["left_entities"]),
                        )
                    except Exception:
                        if error_acc is not None:
                            error_acc.add(1)
                        continue
                    for s, p, o in triples:
                        data["subject"].append(s)
                        data["predicate"].append(p)
                        data["object"].append(o)
                        for c in PROV_COLS:
                            data[c].append(row[c])
                yield pd.DataFrame(data, columns=OUT_COLS)

    return _prepare_chunks(chunks).mapInPandas(run, TRIPLES_SCHEMA)


def _prepare_chunks(chunks: DataFrame) -> DataFrame:
    """JVM-side prep shared by the python engine and the LLM extractor:
    sentence split + multi-token entity scan run as Catalyst expressions so
    only the narrow arrays cross the Arrow boundary."""
    return chunks.select(
        *PROV_COLS,
        F.expr(f"split(text, '{_SENT_SPLIT_SQL}')").alias("sentences"),
        F.expr(f"regexp_extract_all(text, '{_MULTI_ENT_SQL}', 1)")
        .alias("text_entities"),
        F.expr(
            f"regexp_extract_all(coalesce(left_text, ''), '{_MULTI_ENT_SQL}', 1)"
        ).alias("left_entities"),
    )


def detect_mentions(chunks: DataFrame) -> DataFrame:
    """Mention detection — entirely JVM-side (regexp_extract_all + explode),
    no Python in the hot path. Emits one row per entity mention with
    provenance; feeds the broadcast alias-join linker (SURVEY.md J1/J5)."""
    return (
        chunks.select(
            F.explode(
                F.expr(f"regexp_extract_all(text, '({ENTITY_RE})', 1)")
            ).alias("mention"),
            "document_id", "order_id", "repo", "content_sha256",
        )
    )


class LLMExtractor:
    """Optional LLM-backed extractor behind the same batch interface.

    Mirrors the reference's OpenAI-compatible client semantics: one
    prompt-batched POST to ``{base_url}/v1/chat/completions`` per Arrow
    batch, ≤3 attempts on HTTP/parse failure, exponential backoff ×1.5
    from 2 s (deep-reason ``deep_reason/chains.py:33-60``,
    ``deep_reason/pipeline.py:113-135``). Response contract: the message
    content is a JSON array with ONE entry per input chunk, each a list of
    ``[subject, predicate, object]`` triples — a shape mismatch is a parse
    failure and retries like an HTTP error.

    ``sleeper`` is injectable so tests assert the backoff sequence without
    wall-clock sleeps. Requires an endpoint; the sandbox has none, so
    instantiation without one raises — the deterministic extractor above
    is the default engine path.
    """

    def __init__(self, base_url: str | None = None, model: str = "",
                 max_retries: int = 3, backoff_base_s: float = 2.0,
                 backoff_factor: float = 1.5, timeout_s: float = 30.0,
                 sleeper=None):
        if not base_url:
            raise NotImplementedError(
                "LLMExtractor needs an OpenAI-compatible endpoint; "
                "use the deterministic extractor in this environment"
            )
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.backoff_factor = backoff_factor
        self.timeout_s = timeout_s
        self._sleep = sleeper  # None → time.sleep, resolved at call time

    def _request(self, prompt: str) -> str:
        import json
        import urllib.request

        payload = json.dumps({
            "model": self.model,
            "messages": [{"role": "user", "content": prompt}],
        }).encode("utf-8")
        req = urllib.request.Request(
            f"{self.base_url}/v1/chat/completions", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            body = json.load(resp)
        return body["choices"][0]["message"]["content"]

    def extract_batch(self, chunks: list[dict]) -> list[list[tuple[str, str, str]]]:
        """``chunks``: [{"text": str, "context_entities": [str, ...]}] →
        one triple list per chunk. One prompt-batched request; retried on
        HTTP error or response-shape mismatch with the reference's backoff
        (sleep base·factor^attempt between attempts, none after the last)."""
        import json
        import time

        sleep = self._sleep or time.sleep
        prompt = json.dumps({
            "task": "extract (subject, predicate, object) triples per chunk",
            "chunks": chunks,
        })
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                parsed = json.loads(self._request(prompt))
                if not isinstance(parsed, list) or len(parsed) != len(chunks):
                    raise ValueError(
                        f"expected {len(chunks)} chunk entries, got "
                        f"{len(parsed) if isinstance(parsed, list) else type(parsed)}")
                out: list[list[tuple[str, str, str]]] = []
                for entry in parsed:
                    triples = []
                    for t in entry:
                        s, p, o = t  # mis-shaped triple → parse retry
                        triples.append((str(s), str(p), str(o)))
                    out.append(triples)
                return out
            except Exception as exc:  # noqa: BLE001 — retry contract
                last = exc
                if attempt + 1 < self.max_retries:
                    sleep(self.backoff_base_s * self.backoff_factor ** attempt)
        raise RuntimeError(
            f"LLM extraction failed after {self.max_retries} attempts: {last}"
        ) from last

    def extract(self, chunks: DataFrame) -> DataFrame:
        """Same dataflow as ``extract_triples(engine='python')``: JVM-side
        sentence/entity prep, then one HTTP prompt-batch per Arrow batch in
        ``mapInPandas`` — never a request per row. Returns TRIPLES_SCHEMA
        rows with full provenance."""
        url, model = self.base_url, self.model
        retries, base_s = self.max_retries, self.backoff_base_s
        factor, timeout = self.backoff_factor, self.timeout_s

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # re-instantiated per worker: the client holds no connection
            # state and injectable sleepers never cross the pickle boundary
            client = LLMExtractor(url, model, retries, base_s, factor, timeout)
            for pdf in batches:
                if len(pdf) == 0:
                    yield pd.DataFrame({c: [] for c in OUT_COLS})
                    continue
                reqs = [
                    {"text": " ".join(pdf.iloc[i]["sentences"]),
                     "context_entities": list(pdf.iloc[i]["left_entities"])}
                    for i in range(len(pdf))
                ]
                per_chunk = client.extract_batch(reqs)
                data: dict[str, list] = {c: [] for c in OUT_COLS}
                for i, triples in enumerate(per_chunk):
                    row = pdf.iloc[i]
                    for s, p, o in triples:
                        data["subject"].append(s)
                        data["predicate"].append(p)
                        data["object"].append(o)
                        for c in PROV_COLS:
                            data[c].append(row[c])
                yield pd.DataFrame(data, columns=OUT_COLS)

        return _prepare_chunks(chunks).mapInPandas(run, TRIPLES_SCHEMA)
