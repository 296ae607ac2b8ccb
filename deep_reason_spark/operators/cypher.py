"""Cypher-subset → DataFrame-plan compiler — the deterministic re-expression
of the reference's text2cypher baseline (deep-reason
``baseline/langchain_baseline_graph.py``): there an LLM generates Cypher,
a validator checks it and a corrector retries, then Neo4j executes. Here
the *execution substrate* is the engine's own graph tables — a restricted
Cypher grammar compiles directly to joins/aggregations on the edges/nodes
DataFrames, and the validator is a real parser that rejects unsupported
syntax with a precise error (the "validate_cypher" node made deterministic).

Supported grammar (uppercase keywords):

    MATCH (a)-[:PRED]->(b)[-[:PRED2]->(c) ...]      linear chains, any length
    [WHERE var.prop = 'lit' [AND ...]]              equality / STARTS WITH
    RETURN [DISTINCT] item [, item ...]             var.prop [AS alias] |
                                                    count(var) / count(DISTINCT var) [AS alias]
    [ORDER BY alias [DESC] [, ...]] [LIMIT n]

Graph model = SURVEY.md §1.3: ``edges(source, target, description)`` (the
predicate lives in ``description``), ``nodes(id, title, type, ...)``.
``var.id`` is the node id; any other property broadcast-joins the
vocabulary-scale nodes table. Scale shape: each hop is one equi-join on the
edge table with the predicate filter pushed down; property joins broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CypherError(ValueError):
    """Raised when a query falls outside the supported subset — the
    deterministic analogue of the reference's validate_cypher rejection."""


_MATCH_RE = re.compile(r"^MATCH\s+(.+?)(?:\s+WHERE\s+(.+?))?\s+RETURN\s+(.+?)"
                       r"(?:\s+ORDER\s+BY\s+(.+?))?(?:\s+LIMIT\s+(\d+))?\s*$",
                       re.DOTALL)
_NODE_RE = re.compile(r"^\((\w+)\)$")
_HOP_RE = re.compile(r"-\[:([\w ]+)\]->")
_COND_RE = re.compile(
    r"^(\w+)\.(\w+)\s*(=|STARTS WITH)\s*'((?:[^'\\]|\\.)*)'$")
_COUNT_RE = re.compile(r"^count\(\s*(DISTINCT\s+)?(\w+)\s*\)$", re.IGNORECASE)
_PROP_RE = re.compile(r"^(\w+)\.(\w+)$")


def _parse_pattern(pattern: str):
    """'(a)-[:p]->(b)-[:q]->(c)' → ([('a','p','b'), ('b','q','c')], vars)."""
    parts = _HOP_RE.split(pattern.strip())
    if len(parts) < 3 or len(parts) % 2 == 0:
        raise CypherError(f"unsupported MATCH pattern: {pattern!r}")
    node_vars = []
    for node in parts[0::2]:
        m = _NODE_RE.match(node.strip())
        if not m:
            raise CypherError(f"unsupported node syntax: {node.strip()!r} "
                              "(only plain '(var)' nodes; put filters in WHERE)")
        node_vars.append(m.group(1))
    preds = parts[1::2]
    if len(set(node_vars)) != len(node_vars):
        raise CypherError("repeated node variables are not supported")
    hops = [(node_vars[i], preds[i], node_vars[i + 1])
            for i in range(len(preds))]
    return hops, node_vars


def run_cypher(
    query: str,
    edges: DataFrame,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Compile + run one query of the supported subset. Raises
    ``CypherError`` on anything outside it (never guesses)."""
    m = _MATCH_RE.match(query.strip())
    if not m:
        raise CypherError(
            "query must be MATCH ... [WHERE ...] RETURN ... "
            "[ORDER BY ...] [LIMIT n]")
    pattern, where, returns, order, limit = m.groups()
    hops, node_vars = _parse_pattern(pattern)

    # chain the hops: one predicate-filtered edge scan per hop
    df = None
    for src, pred, dst in hops:
        e = edges.where(F.col("description") == pred).select(
            F.col("source").alias(src), F.col("target").alias(dst))
        df = e if df is None else df.join(e, src)

    # WHERE: equality / STARTS WITH on var props (AND-combined)
    needed_props: set[tuple[str, str]] = set()
    conds = []
    for raw in re.split(r"\s+AND\s+", where) if where else []:
        c = _COND_RE.match(raw.strip())
        if not c:
            raise CypherError(f"unsupported WHERE condition: {raw.strip()!r}")
        var, prop, op, lit = c.groups()
        if var not in node_vars:
            raise CypherError(f"unknown variable {var!r} in WHERE")
        conds.append((var, prop, op, lit.replace("\\'", "'")))
        if prop != "id":
            needed_props.add((var, prop))

    # RETURN items
    items = []  # (kind, var, prop, distinct, alias)
    for raw in returns.split(","):
        raw = raw.strip()
        alias = None
        am = re.match(r"^(.*?)\s+AS\s+(\w+)$", raw)
        if am:
            raw, alias = am.group(1).strip(), am.group(2)
        if raw.upper().startswith("DISTINCT "):
            raise CypherError("use count(DISTINCT v); bare DISTINCT rows "
                              "are not supported")
        cm = _COUNT_RE.match(raw)
        if cm:
            items.append(("count", cm.group(2), None,
                          bool(cm.group(1)), alias or "count"))
            continue
        pm = _PROP_RE.match(raw)
        if pm:
            var, prop = pm.groups()
            if var not in node_vars:
                raise CypherError(f"unknown variable {var!r} in RETURN")
            if prop != "id":
                needed_props.add((var, prop))
            items.append(("prop", var, prop, False, alias or f"{var}_{prop}"))
            continue
        raise CypherError(f"unsupported RETURN item: {raw!r}")

    # attach node properties (vocabulary-scale broadcast joins)
    if needed_props and nodes is None:
        raise CypherError("query references node properties but no nodes "
                          "table was provided")
    # gated, not bare: `nodes` is the entity-scale nodes table — broadcast
    # only while it estimates small, else AQE plans the property joins.
    # ONE estimate of the whole table (memoized), reused for every
    # projected property join — per-projection gating would run one
    # estimate action per RETURN property over the same table
    from deep_reason_spark.functions.broadcast import broadcast_hint
    hint = broadcast_hint(nodes) if needed_props else None
    for var, prop in sorted(needed_props):
        if prop not in (nodes.columns if nodes is not None else []):
            raise CypherError(f"unknown node property {prop!r}")
        side = nodes.select(F.col("id").alias(var),
                            F.col(prop).alias(f"__{var}_{prop}"))
        df = df.join(hint(side), var, "left")

    def _prop_col(var: str, prop: str):
        return F.col(var) if prop == "id" else F.col(f"__{var}_{prop}")

    for var, prop, op, lit in conds:
        col = _prop_col(var, prop)
        df = df.where(col == lit if op == "=" else col.startswith(lit))

    # projection / aggregation
    counts = [i for i in items if i[0] == "count"]
    props = [i for i in items if i[0] == "prop"]
    if counts:
        keys = [_prop_col(v, p).alias(a) for _, v, p, _, a in props]
        aggs = [
            (F.countDistinct(var) if distinct else F.count(var)).alias(a)
            for _, var, _, distinct, a in counts
        ]
        df = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    else:
        df = df.select(*[_prop_col(v, p).alias(a) for _, v, p, _, a in props])

    if order:
        out_cols = set(df.columns)
        sort_cols = []
        for part in order.split(","):
            part = part.strip()
            desc = part.upper().endswith(" DESC")
            name = re.sub(r"\s+(DESC|ASC)$", "", part, flags=re.IGNORECASE)
            if name not in out_cols:
                raise CypherError(f"ORDER BY {name!r} is not a RETURN alias")
            sort_cols.append(F.desc(name) if desc else F.asc(name))
        df = df.orderBy(*sort_cols)
    if limit:
        df = df.limit(int(limit))
    return df
