"""GraphML interop — export/import of the entity graph for the reference's
gen_agent tooling (deep-reason ``gen_agent/sampling.py:135,353`` loads
``graph.graphml`` with ``nx.read_graphml``; GraphRAG writes it).

Engine stance (SURVEY.md §1.3): edges live as a DataFrame — GraphML is an
INTEROP BOUNDARY, not an execution format. Export/import therefore run
driver-side over the *vocabulary-scale* entity graph (entity titles +
relationships — millions of rows at most, never corpus-scale), via stdlib
XML: no networkx dependency in the engine. A corpus-scale graph stays in
parquet; exporting it to XML would be wrong at any engine.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame, SparkSession

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"


def write_graphml(
    edges: DataFrame,
    path: str,
    nodes: DataFrame | None = None,
    directed: bool = False,
    max_rows: int = 5_000_000,
) -> None:
    """edges(src, dst[, weight]) [+ nodes(id[, description, type])] → .graphml.

    ``max_rows`` guards the driver-side collect: exporting more than
    vocabulary scale is refused loudly rather than OOMing quietly."""
    n_edges = edges.count()
    if n_edges > max_rows:
        raise ValueError(
            f"refusing to export {n_edges} edges to XML (> {max_rows}); "
            "GraphML is an interop format for vocabulary-scale graphs — "
            "keep corpus-scale edge lists in parquet"
        )
    has_weight = "weight" in edges.columns
    edge_rows = edges.select(
        *(["src", "dst"] + (["weight"] if has_weight else []))
    ).collect()

    node_attrs: dict[str, dict[str, str]] = {}
    if nodes is not None:
        n_nodes = nodes.count()
        if n_nodes > max_rows:
            raise ValueError(
                f"refusing to export {n_nodes} nodes to XML (> {max_rows}); "
                "GraphML is an interop format for vocabulary-scale graphs"
            )
        attr_cols = [c for c in nodes.columns if c != "id"]
        for r in nodes.collect():
            node_attrs[str(r["id"])] = {c: str(r[c]) for c in attr_cols
                                        if r[c] is not None}
    # implicit nodes from edges
    ids = {str(r.src) for r in edge_rows} | {str(r.dst) for r in edge_rows}
    ids |= set(node_attrs)

    keys = sorted({k for a in node_attrs.values() for k in a})
    lines = [
        '<?xml version="1.0" encoding="utf-8"?>',
        f'<graphml xmlns="{_GRAPHML_NS}">',
    ]
    for i, k in enumerate(keys):
        lines.append(
            f'  <key id="d{i}" for="node" attr.name={quoteattr(k)} '
            'attr.type="string"/>'
        )
    if has_weight:
        lines.append('  <key id="w" for="edge" attr.name="weight" '
                     'attr.type="double"/>')
    kind = "directed" if directed else "undirected"
    lines.append(f'  <graph edgedefault="{kind}">')
    key_id = {k: f"d{i}" for i, k in enumerate(keys)}
    for nid in sorted(ids):
        attrs = node_attrs.get(nid, {})
        if attrs:
            lines.append(f'    <node id={quoteattr(nid)}>')
            for k, v in sorted(attrs.items()):
                lines.append(f'      <data key="{key_id[k]}">{escape(v)}</data>')
            lines.append("    </node>")
        else:
            lines.append(f'    <node id={quoteattr(nid)}/>')
    for r in edge_rows:
        s, d = quoteattr(str(r.src)), quoteattr(str(r.dst))
        if has_weight and r.weight is not None:
            lines.append(f'    <edge source={s} target={d}>')
            lines.append(f'      <data key="w">{r.weight}</data>')
            lines.append("    </edge>")
        else:
            lines.append(f'    <edge source={s} target={d}/>')
    lines.append("  </graph>")
    lines.append("</graphml>")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))


def read_graphml(spark: SparkSession, path: str) -> DataFrame:
    """.graphml → edges DataFrame(src, dst, weight double|null) — the S4
    scan re-expressed with a real parser: the XML is read once driver-side
    (vocabulary scale) and immediately becomes a distributed DataFrame."""
    tree = ET.parse(path)
    ns = {"g": _GRAPHML_NS}
    root = tree.getroot()
    weight_keys = {
        k.get("id")
        for k in root.findall("g:key", ns)
        if k.get("for") == "edge" and k.get("attr.name") == "weight"
    }
    rows = []
    for e in root.findall(".//g:edge", ns):
        w = None
        for d in e.findall("g:data", ns):
            if d.get("key") in weight_keys and d.text is not None:
                w = float(d.text)
        rows.append((e.get("source"), e.get("target"), w))
    return spark.createDataFrame(rows, "src string, dst string, weight double")
