"""GraphML interop tests — export must be consumable by the reference's
tooling (nx.read_graphml, gen_agent/sampling.py:135) and round-trip through
our own reader."""

from __future__ import annotations

import pytest

from deep_reason_spark.sources.graphml import read_graphml, write_graphml

EDGES = [("Ada", "Babbage", 2.0), ("Babbage", "Turing", 1.0),
         ("Ada", "Turing", 0.5)]


def _edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, weight double")


def test_roundtrip_through_own_reader(spark, tmp_path):
    p = str(tmp_path / "graph.graphml")
    write_graphml(_edges(spark), p)
    back = read_graphml(spark, p)
    assert {(r.src, r.dst, r.weight) for r in back.collect()} == set(EDGES)


def test_networkx_can_consume_export(spark, tmp_path):
    nx = pytest.importorskip("networkx")
    p = str(tmp_path / "graph.graphml")
    nodes = spark.createDataFrame(
        [("Ada", "first programmer", "person")],
        "id string, description string, type string")
    write_graphml(_edges(spark), p, nodes=nodes)
    g = nx.read_graphml(p)
    assert set(g.nodes()) == {"Ada", "Babbage", "Turing"}
    assert g.number_of_edges() == 3
    assert g.nodes["Ada"]["description"] == "first programmer"
    assert g.edges["Ada", "Babbage"]["weight"] == 2.0


def test_xml_escaping(spark, tmp_path):
    nx = pytest.importorskip("networkx")
    p = str(tmp_path / "esc.graphml")
    weird = spark.createDataFrame(
        [("a<b", 'c&"d', 1.0)], "src string, dst string, weight double")
    write_graphml(weird, p)
    g = nx.read_graphml(p)
    assert set(g.nodes()) == {"a<b", 'c&"d'}


def test_export_refuses_corpus_scale(spark, tmp_path):
    e = _edges(spark)
    with pytest.raises(ValueError, match="vocabulary-scale"):
        write_graphml(e, str(tmp_path / "x.graphml"), max_rows=2)
