"""Incremental connected components — folding edge batches into an
existing labeling must be EXACTLY the full-graph recompute (the operator's
whole contract), in both CC regimes; plus the streaming maintenance face
(versioned labels, exactly-once replay semantics)."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from deep_reason_spark.operators.canonicalize import (
    connected_components,
    incremental_components,
)

EDGE_SCHEMA = "src string, dst string"


def _labels(df) -> dict:
    return {r["node"]: r["component"] for r in df.collect()}


def _random_batches(seed: int, n_nodes: int, n_edges: int, n_batches: int):
    rng = random.Random(seed)
    nodes = [f"x{i:04d}" for i in range(n_nodes)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(n_edges)
    ]
    size = (len(edges) + n_batches - 1) // n_batches
    return [edges[i: i + size] for i in range(0, len(edges), size)]


def _fold(spark, batches, **kw):
    labels = None
    for batch in batches:
        df = spark.createDataFrame(batch, EDGE_SCHEMA)
        if labels is None:
            labels = connected_components(df, **kw)
        else:
            labels = incremental_components(labels, df, **kw)
        labels = labels.localCheckpoint()
    return labels


def test_fold_equals_full_recompute(spark):
    batches = _random_batches(seed=7, n_nodes=120, n_edges=300, n_batches=3)
    folded = _fold(spark, batches)
    full = connected_components(
        spark.createDataFrame([e for b in batches for e in b], EDGE_SCHEMA)
    )
    assert _labels(folded) == _labels(full)


def test_fold_equals_full_distributed_regime(spark):
    """Force the distributed star rounds (threshold 0) through both the
    base and every delta CC — the regime the two-regime dispatch would
    otherwise skip at this size."""
    batches = _random_batches(seed=11, n_nodes=60, n_edges=140, n_batches=2)
    folded = _fold(spark, batches, small_graph_threshold=0)
    full = connected_components(
        spark.createDataFrame([e for b in batches for e in b], EDGE_SCHEMA),
        small_graph_threshold=0,
    )
    assert _labels(folded) == _labels(full)


def test_merge_new_node_and_noop_paths(spark):
    """One batch exercising all three delta cases: an edge merging two old
    components, an edge attaching brand-new nodes, and an edge that falls
    inside one old component (contracts to a self-loop, must change
    nothing)."""
    old = connected_components(
        spark.createDataFrame([("a", "b"), ("c", "d")], EDGE_SCHEMA)
    )
    batch = spark.createDataFrame(
        [("b", "d"),          # merges comp(a) with comp(c) → min 'a'
         ("e", "f"),          # brand-new component → min 'e'
         ("a", "b")],         # intra-component: contracts away
        EDGE_SCHEMA,
    )
    got = _labels(incremental_components(old, batch))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "e": "e", "f": "e"}


def test_new_node_can_become_component_minimum(spark):
    """A late node with a SMALLER id than the old component label must win
    the min — the exactness argument's sharp corner."""
    old = connected_components(
        spark.createDataFrame([("m", "n")], EDGE_SCHEMA))
    got = _labels(incremental_components(
        old, spark.createDataFrame([("b", "n")], EDGE_SCHEMA)))
    assert got == {"m": "b", "n": "b", "b": "b"}


def test_empty_batch_is_identity(spark):
    old = connected_components(
        spark.createDataFrame([("a", "b"), ("c", "d")], EDGE_SCHEMA)
    ).localCheckpoint()
    got = incremental_components(
        old, spark.createDataFrame([], EDGE_SCHEMA))
    assert _labels(got) == _labels(old)


def test_stream_maintain_components(spark, tmp_path):
    """Edge files arriving in two waves → the newest labels version equals
    the full recompute over every edge seen; versions are complete
    labelings (exactly-once: a version is overwritten in place on replay,
    never appended to)."""
    from deep_reason_spark.streaming.incremental import (
        stream_maintain_components,
    )

    edges_dir = str(tmp_path / "edges")
    out_dir = str(tmp_path / "cc")
    batches = _random_batches(seed=23, n_nodes=80, n_edges=160, n_batches=2)

    spark.createDataFrame(batches[0], EDGE_SCHEMA).write.mode(
        "append").parquet(edges_dir)
    stream_maintain_components(spark, edges_dir, out_dir).awaitTermination(120)

    spark.createDataFrame(batches[1], EDGE_SCHEMA).write.mode(
        "append").parquet(edges_dir)
    stream_maintain_components(spark, edges_dir, out_dir).awaitTermination(120)

    all_versions = spark.read.parquet(os.path.join(out_dir, "labels"))
    latest = all_versions.agg(F.max("as_of_batch").alias("m")).collect()[0]["m"]
    got = all_versions.where(F.col("as_of_batch") == latest).select(
        "node", "component")
    full = connected_components(
        spark.createDataFrame([e for b in batches for e in b], EDGE_SCHEMA))
    assert _labels(got) == _labels(full)
    # at least two distinct versions exist and the pre-merge version also
    # labels every node it had seen (complete snapshot per version)
    versions = sorted(
        r["as_of_batch"]
        for r in all_versions.select("as_of_batch").distinct().collect())
    assert len(versions) >= 2
    v0 = all_versions.where(F.col("as_of_batch") == versions[0])
    v0_nodes = {r["node"] for r in v0.select("node").collect()}
    b0_nodes = {n for e in batches[0] for n in e}
    assert v0_nodes == b0_nodes


def test_stream_replay_overwrites_version_in_place(spark, tmp_path):
    """Exactly-once under replay: wiping the streaming checkpoint re-runs
    batch 0 over the same files; its labels version must be REWRITTEN in
    place (reading only versions strictly BEFORE it), not appended — same
    row set, same version count."""
    import shutil

    from deep_reason_spark.streaming.incremental import (
        stream_maintain_components,
    )

    edges_dir = str(tmp_path / "edges")
    out_dir = str(tmp_path / "cc")
    batch = _random_batches(seed=31, n_nodes=40, n_edges=80, n_batches=1)[0]
    spark.createDataFrame(batch, EDGE_SCHEMA).write.mode(
        "append").parquet(edges_dir)

    stream_maintain_components(spark, edges_dir, out_dir).awaitTermination(120)
    labels_path = os.path.join(out_dir, "labels")
    first = spark.read.parquet(labels_path)
    n_rows, n_versions = first.count(), first.select(
        "as_of_batch").distinct().count()

    shutil.rmtree(os.path.join(out_dir, "_cc_checkpoint"))
    stream_maintain_components(spark, edges_dir, out_dir).awaitTermination(120)
    replayed = spark.read.parquet(labels_path)
    assert replayed.count() == n_rows
    assert replayed.select("as_of_batch").distinct().count() == n_versions
    full = connected_components(spark.createDataFrame(batch, EDGE_SCHEMA))
    assert _labels(replayed.select("node", "component")) == _labels(full)
