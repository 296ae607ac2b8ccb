"""Benchmark harness — one JSON line to stdout.

Default mode (driver contract): runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and the flagship KG pipeline
(chunk → extract → link → canonicalize → materialize) on a deterministic
synthetic corpus, then prints::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "kg_triples_per_sec": ..., "kg_files": ...}

Scaling mode (``--scaling``): runs the SAME KG pipeline at local[8] and
local[32] via two fresh subprocesses and reports throughput at both plus
efficiency — the sandbox stand-in for N vs 4N executors (north rule).
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HEADLINE = [
    "a7_pricing_summary",
    "j1_region_stats",
    "a9_degree_metrics",
    "a11_salted_hot_agg",
    "j6_two_hop_match",
    "w3_cumsum_batches",
    "s1_chunk_documents",
    "p3_trigram_triples",
    "kg_predicate_counts",
    "d3_minhash_signatures",
    "d4_lsh_buckets",
    "d5_simhash",
    "v1_cosine_topk",
    "g5_connected_components",
]

KG_BENCH_FILES = int(os.environ.get("SPARK_GRAFT_KG_FILES", "20000"))


def _force(df) -> None:
    """Materialize fully on executors without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def run_kg_bench(spark, n_files: int) -> dict:
    from deep_reason_spark.datagen import alias_dict_df, generate_repo_files
    from deep_reason_spark.plans.kg_pipeline import run_kg_pipeline

    out = tempfile.mkdtemp(prefix="kg_bench_")
    corpus_dir = os.path.join(out, "corpus")
    try:
        # corpus materialization is input prep, not pipeline work — untimed
        # (a real deployment reads an existing Iceberg table)
        generate_repo_files(spark, n_files).write.parquet(corpus_dir)
        corpus = spark.read.parquet(corpus_dir)

        t0 = time.monotonic()
        m = run_kg_pipeline(
            spark, corpus, alias_dict_df(spark), out, n_buckets=64, resume=False
        )
        wall = time.monotonic() - t0
        return {
            "kg_files": n_files,
            "kg_triples": m.triples_out,
            "kg_wall_sec": round(wall, 3),
            "kg_triples_per_sec": round(m.triples_out / wall, 1),
            "kg_stage_wall_ms": m.wall_ms,
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_bench(cpus: str, sf_dir: str, kg_files: int, include_queries: bool = True) -> dict:
    from deep_reason_spark.queries import QUERIES
    from deep_reason_spark.session import get_spark

    spark = get_spark(app_name="deep_reason_spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    sf = 0.1
    for tok in sf_dir.rstrip("/").split("/"):
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    per_query: dict[str, float] = {}
    total = 0.0
    if include_queries:
        for name in HEADLINE:
            fn = QUERIES[name]
            fn(spark, sf_dir).count()  # warm the scan/plan once
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            dt = time.monotonic() - t0
            per_query[name] = round(dt, 3)
            total += dt

    kg = run_kg_bench(spark, kg_files)
    total += kg["kg_wall_sec"]
    spark.stop()

    return {
        "metric": "headline suite + KG pipeline wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        **kg,
    }


def run_scaling() -> dict:
    """Same KG job at local[8] vs local[32]; efficiency = (T8/T32)/4."""
    results = {}
    for cpus in ("8", "32"):
        out = subprocess.run(
            [sys.executable, __file__, "--kg-only"],
            env={**os.environ, "SPARK_GRAFT_CPUS": cpus},
            capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = results["8"]["kg_triples_per_sec"]
    t32 = results["32"]["kg_triples_per_sec"]
    return {
        "metric": "kg pipeline scaling local[8] -> local[32]",
        "throughput_local8_triples_per_sec": t8,
        "throughput_local32_triples_per_sec": t32,
        "speedup": round(t32 / t8, 3),
        "scaling_efficiency": round(t32 / t8 / 4.0, 3),
        "kg_files": results["32"]["kg_files"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--kg-only" in sys.argv:
        print(json.dumps(run_bench(cpus, sf_dir, KG_BENCH_FILES, include_queries=False)))
    else:
        print(json.dumps(run_bench(cpus, sf_dir, KG_BENCH_FILES)))
