"""spark-submit entry point for the KG-construction pipeline.

    spark-submit --py-files dist/deep_reason_spark.zip jobs/run_pipeline.py \
        --input /data/repo_files --output /data/kg \
        [--buckets 4096] [--salt 16] [--no-resume] [--alias-dict path.parquet]

Reads the Iceberg/parquet ``repo_files`` table (repo, path, commit, lang,
content), runs chunk → extract → link → canonicalize → ontology →
materialize, resumable from the per-bucket checkpoint ledger.
"""

from __future__ import annotations

import argparse

from deep_reason_spark.datagen import alias_dict_df, entity_types_df
from deep_reason_spark.plans.kg_pipeline import run_kg_pipeline
from deep_reason_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--alias-dict", default=None,
                    help="parquet with (alias, entity_id, canonical_name, prior)")
    ap.add_argument("--entity-types", default=None,
                    help="parquet with (entity_id, type)")
    args = ap.parse_args()

    spark = get_spark(app_name="deep_reason_spark-pipeline")
    repo_files = spark.read.parquet(args.input)
    aliases = (spark.read.parquet(args.alias_dict) if args.alias_dict
               else alias_dict_df(spark))
    types = (spark.read.parquet(args.entity_types) if args.entity_types
             else entity_types_df(spark))

    metrics = run_kg_pipeline(
        spark, repo_files, aliases, args.output,
        n_buckets=args.buckets, resume=not args.no_resume,
        salt=args.salt, entity_types=types,
    )
    print(f"triples={metrics.triples_out} "
          f"buckets_processed={metrics.buckets_processed} "
          f"buckets_skipped={metrics.buckets_skipped} "
          f"extract_errors={metrics.extract_errors} "
          f"wall_ms={metrics.wall_ms}")
    spark.stop()


if __name__ == "__main__":
    main()
