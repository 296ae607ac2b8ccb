"""spark-submit entry point for any registered driver-contract query.

    spark-submit --py-files dist/deep_reason_spark.zip jobs/run_query.py \
        --query c1_communities --sf-dir /data/tables \
        [--output /data/out.parquet] [--show 20] [--explain] [--oracle]

Runs a query from the ``deep_reason_spark.queries`` registry (the same
callables the grading driver executes) against a directory of the standard
parquet tables. ``--output`` writes the result; otherwise the first
``--show`` rows print. ``--explain`` prints the formatted physical plan
(the scale-audit view); ``--oracle`` prints the query's DuckDB-equivalent
SQL for independent verification.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    from deep_reason_spark.queries import ORACLES, QUERIES
    from deep_reason_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True,
                    help=f"one of: {', '.join(sorted(QUERIES))}")
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    args = ap.parse_args()

    if args.query not in QUERIES:
        sys.exit(f"unknown query {args.query!r}; registry has "
                 f"{len(QUERIES)} entries: {', '.join(sorted(QUERIES))}")
    if args.oracle:
        print(ORACLES[args.query])
        return

    spark = get_spark(app_name=f"deep_reason_spark-{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {spark.read.parquet(args.output).count()} rows "
              f"to {args.output}")
    else:
        df.show(args.show, truncate=False)


if __name__ == "__main__":
    main()
