"""Full-registry DuckDB parity sweep in DRIVER SWEEP ORDER — the second
leg of the CLAUDE.md parity contract (sf0.001 is pinned by pytest;
this script automates the sf0.01 leg, VERDICT r3 task 3) and the
sweep-time evidence for the driver's prefix budget (task 7: the driver
sweeps COLD in registration order, so the ordered cold timing below is
what decides whether the prefix fits any plausible budget).

Usage:
    python scripts/parity_sweep.py [sf_dir] [artifact.json]

Defaults: sf_dir=/root/testdata/sf0.01, artifact=PARITY_SWEEP.json.
Prints one line per query (status + wall seconds, in registration order)
and writes the artifact with per-query status/timing, totals, and loadavg.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    artifact = sys.argv[2] if len(sys.argv) > 2 else "PARITY_SWEEP.json"
    load_before = os.getloadavg()

    from deep_reason_spark.oracle_check import run_parity
    from deep_reason_spark.queries import ORACLES, QUERIES
    from deep_reason_spark.session import get_spark

    spark = get_spark(app_name="parity-sweep",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    n_fail = 0
    t_total0 = time.monotonic()
    for name in QUERIES:  # registration order == driver sweep order
        t0 = time.monotonic()
        problems = run_parity(spark, sf_dir, [name])[name]
        dt = round(time.monotonic() - t0, 2)
        ok = (not problems) or (name not in ORACLES
                                and problems[0].startswith("no oracle"))
        if not ok:
            n_fail += 1
        results[name] = {"ok": ok, "sec": dt,
                         **({"problems": problems[:3]} if not ok else {})}
        print(f"{'PASS' if ok else 'FAIL':4s} {dt:7.2f}s  {name}", flush=True)
    total = round(time.monotonic() - t_total0, 2)

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(QUERIES),
        "n_fail": n_fail,
        "total_sec": total,
        "order": list(QUERIES),
        "results": results,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(QUERIES) - n_fail}/{len(QUERIES)} green, {total}s total "
          f"-> {artifact}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
