"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§7.2).

NOT part of the driver contract — bench.py is the frozen measurement
surface. This tool exists for optimization-round evidence:

  python bench_extra.py time  <query> [<query> ...] [--repeats N]
  python bench_extra.py plans <query> [<query> ...] [--tag before|after]

``time``  : per-query noop-sink wall times (median + samples) as one JSON
            line, with loadavg bracketing.
``plans`` : writes ``plans/r06/<query>_<tag>.txt`` with the
            ``explain("formatted")`` output of the query plan.

Env: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's r5
measurement scale), $SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1]
    repeats = 3
    tag = "before"
    skip: set[int] = set()
    if "--repeats" in sys.argv:
        i = sys.argv.index("--repeats")
        repeats = int(sys.argv[i + 1])
        skip.add(i + 1)
    if "--tag" in sys.argv:
        i = sys.argv.index("--tag")
        tag = sys.argv[i + 1]
        skip.add(i + 1)
    names = [a for i, a in enumerate(sys.argv)
             if i >= 2 and i not in skip and not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from deep_reason_spark.queries import QUERIES
    from deep_reason_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "plans":
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plans", "r06")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        spark.stop()
        return

    load0 = os.getloadavg()
    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:warm")
        fn(spark, sf_dir).count()  # warm scan/plan (bench.py methodology)
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.monotonic()
            _force(fn(spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
        srt = sorted(samples)
        results[name] = {"median": srt[len(srt) // 2], "min": srt[0],
                         "samples": samples}
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": results,
                      "loadavg_before": [round(x, 2) for x in load0],
                      "loadavg_after": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
