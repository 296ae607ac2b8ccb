"""Same-window round-over-round bench pair (CLAUDE.md bench discipline /
VERDICT r2 task 7): run `python bench.py` on a git-archive snapshot of the
previous round's commit and on HEAD back-to-back, so host-contention
windows (observed 1.5-4x uniform slowdowns) cannot masquerade as
regressions or wins. Loadavg is recorded inside each bench JSON.

Usage: python scripts/bench_pair.py [baseline_ref] [out.json]
Defaults: baseline_ref=r3 bookkeeping commit, out=BENCH_PAIR.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cwd: str) -> dict:
    out = subprocess.run([sys.executable, "bench.py"], cwd=cwd,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    base_ref = sys.argv[1] if len(sys.argv) > 1 else "91515c7"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_PAIR.json"
    tmp = tempfile.mkdtemp(prefix="bench_base_")
    try:
        tar = os.path.join(tmp, "base.tar")
        subprocess.run(["git", "archive", "-o", tar, base_ref],
                       cwd=REPO, check=True)
        base_dir = os.path.join(tmp, "tree")
        os.makedirs(base_dir)
        subprocess.run(["tar", "-xf", tar, "-C", base_dir], check=True)

        print(f"baseline ({base_ref}) ...", flush=True)
        base = run_bench(base_dir)
        print(json.dumps(base), flush=True)
        print("HEAD ...", flush=True)
        head = run_bench(REPO)
        print(json.dumps(head), flush=True)

        pair = {
            "baseline_ref": base_ref,
            "baseline": base,
            "head": head,
            "suite_sec": {
                "baseline": round(base["value"] - base["kg_wall_sec"], 3),
                "head": round(head["value"] - head["kg_wall_sec"], 3),
            },
            "kg_wall_sec": {"baseline": base["kg_wall_sec"],
                            "head": head["kg_wall_sec"]},
            "kg_triples_per_sec": {"baseline": base["kg_triples_per_sec"],
                                   "head": head["kg_triples_per_sec"]},
        }
        with open(os.path.join(REPO, out_path), "w") as f:
            json.dump(pair, f, indent=1)
        print(f"-> {out_path}")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
