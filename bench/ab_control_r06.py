"""Interleaved A/B control for round-6 query/bench claims (VERDICT r5
#4): alternate full bench.py runs of the ROUND-START tree (worktree at
e77d744) and HEAD under identical conditions, recording each run's
loadavg so official-number regressions can be attributed mechanically
(same protocol as BENCH/build_control_runs.jsonl, extended to the whole
query mix). bench.py itself is byte-identical in both trees.

Usage: python bench/ab_control_r06.py [n_pairs] [out_path]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASE = "/root/wt_r6base"
HEAD = "/root/repo"


def loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def run_one(tree: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        SPARK_GRAFT_CPUS="32",
    )
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    wall = round(time.time() - t0, 1)
    parsed = None
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    return {
        "tree": "base" if tree == BASE else "head",
        "rc": p.returncode,
        "wall_s": wall,
        "loadavg_after": loadavg(),
        "parsed": parsed,
    }


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(HEAD, "BENCH", "ab_r06_runs.jsonl")
    )
    for i in range(n_pairs):
        for tree in (BASE, HEAD):
            rec = run_one(tree)
            rec["pair"] = i
            rec["ts"] = time.time()
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            q = (rec.get("parsed") or {}).get("queries", {})
            print(
                rec["tree"],
                i,
                "total",
                (rec.get("parsed") or {}).get("value"),
                "build",
                q.get("index_build"),
                flush=True,
            )


if __name__ == "__main__":
    main()
