"""Scaling-efficiency evidence (north_rule): run the identical index
build + query mix at local[8] and local[32] on the same input and
report throughput at both plus efficiency into BENCH/BASELINE.md.

Each measurement runs in a fresh subprocess (fresh JVM) so the two
parallelism levels don't share a SparkContext.

Usage: python bench/scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        FTS_BENCH_DOCS=str(n_docs),
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_at(cpus, n_docs)
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)

    tp8 = results[8]["index_docs_per_sec"]
    tp32 = results[32]["index_docs_per_sec"]
    eff = tp32 / (4 * tp8)
    q8 = sum(v for k, v in results[8]["queries"].items() if k.startswith("q_"))
    q32 = sum(v for k, v in results[32]["queries"].items() if k.startswith("q_"))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured results

Sandbox stand-in for the N vs 4N executor-cluster requirement
(BASELINE.json north_rule): the identical job (synthetic corpus,
n_docs={n_docs}, blocks-mode index build + reference query mix) run at
two parallelism levels on the same machine, fresh JVM each.

| parallelism | index build (s) | index docs/sec | query mix total (s) |
|---|---|---|---|
| local[8]  (N)  | {results[8]["queries"]["index_build"]} | {tp8} | {round(q8, 3)} |
| local[32] (4N) | {results[32]["queries"]["index_build"]} | {tp32} | {round(q32, 3)} |

**Index-build scaling efficiency (N→4N): {eff:.3f}**
(target ≥ 0.8 per north_rule; efficiency = throughput_4N / (4 × throughput_N))

Raw JSON:

```json
{json.dumps(results[8])}
{json.dumps(results[32])}
```
"""
        )
    print(json.dumps({"efficiency": round(eff, 3), "tp8": tp8, "tp32": tp32}))


if __name__ == "__main__":
    main()
