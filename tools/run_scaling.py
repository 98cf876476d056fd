"""Scaling-efficiency measurement (BASELINE.json north_rule).

Runs the flagship KG pipeline at two parallelism levels — local[8] vs
local[32], the sandbox stand-in for N vs 4N executors — each in a fresh
subprocess/JVM on identical input, and reports throughput at both plus
efficiency = (T_low / T_high) / (cpus_high / cpus_low).

The sandbox host shows large run-to-run CPU variance (same job measured
3-13 s on identical input), so each level is repeated ``reps`` times in
alternating order and the per-level minimum wall time (least host noise)
is used.  Writes BENCH/scaling.json.

Usage: PYTHONPATH=/root/repo python tools/run_scaling.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_pages: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["PYTHONPATH"] = REPO
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # RAM-backed shuffle/output dirs + roomy heap: on a real cluster these
    # are per-node SSDs and executor memory; on the single sandbox box the
    # OS disk would serialize both parallelism levels identically and mask
    # the compute scaling the measurement is after
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.makedirs("/dev/shm/bench_tmp", exist_ok=True)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    env.setdefault("TMPDIR", "/dev/shm/bench_tmp")
    env.setdefault("SPARK_DRIVER_MEMORY", "48g")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--pages",
            str(n_pages),
            "--pipeline-only",
        ],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo, hi = 8, 32
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for r in range(reps):
        for cpus in (lo, hi):
            res = run_at(cpus, n_pages)
            runs[cpus].append(res)
            print(
                f"rep {r} local[{cpus}]: {res['queries']['kg_pipeline']} s "
                f"({res['validated_triples_per_sec']} valid tps) "
                f"stages={res.get('pipeline_stage_seconds')}",
                flush=True,
            )
    best_lo = min(runs[lo], key=lambda x: x["queries"]["kg_pipeline"])
    best_hi = min(runs[hi], key=lambda x: x["queries"]["kg_pipeline"])
    t_lo = best_lo["queries"]["kg_pipeline"]
    t_hi = best_hi["queries"]["kg_pipeline"]
    speedup = t_lo / t_hi
    efficiency = speedup / (hi / lo)
    result = {
        "n_pages": n_pages,
        "reps": reps,
        "cpus_low": lo,
        "cpus_high": hi,
        "pipeline_sec_low": t_lo,
        "pipeline_sec_high": t_hi,
        "valid_tps_low": best_lo["validated_triples_per_sec"],
        "valid_tps_high": best_hi["validated_triples_per_sec"],
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "all_runs": {
            str(c): [x["queries"]["kg_pipeline"] for x in rs] for c, rs in runs.items()
        },
        "best_low": best_lo,
        "best_high": best_hi,
    }
    print(json.dumps({k: v for k, v in result.items() if k not in ("best_low", "best_high")}, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
