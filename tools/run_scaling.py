"""Scaling-efficiency measurement (BASELINE.json north_rule).

Runs the flagship KG pipeline at two parallelism levels — local[8] vs
local[32], the sandbox stand-in for N vs 4N executors — each in a fresh
subprocess/JVM on identical input, and reports throughput at both plus
efficiency = (T_low / T_high) / (cpus_high / cpus_low).

Writes/updates BENCH/BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/run_scaling.py [n_pages]
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
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--pages", str(n_pages)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    lo, hi = 8, 32
    r_lo = run_at(lo, n_pages)
    r_hi = run_at(hi, n_pages)
    t_lo = r_lo["queries"]["kg_pipeline"]
    t_hi = r_hi["queries"]["kg_pipeline"]
    speedup = t_lo / t_hi
    efficiency = speedup / (hi / lo)
    result = {
        "n_pages": n_pages,
        "cpus_low": lo,
        "cpus_high": hi,
        "pipeline_sec_low": t_lo,
        "pipeline_sec_high": t_hi,
        "valid_tps_low": r_lo["validated_triples_per_sec"],
        "valid_tps_high": r_hi["validated_triples_per_sec"],
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "full_low": r_lo,
        "full_high": r_hi,
    }
    print(json.dumps(result, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
