"""One scaling-bench trial: run the wide-frontier job at ONE parallelism
level in a fresh JVM and append the result to a trials JSONL. Running trials
as separate short processes (instead of one long orchestrator) keeps each
measurement isolated and lets the caller interleave levels explicitly.

Usage:  python scripts/scaling_trial.py <cores> <n_rows> <k_global> <out.jsonl> [validate_fraction]
Then:   python scripts/scaling_report.py <out.jsonl> <lo> <hi>   # writes BENCH_SCALING.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CORES = int(sys.argv[1])
N_ROWS = int(sys.argv[2])
K_GLOBAL = int(sys.argv[3])
OUT = sys.argv[4]
VALIDATE = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

CHILD = """
import os, sys, tempfile, json
sys.path.insert(0, "/root/repo")
from crawlspark.session import get_spark
from crawlspark.benchlib import run_wide_round
cores = int(sys.argv[1]); n = int(sys.argv[2]); k = int(sys.argv[3])
vf = float(sys.argv[4])
s = get_spark("scaling", cores=cores)
s.sparkContext.setLogLevel("ERROR")
d = "/dev/shm" if os.path.isdir("/dev/shm") else None
r = run_wide_round(s, n, k, cores,
                   tempfile.mkdtemp(prefix=f"scal{cores}_", dir=d), rounds=2,
                   validate_fraction=vf)
print("CHILD_RESULT " + json.dumps(r))
s.stop()
"""


def canary() -> float:
    """Single-thread CPU-speed probe (seconds; lower = faster machine)."""
    t = time.time()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.time() - t, 2)


def _burn(_):
    x = 0
    for i in range(10_000_000):
        x += i * i
    return x


def agg_canary(procs: int = 8) -> float:
    """AGGREGATE CPU probe: wall seconds for `procs` concurrent burn loops.
    The hypervisor caps total CPU delivery in oscillating windows — a
    single-thread canary cannot see that cap; this one can. On an uncapped
    8-core window this ≈ the single-thread canary; under a 2-core cap it is
    ~4× larger."""
    import multiprocessing as mp
    t = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, range(procs))
    return round(time.time() - t, 2)


def main():
    c = canary()
    ac = agg_canary()
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(CORES), str(N_ROWS), str(K_GLOBAL),
         str(VALIDATE)],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_AQE": "0"})
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            r = json.loads(line[len("CHILD_RESULT "):])
            r["canary_s"] = c
            r["agg_canary_s"] = ac
            r["agg_canary_after_s"] = agg_canary()
            r["cores"] = CORES
            with open(OUT, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(json.dumps(r))
            return
    raise RuntimeError(f"local[{CORES}] run failed:\n{p.stderr[-2000:]}")


if __name__ == "__main__":
    main()
