"""Throughput-scaling evidence: the SAME wide-frontier scheduling job at two
parallelism levels (local[N] and local[4N] — the sandbox stand-in for N vs
4N executors, per the driver instruction), reporting throughput at both and
    efficiency = (tput_4N / tput_N) / 4
against the north rule's ≥ 0.8 bar. Each level runs in a fresh JVM
(subprocess) so JIT/codegen warm-up is identically charged to both.

Usage: python scripts/scaling_bench.py [n_rows] [k_global]
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
K_GLOBAL = int(sys.argv[2]) if len(sys.argv) > 2 else 800_000

CHILD = """
import sys, tempfile, json
sys.path.insert(0, "/root/repo")
from crawlspark.session import get_spark
from crawlspark.benchlib import run_wide_round
cores = int(sys.argv[1]); n = int(sys.argv[2]); k = int(sys.argv[3])
s = get_spark("scaling", cores=cores)
s.sparkContext.setLogLevel("ERROR")
r = run_wide_round(s, n, k, cores,
                   tempfile.mkdtemp(prefix=f"scal{cores}_",
                                    dir="/dev/shm" if __import__("os").path.isdir("/dev/shm") else None),
                   rounds=2)
print("CHILD_RESULT " + json.dumps(r))
s.stop()
"""


def run_level(cores: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(N_ROWS), str(K_GLOBAL)],
        capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"local[{cores}] run failed:\n{p.stderr[-2000:]}")


def main():
    # local[2] vs local[8]: the 4x pair with real CPU headroom on this box.
    # (The sandbox advertises 32 CPUs but a 32-way burn test delivers ~19
    # cores effective — local[32] oversubscribes and context-switch thrash
    # INVERTS scaling, so 8-vs-32 would measure hypervisor steal, not the
    # job. 2->8 keeps both levels fully backed by hardware.)
    lo, hi = 2, 8
    r_lo = run_level(lo)
    r_hi = run_level(hi)
    eff = (r_hi["urls_per_sec"] / r_lo["urls_per_sec"]) / (hi / lo)
    out = {
        "job": f"wide-frontier scheduling round, n={N_ROWS}, k={K_GLOBAL}",
        "levels": {f"local[{lo}]": r_lo, f"local[{hi}]": r_hi},
        "scaling_efficiency": round(eff, 3),
        "bar": 0.8,
        "meets_bar": eff >= 0.8,
    }
    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
