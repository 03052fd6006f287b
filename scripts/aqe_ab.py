"""Interleaved AQE on/off A/B of the wide-frontier round (fresh JVM per
trial, single-thread canary before each, same window by adjacency).

Motivation: the t1 job audit showed ~57 async broadcast-exchange jobs per
round; with explicit broadcast hints + salting already in the plans, AQE's
re-optimization rounds add driver-side fixed cost per action — the serial
fraction that caps N->4N scaling. Usage:

    python scripts/aqe_ab.py [n_rows] [k] [reps]
"""

import json
import os
import subprocess
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

CHILD = """
import os, sys, tempfile, json
sys.path.insert(0, "/root/repo")
from crawlspark.session import get_spark
from crawlspark.benchlib import run_wide_round
s = get_spark("aqeab", cores=8)
s.sparkContext.setLogLevel("ERROR")
r = run_wide_round(s, %d, %d, 8,
                   tempfile.mkdtemp(prefix="aqeab_", dir="/dev/shm"),
                   rounds=2)
print("CHILD_RESULT " + json.dumps(r))
s.stop()
""" % (N, K)


def burn() -> float:
    t = time.time()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.time() - t, 2)


def main() -> None:
    for rep in range(REPS):
        for aqe in ("1", "0"):
            c = burn()
            env = dict(os.environ, SPARK_GRAFT_AQE=aqe)
            p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=1800)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("CHILD_RESULT")]
            r = (json.loads(line[0][13:]) if line
                 else {"err": p.stderr[-300:]})
            r["aqe"] = aqe
            r["canary_s"] = c
            r["rep"] = rep
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
