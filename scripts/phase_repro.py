"""Repro harness for the N-vs-4N scaling inversion: run the wide-frontier
job at one parallelism level with CRAWLSPARK_TIMING=1 and print per-phase
timings per round. Usage: python scripts/phase_repro.py <cores> [n] [k] [rounds]"""
import os, sys, tempfile, time, json
sys.path.insert(0, "/root/repo")
os.environ["CRAWLSPARK_TIMING"] = "1"
cores = int(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
k = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
from crawlspark.session import get_spark
from crawlspark.benchlib import run_wide_round
s = get_spark("phase_repro", cores=cores)
s.sparkContext.setLogLevel("ERROR")
d = "/dev/shm" if os.path.isdir("/dev/shm") else None
r = run_wide_round(s, n, k, cores, tempfile.mkdtemp(prefix=f"repro{cores}_", dir=d), rounds=rounds)
print("RESULT " + json.dumps(r))
s.stop()
