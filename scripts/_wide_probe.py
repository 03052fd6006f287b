"""Dev probe: one wide-frontier run. Usage: _wide_probe.py CORES [N K ROUNDS VALIDATE_FRACTION]"""
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from crawlspark.benchlib import run_wide_round
from crawlspark.session import get_spark

cores = int(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
k = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
vf = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0

s = get_spark("wide", cores=cores)
s.sparkContext.setLogLevel("ERROR")
r = run_wide_round(s, n, k, cores,
                   tempfile.mkdtemp(prefix=f"wp{cores}_", dir="/dev/shm"),
                   rounds=rounds, validate_fraction=vf)
print(f"RESULT cores={cores}", r, flush=True)
s.stop()

import resource
ru_s = resource.getrusage(resource.RUSAGE_SELF)
ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
print(f"CPU self user={ru_s.ru_utime:.0f}s sys={ru_s.ru_stime:.0f}s | "
      f"children user={ru_c.ru_utime:.0f}s sys={ru_c.ru_stime:.0f}s | "
      f"maxrss_self={ru_s.ru_maxrss//1024}MB children={ru_c.ru_maxrss//1024}MB",
      flush=True)
