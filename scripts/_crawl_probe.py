"""Dev probe: the bench.py crawl-engine section alone (t2, 4 rounds,
k=2000). Usage: _crawl_probe.py [CORES]"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from crawlspark import synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore
from crawlspark.session import get_spark

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

import time

spark = get_spark("crawlprobe", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
tier = synth.TIERS[os.environ.get("SPARK_GRAFT_CRAWL_TIER", "t2")]
pages = synth.spark_pages(spark, tier, parallelism=cores).cache()
pages.count()
robots = synth.spark_robots(spark, tier)
seeds = synth.spark_seeds(spark, tier)
cfg = CrawlConfig(k_global=int(os.environ.get("SPARK_GRAFT_CRAWL_K", "2000")),
                  max_rounds=int(os.environ.get("SPARK_GRAFT_CRAWL_ROUNDS", "4")),
                  seen_shards=8,
                  seen_m_bits=1 << 22, salt_buckets=cores,
                  validate_fraction=0)
def _canary() -> float:
    """Single-thread CPU probe (same loop as scaling_trial.py) — stamps
    what the hypervisor was delivering around each trial so a recorded
    crawl number is interpretable (clean window: <=0.70)."""
    t = time.time()
    x = 0
    for i in range(10_000_000):
        x += i * i
    return round(time.time() - t, 2)


for trial in range(2):
    c_before = _canary()
    store = SnapshotStore(spark, tempfile.mkdtemp(
        prefix="crawlprobe_", dir="/dev/shm"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    t0 = time.time()
    stats = eng.run()
    dt = time.time() - t0
    store.destroy()
    print(f"RESULT trial={trial} cores={cores} seconds={dt:.2f} "
          f"scheduled={sum(s['scheduled'] for s in stats)} "
          f"fetched={sum(s['fetched'] for s in stats)} "
          f"rounds={len(stats)} "
          f"canary_before={c_before} canary_after={_canary()}",
          flush=True)
spark.stop()
