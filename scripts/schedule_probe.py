"""Microbenchmark the round-0 schedule chain step by step at one
parallelism level, to find the non-scaling stage.
Usage: python scripts/schedule_probe.py <cores> [n]"""
import os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
from crawlspark.session import get_spark
from crawlspark import benchlib
from crawlspark.frontier.politeness import (budget_col, prune_to_global_topk,
                                            robots_allowed_col, topk_per_host,
                                            order_cols)
from crawlspark.plans import with_global_seq
from pyspark.sql import functions as F

s = get_spark("probe", cores=cores)
s.sparkContext.setLogLevel("ERROR")
d = "/dev/shm" if os.path.isdir("/dev/shm") else None
store_dir = tempfile.mkdtemp(prefix=f"probe{cores}_", dir=d)

fr = benchlib.make_wide_frontier(s, n, cores)
fr.write.mode("overwrite").parquet(store_dir + "/frontier")
robots = benchlib.make_wide_robots(s)

def tick(label, t0):
    print(f"  {label}: {time.time()-t0:.1f}s", flush=True)
    return time.time()

t = time.time()
base = s.read.parquet(store_dir + "/frontier")
base.count()
t = tick("A scan+count", t)

ck = base.localCheckpoint(eager=True)
t = tick("B scan+localCheckpoint", t)
ck.unpersist()

robots_aug = robots.withColumn("credit_ms", F.lit(0).cast("long"))
allowed = (base.join(F.broadcast(robots_aug), "host", "left")
           .filter(robots_allowed_col())
           .withColumn("host_budget", budget_col(30_000, 400_000))
           .select("canon", "url_hash", "host", "path", "priority",
                   "discovered_seq", "ref_url", "host_budget"))
allowed = allowed.localCheckpoint(eager=True)
t = tick("C robots+budget+checkpoint", t)

surv = topk_per_host(allowed, cores)
surv.count()
t = tick("D topk_per_host+count", t)

surv2 = topk_per_host(allowed, cores)
pruned = prune_to_global_topk(surv2, 400_000)
t = tick("E prune collect", t)

seq_df, n_pruned = with_global_seq(pruned, order_cols(), out="idx",
                                   start=0, return_count=True)
t = tick(f"F global_seq (n={n_pruned})", t)
s.stop()
