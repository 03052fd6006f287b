"""Probe: kill after round 1, resume in-session, compare to one-shot run.
Also probes the cuckoo seen-filter kind. Run as two separate processes to
prove resume works from disk state alone: pass 'phase1' or 'phase2'."""
import sys
sys.path.insert(0, "/root/repo")

from crawlspark.session import get_spark
from crawlspark import synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

ROOT = "/tmp/crawl_resume_probe"
phase = sys.argv[1]
spark = get_spark("resume-probe", cores=4, driver_mem="6g")
tier = synth.TIERS["t1"]
pages = synth.spark_pages(spark, tier, parallelism=4).cache()
robots = synth.spark_robots(spark, tier)
cfg = CrawlConfig(k_global=200, max_rounds=6, seen_kind="cuckoo",
                  seen_shards=4, seen_m_bits=1 << 16, validate_fraction=0)
store = SnapshotStore(spark, ROOT)
eng = CrawlEngine(spark, store, pages, robots, None, cfg)

if phase == "phase1":
    store.destroy()
    store = SnapshotStore(spark, ROOT)
    eng.store = store
    eng.seed(synth.spark_seeds(spark, tier))
    print("phase1:", eng.run(max_rounds=2))  # then "die"
elif phase == "phase2":
    print("resume from round", store.last_round())
    print("phase2:", eng.run(max_rounds=4))
    rows = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
            for r in store.read("fetch_log").orderBy("fetch_seq").collect()]
    import json
    with open("/tmp/crawl_resume_probe_log.json", "w") as f:
        json.dump(rows, f)
    print("total fetches:", len(rows))
spark.stop()
