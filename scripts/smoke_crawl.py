"""Manual smoke: engine vs oracle on the t1 tier graph."""
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from crawlspark.session import get_spark
from crawlspark import synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore
from crawlspark import oracle

spark = get_spark("smoke", cores=8, driver_mem="8g")

tier = synth.TIERS["t1"]
pages = synth.spark_pages(spark, tier, parallelism=8).cache()
robots = synth.spark_robots(spark, tier)
seeds = synth.spark_seeds(spark, tier)
images = synth.spark_images(spark, tier, parallelism=8)
print("pages", pages.count())

cfg = CrawlConfig(k_global=200, max_rounds=6, seen_shards=4,
                  seen_m_bits=1 << 16, validate_fraction=0.05)
store = SnapshotStore(spark, tempfile.mkdtemp(prefix="crawl_smoke_"))
eng = CrawlEngine(spark, store, pages, robots, images, cfg)
eng.seed(seeds)
stats = eng.run()
print("engine stats:", stats)

log = store.read("fetch_log").orderBy("fetch_seq").collect()
print("engine fetches:", len(log))

# oracle on same data
pages_by_url = {}
for row in pages.collect():
    d = row.asDict(recursive=True)
    pages_by_url[d["url"]] = d
robots_map = {r["host"]: (list(r["disallow_prefixes"]), int(r["crawl_delay_ms"]))
              for r in robots.collect()}
seed_urls = [r["url"] for r in seeds.orderBy("seed_pos").collect()]

ores = oracle.simulate(pages_by_url, robots_map, seed_urls,
                       round_ms=cfg.round_ms, k_global=cfg.k_global,
                       max_rounds=cfg.max_rounds)
print("oracle fetches:", len(ores.fetch_log), "rounds:", ores.rounds)

mismatch = 0
for e, o in zip(log, ores.fetch_log):
    if (e["fetch_seq"], e["canon"], e["status"], e["is_refresh"]) != \
       (o["fetch_seq"], o["canon"], o["status"], o["is_refresh"]):
        if mismatch < 10:
            print("MISMATCH", e["fetch_seq"], e["canon"], e["status"],
                  e["is_refresh"], "| oracle:", o["fetch_seq"], o["canon"],
                  o["status"], o["is_refresh"], "round", e["round"], o["round"])
        mismatch += 1
if len(log) != len(ores.fetch_log):
    print("LENGTH MISMATCH", len(log), len(ores.fetch_log))
engine_seen = {r["url_hash"] for r in store.read("seen").collect()}
print("seen equal:", engine_seen == ores.seen,
      len(engine_seen), len(ores.seen))
print("order mismatches:", mismatch)
store.destroy()
spark.stop()
