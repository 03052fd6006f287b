"""Fetcher strategy (UnifiedScraper analog, scraper_interface.go:16-55):
the engine's fetch stage is a swappable object; the default corpus lookup
is one implementation, and a user strategy (here: a failure-injecting
wrapper) plugs in without the engine knowing which backend is driving."""
import tempfile

from pyspark.sql import functions as F

from crawlspark import synth
from crawlspark.frontier import (CorpusFetcher, CrawlConfig, CrawlEngine,
                                 Fetcher, SnapshotStore)

K = 200
ROUNDS = 2


def _run(spark, pages, robots, seeds, fetcher):
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="fetcher_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg,
                      fetcher=fetcher)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
           for r in store.read("fetch_log").orderBy("fetch_seq").collect()]
    store.destroy()
    return log


def test_explicit_corpus_fetcher_is_default(spark):
    """Passing CorpusFetcher explicitly == passing nothing: the strategy
    seam does not change behavior."""
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=8)
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    assert isinstance(CorpusFetcher(pages), Fetcher)  # runtime protocol
    default = _run(spark, pages, robots, seeds, None)
    explicit = _run(spark, pages, robots, seeds, CorpusFetcher(pages))
    assert default == explicit
    assert len(default) > 0


def test_injecting_fetcher_dead_letters(spark):
    """A wrapper strategy that 503s every host0 fetch: those rows are
    LOGGED as non-2xx (errors-as-data), never expanded, and sampled into
    debug_samples — all without engine changes."""
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=8)
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)

    class Inject503:
        def __init__(self, inner):
            self.inner = inner
            self.raw = inner.raw

        def lookup(self, probe, key):
            out = self.inner.lookup(probe, key)
            bad = F.col(key).startswith("http://host0.test/")
            return (out.withColumn(
                        "status",
                        F.when(bad, F.lit(503)).otherwise(F.col("status")))
                    .withColumn("links", F.when(bad, F.lit(None))
                                .otherwise(F.col("links"))))

    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="fetcher503_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg,
                      fetcher=Inject503(CorpusFetcher(pages)))
    eng.seed(seeds)
    eng.run()
    log = store.read("fetch_log").collect()
    h0 = [r for r in log if r["host"] == "host0.test"]
    assert h0 and all(r["status"] == 503 for r in h0)
    # 503 pages are dead-lettered: nothing in the log claims host0 pages
    # as referer (their links were never expanded)
    assert all(not (r["ref_url"] or "").startswith("http://host0.test/")
               for r in log)
    # and they surface in the failure-sampling table (S11)
    dbg = store.read("debug_samples").collect()
    assert {r["canon"] for r in h0} <= {r["canon"] for r in dbg}
    store.destroy()
