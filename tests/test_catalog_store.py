"""CatalogStore: the engine's snapshot contract over SQL catalog tables —
same crawl, same oracle, resume included. Runs on the built-in session
catalog with parquet tables (Iceberg swaps in via provider='iceberg')."""
import tempfile

from crawlspark import oracle, synth
from crawlspark.frontier import CrawlConfig, CrawlEngine
from crawlspark.frontier.catalog import CatalogStore

K = 150
ROUNDS = 3


def _oracle(tier):
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    return oracle.simulate(pages_by_url, robots,
                           list(synth.gen_seeds_pdf(tier)["url"]),
                           round_ms=30_000, k_global=K, max_rounds=ROUNDS)


def test_catalog_store_crawl_and_resume(spark):
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=4)
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    want = _oracle(tier)
    wantlog = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
               for r in want.fetch_log]

    root = tempfile.mkdtemp(prefix="catstore_")
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = CatalogStore(spark, root, prefix="t_cat")
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)            # "crash" mid-crawl

    # resume from catalog state only (fresh objects)
    store2 = CatalogStore(spark, root, prefix="t_cat")
    assert store2.last_round() == 1
    eng2 = CrawlEngine(spark, store2, pages, robots, None, cfg)
    eng2.run(max_rounds=ROUNDS - 2)

    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
           for r in store2.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == wantlog
    seen = {r["url_hash"] for r in store2.read("seen").collect()}
    assert seen == want.seen
    store2.destroy()
