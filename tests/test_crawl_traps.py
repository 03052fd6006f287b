"""Trap-suppression golden tests (cfg.trap_max_urls): once a (host,
path-template) accumulates the threshold of FETCHED urls, its children
stop entering the frontier — engine and sequential oracle must agree
byte-for-byte on the fetch log and seen set, including across a
kill/resume. The synth corpus has a single template per host (/p/N), so
suppression visibly reshapes the crawl."""
import tempfile

import pytest

from crawlspark import oracle, synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

K = 150
ROUNDS = 4
TRAP = 8


@pytest.fixture(scope="module")
def trap_data(spark):
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=8).cache()
    pages.count()
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    return pages, robots, seeds


def _oracle_inputs():
    tier = synth.TIERS["t1"]
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    seeds = list(synth.gen_seeds_pdf(tier)["url"])
    return pages_by_url, robots, seeds


@pytest.fixture(scope="module")
def trap_oracle():
    pages_by_url, robots, seeds = _oracle_inputs()
    return oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                           k_global=K, max_rounds=ROUNDS,
                           trap_max_urls=TRAP)


def _want(res):
    return [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
            for r in res.fetch_log]


def _log(store):
    return [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
            for r in store.read("fetch_log").orderBy("fetch_seq").collect()]


def _engine(spark, data, max_rounds=ROUNDS, trap=TRAP, store=None):
    pages, robots, seeds = data
    cfg = CrawlConfig(k_global=K, max_rounds=max_rounds, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      trap_max_urls=trap)
    if store is None:
        store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_trap_"))
        eng = CrawlEngine(spark, store, pages, robots, None, cfg)
        eng.seed(seeds)
    else:
        eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.run(max_rounds)
    return store


def test_trap_suppression_actually_bites():
    pages_by_url, robots, seeds = _oracle_inputs()
    base = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                           k_global=K, max_rounds=ROUNDS)
    trapped = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                              k_global=K, max_rounds=ROUNDS,
                              trap_max_urls=TRAP)
    assert _want(trapped) != _want(base)
    assert len(trapped.fetch_log) < len(base.fetch_log)
    # a limit no host reaches is a no-op — the param itself is neutral
    loose = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                            k_global=K, max_rounds=ROUNDS,
                            trap_max_urls=10**9)
    assert _want(loose) == _want(base)


def test_engine_matches_oracle_with_traps(spark, trap_data, trap_oracle):
    store = _engine(spark, trap_data)
    assert _log(store) == _want(trap_oracle)
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    assert seen == trap_oracle.seen
    # the committed counts state aggregates to the oracle's tally
    counts = {(r["host"], r["template"]): r["n"]
              for r in store.read("trap_counts")
              .groupBy("host", "template").sum("n")
              .withColumnRenamed("sum(n)", "n").collect()}
    assert sum(counts.values()) == len(trap_oracle.fetch_log)
    assert any(n >= TRAP for n in counts.values())
    store.destroy()


def test_trap_resume_byte_identical(spark, trap_data, trap_oracle):
    # phase 1: two rounds, then a NEW engine resumes from the store
    store = _engine(spark, trap_data, max_rounds=2)
    store = _engine(spark, trap_data, max_rounds=ROUNDS - 2, store=store)
    assert _log(store) == _want(trap_oracle)
    store.destroy()
