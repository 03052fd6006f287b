"""Host-backoff golden tests (cfg.backoff_errors / cfg.backoff_window):
a host whose non-2xx count over the trailing window reaches the threshold
is excluded from scheduling until the errors age out — engine and
sequential oracle must agree byte-for-byte on the fetch log and seen set,
including across a kill/resume. The t1 synth corpus has ~4% non-2xx
pages (404/500), so with BACKOFF=3 several hosts trip the breaker and
re-enter after their window clears — the suppression visibly reshapes
the crawl without collapsing it."""
import tempfile

import pytest

from crawlspark import oracle, synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

K = 150
ROUNDS = 4
BACKOFF = 3
WINDOW = 2


@pytest.fixture(scope="module")
def backoff_data(spark):
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
def backoff_oracle():
    pages_by_url, robots, seeds = _oracle_inputs()
    return oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                           k_global=K, max_rounds=ROUNDS,
                           backoff_errors=BACKOFF, backoff_window=WINDOW)


def _want(res):
    return [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
            for r in res.fetch_log]


def _log(store):
    return [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
            for r in store.read("fetch_log").orderBy("fetch_seq").collect()]


def _engine(spark, data, max_rounds=ROUNDS, store=None):
    pages, robots, seeds = data
    cfg = CrawlConfig(k_global=K, max_rounds=max_rounds, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      backoff_errors=BACKOFF, backoff_window=WINDOW)
    if store is None:
        store = SnapshotStore(spark,
                              tempfile.mkdtemp(prefix="golden_backoff_"))
        eng = CrawlEngine(spark, store, pages, robots, None, cfg)
        eng.seed(seeds)
    else:
        eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.run(max_rounds)
    return store


def test_backoff_actually_bites():
    pages_by_url, robots, seeds = _oracle_inputs()
    base = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                           k_global=K, max_rounds=ROUNDS)
    backed = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                             k_global=K, max_rounds=ROUNDS,
                             backoff_errors=BACKOFF, backoff_window=WINDOW)
    assert _want(backed) != _want(base)
    assert len(backed.fetch_log) < len(base.fetch_log)
    # a hair-trigger threshold suppresses every erroring host at once —
    # the crawl still terminates (empty scheduling round breaks the loop)
    tight = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                            k_global=K, max_rounds=ROUNDS,
                            backoff_errors=1, backoff_window=ROUNDS)
    assert len(tight.fetch_log) < len(backed.fetch_log)
    # a threshold no host reaches is a no-op — the param itself is neutral
    loose = oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                            k_global=K, max_rounds=ROUNDS,
                            backoff_errors=10**9, backoff_window=WINDOW)
    assert _want(loose) == _want(base)


def test_engine_matches_oracle_with_backoff(spark, backoff_data,
                                            backoff_oracle):
    store = _engine(spark, backoff_data)
    assert _log(store) == _want(backoff_oracle)
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    assert seen == backoff_oracle.seen
    # the committed per-round error counts equal the oracle's tally
    errs = {(r["round"], r["host"]): r["n_err"]
            for r in store.read("host_errors").collect()}
    want_errs = {}
    for e in backoff_oracle.fetch_log:
        if e["status"] // 100 != 2:
            from crawlspark.urltools import host_of
            k = (e["round"], host_of(e["canon"]))
            want_errs[k] = want_errs.get(k, 0) + 1
    assert errs == want_errs
    assert any(n >= BACKOFF for n in errs.values())
    store.destroy()


def test_backoff_resume_byte_identical(spark, backoff_data, backoff_oracle):
    # phase 1: two rounds, then a NEW engine resumes from the store —
    # the suppression window must reconstruct from the committed
    # host_errors rounds alone
    store = _engine(spark, backoff_data, max_rounds=2)
    store = _engine(spark, backoff_data, max_rounds=ROUNDS - 2, store=store)
    assert _log(store) == _want(backoff_oracle)
    store.destroy()
