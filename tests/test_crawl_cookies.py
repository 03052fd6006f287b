"""Cookie-jar golden tests (S7/J3 — /root/reference/session.go:67-110
re-expressed for the batch engine):

  * a per-host cookie jar rides in snapshot state (the SaveCookie analog);
  * fetches in round r see the jar as of the END of round r-1;
  * pages with ``require_cookie`` 403 unless the jar satisfies them, and a
    403 serves NO content (no links, image, refresh, form, or Set-Cookie);
  * 2xx ``set_cookies`` harvests merge latest-wins per (host, name);
  * ``seed(cookies=...)`` pre-loads the jar (the LoadCookie analog) and
    CHANGES fetch outcomes — the reference's cookie persistence semantics.

All pinned exactly against the sequential oracle (crawlspark.oracle), in
both corpus flavors (structured and raw-HTML-bytes), plus resume."""
import tempfile

import pytest

from crawlspark import oracle, synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

K = 150
ROUNDS = 4


@pytest.fixture(scope="module")
def cookie_data(spark):
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=8,
                              cookies=True).cache()
    pages.count()
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    return tier, pages, robots, seeds


def _oracle_inputs():
    tier = synth.TIERS["t1"]
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images,
                              cookies=True)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    seeds = list(synth.gen_seeds_pdf(tier)["url"])
    return tier, pages_by_url, robots, seeds


@pytest.fixture(scope="module")
def cookie_oracle():
    _, pages_by_url, robots, seeds = _oracle_inputs()
    return oracle.simulate(pages_by_url, robots, seeds,
                           round_ms=30_000, k_global=K, max_rounds=ROUNDS)


def _run(spark, pages, robots, seeds, initial=None, max_rounds=ROUNDS):
    cfg = CrawlConfig(k_global=K, max_rounds=max_rounds, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_cookie_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    cookies = None
    if initial is not None:
        cookies = spark.createDataFrame(
            [(h, n, v) for h, m in initial.items() for n, v in m.items()],
            "host string, name string, value string")
    eng.seed(seeds, cookies=cookies)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["image_id"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    return store, log, seen


def _want(res):
    return [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["image_id"]) for r in res.fetch_log]


def test_engine_matches_oracle_cookies(spark, cookie_data, cookie_oracle):
    _, pages, robots, seeds = cookie_data
    store, log, seen = _run(spark, pages, robots, seeds)
    assert log == _want(cookie_oracle)
    assert seen == cookie_oracle.seen
    # the gate actually fired: some fetches were cookie-403s with no payload
    gated = [r for r in log if r[2] == 403]
    assert gated and all(r[4] is None for r in gated)
    # and some cookies were harvested into the committed jar, with the
    # RFC 6265 scoping shapes present (round-4): dot-form Domain rows
    # normalize to a host-matching non-host-only scope, path-scoped rows
    # keep their attribute path, Max-Age rows carry expires_round, and
    # INVALID Domain attributes (not covering the host) never land
    jar = store.read("cookies").collect()
    assert jar and all(r["name"] in ("sess", "psc") for r in jar)
    assert any(not r["host_only"] and r["domain"].startswith("host")
               for r in jar)                     # Domain=.hostN.test rows
    assert any(r["name"] == "psc" and r["path"].startswith("/p/")
               for r in jar)                     # path-scoped rows
    assert all(r["domain"] != "other.test" for r in jar)  # invalid ignored
    assert all(not r["domain"].startswith(".") for r in jar)  # dot stripped
    store.destroy()


def test_preloaded_jar_changes_fetches(spark, cookie_data, cookie_oracle):
    """The LoadCookie analog: pre-seeding the jar with every host's session
    cookie turns cookie-403s into served fetches — cookie presence changes
    fetch results, engine and oracle agreeing exactly in both worlds."""
    tier, pages, robots, seeds = cookie_data
    initial = {f"host{h}.test": {"sess": f"tok{h}", "psc": f"pv{h}"}
               for h in range(tier.n_hosts)}
    _, pages_by_url, robots_d, seeds_l = _oracle_inputs()
    want = oracle.simulate(pages_by_url, robots_d, seeds_l,
                           round_ms=30_000, k_global=K, max_rounds=ROUNDS,
                           initial_cookies=initial)
    store, log, seen = _run(spark, pages, robots, seeds, initial=initial)
    assert log == _want(want)
    assert seen == want.seen
    # with the jar pre-loaded no cookie gate can fire (synth requires only
    # the per-host sess token), and the crawl differs from the cold run
    assert not [r for r in log if r[2] == 403]
    assert log != _want(cookie_oracle)
    store.destroy()


def test_engine_matches_oracle_cookies_raw(spark, cookie_data,
                                           cookie_oracle):
    """Raw-HTML-bytes corpus flavor: cookie columns are header-channel facts
    riding beside the body; the gate + harvest behave identically."""
    _, _, robots, seeds = cookie_data
    tier = synth.TIERS["t1"]
    raw = synth.spark_raw_pages(spark, tier, parallelism=8,
                                cookies=True).cache()
    raw.count()
    store, log, seen = _run(spark, raw, robots, seeds)
    assert log == _want(cookie_oracle)
    assert seen == cookie_oracle.seen
    store.destroy()
    raw.unpersist()


def test_resume_with_cookie_state(spark, cookie_data, cookie_oracle):
    """Kill after round 1, resume from disk: the jar is part of snapshot
    state, so the resumed crawl is byte-identical (SaveCookie/LoadCookie
    round-trip through the store)."""
    _, pages, robots, seeds = cookie_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    root = tempfile.mkdtemp(prefix="golden_cookie_resume_")
    store = SnapshotStore(spark, root)
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)

    store2 = SnapshotStore(spark, root)
    eng2 = CrawlEngine(spark, store2, pages, robots, None, cfg)
    assert store2.read("cookies") is not None   # jar survived the "crash"
    eng2.run(max_rounds=ROUNDS - 2)
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["image_id"]) for r in
           store2.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == _want(cookie_oracle)
    store2.destroy()


# --- RFC 6265 scoping golden (round-4 VERDICT #5) ---------------------------
#
# Hand-built corpus over subdomain hosts + multi-level paths — the shapes
# the t1 graph (flat hostN.test / /p/K) cannot express:
#   * Domain=.shop.test set on a.shop.test RIDES to b.shop.test;
#   * it does NOT ride to c.other.test (domain-match fails);
#   * a host-only cookie set on a.shop.test does NOT ride to b.shop.test;
#   * Path=/docs/guide rides /docs/guide/sub but NOT /pub/out;
#   * Max-Age=1 (rounds) rides round 1 and is expired by round 2.

def _scope_page(url, links=(), set_cookies=None, require=None):
    from crawlspark.urltools import host_of
    return {
        "url": url, "host": host_of(url), "base_href": None,
        "meta_refresh_url": None,
        "links": [{"href": h, "text": f"l{i}", "img_alt": None, "pos": i}
                  for i, h in enumerate(links)],
        "title": url, "image_id": None, "status": 200,
        "form_action": None, "form_method": None, "form_inputs": None,
        "set_cookies": set_cookies, "require_cookie": require,
    }


def _scope_corpus():
    A, B, C = "http://a.shop.test", "http://b.shop.test", "http://c.other.test"
    pages = [
        _scope_page(
            f"{A}/login",
            links=[f"{B}/account", f"{A}/docs/guide/deep", f"{C}/steal",
                   f"{B}/local", f"{A}/t1"],
            set_cookies=[
                {"name": "auth", "value": "tkn", "domain": ".shop.test",
                 "path": None, "max_age": None},
                {"name": "local", "value": "1", "domain": None,
                 "path": None, "max_age": None},
                {"name": "tmp", "value": "x", "domain": None,
                 "path": "/", "max_age": 1},
            ]),
        _scope_page(f"{B}/account", require="auth=tkn",
                    links=[f"{A}/docs/guide/sub2"]),
        _scope_page(f"{C}/steal", require="auth"),
        _scope_page(f"{B}/local", require="local"),
        _scope_page(f"{A}/t1", require="tmp"),
        _scope_page(
            f"{A}/docs/guide/deep",
            links=[f"{A}/docs/guide/sub", f"{A}/pub/out", f"{A}/t2"],
            set_cookies=[{"name": "pathc", "value": "yes", "domain": None,
                          "path": "/docs/guide", "max_age": None}]),
        _scope_page(f"{A}/docs/guide/sub", require="pathc"),
        _scope_page(f"{A}/docs/guide/sub2", require="pathc"),
        _scope_page(f"{A}/pub/out", require="pathc"),
        _scope_page(f"{A}/t2", require="tmp"),
    ]
    by_url = {p["url"]: p for p in pages}
    hosts = sorted({p["host"] for p in pages})
    robots = {h: ([], 0) for h in hosts}
    seeds = [f"{A}/login"]
    return pages, by_url, robots, seeds, hosts


def test_rfc6265_scoping_golden(spark):
    from crawlspark.synth import COOKIE_COLS_SCHEMA, PAGES_SCHEMA
    pages, by_url, robots_d, seeds_l, hosts = _scope_corpus()
    want = oracle.simulate(by_url, robots_d, seeds_l, round_ms=30_000,
                           k_global=50, max_rounds=4)

    pages_df = spark.createDataFrame(
        [tuple(p[k] for k in (
            "url", "host", "base_href", "meta_refresh_url", "links",
            "title", "image_id", "status", "form_action", "form_method",
            "form_inputs", "set_cookies", "require_cookie"))
         for p in pages],
        PAGES_SCHEMA + COOKIE_COLS_SCHEMA)
    robots_df = spark.createDataFrame(
        [(h, [], 0) for h in hosts],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long")
    seeds_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds_l)], "url string, seed_pos long")

    cfg = CrawlConfig(k_global=50, max_rounds=4, seen_shards=2,
                      seen_m_bits=1 << 14, validate_fraction=0,
                      shuffle_partitions=4)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_rfc6265_"))
    eng = CrawlEngine(spark, store, pages_df, robots_df, None, cfg)
    eng.seed(seeds_df)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["image_id"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == _want(want)

    status = {c: s for _seq, c, s, _ref, _img in log}
    A, B, C = ("http://a.shop.test", "http://b.shop.test",
               "http://c.other.test")
    assert status[f"{B}/account"] == 200        # Domain cookie rides subdomain
    assert status[f"{C}/steal"] == 403          # ...but not across domains
    assert status[f"{B}/local"] == 403          # host-only does not ride
    assert status[f"{A}/t1"] == 200             # Max-Age=1 valid in round 1
    assert status[f"{A}/t2"] == 403             # ...expired by round 2
    assert status[f"{A}/docs/guide/sub"] == 200     # in path scope (round 2)
    assert status[f"{A}/pub/out"] == 403            # outside path scope
    # sub2 is fetched in round 2 as b/account's child — also in scope
    assert status[f"{A}/docs/guide/sub2"] == 200
    # the committed jar: dot-domain normalized, invalid rows absent
    jar = {(r["domain"], r["host_only"], r["path"], r["name"])
           for r in store.read("cookies").collect()}
    assert ("shop.test", False, "/", "auth") in jar
    assert ("a.shop.test", True, "/", "local") in jar
    assert ("a.shop.test", False, "/docs/guide", "pathc") not in jar
    assert ("a.shop.test", True, "/docs/guide", "pathc") in jar
    assert not any(n == "tmp" for _d, _h, _p, n in jar)   # pruned
    store.destroy()


def test_cookie_gate_matches_oracle_randomized(spark):
    """Randomized differential: the engine's Column-side RFC 6265 matcher
    (_cookie_gate: suffix-chain broadcast equi-join + path match +
    expiry + longest-path/earliest-creation selection) against the
    oracle's sequential cookie_get, over a jar x request grid that
    covers every scope interaction — domain vs host-only, sub/sibling
    subdomains, nested/sibling/prefix-confusable paths, expired and
    unexpired rows, shadowed names."""
    import random
    from types import SimpleNamespace

    from pyspark.sql import functions as F

    from crawlspark.frontier.engine import CrawlEngine
    from crawlspark.oracle import cookie_get

    rng = random.Random(20260821)
    domains = ["a.shop.test", "b.shop.test", "shop.test", "other.test",
               "x.a.shop.test"]
    paths = ["/", "/a", "/a/b", "/ab", "/a/b/c", "/docs"]
    names = ["x", "y"]
    jar0 = {}
    for seq in range(40):
        # the real jar is UNIQUE by (domain, host_only, path, name) —
        # the harvest groupBy enforces it — so build the dict first
        # (last write wins, like the merge) and the DataFrame from it
        jar0[(rng.choice(domains), rng.random() < 0.5,
              rng.choice(paths), rng.choice(names))] = (
            f"v{seq}", seq, rng.choice([None, 1, 3, 7]))
    jar = spark.createDataFrame(
        [(d, ho, p, n, v, s, e)
         for (d, ho, p, n), (v, s, e) in jar0.items()],
        "domain string, host_only boolean, path string, "
        "name string, value string, set_seq long, "
        "expires_round long")

    req_hosts = domains + ["zz.test", "a.shop.test"]
    req_paths = paths + ["/a/bc", "/ab/c", "/docs/guide"]
    looked_rows = []
    for i in range(120):
        h = rng.choice(req_hosts)
        pth = rng.choice(req_paths)
        name = rng.choice(names)
        req = name if rng.random() < 0.5 else \
            f"{name}=v{rng.randrange(40)}"
        looked_rows.append(
            (i, f"http://{h}{pth}", h, req, 200))
    looked = spark.createDataFrame(
        looked_rows, "url_hash long, canon string, _phost string, "
                     "require_cookie string, status int")

    ns = SimpleNamespace(_COOKIE_CONTENT_COLS=CrawlEngine._COOKIE_CONTENT_COLS)
    RND = 4
    gated = CrawlEngine._cookie_gate(ns, looked, jar, RND,
                                     "url_hash", "canon")
    got = {r["url_hash"]: r["status"] for r in gated.collect()}

    from crawlspark.urltools import path_of
    for i, canon, h, req, _s in looked_rows:
        name, sep, want = req.partition("=")
        v = cookie_get(jar0, h, path_of(canon), name, RND)
        ok = (v == want) if sep else (v is not None)
        assert got[i] == (200 if ok else 403), \
            (i, h, canon, req, v, got[i])
    # both outcomes occurred (the grid actually exercises the gate)
    assert 200 in got.values() and 403 in got.values()


def test_psl_cookie_domain_validation_golden(spark):
    """Full-PSL cookie-Domain validation (CrawlConfig.psl / oracle
    psl_rules): with *.kawasaki.jp in the list, shop.kawasaki.jp is a
    PUBLIC SUFFIX, so a Domain=.shop.kawasaki.jp cookie set from
    a.shop.kawasaki.jp must be IGNORED (the literal-IN subset path
    would have accepted it — its registrable domain there is
    kawasaki.jp); the !city.kawasaki.jp exception keeps
    city.kawasaki.jp a normal registrable site whose Domain cookies
    ride to subdomains. Engine fetch log is pinned exactly against the
    sequential oracle running the same rules."""
    from crawlspark.psl import load_psl
    from crawlspark.synth import COOKIE_COLS_SCHEMA, PAGES_SCHEMA

    A = "http://a.shop.kawasaki.jp"
    B = "http://b.shop.kawasaki.jp"
    X = "http://x.a.shop.kawasaki.jp"
    C = "http://city.kawasaki.jp"
    D = "http://sub.city.kawasaki.jp"
    pages = [
        _scope_page(
            f"{A}/login",
            links=[f"{B}/steal", f"{X}/need-ok"],
            set_cookies=[
                # rejected by full PSL: Domain IS a public suffix
                {"name": "evil", "value": "1",
                 "domain": ".shop.kawasaki.jp", "path": None,
                 "max_age": None},
                # accepted: Domain == the setting host's registrable
                # domain under *.kawasaki.jp (= a.shop.kawasaki.jp)
                {"name": "ok", "value": "1",
                 "domain": ".a.shop.kawasaki.jp", "path": None,
                 "max_age": None},
            ]),
        _scope_page(
            f"{C}/set", links=[f"{D}/need-cauth"],
            set_cookies=[
                # exception rule: city.kawasaki.jp is registrable
                {"name": "cauth", "value": "1",
                 "domain": ".city.kawasaki.jp", "path": None,
                 "max_age": None},
            ]),
        _scope_page(f"{B}/steal", require="evil"),
        _scope_page(f"{X}/need-ok", require="ok"),
        _scope_page(f"{D}/need-cauth", require="cauth"),
    ]
    by_url = {p["url"]: p for p in pages}
    hosts = sorted({p["host"] for p in pages})
    robots_d = {h: ([], 0) for h in hosts}
    seeds_l = [f"{A}/login", f"{C}/set"]
    rules = load_psl()

    want = oracle.simulate(by_url, robots_d, seeds_l, round_ms=30_000,
                           k_global=50, max_rounds=3, psl_rules=rules)

    pages_df = spark.createDataFrame(
        [tuple(p[k] for k in (
            "url", "host", "base_href", "meta_refresh_url", "links",
            "title", "image_id", "status", "form_action", "form_method",
            "form_inputs", "set_cookies", "require_cookie"))
         for p in pages],
        PAGES_SCHEMA + COOKIE_COLS_SCHEMA)
    robots_df = spark.createDataFrame(
        [(h, [], 0) for h in hosts],
        "host string, disallow_prefixes array<string>, crawl_delay_ms long")
    seeds_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds_l)], "url string, seed_pos long")

    cfg = CrawlConfig(k_global=50, max_rounds=3, seen_shards=2,
                      seen_m_bits=1 << 14, validate_fraction=0,
                      shuffle_partitions=4, psl=rules)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_psl_"))
    eng = CrawlEngine(spark, store, pages_df, robots_df, None, cfg)
    eng.seed(seeds_df)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["image_id"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == _want(want)

    status = {c: s for _seq, c, s, _ref, _img in log}
    assert status[f"{B}/steal"] == 403       # evil cookie was ignored
    assert status[f"{X}/need-ok"] == 200     # rd-scoped cookie rides
    assert status[f"{D}/need-cauth"] == 200  # exception-rule site cookie
    jar = {(r["domain"], r["name"]) for r in
           store.read("cookies").collect()}
    assert ("a.shop.kawasaki.jp", "ok") in jar
    assert ("city.kawasaki.jp", "cauth") in jar
    assert not any(n == "evil" for _d, n in jar)
    store.destroy()
