"""Crawl-order golden tests: engine == sequential oracle, exactly
(BASELINE.json: crawl-order/URL-seen exact match; resume byte-identity)."""
import tempfile

import pytest

from crawlspark import oracle, synth
from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

K = 200
ROUNDS = 4


@pytest.fixture(scope="module")
def t1_data(spark):
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=8).cache()
    pages.count()
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    return tier, pages, robots, seeds


@pytest.fixture(scope="module")
def oracle_result():
    tier = synth.TIERS["t1"]
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    seeds = list(synth.gen_seeds_pdf(tier)["url"])
    return oracle.simulate(pages_by_url, robots, seeds,
                           round_ms=30_000, k_global=K, max_rounds=ROUNDS)


def run_engine(spark, t1_data, kind):
    tier, pages, robots, seeds = t1_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_kind=kind,
                      seen_shards=4, seen_m_bits=1 << 16,
                      validate_fraction=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix=f"golden_{kind}_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    return store, log, seen


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_engine_matches_oracle(spark, t1_data, oracle_result, kind):
    store, log, seen = run_engine(spark, t1_data, kind)
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in oracle_result.fetch_log]
    assert len(log) == len(want)
    assert log == want                      # exact crawl order
    assert seen == oracle_result.seen       # exact URL-seen set
    store.destroy()


def test_resume_is_byte_identical(spark, t1_data, oracle_result):
    tier, pages, robots, seeds = t1_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    root = tempfile.mkdtemp(prefix="golden_resume_")
    store = SnapshotStore(spark, root)
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)          # "crash" after round 1

    # fresh engine + store objects — only disk state survives
    store2 = SnapshotStore(spark, root)
    eng2 = CrawlEngine(spark, store2, pages, robots, None, cfg)
    assert store2.last_round() == 1
    eng2.run(max_rounds=ROUNDS - 2)

    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
           for r in store2.read("fetch_log").orderBy("fetch_seq").collect()]
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
            for r in oracle_result.fetch_log]
    assert log == want
    store2.destroy()


def test_payload_validation_passes(spark, t1_data):
    tier, pages, robots, seeds = t1_data
    images = synth.spark_images(spark, tier, parallelism=8)
    cfg = CrawlConfig(k_global=100, max_rounds=2, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0.2)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_val_"))
    eng = CrawlEngine(spark, store, pages, robots, images, cfg)
    eng.seed(seeds)
    stats = eng.run()   # raises if any sampled payload fails fidelity
    assert stats[0]["fetched"] > 0
    store.destroy()


def test_hot_host_budget_respected(spark, t1_data, oracle_result):
    """Politeness: per-round per-host fetch counts never exceed the
    carryover-aware budget ((round_ms + credit) // delay with credit ≤
    delay), refreshes excluded by contract."""
    tier, pages, robots, seeds = t1_data
    delays = {r["host"]: int(r["crawl_delay_ms"])
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    per = {}
    for r in oracle_result.fetch_log:
        if r["is_refresh"]:
            continue
        host = r["canon"].split("/")[2]
        per.setdefault((r["round"], host), 0)
        per[(r["round"], host)] += 1
    for (rnd, host), n in per.items():
        d = delays.get(host, 0)
        budget = K if d == 0 else max(1, (30_000 + d) // d)
        assert n <= budget, (rnd, host, n, budget)


def test_engine_matches_oracle_raw_bodies(spark, t1_data, oracle_result):
    """The raw-body path: the corpus carries HTML BYTES (+ Content-Type),
    pages are decoded (U4 charset chain) and parsed (P1 link extraction)
    at fetch time — and the crawl order / seen set still match the
    sequential oracle exactly. This is the reference's actual body path
    (response.go:27-94, session.go:343-358) end-to-end."""
    tier, _, robots, seeds = t1_data
    raw_pages = synth.spark_raw_pages(spark, tier, parallelism=8).cache()
    raw_pages.count()
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_raw_"))
    eng = CrawlEngine(spark, store, raw_pages, robots, None, cfg)
    assert eng._raw
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in oracle_result.fetch_log]
    assert len(log) == len(want)
    assert log == want
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    assert seen == oracle_result.seen

    # S11: the failure table holds exactly the non-2xx fetches (≤cap/round)
    dbg = store.read("debug_samples").collect()
    want_bad = [r for r in oracle_result.fetch_log
                if not (200 <= r["status"] <= 299)]
    assert {(r["fetch_seq"], r["status"]) for r in dbg} \
        == {(r["fetch_seq"], r["status"]) for r in want_bad}
    store.destroy()
    raw_pages.unpersist()


def test_body_filter_changes_crawl(spark, t1_data):
    """P10 end-to-end: a BodyFilter that strips every link leaves the crawl
    with no discoveries — only seeds (and their meta-refreshes) are ever
    fetched. The same run without the filter expands normally."""
    tier, _, robots, seeds = t1_data
    raw_pages = synth.spark_raw_pages(spark, tier, parallelism=8)
    cfg = CrawlConfig(k_global=K, max_rounds=2, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)

    def run(flt):
        store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_bf_"))
        eng = CrawlEngine(spark, store, raw_pages, robots, None, cfg,
                          body_filter=flt)
        eng.seed(seeds)
        eng.run()
        n = store.read("fetch_log").count()
        store.destroy()
        return n

    strip = lambda b: b.replace(b"<a href=", b"<a data-href=")
    n_filtered = run(strip)
    n_plain = run(None)
    n_seeds = seeds.count()
    assert n_filtered <= n_seeds * 2      # seeds + their refreshes only
    assert n_plain > n_filtered


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_engine_matches_oracle_sharded_blobs(spark, t1_data, oracle_result,
                                             kind):
    """Forces the beyond-broadcast FILTER regime
    (seen_blob_broadcast_bytes=0): the Bloom/cuckoo probe exchanges the
    frontier by shard id and each task reads only its own shard's blob from
    the shard-partitioned seen_shards files; the incremental build likewise
    reads prior blobs executor-side. No driver blob load, no broadcast —
    and the crawl order / seen set still match the oracle exactly."""
    tier, pages, robots, seeds = t1_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_kind=kind,
                      seen_shards=4, seen_m_bits=1 << 16,
                      validate_fraction=0, seen_blob_broadcast_bytes=0,
                      # the approximate filter only runs beyond the
                      # broadcastable-seen regime (engine skips it as pure
                      # overhead otherwise) — force that regime here
                      seen_broadcast_rows=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_shblob_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in oracle_result.fetch_log]
    assert log == want
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    assert seen == oracle_result.seen
    store.destroy()


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_engine_matches_oracle_bucketed_seen(spark, t1_data, oracle_result,
                                             kind):
    """Forces the beyond-broadcast exact-decide path
    (seen_broadcast_rows=0 -> broadcast-blob Bloom/cuckoo pre-filter +
    per-bucket executor-side probe against the hash-partitioned seen
    table) — order and seen set must still match the oracle exactly."""
    tier, pages, robots, seeds = t1_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_kind=kind,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      seen_broadcast_rows=0, seen_buckets=8)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_bkt_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in oracle_result.fetch_log]
    assert log == want
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    assert seen == oracle_result.seen
    store.destroy()


def test_engine_matches_oracle_auto_submit_forms(spark, t1_data):
    """S3 end-to-end (form.go:338-401): with auto_submit_forms on, a 2xx
    page carrying a GET form also discovers its submit URL (action +
    sorted urlencoded defaults) in the reserved document-order slot — and
    the crawl STILL matches the sequential oracle exactly. The oracle
    resolves defaults and urlencodes with its own independent
    implementation (oracle._form_submit_href vs forms.submit_href)."""
    tier, pages, robots, seeds = t1_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      auto_submit_forms=True)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_form_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]

    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots_d = {r["host"]: (list(r["disallow_prefixes"]),
                            int(r["crawl_delay_ms"]))
                for r in synth.gen_robots_pdf(
                    tier.n_hosts).to_dict("records")}
    seeds_l = list(synth.gen_seeds_pdf(tier)["url"])
    want_res = oracle.simulate(pages_by_url, robots_d, seeds_l,
                               round_ms=30_000, k_global=K,
                               max_rounds=ROUNDS, auto_submit_forms=True)
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in want_res.fetch_log]
    assert log == want
    # the form path visibly changes the crawl: submit URLs got fetched
    assert any("?" in c and ("q=" in c) for _s, c, *_ in log)
    seen = {r["url_hash"] for r in store.read("seen").collect()}
    assert seen == want_res.seen
    store.destroy()


def test_engine_auto_submit_raw_bodies(spark, t1_data):
    """Same as above but over RAW HTML bodies: the form is extracted by the
    parse kernel at fetch time (inputs/selects in document order), then
    resolved and submitted — identical crawl to the structured run."""
    tier, pages, robots, seeds = t1_data
    raw_pages = synth.spark_raw_pages(spark, tier, parallelism=8)
    cfg = CrawlConfig(k_global=K, max_rounds=2, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      auto_submit_forms=True)

    def run(corpus):
        store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_fr_"))
        eng = CrawlEngine(spark, store, corpus, robots, None, cfg)
        eng.seed(seeds)
        eng.run()
        log = [(r["fetch_seq"], r["canon"], r["status"])
               for r in store.read("fetch_log")
               .orderBy("fetch_seq").collect()]
        store.destroy()
        return log

    assert run(raw_pages) == run(pages)


def test_engine_matches_oracle_robots_from_bodies(spark, t1_data,
                                                  oracle_result):
    """Robots end-to-end (U6/U7 at the crawl level): the engine consumes
    raw /robots.txt BODIES parsed by the RFC 9309 parser
    (robots_cache_from_bodies), while the oracle parses the SAME bodies
    with parse_robots and decides via its own pure-Python longest-match
    (oracle.simulate rules form). The crawl also equals the prefix-fixture
    run — gen_robots_body round-trips — proving both robots paths agree."""
    from crawlspark.frontier.robots import (parse_robots,
                                            robots_cache_from_bodies)
    tier, pages, _, seeds = t1_data
    robots = robots_cache_from_bodies(synth.spark_robots_bodies(spark, tier))
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_repbody_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]

    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots_d = {f"host{h}.test": parse_robots(synth.gen_robots_body(h))
                for h in range(tier.n_hosts)}
    want_res = oracle.simulate(pages_by_url, robots_d,
                               list(synth.gen_seeds_pdf(tier)["url"]),
                               round_ms=30_000, k_global=K,
                               max_rounds=ROUNDS)
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in want_res.fetch_log]
    assert log == want
    # round-trip sanity: bodies-derived run == prefix-fixture run
    assert want == [(r["fetch_seq"], r["canon"], r["status"],
                     r["is_refresh"], r["ref_url"])
                    for r in oracle_result.fetch_log]
    assert {r["url_hash"] for r in store.read("seen").collect()} \
        == want_res.seen
    store.destroy()


@pytest.mark.parametrize("cadence", [1, 3, 100])
def test_frontier_mor_commits_match_oracle(spark, t1_data, oracle_result,
                                           cadence):
    """Merge-on-read frontier commits at three cadences — compact every
    round (the old eager behavior), mid-crawl compaction, and never-compact
    (pure delta stack) — all reconstruct the identical frontier: crawl
    order and seen set equal the oracle exactly, including a resume that
    lands between compactions."""
    tier, pages, robots, seeds = t1_data
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      frontier_compact_every=cadence)
    root = tempfile.mkdtemp(prefix=f"golden_mor{cadence}_")
    store = SnapshotStore(spark, root)
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)
    # resume mid-delta-stack from disk state only
    store2 = SnapshotStore(spark, root)
    eng2 = CrawlEngine(spark, store2, pages, robots, None, cfg)
    eng2.run(max_rounds=ROUNDS - 2)
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store2.read("fetch_log").orderBy("fetch_seq").collect()]
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in oracle_result.fetch_log]
    assert log == want
    assert {r["url_hash"] for r in store2.read("seen").collect()} \
        == oracle_result.seen
    # the delta tables actually carried the rounds between compactions
    if cadence > 1:
        assert store2.read("frontier_add") is not None
        assert store2.last_committed_round("frontier") < ROUNDS - 1
    else:
        assert store2.read("frontier_add") is None
    store2.destroy()


def _oracle_phash_run():
    tier = synth.TIERS["t1"]
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    seeds = list(synth.gen_seeds_pdf(tier)["url"])
    ipdf = synth.gen_images_pdf(0, tier.n_images, materialize_bytes=False)
    image_phash = {i: int(p) for i, p in zip(ipdf["image_id"], ipdf["phash"])}
    return oracle.simulate(pages_by_url, robots, seeds, round_ms=30_000,
                           k_global=K, max_rounds=ROUNDS,
                           image_phash=image_phash, phash_dedup=True)


def test_phash_dedup_matches_oracle(spark, t1_data):
    """North-rule phash dedup: the first fetch (fetch_seq order, across
    rounds) of each exact perceptual hash wins; every later fetch of the
    same phash is recorded in payload_dups with dup_of = the winner's
    fetch_seq. Engine == sequential oracle, element for element — and the
    fetch log itself is unchanged by the stage (dedup is a side record,
    not a fetch semantic). t1 maps 2,000 pages onto 1,000 images and ~1%
    of images share pixels (synth.gen_image_row), so both dup kinds
    (same image_id, distinct ids w/ equal phash) occur."""
    tier, pages, robots, seeds = t1_data
    images = synth.spark_images(spark, tier, parallelism=8)
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      phash_dedup=True)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_phash_"))
    eng = CrawlEngine(spark, store, pages, robots, images, cfg)
    eng.seed(seeds)
    eng.run()
    o = _oracle_phash_run()
    got = [(r["round"], r["fetch_seq"], r["image_id"], r["phash"],
            r["dup_of"]) for r in
           store.read("payload_dups").orderBy("fetch_seq").collect()]
    want = [(d["round"], d["fetch_seq"], d["image_id"], d["phash"],
             d["dup_of"]) for d in o.payload_dups]
    assert len(want) > 0           # the fixture actually exercises dedup
    assert got == want
    # winners state: unique by phash, and exactly the oracle's first-seen map
    winners = {r["phash"]: r["first_seq"]
               for r in store.read("phash_seen").collect()}
    assert len(winners) == store.read("phash_seen").count()
    # every dup points at a seq that is NOT itself a dup and shares the phash
    dup_seqs = {d["fetch_seq"] for d in o.payload_dups}
    for d in o.payload_dups:
        assert d["dup_of"] not in dup_seqs
        assert winners[d["phash"]] == d["dup_of"]
    # fetch log unchanged by the stage
    log = [(r["fetch_seq"], r["canon"], r["status"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    want_log = [(r["fetch_seq"], r["canon"], r["status"])
                for r in o.fetch_log]
    assert log == want_log
    store.destroy()


def test_phash_dedup_resume(spark, t1_data):
    """phash_seen state round-trips a kill/resume: a run killed after
    round 1 and resumed in fresh objects produces the same payload_dups
    as the one-shot oracle (cross-round dups must see the committed
    winners, not an empty map)."""
    tier, pages, robots, seeds = t1_data
    images = synth.spark_images(spark, tier, parallelism=8)
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      phash_dedup=True)
    root = tempfile.mkdtemp(prefix="golden_phash_resume_")
    store = SnapshotStore(spark, root)
    eng = CrawlEngine(spark, store, pages, robots, images, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)

    store2 = SnapshotStore(spark, root)
    eng2 = CrawlEngine(spark, store2, pages, robots, images, cfg)
    eng2.run(max_rounds=ROUNDS - 2)
    o = _oracle_phash_run()
    got = [(r["round"], r["fetch_seq"], r["image_id"], r["phash"],
            r["dup_of"]) for r in
           store2.read("payload_dups").orderBy("fetch_seq").collect()]
    want = [(d["round"], d["fetch_seq"], d["image_id"], d["phash"],
             d["dup_of"]) for d in o.payload_dups]
    # the kill happened mid-run, so dups must span both run segments
    assert {g[0] for g in got} >= {0, 2}
    assert got == want
    store2.destroy()


def test_payload_validation_failure_aborts_commit(spark, t1_data):
    """Fidelity failure must precede the atomic commit point even though
    the validation action now overlaps the commit's table writes: the
    round directory stays invisible (manifest not replaced), exactly as
    if the process had crashed mid-commit."""
    from pyspark.sql import functions as F
    tier, pages, robots, seeds = t1_data
    images = (synth.spark_images(spark, tier, parallelism=8)
              .withColumn("phash", F.col("phash") + F.lit(1)))  # corrupt
    cfg = CrawlConfig(k_global=100, max_rounds=1, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=1.0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_valfail_"))
    eng = CrawlEngine(spark, store, pages, robots, images, cfg)
    eng.seed(seeds)
    with pytest.raises(RuntimeError, match="payload fidelity"):
        eng.run()
    assert store.last_round() == -1          # only the seed commit exists
    assert store.read("fetch_log").count() == 0
    store.destroy()


def test_curate_images_matches_oracle(spark, t1_data):
    """Payload-curation gate (cfg.curate_images): every fetched 2xx image
    failing the training predicate lands in image_rejects with the FIRST
    failing reason, element-for-element equal to the sequential oracle —
    and the fetch log is unchanged by the stage. aspect_num=2 so both
    min_side and aspect reasons fire on the synth corpus."""
    tier, pages, robots, seeds = t1_data
    images = synth.spark_images(spark, tier, parallelism=8)
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      curate_images=True, curate_aspect_num=2)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_curate_"))
    eng = CrawlEngine(spark, store, pages, robots, images, cfg)
    eng.seed(seeds)
    eng.run()

    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots_d = {r["host"]: (list(r["disallow_prefixes"]),
                            int(r["crawl_delay_ms"]))
                for r in synth.gen_robots_pdf(
                    tier.n_hosts).to_dict("records")}
    seed_urls = list(synth.gen_seeds_pdf(tier)["url"])
    ipdf = synth.gen_images_pdf(0, tier.n_images, materialize_bytes=False)
    image_meta = {i: (int(w), int(h), c)
                  for i, w, h, c in zip(ipdf["image_id"], ipdf["w"],
                                        ipdf["h"], ipdf["caption"])}
    o = oracle.simulate(pages_by_url, robots_d, seed_urls,
                        round_ms=30_000, k_global=K, max_rounds=ROUNDS,
                        image_meta=image_meta, curate_images=True,
                        curate_aspect_num=2)
    got = [(r["round"], r["fetch_seq"], r["image_id"], r["reason"])
           for r in store.read("image_rejects")
           .orderBy("fetch_seq").collect()]
    want = [(d["round"], d["fetch_seq"], d["image_id"], d["reason"])
            for d in o.image_rejects]
    assert len(want) > 0
    assert {r[3] for r in want} >= {"min_side", "aspect"}
    assert got == want
    # fetch log unchanged by the stage
    log = [(r["fetch_seq"], r["canon"], r["status"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == [(r["fetch_seq"], r["canon"], r["status"])
                   for r in o.fetch_log]
    store.destroy()


def test_seen_filter_regime_flip_mid_crawl(spark, t1_data, oracle_result):
    """Round-4 serial-fraction cut: while the seen set is broadcastable,
    shard builds are SKIPPED entirely (no seen_shards table in those
    snapshots); the first round whose committed total crosses
    seen_broadcast_rows does ONE full rebuild from the exact seen set,
    and the beyond-broadcast sharded probe then runs against complete
    shards — crawl order and seen set still exactly match the oracle."""
    tier, pages, robots, seeds = t1_data
    # t1/K=200: round totals cross 300 during round 1, so rounds 0-1 are
    # unsharded, the flip rebuild runs at round 1's commit, and rounds 2+
    # probe through the sharded path (blob broadcast forced off)
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0,
                      seen_broadcast_rows=300,
                      seen_blob_broadcast_bytes=0)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_flip_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    stats = eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    want = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in oracle_result.fetch_log]
    assert log == want
    assert {r["url_hash"] for r in store.read("seen").collect()} \
        == oracle_result.seen
    # the flip actually happened: shards exist now, and the rebuilt set
    # has no false negatives over every seen hash
    shards = store.read_local("seen_shards")
    assert shards and len({r["shard"] for r in shards}) == 4
    from crawlspark.frontier.seen import SeenFilter
    filt = SeenFilter("bloom", n_shards=4, m_bits=1 << 16)
    from pyspark.sql import functions as F
    flags = (store.read("seen").select("url_hash")
             .withColumn("m", filt.might_contain_col(
                 shards, F.col("url_hash"), spark)).collect())
    assert all(r["m"] for r in flags)
    store.destroy()
    assert sum(s["fetched"] for s in stats) == len(want)


def test_engine_matches_oracle_t2_scale(spark):
    """Exactness at the t2 correctness tier (20k pages / 64 hosts — 20×
    the t1 graph, WITH hot-host skew): 3 rounds at k=1000, crawl order
    and seen set equal to the sequential oracle element-for-element.
    The larger graph exercises salting, the budget gate, and the
    priority-histogram cut at row counts where partition boundaries
    actually move — a scale datapoint the t1 goldens cannot give."""
    tier = synth.TIERS["t2"]
    pages = synth.spark_pages(spark, tier, parallelism=8).cache()
    pages.count()
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots_d = {r["host"]: (list(r["disallow_prefixes"]),
                            int(r["crawl_delay_ms"]))
                for r in synth.gen_robots_pdf(
                    tier.n_hosts).to_dict("records")}
    seeds_l = list(synth.gen_seeds_pdf(tier)["url"])
    want = oracle.simulate(pages_by_url, robots_d, seeds_l,
                           round_ms=30_000, k_global=1000, max_rounds=3)

    cfg = CrawlConfig(k_global=1000, max_rounds=3, seen_shards=8,
                      seen_m_bits=1 << 18, validate_fraction=0,
                      shuffle_partitions=16)
    store = SnapshotStore(spark, tempfile.mkdtemp(prefix="golden_t2_"))
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
            r["ref_url"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]
    wlog = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"],
             r["ref_url"]) for r in want.fetch_log]
    assert len(log) == len(wlog) and log == wlog
    assert {r["url_hash"] for r in store.read("seen").collect()} \
        == want.seen
    store.destroy()
    pages.unpersist()
