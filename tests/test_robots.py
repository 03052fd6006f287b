"""REP (robots.txt) parsing + matching — vectors from RFC 9309 §2.2.2 /
§5 and the long-public Google REP documentation examples."""
import pytest

from crawlspark.frontier.robots import parse_robots, rule_allows

SAMPLE = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/open
Crawl-delay: 4.5

User-agent: crawlspark
User-agent: otherbot
Disallow: /only-for-us/
Crawl-delay: 2
"""


def test_group_selection_specific_beats_star():
    d = parse_robots(SAMPLE, agent="crawlspark/1.0")
    assert d["rules"] == [(False, "/only-for-us/")]
    assert d["crawl_delay_ms"] == 2000


def test_star_group_and_fractional_delay():
    d = parse_robots(SAMPLE, agent="randombot")
    assert (False, "/private/") in d["rules"]
    assert (True, "/private/open") in d["rules"]
    assert d["crawl_delay_ms"] == 4500


def test_consecutive_agent_lines_share_group():
    d = parse_robots(SAMPLE, agent="otherbot")
    assert d["rules"] == [(False, "/only-for-us/")]


def test_no_matching_group_allows_all():
    body = "User-agent: nobody\nDisallow: /"
    assert parse_robots(body, agent="crawlspark")["rules"] == []


def test_rules_before_any_group_ignored_and_empty_disallow():
    body = "Disallow: /lost\nUser-agent: *\nDisallow:\nAllow: /x"
    d = parse_robots(body, agent="a")
    assert d["rules"] == [(True, "/x")]


def test_duplicate_groups_merge_rules():
    """RFC 9309 §2.2.1: rules from ALL groups matching the agent combine —
    a second 'User-agent: *' group's disallows must not be dropped."""
    body = ("User-agent: *\nDisallow: /a/\nCrawl-delay: 3\n\n"
            "User-agent: *\nDisallow: /b/\nAllow: /b/open\n")
    d = parse_robots(body, agent="anybot")
    assert d["rules"] == [(False, "/a/"), (False, "/b/"), (True, "/b/open")]
    assert d["crawl_delay_ms"] == 3000  # first non-None delay among winners
    # the merged rule set actually blocks both subtrees
    assert rule_allows("/a/x", d["rules"]) is False
    assert rule_allows("/b/x", d["rules"]) is False
    assert rule_allows("/b/open/x", d["rules"]) is True


def test_duplicate_groups_merge_only_at_winning_specificity():
    """A duplicate '*' group does NOT leak into a more specific agent's
    decision: only groups at the max specificity merge."""
    body = ("User-agent: *\nDisallow: /star/\n\n"
            "User-agent: crawlspark\nDisallow: /us/\n\n"
            "User-agent: crawlspark\nDisallow: /us2/\n")
    d = parse_robots(body, agent="crawlspark")
    assert d["rules"] == [(False, "/us/"), (False, "/us2/")]


# longest-match precedence — RFC 9309 §5.2 / Google REP example table
CASES = [
    ("/page",       [(True, "/p"), (False, "/")],            True),
    ("/folder/page", [(True, "/folder"), (False, "/folder")], True),
    ("/page.htm",   [(True, "/page"), (False, "/*.htm")],     False),
    ("/page.php5",  [(True, "/page"), (False, "/*.ph")],      True),
    ("/",           [(True, "/$"), (False, "/")],             True),
    ("/page.htm2",  [(True, "/$"), (False, "/")],             False),
    ("/fish.html",  [(False, "/fish*")],                      False),
    ("/fishheads/x", [(False, "/fish")],                      False),
    ("/Fish.asp",   [(False, "/fish")],                       True),
    ("/folder/filename.php", [(False, "/*.php")],             False),
    ("/filename.php5",       [(False, "/*.php$")],            True),
    ("/filename.php",        [(False, "/*.php$")],            False),
    ("/anything",   [],                                       True),
]


@pytest.mark.parametrize("path,rules,want", CASES)
def test_longest_match_precedence(path, rules, want):
    assert rule_allows(path, rules) is want


def test_spark_parse_and_match(spark):
    """robots_cache_from_bodies + rep_allowed_col agree with the kernel."""
    from pyspark.sql import functions as F

    from crawlspark.frontier.robots import (rep_allowed_col,
                                            robots_cache_from_bodies)
    bodies = spark.createDataFrame(
        [("h1", SAMPLE), ("h2", "User-agent: *\nDisallow: /*.htm$")],
        "host string, body string")
    cache = robots_cache_from_bodies(bodies, agent="crawlspark")
    rows = {r["host"]: r for r in cache.collect()}
    assert rows["h1"]["crawl_delay_ms"] == 2000
    assert [tuple(x) for x in rows["h1"]["rules"]] == [(False, "/only-for-us/")]

    paths = spark.createDataFrame(
        [("h1", "/only-for-us/secret"), ("h1", "/elsewhere"),
         ("h2", "/a/page.htm"), ("h2", "/a/page.html")],
        "host string, path string")
    out = (paths.join(cache, "host", "left")
           .withColumn("ok", rep_allowed_col())
           .orderBy("host", "path").collect())
    got = [(r["host"], r["path"], r["ok"]) for r in out]
    assert got == [
        ("h1", "/elsewhere", True),
        ("h1", "/only-for-us/secret", False),
        ("h2", "/a/page.htm", False),
        ("h2", "/a/page.html", True),
    ]

    # kernel vs expression parity on the RFC vectors
    rules_df = spark.createDataFrame(
        [(p, [{"allow": a, "pattern": pt} for a, pt in rs], want)
         for p, rs, want in CASES],
        f"path string, rules array<struct<allow:boolean,pattern:string>>, "
        f"want boolean")
    mism = (rules_df
            .withColumn("ok", rep_allowed_col())
            .filter(F.col("ok") != F.col("want")).count())
    assert mism == 0


def test_engine_accepts_rep_rules_shape(spark, tmp_path):
    """Engine with REP-rules robots == engine with the equivalent legacy
    disallow_prefixes shape (same graph, same budgets) — fetch logs equal."""
    from pyspark.sql import functions as F

    from crawlspark import synth
    from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=4)
    seeds = synth.spark_seeds(spark, tier)
    legacy = synth.spark_robots(spark, tier)
    rep = legacy.select(
        "host",
        F.transform(F.col("disallow_prefixes"),
                    lambda p: F.struct(F.lit(False).alias("allow"),
                                       p.alias("pattern"))).alias("rules"),
        "crawl_delay_ms")

    logs = []
    for robots in (legacy, rep):
        cfg = CrawlConfig(k_global=150, max_rounds=3, seen_shards=4,
                          seen_m_bits=1 << 16, validate_fraction=0)
        store = SnapshotStore(spark, str(tmp_path / f"rep_{len(logs)}"))
        eng = CrawlEngine(spark, store, pages, robots, None, cfg)
        eng.seed(seeds)
        eng.run()
        logs.append([(r["fetch_seq"], r["canon"], r["status"])
                     for r in store.read("fetch_log")
                     .orderBy("fetch_seq").collect()])
        store.destroy()
    assert logs[0] == logs[1]
    assert len(logs[0]) > 0


def test_engine_with_parsed_robots_bodies_matches_oracle(spark, tmp_path):
    """End-to-end parse-at-crawl path: raw robots.txt bodies →
    robots_cache_from_bodies (REP rules + crawl-delay) → engine. The crawl
    must equal the sequential oracle run on the pre-parsed fixture rules
    (the bodies round-trip the same policy)."""
    from crawlspark import oracle, synth
    from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore
    from crawlspark.frontier.robots import robots_cache_from_bodies

    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=4)
    seeds = synth.spark_seeds(spark, tier)
    bodies = synth.spark_robots_bodies(spark, tier)
    cache = robots_cache_from_bodies(bodies, agent="crawlspark")

    cfg = CrawlConfig(k_global=150, max_rounds=3, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = SnapshotStore(spark, str(tmp_path / "robots_e2e"))
    eng = CrawlEngine(spark, store, pages, cache, None, cfg)
    eng.seed(seeds)
    eng.run()
    log = [(r["fetch_seq"], r["canon"], r["status"]) for r in
           store.read("fetch_log").orderBy("fetch_seq").collect()]

    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    want = oracle.simulate(pages_by_url,
                           robots, list(synth.gen_seeds_pdf(tier)["url"]),
                           round_ms=30_000, k_global=150, max_rounds=3)
    assert log == [(r["fetch_seq"], r["canon"], r["status"])
                   for r in want.fetch_log]
    assert len(log) > 0
    store.destroy()


def test_robots_sitemap_urls_envelope(spark):
    import pyspark.sql.functions as F

    from crawlspark.frontier.robots import robots_sitemap_urls
    body = ("User-agent: *\r\n"
            "Sitemap: http://a.example/s1.xml\r\n"
            "  sitemap:\thttp://a.example/s2.xml  # comment\n"
            "SITEMAP:http://a.example/s3.xml\n"
            "Sitemap:\n"              # no value -> skipped
            "# Sitemap: http://a.example/nope.xml\n"
            "Disallow: /x\n"
            "NotSitemap: http://a.example/also-nope.xml")
    df = spark.createDataFrame([(body,)], "body string")
    got = df.select(robots_sitemap_urls(F.col("body"))
                    .alias("u")).collect()[0]["u"]
    assert got == ["http://a.example/s1.xml", "http://a.example/s2.xml",
                   "http://a.example/s3.xml"]
