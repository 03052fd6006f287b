"""Unit tests for frontier/sitemap.py (XML sitemap parsing → seeds) and
functions/text.py segment_dedup (CCNet-style duplicated-segment removal).
The driver entries (sitemap_parse, segment_dedup) pin the DuckDB
differential at sf0.01; these pin the semantic edges."""

from pyspark.sql import functions as F

from crawlspark.frontier.sitemap import (parse_sitemaps, sitemap_index_locs,
                                         sitemap_seeds, sitemap_url_entries,
                                         xml_unescape)
from crawlspark.functions.text import segment_dedup

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc> http://a.example/p?x=1&amp;y=2 </loc>
      <lastmod>2024-01-01</lastmod><priority>0.8</priority></url>
 <url attr="z"><loc>http://a.example/q</loc></url>
 <url><lastmod>2024-02-02</lastmod></url>
 junk between elements
 <url><loc>http://a.example/&lt;odd&gt;</loc><priority>bogus</priority></url>
</urlset>"""

INDEX = """<sitemapindex>
 <sitemap><loc>http://a.example/sm1.xml</loc></sitemap>
 <sitemap><loc>http://a.example/sm2.xml</loc><lastmod>2024</lastmod></sitemap>
</sitemapindex>"""


def test_sitemap_urlset_parse(spark):
    df = spark.createDataFrame([("s1", URLSET)], ["src", "body"])
    rows = (parse_sitemaps(df, src_cols=("src",))
            .orderBy("entry_pos").collect())
    # loc-less block dropped; entities unescaped; whitespace trimmed;
    # bogus priority → null (try_cast), never an ANSI error
    assert [(r.entry_pos, r.loc, r.lastmod, r.priority) for r in rows] == [
        (0, "http://a.example/p?x=1&y=2", "2024-01-01", 0.8),
        (1, "http://a.example/q", None, None),
        (2, "http://a.example/<odd>", None, None),
    ]


def test_sitemap_index_locs(spark):
    df = spark.createDataFrame([("i", INDEX), ("u", URLSET)],
                               ["src", "body"])
    got = {r.src: r.locs for r in df.select(
        "src", sitemap_index_locs(F.col("body")).alias("locs")).collect()}
    assert got["i"] == ["http://a.example/sm1.xml",
                        "http://a.example/sm2.xml"]
    assert got["u"] == []   # a urlset has no <sitemap> children
    # and a urlset parse of the index doc yields no entries
    assert df.filter(F.col("src") == "i").select(
        sitemap_url_entries(F.col("body")).alias("e")).first().e == []


def test_sitemap_seeds_total_order(spark):
    df = spark.createDataFrame(
        [("b", URLSET), ("a", URLSET)], ["src", "body"])
    seeds = sitemap_seeds(parse_sitemaps(df, src_cols=("src",)),
                          order_cols=("src", "entry_pos"), start_pos=5)
    rows = seeds.orderBy("seed_pos").collect()
    assert [r.seed_pos for r in rows] == list(range(5, 11))
    # src 'a' doc-order first, then 'b'
    assert rows[0].url == "http://a.example/p?x=1&y=2"
    assert rows[3].url == "http://a.example/p?x=1&y=2"


def test_xml_unescape_amp_last(spark):
    df = spark.createDataFrame([("&amp;lt;x&amp;amp;",)], ["s"])
    # &amp; decodes once: '&lt;x&amp;' — never a second pass to '<x&'
    assert df.select(xml_unescape(F.col("s")).alias("o")).first().o \
        == "&lt;x&amp;"


def _dedup_rows(spark, docs, seg_tokens=2):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r.doc_id: r for r in
            segment_dedup(df, seg_tokens=seg_tokens).collect()}


def test_segment_dedup_cross_doc_keep_first(spark):
    out = _dedup_rows(spark, [
        (1, "a b c d"),          # segs: "a b", "c d"
        (2, "c d a b e"),        # segs: "c d", "a b", "e" — first two dup
    ])
    assert (out[1].n_segs, out[1].n_dropped, out[1].clean_text) \
        == (2, 0, "a b c d")
    assert (out[2].n_segs, out[2].n_dropped, out[2].clean_text) \
        == (3, 2, "e")


def test_segment_dedup_within_doc_and_order(spark):
    out = _dedup_rows(spark, [(7, "x y z w x y q")])
    # segs: "x y", "z w", "x y", "q" — third is an in-doc dup of the first
    r = out[7]
    assert (r.n_segs, r.n_dropped, r.clean_text) == (4, 1, "x y z w q")


def test_segment_dedup_keep_is_min_doc_then_idx(spark):
    # same segment in doc 3 (idx 1) and doc 2 (idx 0): doc 2 keeps it
    out = _dedup_rows(spark, [(3, "p q s t"), (2, "s t")])
    assert out[2].clean_text == "s t"
    assert out[3].clean_text == "p q"
    assert out[3].n_dropped == 1


def test_segment_dedup_whitespace_and_partial_tail(spark):
    out = _dedup_rows(spark, [(1, "  a   b  c ")], seg_tokens=2)
    # \s+ tokenize → ["a","b","c"]; tail segment is the single token "c"
    assert (out[1].n_segs, out[1].clean_text) == (2, "a b c")


def test_sitemap_seeds_drive_engine_identically(spark):
    """Composition golden: seeding the engine from parsed sitemap bodies
    (one <urlset> per host, pages in doc order) produces the byte-same
    fetch_log as seeding from the direct seed list — sitemap discovery is
    a drop-in frontier source."""
    import tempfile

    from crawlspark import synth
    from crawlspark.frontier import CrawlConfig, CrawlEngine, SnapshotStore

    tier = synth.TIERS["t1"]
    pages = spark.createDataFrame(
        synth.gen_pages_pdf(0, tier.n_pages, synth.page_counts(tier),
                            tier.n_images))
    robots = synth.spark_robots(spark, tier)
    direct = synth.gen_seeds_pdf(tier)

    # one sitemap per host, containing that host's seeds in doc order
    bodies = []
    for h in sorted({int(u.split("host")[1].split(".")[0])
                     for u in direct["url"]}):
        locs = [u for u in direct["url"] if f"host{h}." in u]
        bodies.append((h, "<urlset>" + "".join(
            f"<url><loc>{u}</loc></url>" for u in locs) + "</urlset>"))
    bdf = spark.createDataFrame(bodies, ["host_idx", "body"])
    parsed = parse_sitemaps(bdf, src_cols=("host_idx",))
    # the direct list interleaves hosts (page k of every host before page
    # k+1 of any): that order is (entry_pos, host_idx)
    seeds = sitemap_seeds(parsed, order_cols=("entry_pos", "host_idx"))

    def run(seed_df):
        cfg = CrawlConfig(k_global=50, max_rounds=2, seen_shards=4,
                          seen_m_bits=1 << 16, validate_fraction=0)
        store = SnapshotStore(spark, tempfile.mkdtemp(prefix="smseed_"))
        eng = CrawlEngine(spark, store, pages, robots, None, cfg)
        eng.seed(seed_df)
        eng.run()
        return [(r["fetch_seq"], r["canon"], r["status"]) for r in
                store.read("fetch_log").orderBy("fetch_seq").collect()]

    got = run(seeds)
    want = run(spark.createDataFrame(direct))
    assert got == want and len(got) > 0


def test_robots_sitemap_directive(spark):
    from crawlspark.frontier.sitemap import robots_sitemap_urls
    body = """User-agent: *
Disallow: /private
SITEMAP: http://a.example/sm.xml
sitemap: http://a.example/sm2.xml   # trailing comment
User-agent: other
Sitemap:http://a.example/sm3.xml
notasitemap: http://x/
Sitemap:
"""
    df = spark.createDataFrame([(body,)], ["body"])
    got = df.select(robots_sitemap_urls(F.col("body")).alias("u")).first().u
    # group-independent, case-insensitive key, comments stripped; the
    # value-less directive yields nothing
    assert got == ["http://a.example/sm.xml", "http://a.example/sm2.xml",
                   "http://a.example/sm3.xml"]
