"""Canonicalization vectors (FIXTURES.md §4 url_resolve) + UDF parity."""
from pyspark.sql import functions as F

from crawlspark.urltools import canonicalize, host_of, path_of, with_canonical

BASE = "http://host1.test/p/5"


def test_relative_resolution():
    # Page.ResolveLink semantics (reference page.go:34-40)
    assert canonicalize("/p/7", BASE) == "http://host1.test/p/7"
    assert canonicalize("../p/7", BASE) == "http://host1.test/p/7"
    assert canonicalize("x/y", BASE) == "http://host1.test/p/x/y"
    assert canonicalize("http://other.test/z", BASE) == "http://other.test/z"


def test_base_href_override():
    # head base replaces the document URL (reference response.go:86-94)
    assert canonicalize("a", "http://host1.test/sub/dir/") == \
        "http://host1.test/sub/dir/a"


def test_normal_form():
    assert canonicalize("HTTP://HOST1.TEST/p/5") == "http://host1.test/p/5"
    assert canonicalize("http://host1.test:80/p/5") == "http://host1.test/p/5"
    assert canonicalize("https://host1.test:443/x") == "https://host1.test/x"
    assert canonicalize("http://host1.test:8080/x") == \
        "http://host1.test:8080/x"
    assert canonicalize("http://host1.test") == "http://host1.test/"
    assert canonicalize("http://h.test/p?b=2&a=1") == "http://h.test/p?a=1&b=2"
    assert canonicalize("http://h.test/p#frag") == "http://h.test/p"


def test_skipped_hrefs():
    assert canonicalize("#top", BASE) is None
    assert canonicalize("", BASE) is None
    assert canonicalize("mailto:x@y.z", BASE) is None
    assert canonicalize("javascript:void(0)", BASE) is None
    assert canonicalize(None, BASE) is None


def test_host_path():
    assert host_of("http://host1.test:8080/p/5") == "host1.test:8080"
    assert path_of("http://host1.test/p/5?a=1") == "/p/5"


def test_udf_matches_pure(spark):
    rows = [("HTTP://H.TEST:80/a?b=2&a=1#f", None),
            ("/p/7", BASE), ("#top", BASE), ("../q", BASE)]
    df = spark.createDataFrame(rows, ["u", "b"])
    got = [r["c"] for r in
           with_canonical(df, "u", "b", out="c").select("c").collect()]
    want = [canonicalize(u, b) for u, b in rows]
    assert got == want


def test_fused_parts_match_chained(spark):
    """url_parts_udf (one parse) must equal canonicalize + host_of/path_of
    (re-parse of the canon string) on the full vector envelope — ports,
    query sort, fragment, unusable hrefs, base-relative forms."""
    from crawlspark.urltools import url_parts_udf

    rows = [("HTTP://H.TEST:80/a?b=2&a=1#f", None),
            ("https://h.test:443/x", None),
            ("http://h.test:8080/x?z=1&z=0", None),
            ("http://h.test", None),
            ("/p/7", BASE), ("../q", BASE), ("x/y", BASE),
            ("#top", BASE), ("", BASE), ("mailto:x@y.z", BASE),
            ("javascript:void(0)", BASE), (None, BASE)]
    df = spark.createDataFrame(rows, ["u", "b"])
    got = (df.select(url_parts_udf(F.col("u"), F.col("b")).alias("p"))
           .select("p.canon", "p.host", "p.path").collect())
    for (u, b), r in zip(rows, got):
        c = canonicalize(u, b)
        assert r["canon"] == c
        assert r["host"] == (host_of(c) if c is not None else None)
        assert r["path"] == (path_of(c) if c is not None else None)


def test_url_feature_cols_envelope(spark):
    import pyspark.sql.functions as F

    from crawlspark.urltools import url_feature_cols
    rows = [
        ("http://a.test/img/cat01.JPG?w=1&h=2",),
        ("https://b.test/",),
        ("http://c.test/a/b/c/report.pdf",),
        ("http://d.test/no-ext",),
        ("http://e.test/x.tar.gz?q=1",),
        ("http://f.test",),                      # no path at all
    ]
    df = spark.createDataFrame(rows, "url string")
    f = url_feature_cols("url")
    got = [tuple(r) for r in df.select(
        f["ext"].alias("e"), f["depth"].alias("d"),
        f["n_params"].alias("p"), f["n_digits"].alias("n"),
        f["url_class"].alias("c")).collect()]
    assert got == [
        ("jpg", 2, 2, 2, "image"),
        ("", 0, 0, 0, "page"),
        ("pdf", 4, 0, 0, "doc"),
        ("", 1, 0, 0, "page"),
        ("gz", 1, 1, 0, "data"),
        ("", 0, 0, 0, "page"),
    ]


def test_registrable_domain_psl_tiers(spark):
    from crawlspark.urltools import registrable_domain
    rows = [
        ("www.example.co.uk", "example.co.uk"),     # 2-label suffix
        ("a.b.example.co.uk", "example.co.uk"),     # deep subdomain
        ("example.co.uk", "example.co.uk"),
        ("co.uk", None),                            # host IS a suffix
        ("uk", None),                               # bare TLD
        ("example.com", "example.com"),             # plain TLD
        ("www.example.com", "example.com"),
        ("user.github.io", "user.github.io"),       # PSL private domain
        ("cdn.user.github.io", "user.github.io"),
        ("github.io", None),
        ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),  # 3-label
        ("x.bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
        ("s3.amazonaws.com", None),
        ("blog.blogspot.co.uk", "blog.blogspot.co.uk"),
        ("site.unknowntld", "site.unknowntld"),     # prevailing-* rule
        ("a.site.unknowntld", "site.unknowntld"),
        ("localhost", None),                        # single label
        ("192.168.0.7", None),                      # IPv4 literal
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "host string")
    got = [r.site for r in df.select(
        registrable_domain("host").alias("site")).collect()]
    assert got == [want for _, want in rows]


def test_canonicalize_idn_punycode():
    from crawlspark.urltools import canonicalize, host_of
    # unicode host → RFC 3490 ACE form, case-folded first
    assert canonicalize("http://MÜNCHEN.example/p1") == \
        "http://xn--mnchen-3ya.example/p1"
    # only the unicode label is encoded; ASCII labels pass through
    assert canonicalize("http://sub5.東京.example/x") == \
        "http://sub5.xn--1lqs71d.example/x"
    # already-punycode input is case-folded, not double-encoded
    assert canonicalize("http://XN--MNCHEN-3YA.example/") == \
        "http://xn--mnchen-3ya.example/"
    # non-default port and query sort still apply
    assert canonicalize("http://español.example:8080/q?b=1&a=2") == \
        "http://xn--espaol-zwa.example:8080/q?a=2&b=1"
    # host_of of the canonical form is the ACE host (seen/politeness key)
    assert host_of(canonicalize("https://www.héllo.example/")) == \
        "www.xn--hllo-bpa.example"
    # unencodable (overlong label) → unusable href
    assert canonicalize("http://" + "ü" * 64 + ".example/") is None


def test_py_registrable_domain_matches_column_twin(spark):
    """The pure-Python mirror (used by the sequential cookie oracle) is
    bit-identical to the Column expression over every PSL shape class."""
    from pyspark.sql import functions as F

    from crawlspark.urltools import py_registrable_domain, registrable_domain

    hosts = [
        "example.com", "www.example.com", "a.b.example.com",
        "example.co.uk", "www.example.co.uk", "deep.a.example.co.uk",
        "co.uk", "uk", "com",                       # public suffixes/TLDs
        "foo.github.io", "github.io",               # private PSL section
        "bucket.s3.amazonaws.com", "s3.amazonaws.com",
        "x.blogspot.co.uk", "blogspot.co.uk",
        "10.1.2.3", "localhost",                    # IP / single label
        "host3.test", "a.host3.test", "b.a.host3.test",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["rd"] for r in
           df.select("host", registrable_domain().alias("rd")).collect()}
    want = {h: py_registrable_domain(h) for h in hosts}
    assert got == want
