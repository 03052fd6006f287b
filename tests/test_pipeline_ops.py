"""asof_join / sampling / contamination / exact_group_quantiles unit tests
(pure-Python mirrors + semantic edge cases; the driver entries pin the
DuckDB differential at sf0.01)."""

import pytest
from pyspark.sql import functions as F

from crawlspark.functions.asof import asof_join
from crawlspark.functions.contamination import contamination
from crawlspark.functions.sampling import (default_hash, portable_mix,
                                           stratified_sample,
                                           topn_per_stratum)
from crawlspark.functions.stats import exact_group_quantiles


# -- asof ---------------------------------------------------------------------

def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 50, "d")],
        ["k", "ts", "tag"])
    right = spark.createDataFrame(
        # two right rows at k=1,ts=10: tiebreak rid max (=7) must win;
        # ts=10 is INCLUSIVE for the left ts=10 row
        [(1, 10, 6, 100.0), (1, 10, 7, 200.0), (1, 15, 8, 300.0)],
        ["k", "ts", "rid", "v"])
    out = {(r["k"], r["ts"]): r["v"]
           for r in asof_join(left, right, on="k", value_cols=["v"],
                              right_tiebreak="rid").collect()}
    assert out == {(1, 10): 200.0,   # inclusive + max-rid tie win
                   (1, 20): 300.0,   # latest preceding
                   (1, 5): None,     # nothing precedes
                   (2, 50): None}    # key with no right rows


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, on="k", value_cols=["v"])


def test_asof_matches_quadratic_reference(spark):
    import random
    rnd = random.Random(7)
    L = [(rnd.randrange(5), rnd.randrange(100), i) for i in range(200)]
    R = [(rnd.randrange(5), rnd.randrange(100), i, float(i))
         for i in range(100)]
    left = spark.createDataFrame(L, ["k", "ts", "lid"])
    right = spark.createDataFrame(R, ["k", "ts", "rid", "v"])
    got = {r["lid"]: r["v"]
           for r in asof_join(left, right, on="k", value_cols=["v"],
                              right_tiebreak="rid").collect()}
    for k, ts, lid in L:
        cand = [(rts, rid, v) for (rk, rts, rid, v) in R
                if rk == k and rts <= ts]
        want = max(cand)[2] if cand else None
        assert got[lid] == want, lid


# -- sampling -----------------------------------------------------------------

def test_stratified_sample_exact_membership(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "s"])
    rates = spark.createDataFrame([("a", 0.3), ("b", 0.0)], ["s", "rate"])
    bucket = F.pmod(portable_mix("id"), F.lit(1000))
    got = {r["id"] for r in
           stratified_sample(df, "s", rates, "id",
                             hash_bucket=bucket).collect()}
    want = {i for i, s in rows
            if s == "a" and ((i % 1000003) * 2654435761) % 2147483647
            % 1000 < 300}
    assert got == want and got  # non-empty, exact


def test_stratified_sample_xxhash_rate(spark):
    # the production default hash: keep-rate lands near the target
    df = spark.range(20000).select(F.col("id"), F.lit("x").alias("s"))
    rates = spark.createDataFrame([("x", 0.25)], ["s", "rate"])
    n = stratified_sample(df, "s", rates, "id").count()
    assert 0.22 * 20000 < n < 0.28 * 20000


def test_stratified_sample_unknown_stratum_dropped(spark):
    df = spark.createDataFrame([(1, "zz")], ["id", "s"])
    rates = spark.createDataFrame([("a", 1.0)], ["s", "rate"])
    assert stratified_sample(df, "s", rates, "id").count() == 0


def test_topn_per_stratum_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(300)], ["id", "s"])
    a = topn_per_stratum(df, "s", 7, portable_mix("id"), "id").collect()
    b = topn_per_stratum(df.repartition(13), "s", 7,
                         portable_mix("id"), "id").collect()
    ka = sorted((r["s"], r["id"]) for r in a)
    kb = sorted((r["s"], r["id"]) for r in b)
    assert ka == kb
    from collections import Counter
    assert set(Counter(s for s, _ in ka).values()) == {7}


def test_default_hash_is_xxhash64_mirror(spark):
    # bit-parity with the pure-python xxh64 mirror used by oracles
    from crawlspark.hashing import xxh64_long
    rows = spark.range(50).select(
        "id", default_hash("id", buckets=1 << 20).alias("b")).collect()
    for r in rows:
        assert r["b"] == xxh64_long(int(r["id"])) % (1 << 20)


# -- contamination ------------------------------------------------------------

def test_contamination_exact(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps"),
         (1, "a quick brown fox runs"),      # shares "quick brown fox"
         (2, "totally different words here"),
         (3, "the quick brown fox jumps over")],  # shares 3 grams w/ doc 0
        ["doc_id", "text"])
    bench = docs.filter(F.col("doc_id") == 0)
    rest = docs.filter(F.col("doc_id") != 0)
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in contamination(rest, bench, n=3).collect()}
    assert got == {1: (1, True), 2: (0, False), 3: (3, True)}


def test_contamination_short_docs_clean(spark):
    docs = spark.createDataFrame([(1, "too short"), (2, "")],
                                 ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "too short to matter")],
                                  ["doc_id", "text"])
    got = contamination(docs, bench, n=3).collect()
    assert all(r["n_hits"] == 0 and not r["contaminated"] for r in got)


# -- quantiles ----------------------------------------------------------------

def test_exact_group_quantiles_rank_definition(spark):
    rows = [("g", float(v), i) for i, v in enumerate(range(1, 11))]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = exact_group_quantiles(
        df, "g", F.col("v"), F.col("id"),
        {"p0": (0, 1), "p50": (1, 2), "p100": (1, 1)}).collect()[0]
    # n=10: rank(p)= p*(n-1) div 1 + 1 -> p0=1st(1.0) p50=(9//2)+1=5th(5.0)
    assert (out["n"], out["p0"], out["p50"], out["p100"]) == (10, 1.0, 5.0,
                                                              10.0)


def test_exact_group_quantiles_ties_and_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 1.0, 2), ("a", 2.0, 3),
         ("b", 5.0, 4)], ["g", "v", "id"])
    out = {r["g"]: r for r in exact_group_quantiles(
        df, "g", F.col("v"), F.col("id"), {"p50": (1, 2)}).collect()}
    assert out["a"]["p50"] == 1.0 and out["a"]["n"] == 3
    assert out["b"]["p50"] == 5.0 and out["b"]["n"] == 1


def test_exact_group_quantiles_validates_p(spark):
    df = spark.createDataFrame([("a", 1.0, 1)], ["g", "v", "id"])
    with pytest.raises(ValueError, match="outside"):
        exact_group_quantiles(df, "g", F.col("v"), F.col("id"),
                              {"bad": (3, 2)})


# -- temperature mixture --------------------------------------------------------

def test_mixture_plan_integer_exact(spark):
    import math
    from crawlspark.functions.sampling import mixture_plan
    rows = [("a",)] * 100 + [("b",)] * 25 + [("c",)] * 4
    df = spark.createDataFrame(rows, ["source"])
    plan = {s: (c, k) for s, c, k in mixture_plan(df, "source", 500_000)}
    total, sw = 129, math.isqrt(100) + math.isqrt(25) + math.isqrt(4)
    t = (total * 500_000) // 1_000_000            # 64
    assert plan == {s: (c, min(c, (t * math.isqrt(c)) // sw))
                    for s, c in [("a", 100), ("b", 25), ("c", 4)]}
    # sqrt temperature upweights the small source: c shares 4/129 ≈ 3.1%
    # of the corpus but gets isqrt share 2/17 ≈ 11.8% of the budget
    assert plan["c"][1] * 129 > 4 * t


def test_temperature_mixture_exact_counts_and_determinism(spark):
    from crawlspark.functions.sampling import (mixture_plan, portable_mix,
                                               temperature_mixture)
    rows = [(i, "s%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mixture(df, "source", "doc_id", 300_000,
                              hash_col=portable_mix("doc_id"))
    got = out.groupBy("source").count().collect()
    plan = {s: k for s, _, k in mixture_plan(df, "source", 300_000)}
    assert {r["source"]: r["count"] for r in got} == plan
    # deterministic: same rows on a different partitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in temperature_mixture(
        df.repartition(7), "source", "doc_id", 300_000,
        hash_col=portable_mix("doc_id")).collect())
    assert a == b


def test_temperature_mixture_budget_cap(spark):
    from crawlspark.functions.sampling import mixture_plan
    # a tiny source whose sqrt share exceeds its cardinality is capped
    df = spark.createDataFrame([("big",)] * 400 + [("tiny",)] * 2,
                               ["source"])
    plan = {s: (c, k) for s, c, k in mixture_plan(df, "source", 900_000)}
    assert plan["tiny"][1] <= 2


def test_quantile_gate_median_keep(spark):
    import pyspark.sql.functions as F

    from crawlspark.functions.stats import quantile_gate
    rows = [("a", i, float(i)) for i in range(1, 6)]       # 1..5
    rows += [("b", i, float(10 - i)) for i in range(1, 4)]  # 9,8,7
    df = spark.createDataFrame(rows, "g string, rid long, v double")
    out = quantile_gate(df, "g", F.col("v"), F.col("rid"), 50, 100,
                        value_name="score")
    got = sorted((r.g, r.rid, r.score, r.threshold) for r in out.collect())
    # group a: n=5, rank=(50*4)//100+1=3 -> threshold 3.0 -> keep 3,4,5
    # group b: n=3, rank=(50*2)//100+1=2 -> values asc 7,8,9 threshold 8.0
    assert got == [("a", 3, 3.0, 3.0), ("a", 4, 4.0, 3.0),
                   ("a", 5, 5.0, 3.0), ("b", 1, 9.0, 8.0),
                   ("b", 2, 8.0, 8.0)]


def test_epoch_shuffle_permutation_properties(spark):
    """order_idx is a dense 0..n-1 permutation; the same epoch is
    reproducible across runs; different epochs give different orders."""
    from crawlspark.functions.sampling import epoch_shuffle
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    e1 = {r["doc_id"]: r["order_idx"]
          for r in epoch_shuffle(df, "doc_id", 1).collect()}
    assert sorted(e1.values()) == list(range(200))
    e1b = {r["doc_id"]: r["order_idx"]
           for r in epoch_shuffle(df, "doc_id", 1).collect()}
    assert e1 == e1b
    e2 = {r["doc_id"]: r["order_idx"]
          for r in epoch_shuffle(df, "doc_id", 2).collect()}
    assert sorted(e2.values()) == list(range(200))
    assert e1 != e2
