"""Recrawl scheduling (frontier/recrawl.py), trap detection
(frontier/traps.py), and SURT keys (urltools.surt_key)."""

import math

from pyspark.sql import Row, functions as F

from crawlspark.frontier.recrawl import (change_history_stats,
                                         poisson_staleness,
                                         recrawl_candidates,
                                         stale_score_ppm)
from crawlspark.frontier.traps import path_template, trap_filter, trap_report
from crawlspark.urltools import surt_key


def _history(spark):
    rows = []
    # url A: 5 fetches over 400 s, 2 changes
    for i, ch in enumerate([0, 1, 0, 0, 1]):
        rows.append(Row(url="http://h1.example/a", host="h1.example",
                        ts_s=1000 + i * 100, changed=ch))
    # url B: 2 fetches over 50 s, 1 change (fresher, higher rate)
    rows.append(Row(url="http://h1.example/b", host="h1.example",
                    ts_s=1000, changed=0))
    rows.append(Row(url="http://h1.example/b", host="h1.example",
                    ts_s=1050, changed=1))
    # url C: single fetch — no observable rate
    rows.append(Row(url="http://h2.example/c", host="h2.example",
                    ts_s=1200, changed=0))
    return spark.createDataFrame(rows)


def test_change_history_stats_and_exact_score(spark):
    stats = change_history_stats(_history(spark))
    got = {r["url"]: r for r in stats.collect()}
    a = got["http://h1.example/a"]
    assert (a["n_fetches"], a["n_changes"], a["span_s"]) == (5, 2, 400)
    # exact integer ppm at now=2000: 2 * (2000-1400) * 1e6 div 400
    scored = {r["url"]: r["ppm"] for r in stats.select(
        "url", stale_score_ppm(2000).alias("ppm")).collect()}
    assert scored["http://h1.example/a"] == 2 * 600 * 1_000_000 // 400
    assert scored["http://h1.example/b"] == 1 * 950 * 1_000_000 // 50
    assert scored["http://h2.example/c"] is None  # span 0


def test_poisson_staleness_matches_numpy(spark):
    stats = change_history_stats(_history(spark))
    lam_c, p_c = poisson_staleness(2000)
    rows = {r["url"]: r for r in stats.select(
        "url", "n_fetches", "n_changes", "span_s", "last_s",
        lam_c, p_c).collect()}
    a = rows["http://h1.example/a"]
    n, x = 5.0, 2.0
    dt_bar = 400.0 / (n - 1.0)
    lam = -math.log((n - x + 0.5) / (n + 0.5)) / dt_bar
    p = 1.0 - math.exp(-lam * (2000 - 1400))
    assert abs(a["lambda_hat"] - lam) < 1e-12
    assert abs(a["p_stale"] - p) < 1e-12
    assert rows["http://h2.example/c"]["p_stale"] is None


def test_recrawl_candidates_per_host_topk(spark):
    stats = change_history_stats(_history(spark))
    picks = recrawl_candidates(stats, now_s=2000, per_host_k=1).collect()
    # only host h1 has scoreable urls; B outranks A (higher exact ppm)
    assert len(picks) == 1
    assert picks[0]["url"] == "http://h1.example/b"
    assert picks[0]["recrawl_rank"] == 1
    both = recrawl_candidates(stats, now_s=2000, per_host_k=5).collect()
    assert {(r["url"], r["recrawl_rank"]) for r in both} == {
        ("http://h1.example/b", 1), ("http://h1.example/a", 2)}


def test_path_template_and_trap_report(spark):
    urls = spark.createDataFrame(
        [Row(host="h1", path=f"/cal/20{i:02d}/{i % 12 + 1}/x")
         for i in range(10)]
        + [Row(host="h1", path="/about"), Row(host="h1", path="/about"),
           Row(host="h2", path="/cal/2024/1/x")])
    rep = trap_report(urls, min_urls=5).collect()
    assert len(rep) == 1
    r = rep[0]
    assert (r["host"], r["template"], r["n_urls"]) == ("h1", "/cal/N/N/x", 10)
    assert r["sample_path"] == "/cal/2000/1/x"
    # duplicates collapse: /about appears twice but counts once
    assert trap_report(urls, min_urls=2).filter(
        F.col("template") == "/about").count() == 0


def test_trap_filter_suppresses_flagged_only(spark):
    urls = spark.createDataFrame(
        [Row(host="h1", path=f"/cal/{i}/x") for i in range(6)]
        + [Row(host="h1", path="/keep"), Row(host="h2", path="/cal/9/x")])
    flagged = trap_report(urls, min_urls=5)
    kept = sorted((r["host"], r["path"])
                  for r in trap_filter(urls, flagged).collect())
    assert kept == [("h1", "/keep"), ("h2", "/cal/9/x")]


def test_surt_key_examples(spark):
    cases = {
        "http://www.example.com/p?b=2&a=1": "com,example,www)/p?a=1&b=2",
        "https://example.com/": "com,example)/",
        "http://a.b.cdn.example:8080/x/y": "example,cdn,b,a:8080)/x/y",
        "http://example.com/p": "com,example)/p",
    }
    df = spark.createDataFrame([Row(u=k) for k in cases])
    got = {r["u"]: r["s"] for r in
           df.select("u", surt_key("u").alias("s")).collect()}
    assert got == cases


def test_dup_span_removal_exact_shapes(spark):
    from crawlspark.functions.dedup import dup_span_removal
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e f g h"),
         Row(doc_id=2, text="x x a b c d e y"),
         Row(doc_id=3, text="a b c d q q q q a b c d"),
         Row(doc_id=4, text="a b c d e f g h"),
         Row(doc_id=5, text="short"),
         Row(doc_id=6, text="  ")])
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in dup_span_removal(docs, span_tokens=4).collect())
    assert spans == [
        (2, 2, 7, 5),    # shares "a b c d e" with doc 1 (not first)
        (3, 0, 4, 4),    # two separate repeats of "a b c d"
        (3, 8, 12, 4),
        (4, 0, 8, 8),    # full duplicate of doc 1: one merged span
    ]
