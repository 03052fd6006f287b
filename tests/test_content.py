"""Main-content extraction (operators/content.py): block segmentation,
chrome-subtree dropping, integer link density, classification bounds,
and the Spark block/main-text paths."""

from pyspark.sql import Row

from crawlspark.operators.content import (extract_blocks,
                                          main_content_blocks, main_text)


def test_segmentation_and_chrome_dropped():
    html = ("<html><header>Site <nav>Home About</nav> chrome</header>"
            "<p>one two three four five six</p>"
            "<div><a href='/x'>all link text</a></div>"
            "<p>tail block with plenty of words here</p>"
            "<footer>(c) 2024 corp</footer></html>")
    blocks = extract_blocks(html)
    assert [b["block_idx"] for b in blocks] == [0, 1, 2]
    assert blocks[0]["text"] == "one two three four five six"
    assert blocks[0]["is_content"] and blocks[0]["link_pct"] == 0
    assert blocks[1]["text"] == "all link text"
    assert blocks[1]["link_pct"] == 100 and not blocks[1]["is_content"]
    assert blocks[2]["is_content"]


def test_entities_br_and_unclosed_tags():
    html = "<p>salt &amp; pepper<br>third and fourth words now</p><div>tail"
    blocks = extract_blocks(html)
    assert blocks[0]["text"] == "salt & pepper third and fourth words now"
    assert blocks[0]["n_words"] == 8
    # unclosed <div> still flushes at close()
    assert blocks[1]["text"] == "tail"


def test_link_density_boundary_exact_50_rejected():
    # 5 link chars vs 10 total => 50% == max_link_pct -> NOT content
    html = "<p>aa bbb <a href='/'>ccccc</a> word word word</p>"
    b = extract_blocks(html)[0]
    assert b["n_words"] == 6
    assert b["link_pct"] == (5 * 100) // 22  # 22 non-space chars total
    assert b["is_content"]
    html2 = "<p>abcde <a href='/'>fghij</a> x y z w</p>"
    b2 = extract_blocks(html2, max_link_pct=35)[0]
    assert b2["link_pct"] == (5 * 100) // 14  # 35
    assert not b2["is_content"]


def test_min_words_boundary():
    assert not extract_blocks("<p>one two three four</p>")[0]["is_content"]
    assert extract_blocks("<p>one two three four five</p>")[0]["is_content"]
    assert extract_blocks("<p>a b c</p>", min_words=3)[0]["is_content"]


def test_nested_drop_subtrees_and_empty_body():
    html = ("<nav>top <footer>deep</footer> still-chrome</nav>"
            "<p>real words appear here today</p>")
    blocks = extract_blocks(html)
    assert len(blocks) == 1 and blocks[0]["text"].startswith("real")
    assert extract_blocks("") == []
    assert extract_blocks(None) == []


def test_spark_blocks_and_main_text(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, body="<header>x</header><p>alpha beta gamma delta "
                           "epsilon</p><div><a href='/'>spam spam spam"
                           "</a></div><p>zeta eta theta iota kappa</p>"),
        Row(doc_id=2, body="<p>too short</p>"),
    ])
    rows = {(r["doc_id"], r["block_idx"]): r
            for r in main_content_blocks(docs).collect()}
    assert rows[(1, 0)]["is_content"] and rows[(1, 2)]["is_content"]
    assert not rows[(1, 1)]["is_content"]
    assert not rows[(2, 0)]["is_content"]
    mt = {r["doc_id"]: r for r in main_text(docs).collect()}
    assert mt[1]["main_text"] == ("alpha beta gamma delta epsilon\n"
                                  "zeta eta theta iota kappa")
    assert (mt[1]["n_blocks"], mt[1]["n_content_blocks"]) == (3, 2)
    assert mt[2]["main_text"] == "" and mt[2]["n_content_blocks"] == 0


def test_vocab_and_oov(spark):
    from crawlspark.functions.text import oov_rate_ppm, vocab_topv
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b x y"), (3, "z z")],
        "doc_id long, text string")
    vocab = {(r["term"], r["tf"], r["vocab_rank"])
             for r in vocab_topv(docs, v=3).collect()}
    # tf: a=4 b=3 z=2 c=1 x=1 y=1 -> top3 = a,b,z
    assert vocab == {("a", 4, 1), ("b", 3, 2), ("z", 2, 3)}
    oov = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
           for r in oov_rate_ppm(docs, vocab_topv(docs, v=3)).collect()}
    assert oov[1] == (6, 1, 1_000_000 // 6)
    assert oov[2] == (4, 2, 500_000)
    assert oov[3] == (2, 0, 0)


def test_postings(spark):
    from crawlspark.functions.retrieval import postings
    docs = spark.createDataFrame(
        [(1, "a b a c a"), (2, "c c")], "doc_id long, text string")
    out = {(r["term"], r["doc_id"]): (r["tf"], r["positions"])
           for r in postings(docs).collect()}
    assert out[("a", 1)] == (3, "0,2,4")
    assert out[("b", 1)] == (1, "1")
    assert out[("c", 1)] == (1, "3")
    assert out[("c", 2)] == (2, "0,1")
    assert len(out) == 4


def test_scrub_pii(spark):
    from pyspark.sql import Row

    from crawlspark.functions.text import scrub_pii
    from pyspark.sql import functions as F
    docs = spark.createDataFrame([
        Row(i=1, t="mail me at a.b+c@ex.co or 10.0.0.1 card 4111111111111111"),
        Row(i=2, t="no pii here 123 1.2 short"),
        Row(i=3, t="two ips 192.168.0.1 8.8.8.8 and x@y.io"),
    ])
    scrubbed, counts = scrub_pii(F.col("t"))
    rows = {r["i"]: r for r in docs.select(
        "i", scrubbed.alias("s"), *counts).collect()}
    assert rows[1]["s"] == "mail me at <EMAIL> or <IP> card <NUM>"
    assert (rows[1]["n_email"], rows[1]["n_ipv4"],
            rows[1]["n_longnum"]) == (1, 1, 1)
    assert rows[2]["s"] == "no pii here 123 1.2 short"
    assert (rows[2]["n_email"], rows[2]["n_ipv4"],
            rows[2]["n_longnum"]) == (0, 0, 0)
    assert rows[3]["s"] == "two ips <IP> <IP> and <EMAIL>"
    assert rows[3]["n_ipv4"] == 2 and rows[3]["n_email"] == 1


def test_dataset_split(spark):
    from pyspark.sql import functions as F

    from crawlspark.functions.sampling import dataset_split, portable_mix
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = dataset_split(df, "doc_id",
                        hash_bucket=F.pmod(portable_mix("doc_id"),
                                           F.lit(100)))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 1000
    # deterministic: identical assignment on re-run
    again = dataset_split(df, "doc_id",
                          hash_bucket=F.pmod(portable_mix("doc_id"),
                                             F.lit(100)))
    assert out.exceptAll(again).count() == 0
    # stability: a row's split is invariant under corpus growth
    bigger = dataset_split(
        spark.range(2000).select(F.col("id").alias("doc_id")), "doc_id",
        hash_bucket=F.pmod(portable_mix("doc_id"), F.lit(100)))
    joined = (out.alias("a").join(bigger.alias("b"), "doc_id")
              .filter(F.col("a.split") != F.col("b.split")))
    assert joined.count() == 0
