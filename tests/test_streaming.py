"""Structured-Streaming surfaces: seed-dir ingest (availableNow drain,
exactly-once file pickup) and the stateful streaming URL-seen dedup."""
import os
import tempfile

from crawlspark.frontier.state import SnapshotStore
from crawlspark.streaming import (drain_seed_stream, merge_seeds,
                                  streaming_url_seen)


def _write_seed_file(d, name, urls):
    with open(os.path.join(d, name), "w") as f:
        f.write("\n".join(urls) + "\n")


def test_seed_drain_and_merge(spark):
    root = tempfile.mkdtemp(prefix="seedstream_")
    seed_dir = os.path.join(root, "seeds")
    inbox = os.path.join(root, "inbox")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(seed_dir)

    _write_seed_file(seed_dir, "a.txt", [
        "http://H0.example/",              # canonicalizes + lowercases
        "http://h0.example:80/",           # same after default-port drop
        "http://h1.example/p?b=2&a=1",
        "#fragment-only",                   # dropped
        "mailto:x@example.com",             # dropped (non-http)
    ])
    drain_seed_stream(spark, seed_dir, inbox, ckpt)
    got = {r["canon"] for r in spark.read.parquet(inbox).collect()}
    assert got == {"http://h0.example/", "http://h1.example/p?a=1&b=2"}

    # second drain with one new file: old file NOT re-ingested (checkpoint)
    _write_seed_file(seed_dir, "b.txt", ["http://h2.example/x"])
    drain_seed_stream(spark, seed_dir, inbox, ckpt)
    rows = spark.read.parquet(inbox).collect()
    assert len(rows) == 3  # 2 + 1, no re-ingest

    # merge into a fresh frontier store: all 3 novel
    store = SnapshotStore(spark, os.path.join(root, "store"))
    import pyspark.sql.functions as F
    empty = spark.createDataFrame(
        [], "canon string, url_hash long, host string, path string, "
            "priority double, discovered_seq long, ref_url string")
    store.commit(-1, {"frontier": empty}, counters={"fetched_total": 0})
    assert merge_seeds(spark, store, inbox) == 3
    fr = store.read("frontier")
    assert fr.count() == 3
    # merging again adds nothing (already queued)
    assert merge_seeds(spark, store, inbox) == 0
    # determinism: discovered_seq is a pure function of the canonical URL
    seqs = {r["canon"]: r["discovered_seq"] for r in fr.collect()}
    assert all(v is not None and v >= 0 for v in seqs.values())


def test_merge_seeds_applies_robots_filter(spark):
    """Streamed seeds must pass the same robots filter as engine.seed():
    the frontier invariant is 'every row is robots-allowed at insert', so a
    disallowed URL arriving via the seed inbox must NOT be merged."""
    root = tempfile.mkdtemp(prefix="seedrobots_")
    seed_dir = os.path.join(root, "seeds")
    inbox = os.path.join(root, "inbox")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(seed_dir)
    _write_seed_file(seed_dir, "a.txt", [
        "http://h0.example/private/page",   # disallowed by REP rules below
        "http://h0.example/public/page",
        "http://h1.example/anything",       # host absent from robots: allowed
    ])
    drain_seed_stream(spark, seed_dir, inbox, ckpt)

    store = SnapshotStore(spark, os.path.join(root, "store"))
    empty = spark.createDataFrame(
        [], "canon string, url_hash long, host string, path string, "
            "priority double, discovered_seq long, ref_url string")
    store.commit(-1, {"frontier": empty}, counters={"fetched_total": 0})
    robots = spark.createDataFrame(
        [("h0.example", [{"allow": False, "pattern": "/private/"}], 0)],
        "host string, rules array<struct<allow:boolean,pattern:string>>, "
        "crawl_delay_ms long")
    assert merge_seeds(spark, store, inbox, robots=robots) == 2
    got = {r["canon"] for r in store.read("frontier").collect()}
    assert got == {"http://h0.example/public/page",
                   "http://h1.example/anything"}


def test_streaming_url_seen_dedup(spark):
    root = tempfile.mkdtemp(prefix="seenstream_")
    src = os.path.join(root, "src")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "out")
    os.makedirs(src)

    def drain():
        urls = (spark.readStream.format("text")
                .schema("value string").load(src)
                .selectExpr("value as url"))
        q = (streaming_url_seen(urls, n_shards=4, m_bits=1 << 14)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .outputMode("append").start())
        q.awaitTermination()

    # batch 1: 3 distinct (one pair canonicalizes together) + intra-batch dup
    _write_seed_file(src, "b1.txt", [
        "http://a.example/1", "http://a.example/1",
        "http://A.EXAMPLE/1#frag",
        "http://b.example/2", "http://c.example/3",
    ])
    drain()
    got1 = {r["canon"] for r in spark.read.parquet(out).collect()}
    assert got1 == {"http://a.example/1", "http://b.example/2",
                    "http://c.example/3"}

    # batch 2: cross-batch dup suppressed by state; one new URL passes
    _write_seed_file(src, "b2.txt", [
        "http://a.example/1", "http://d.example/4",
    ])
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4
    assert {r["canon"] for r in rows} == got1 | {"http://d.example/4"}


def test_streaming_politeness_carryover(spark):
    """Stateful crawl-delay admission: budget oscillates 2,3 with a 12 s
    delay in a 30 s round (carryover credit), matching the batch engine and
    the oracle (tests/test_oracle_carryover.py)."""
    from crawlspark.streaming import streaming_politeness

    root = tempfile.mkdtemp(prefix="politestream_")
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    schema = ("host string, url_hash long, priority double, "
              "discovered_seq long, crawl_delay_ms long")

    def feed(start):
        rows = [("h0.test", 1000 + i, 0.0, start + i, 12_000)
                for i in range(10)]
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src)

    def drain():
        req = spark.readStream.schema(schema).parquet(src)
        q = (streaming_politeness(req, round_ms=30_000, k_default=100)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    feed(0)
    drain()
    got = spark.read.parquet(out).orderBy("discovered_seq").collect()
    assert len(got) == 10
    assert sum(r["admitted"] for r in got) == 2          # 30000 // 12000
    assert got[0]["credit_ms"] == 6_000                  # remainder carried

    feed(100)
    drain()
    got2 = [r for r in spark.read.parquet(out).collect()
            if r["discovered_seq"] >= 100]
    assert len(got2) == 10
    assert sum(r["admitted"] for r in got2) == 3         # (30000+6000)//12000
    assert got2[0]["credit_ms"] == 0                     # spent exactly
    # admission follows the engine's total order: best discovered_seq first
    admitted_seqs = sorted(r["discovered_seq"] for r in got2 if r["admitted"])
    assert admitted_seqs == [100, 101, 102]


def test_streaming_politeness_idle_host_credit_frozen(spark):
    """Pins the DOCUMENTED divergence from the batch engine
    (politeness_stream module docstring): a host absent from a micro-batch
    does NOT accrue credit — its state is frozen — whereas the batch
    engine's next_host_state ticks every throttled host each round. The
    bound: after any non-idle batch where round_ms >= delay, the two
    agree again (credit caps at one delay)."""
    from crawlspark.streaming import streaming_politeness

    root = tempfile.mkdtemp(prefix="politestream_idle_")
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    schema = ("host string, url_hash long, priority double, "
              "discovered_seq long, crawl_delay_ms long")

    def feed(host, start, n):
        rows = [(host, 1000 + start + i, 0.0, start + i, 12_000)
                for i in range(n)]
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src)

    def drain():
        req = spark.readStream.schema(schema).parquet(src)
        q = (streaming_politeness(req, round_ms=30_000, k_default=100)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    feed("h0.test", 0, 10)
    drain()                       # h0: admits 2, credit 6000
    feed("other.test", 100, 1)
    drain()                       # batch WITHOUT h0 — its credit must not tick
    feed("h0.test", 200, 10)
    drain()

    rows = [r for r in spark.read.parquet(out).collect()
            if r["host"] == "h0.test" and r["discovered_seq"] >= 200]
    # frozen credit 6000 (NOT 12000 as the batch engine would accrue):
    # budget = (30000 + 6000) // 12000 = 3
    assert sum(r["admitted"] for r in rows) == 3
    assert rows[0]["credit_ms"] == 0
