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


def test_metrics_stream_watermark_late_data(spark):
    """Watermarked tumbling-window rollup: a late-but-inside-watermark row
    merges into its open window, a beyond-watermark row is dropped, and
    append mode emits each finalized (window, key) exactly once."""
    import json
    import os
    import tempfile

    from crawlspark.streaming.metrics_stream import metrics_stream

    root = tempfile.mkdtemp(prefix="metrics_stream_")
    indir = os.path.join(root, "in")
    os.makedirs(indir)
    src = (spark.readStream
           .schema("ts timestamp, event_type string, value double")
           .json(indir))
    out = metrics_stream(src, window_dur="30 seconds",
                         watermark="60 seconds")
    q = (out.writeStream.format("memory").queryName("mrollup")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .start())

    def drop(name, rows):
        tmp = os.path.join(root, name)
        with open(tmp, "w") as f:
            for ts, et, v in rows:
                f.write(json.dumps(
                    {"ts": ts, "event_type": et, "value": v}) + "\n")
        os.replace(tmp, os.path.join(indir, name))
        q.processAllAvailable()

    # batch 1: window A = [10:00:00, 10:00:30); watermark after = 09:59:20
    drop("f1.json", [("2024-01-01T10:00:05.000Z", "view", 1.0),
                     ("2024-01-01T10:00:20.000Z", "view", 2.0)])
    # batch 2: late row for A, INSIDE the 60 s watermark -> merges;
    # the 10:02 advancer moves the watermark to 10:01:00 (> A's end)
    drop("f2.json", [("2024-01-01T10:00:10.000Z", "view", 4.0),
                     ("2024-01-01T10:02:00.000Z", "click", 1.0)])
    # batch 3: BEYOND-watermark row for A (10:00:01 < wm 10:01:00) ->
    # dropped; A finalizes and emits in this batch with n=3, not 4
    drop("f3.json", [("2024-01-01T10:00:01.000Z", "view", 100.0),
                     ("2024-01-01T10:05:00.000Z", "click", 1.0)])
    # batch 4: advancer so the 10:02 click window also finalizes
    drop("f4.json", [("2024-01-01T10:10:00.000Z", "click", 1.0)])
    q.stop()

    rows = spark.sql("select * from mrollup").collect()
    keyed = {}
    for r in rows:
        k = (r["window_start"].isoformat(), r["event_type"])
        assert k not in keyed, f"append emitted {k} twice"
        keyed[k] = r
    a = keyed[("2024-01-01T10:00:00", "view")]
    assert a["n_events"] == 3
    assert float(a["sum_value"]) == 7.0
    assert float(a["avg_value"]) == round(7.0 / 3, 6)
    b = keyed[("2024-01-01T10:02:00", "click")]
    assert b["n_events"] == 1


def test_streaming_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark: a re-delivery inside the watermark
    horizon is dropped; after the key's state expires (watermark passed),
    the same key is emitted again — the horizon IS the contract."""
    import json
    import os
    import tempfile

    from crawlspark.streaming.dedup_stream import dedup_stream

    root = tempfile.mkdtemp(prefix="dedup_stream_")
    indir = os.path.join(root, "in")
    os.makedirs(indir)
    src = (spark.readStream
           .schema("ts timestamp, event_id long, value double")
           .json(indir))
    out = dedup_stream(src, key_cols=("event_id",), watermark="60 seconds")
    q = (out.writeStream.format("memory").queryName("sdedup")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .start())

    def drop(name, rows):
        tmp = os.path.join(root, name)
        with open(tmp, "w") as f:
            for ts, eid, v in rows:
                f.write(json.dumps(
                    {"ts": ts, "event_id": eid, "value": v}) + "\n")
        os.replace(tmp, os.path.join(indir, name))
        q.processAllAvailable()

    drop("f1.json", [("2024-01-01T10:00:00.000Z", 1, 1.0),
                     ("2024-01-01T10:00:05.000Z", 2, 2.0)])
    # re-delivery of key 1 INSIDE the horizon -> dropped
    drop("f2.json", [("2024-01-01T10:00:30.000Z", 1, 9.0),
                     ("2024-01-01T10:00:31.000Z", 3, 3.0)])
    # advance the watermark far past key 1's state, then re-deliver it:
    # state expired -> emitted AGAIN
    drop("f3.json", [("2024-01-01T10:10:00.000Z", 4, 4.0)])
    drop("f4.json", [("2024-01-01T10:09:30.000Z", 1, 7.0)])
    q.stop()

    rows = spark.sql("select event_id, value from sdedup").collect()
    got = sorted((r["event_id"], r["value"]) for r in rows)
    assert got == [(1, 1.0), (1, 7.0), (2, 2.0), (3, 3.0), (4, 4.0)]


def test_dedup_batch_twin(spark):
    from pyspark.sql import Row

    from crawlspark.streaming.dedup_stream import dedup_batch
    df = spark.createDataFrame(
        [Row(event_id=1, value=5.0), Row(event_id=1, value=2.0),
         Row(event_id=2, value=7.0)])
    got = {r["event_id"]: (r["value"], r["n_seen"])
           for r in dedup_batch(df).collect()}
    assert got == {1: (2.0, 2), 2: (7.0, 1)}


def test_images_ingest_stream_filters_and_phash_dedup(spark):
    """Streaming curation+phash-dedup twin: rejected rows never reach the
    state store; the FIRST arrival of a phash wins inside the watermark
    horizon; re-delivery after state expiry is admitted again (the
    horizon is the streaming contract — cross-horizon exactness belongs
    to the batch path)."""
    import json
    import os
    import tempfile

    from crawlspark.streaming.images_stream import images_ingest_stream

    root = tempfile.mkdtemp(prefix="img_stream_")
    indir = os.path.join(root, "in")
    os.makedirs(indir)
    src = (spark.readStream
           .schema("fetched_at timestamp, image_id string, w int, h int, "
                   "fmt string, caption string, phash long")
           .json(indir))
    out = images_ingest_stream(src, watermark="60 seconds")
    q = (out.writeStream.format("memory").queryName("simg")
         .outputMode("append")
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .start())

    def drop(name, rows):
        tmp = os.path.join(root, name)
        with open(tmp, "w") as f:
            for ts, iid, w, h, cap, ph in rows:
                f.write(json.dumps(
                    {"fetched_at": ts, "image_id": iid, "w": w, "h": h,
                     "fmt": "png", "caption": cap, "phash": ph}) + "\n")
        os.replace(tmp, os.path.join(indir, name))
        q.processAllAvailable()

    drop("f1.json", [
        ("2024-01-01T10:00:00.000Z", "a", 64, 64, "a b c d", 10),
        ("2024-01-01T10:00:01.000Z", "tiny", 16, 64, "a b c d", 11),
        ("2024-01-01T10:00:02.000Z", "shortcap", 64, 64, "a b", 12),
        ("2024-01-01T10:00:03.000Z", "skinny", 64, 256, "a b c d", 13),
    ])
    # re-delivery of phash 10 INSIDE the horizon -> dropped; new phash kept
    drop("f2.json", [
        ("2024-01-01T10:00:30.000Z", "a_dup", 64, 64, "x y z w", 10),
        ("2024-01-01T10:00:31.000Z", "b", 96, 64, "a b c d", 14),
    ])
    # advance the watermark past phash 10's state, then re-deliver it
    drop("f3.json", [
        ("2024-01-01T10:10:00.000Z", "c", 64, 96, "a b c d", 15)])
    drop("f4.json", [
        ("2024-01-01T10:09:30.000Z", "a_again", 64, 64, "p q r s", 10)])
    q.stop()

    got = sorted((r["image_id"], r["phash"]) for r in
                 spark.sql("select image_id, phash from simg").collect())
    assert got == [("a", 10), ("a_again", 10), ("b", 14), ("c", 15)]


def test_streaming_backoff_window(spark):
    """Stateful host backoff: the suppression decision entering round r
    uses exactly the trailing-window error counts of rounds < r — the
    batch engine's cfg.backoff_errors rule — and errors age out so the
    host re-enters the pool."""
    from crawlspark.streaming.backoff_stream import streaming_backoff

    root = tempfile.mkdtemp(prefix="backoffstream_")
    src = os.path.join(root, "src")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)
    schema = "host string, round int, status int"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src)

    def drain():
        req = spark.readStream.schema(schema).parquet(src)
        q = (streaming_backoff(req, backoff_errors=3, backoff_window=2)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    # round 0: 2 errors; round 1: 1 error -> window(0,1)=3 trips round 2
    feed([("h0.test", 0, 404), ("h0.test", 0, 500), ("h0.test", 0, 200),
          ("h0.test", 1, 404), ("h0.test", 1, 200),
          ("h1.test", 0, 200), ("h1.test", 1, 404)])
    drain()
    # rounds 2 and 3 arrive later: round 2 suppressed (2+1 >= 3), round 3
    # sees only round-2 errors (round-0 aged out of the 2-round window)
    feed([("h0.test", 2, 200), ("h0.test", 3, 200),
          ("h1.test", 2, 404), ("h1.test", 3, 200)])
    drain()
    got = {(r["host"], r["round"]): (r["n_fetched"], r["n_err"],
                                     r["suppressed"])
           for r in spark.read.parquet(out).collect()}
    assert got[("h0.test", 0)] == (3, 2, False)
    assert got[("h0.test", 1)] == (2, 1, False)   # window = rounds<1 = 2
    assert got[("h0.test", 2)] == (1, 0, True)    # 2 + 1 >= 3
    assert got[("h0.test", 3)] == (1, 0, False)   # round-0 aged out: 1+0
    assert got[("h1.test", 0)] == (1, 0, False)
    assert got[("h1.test", 2)] == (1, 1, False)   # 0+1 < 3
    assert got[("h1.test", 3)] == (1, 0, False)
    # parity: the decision equals the batch rule recomputed sequentially
    errs = {("h0.test", 0): 2, ("h0.test", 1): 1, ("h0.test", 2): 0,
            ("h0.test", 3): 0, ("h1.test", 0): 0, ("h1.test", 1): 1,
            ("h1.test", 2): 1, ("h1.test", 3): 0}
    for (h, r), (_nf, _ne, sup) in got.items():
        window = sum(n for (hh, rr), n in errs.items()
                     if hh == h and r - 2 <= rr <= r - 1)
        assert sup == (window >= 3), (h, r)


def test_politeness_batch_twin_matches_stream(spark):
    """batch_politeness == streaming_politeness on the same feed: each
    micro-batch is one parquet file drained with availableNow, the twin
    sees the union with explicit batch indexes. Pins admitted/budget/
    credit_ms per row — the driver's politeness_twin entry value-checks
    the same arithmetic against a DuckDB recursive CTE."""
    from crawlspark.streaming import streaming_politeness
    from crawlspark.streaming.politeness_stream import batch_politeness

    root = tempfile.mkdtemp(prefix="politetwin_")
    src, out, ckpt = [os.path.join(root, d) for d in
                      ("src", "out", "ckpt")]
    os.makedirs(src)
    schema = ("host string, url_hash long, priority double, "
              "discovered_seq long, crawl_delay_ms long")
    delays = {"h0": 12_000, "h1": 0, "h2": 9_000}
    all_rows = []

    def feed(b):
        rows = []
        for hi, (h, d) in enumerate(sorted(delays.items())):
            for i in range(6):
                seq = b * 100 + hi * 10 + i
                rows.append((h, 1000 + seq, float((seq * 7) % 5), seq, d))
        all_rows.extend((b,) + r for r in rows)
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src)

    def drain():
        req = spark.readStream.schema(schema).parquet(src)
        q = (streaming_politeness(req, round_ms=30_000, k_default=100)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    for b in range(4):
        feed(b)
        drain()

    twin_in = spark.createDataFrame(
        all_rows, "batch int, " + schema)
    twin = {(r["host"], r["url_hash"]):
            (r["admitted"], r["budget"], r["credit_ms"])
            for r in batch_politeness(twin_in, round_ms=30_000,
                                      k_default=100).collect()}
    streamed = {(r["host"], r["url_hash"]):
                (r["admitted"], r["budget"], r["credit_ms"])
                for r in spark.read.parquet(out).collect()}
    assert twin == streamed and len(twin) == 4 * 18
    # the recurrence actually bit: both admitted and deferred rows exist
    flags = {v[0] for v in twin.values()}
    assert flags == {True, False}


def test_backoff_batch_twin_matches_stream(spark):
    """batch_backoff == streaming_backoff on the same feed (rounds
    arriving in order, one per micro-batch) — the driver's backoff_twin
    entry value-checks the same window rule against plain SQL."""
    from crawlspark.streaming.backoff_stream import (batch_backoff,
                                                     streaming_backoff)

    root = tempfile.mkdtemp(prefix="backofftwin_")
    src, out, ckpt = [os.path.join(root, d) for d in
                      ("src", "out", "ckpt")]
    os.makedirs(src)
    schema = "host string, round int, status int"
    all_rows = []

    def feed(r):
        rows = []
        for h, errs, total in (("a.test", 3, 5), ("b.test", 0, 4),
                               ("c.test", 2, 2)):
            for i in range(total):
                rows.append((h, r, 500 if i < errs else 200))
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src)

    def drain():
        fe = spark.readStream.schema(schema).parquet(src)
        q = (streaming_backoff(fe, backoff_errors=5, backoff_window=2)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    for r in range(5):
        feed(r)
        drain()

    twin_in = spark.createDataFrame(all_rows, schema)
    twin = {(r["host"], r["round"]):
            (r["n_fetched"], r["n_err"], r["suppressed"])
            for r in batch_backoff(twin_in, backoff_errors=5,
                                   backoff_window=2).collect()}
    streamed = {(r["host"], r["round"]):
                (r["n_fetched"], r["n_err"], r["suppressed"])
                for r in spark.read.parquet(out).collect()}
    assert twin == streamed and len(twin) == 15
    sup = {k for k, v in twin.items() if v[2]}
    assert sup == {("a.test", r) for r in range(2, 5)}
