"""CatalogStore: the engine's snapshot contract over SQL catalog tables —
same crawl, same oracle, resume included. Runs on the built-in session
catalog with parquet tables (Iceberg swaps in via provider='iceberg')."""
import tempfile

from crawlspark import oracle, synth
from crawlspark.frontier import CrawlConfig, CrawlEngine
from crawlspark.frontier.catalog import CatalogStore

K = 150
ROUNDS = 3


def _oracle(tier):
    counts = synth.page_counts(tier)
    pdf = synth.gen_pages_pdf(0, tier.n_pages, counts, tier.n_images)
    pages_by_url = {d["url"]: d for d in pdf.to_dict("records")}
    robots = {r["host"]: (list(r["disallow_prefixes"]),
                          int(r["crawl_delay_ms"]))
              for r in synth.gen_robots_pdf(tier.n_hosts).to_dict("records")}
    return oracle.simulate(pages_by_url, robots,
                           list(synth.gen_seeds_pdf(tier)["url"]),
                           round_ms=30_000, k_global=K, max_rounds=ROUNDS)


def test_catalog_store_crawl_and_resume(spark):
    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=4)
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    want = _oracle(tier)
    wantlog = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
               for r in want.fetch_log]

    root = tempfile.mkdtemp(prefix="catstore_")
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = CatalogStore(spark, root, prefix="t_cat")
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)            # "crash" mid-crawl

    # resume from catalog state only (fresh objects)
    store2 = CatalogStore(spark, root, prefix="t_cat")
    assert store2.last_round() == 1
    eng2 = CrawlEngine(spark, store2, pages, robots, None, cfg)
    eng2.run(max_rounds=ROUNDS - 2)

    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
           for r in store2.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == wantlog
    seen = {r["url_hash"] for r in store2.read("seen").collect()}
    assert seen == want.seen
    store2.destroy()


def test_catalog_crash_mid_commit_recovers(spark):
    """Crash INSIDE commit — after the round's data partitions are written
    but BEFORE the manifest snapshot append (the commit point): readers
    must still see only the previous round (the partial round's partitions
    are invisible because no manifest row lists them), and a resumed engine
    re-runs the round idempotently (dynamic partition overwrite replaces
    the orphaned partitions) to the exact oracle log."""
    import pytest

    class CrashMidCommit(CatalogStore):
        armed = False

        def commit(self, round_no, tables, counters, precommit=None):
            if not self.armed:
                return super().commit(round_no, tables, counters,
                                      precommit=precommit)
            # the parent's data-write phase, verbatim — then die before
            # the manifest publish
            from concurrent.futures import ThreadPoolExecutor
            conf = "spark.sql.sources.partitionOverwriteMode"
            prev = self.spark.conf.get(conf, "STATIC")
            self.spark.conf.set(conf, "dynamic")
            try:
                with ThreadPoolExecutor(max_workers=max(1, len(tables))) \
                        as ex:
                    list(ex.map(
                        lambda kv: self._write_round(kv[0], kv[1], round_no),
                        tables.items()))
            finally:
                self.spark.conf.set(conf, prev)
            raise RuntimeError("simulated crash before manifest publish")

    tier = synth.TIERS["t1"]
    pages = synth.spark_pages(spark, tier, parallelism=4)
    robots = synth.spark_robots(spark, tier)
    seeds = synth.spark_seeds(spark, tier)
    want = _oracle(tier)

    root = tempfile.mkdtemp(prefix="catstore_crash_")
    cfg = CrawlConfig(k_global=K, max_rounds=ROUNDS, seen_shards=4,
                      seen_m_bits=1 << 16, validate_fraction=0)
    store = CrashMidCommit(spark, root, prefix="t_crash")
    eng = CrawlEngine(spark, store, pages, robots, None, cfg)
    eng.seed(seeds)
    eng.run(max_rounds=2)                  # rounds 0-1 commit cleanly
    store.armed = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.run(max_rounds=1)              # round 2 dies mid-commit

    # recovery: a fresh reader sees only the committed rounds; the orphaned
    # round-2 partitions are invisible and the resume replays round 2
    store2 = CatalogStore(spark, root, prefix="t_crash")
    assert store2.last_round() == 1
    assert store2.read("fetch_log").count() == sum(
        1 for r in want.fetch_log if r["round"] <= 1)
    eng2 = CrawlEngine(spark, store2, pages, robots, None, cfg)
    eng2.run(max_rounds=1)
    log = [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
           for r in store2.read("fetch_log").orderBy("fetch_seq").collect()]
    assert log == [(r["fetch_seq"], r["canon"], r["status"], r["is_refresh"])
                   for r in want.fetch_log]
    store2.destroy()


def test_catalog_snapshot_maintenance(spark):
    """snapshots() / read_as_of / expire_snapshots / remove_orphans: the
    Iceberg maintenance surface over the manifest-generation model."""
    import pyspark.sql.functions as F

    root = tempfile.mkdtemp(prefix="catmaint_")
    store = CatalogStore(spark, root, prefix="t_maint")

    def frontier(vals):
        return spark.createDataFrame([(v,) for v in vals], "url_hash long")

    def log(vals):
        return spark.createDataFrame(
            [(v, f"u{v}") for v in vals], "fetch_seq long, canon string")

    store.commit(0, {"frontier": frontier([1, 2]), "fetch_log": log([0])},
                 {"n": 1})
    store.commit(1, {"frontier": frontier([3]), "fetch_log": log([1, 2])},
                 {"n": 2})
    store.commit(2, {"frontier": frontier([4, 5]), "fetch_log": log([3])},
                 {"n": 3})

    snaps = store.snapshots()
    assert [s["commit_seq"] for s in snaps] == [0, 1, 2]
    assert snaps[0]["rounds"] == [0] and snaps[2]["rounds"] == [0, 1, 2]

    # time travel: generation 0 sees round-0 state only
    assert sorted(r.url_hash for r in
                  store.read_as_of("frontier", 0).collect()) == [1, 2]
    assert sorted(r.fetch_seq for r in
                  store.read_as_of("fetch_log", 0).collect()) == [0]
    # latest generation == plain read
    assert sorted(r.url_hash for r in
                  store.read_as_of("frontier", 2).collect()) == [4, 5]
    assert sorted(r.fetch_seq for r in
                  store.read("fetch_log").collect()) == [0, 1, 2, 3]

    # orphan: a crashed commit wrote round-3 partitions but no manifest
    # (commit() always writes under dynamic partition overwrite)
    conf = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf, "STATIC")
    spark.conf.set(conf, "dynamic")
    try:
        store._write_round("fetch_log", log([9]), 3)
    finally:
        spark.conf.set(conf, prev)
    assert sorted(r.fetch_seq for r in
                  store.read("fetch_log").collect()) == [0, 1, 2, 3]
    assert store.orphan_rounds("fetch_log") == [3]
    removed = store.remove_orphans(["fetch_log", "frontier"])
    assert removed == {"fetch_log": [3]}
    assert store.orphan_rounds("fetch_log") == []
    # reads unchanged after orphan removal
    assert sorted(r.fetch_seq for r in
                  store.read("fetch_log").collect()) == [0, 1, 2, 3]

    # expire all but the newest generation: old time travel is refused,
    # current reads unchanged
    assert store.expire_snapshots(keep_last=1) == [0, 1]
    assert [s["commit_seq"] for s in store.snapshots()] == [2]
    try:
        store.read_as_of("frontier", 0)
        raise AssertionError("expired snapshot should raise")
    except KeyError:
        pass
    assert sorted(r.url_hash for r in
                  store.read("frontier").collect()) == [4, 5]
    assert sorted(r.fetch_seq for r in
                  store.read("fetch_log").collect()) == [0, 1, 2, 3]
    assert store.counters() == {"n": 3}
    store.destroy()


# --- provider parameterization (round-3 VERDICT #8) -------------------------

class _ProviderProxy:
    """SparkSession proxy: records every SQL statement the store issues and
    rewrites the table provider to one the sandbox can actually execute
    (no Iceberg runtime jar ships in this container). Running the store
    through it proves the cluster swap surface is EXACTLY the configured
    ``USING <provider>`` clause — no code path hardcodes parquet."""

    def __init__(self, spark, record, execute_as="parquet"):
        self._spark = spark
        self._record = record
        self._execute_as = execute_as

    def sql(self, q):
        self._record.append(q)
        return self._spark.sql(
            q.replace("USING iceberg", f"USING {self._execute_as}"))

    def __getattr__(self, attr):
        return getattr(self._spark, attr)


def test_catalog_store_provider_is_pure_config(spark):
    """CatalogStore(provider='iceberg') issues exclusively iceberg DDL —
    every CREATE TABLE carries the configured provider and none falls back
    to a hardcoded one — while commit/read/resume semantics are identical
    (verified by reading back what was committed through a fresh store)."""
    import shutil

    from pyspark.sql import functions as F

    record: list[str] = []
    proxy = _ProviderProxy(spark, record)
    root = tempfile.mkdtemp(prefix="catalog_provider_")
    prefix = "provtest"
    store = CatalogStore(proxy, root, prefix=prefix, provider="iceberg")
    try:
        t0 = spark.range(5).select(F.col("id").alias("url_hash"),
                                   F.lit("h").alias("host"))
        store.commit(0, {"frontier": t0, "fetch_log": t0}, {"fetched_total": 5})
        t1 = spark.range(5, 9).select(F.col("id").alias("url_hash"),
                                      F.lit("h").alias("host"))
        store.commit(1, {"frontier": t1, "fetch_log": t1}, {"fetched_total": 9})

        creates = [q for q in record if q.startswith("CREATE TABLE")]
        assert creates, "store issued no DDL"
        assert all("USING iceberg" in q for q in creates), creates
        assert not any("USING parquet" in q for q in creates), creates

        # a FRESH store over the same catalog tables resumes the state
        # (the SaveCookie/LoadCookie-style durability contract)
        store2 = CatalogStore(proxy, root, prefix=prefix, provider="iceberg")
        assert store2.last_round() == 1
        assert store2.counters() == {"fetched_total": 9}
        # replace table: latest round only; append table: both rounds
        assert {r["url_hash"] for r in store2.read("frontier").collect()} \
            == {5, 6, 7, 8}
        assert {r["url_hash"] for r in store2.read("fetch_log").collect()} \
            == set(range(9))
    finally:
        for t in ("frontier", "fetch_log", "manifest"):
            spark.sql(f"DROP TABLE IF EXISTS default.{prefix}_{t}")
        shutil.rmtree(root, ignore_errors=True)
