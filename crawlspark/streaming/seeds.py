"""Structured-Streaming seed ingest for the crawl frontier.

The reference's closest analog is the download-dir watcher: a CDP event
listener plus a 1 s directory-polling fallback that picks up files as they
complete (/root/reference/chrome.go:333-498). Re-expressed Spark-first, the
"watched directory" is a Structured Streaming file source: new seed-list
files (one URL per line) appearing under a directory become micro-batches;
each batch is canonicalized with the same Arrow UDF the engine uses,
exact-deduped, and appended to a parquet *seed inbox*. A scheduling round
then merges the inbox into the frontier as its own seed-ingest round
(`merge_seeds`) — the streaming and batch halves share one state store and
one canonical form, so a URL arriving by stream and by link discovery is the
same URL.

Determinism: file order within a micro-batch is not guaranteed, so seed
priority/tiebreaks never depend on arrival order — `discovered_seq` comes
from a hash of the canonical URL itself, making the merged frontier a pure
function of the *set* of seed URLs delivered (BASELINE.json determinism
contract), regardless of micro-batch boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..frontier.engine import FRONTIER_COLS
from ..frontier.state import SnapshotStore
from ..urltools import url_parts_udf

SEED_SCHEMA = "value string"


def watch_seed_dir(spark: SparkSession, seed_dir: str):
    """Streaming DataFrame of canonicalized seed rows from text files.

    One URL per line; blank lines and uncanonicalizable hrefs are dropped
    (the attr-missing row-skip semantics, unmarshal.go:104-109).
    """
    raw = (spark.readStream.format("text")
           .schema(SEED_SCHEMA)
           .load(seed_dir))
    parts = url_parts_udf(F.trim(F.col("value")),
                          F.lit(None).cast("string"))
    return (raw.select(parts.alias("_u"))
            .filter(F.col("_u.canon").isNotNull())
            .select(F.col("_u.canon").alias("canon"),
                    F.xxhash64("_u.canon").alias("url_hash"),
                    F.col("_u.host").alias("host"),
                    F.col("_u.path").alias("path"))
            .dropDuplicates(["url_hash"]))


def drain_seed_stream(spark: SparkSession, seed_dir: str, inbox_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain all currently-available seed files into the parquet inbox.

    Trigger availableNow: processes everything present, then stops — the
    batch-drain analog of the reference's poll tick. The checkpoint dir
    gives exactly-once file pickup across drains (a re-run does not
    re-ingest already-seen files).
    """
    q = (watch_seed_dir(spark, seed_dir)
         .writeStream
         .format("parquet")
         .option("path", inbox_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .outputMode("append")
         .start())
    q.awaitTermination()


def merge_seeds(spark: SparkSession, store: SnapshotStore,
                inbox_dir: str, robots: DataFrame | None = None) -> int:
    """Merge the seed inbox into the frontier as a seed-ingest round.

    Already-seen and already-queued URLs are dropped (exact anti-joins);
    survivors enter with seed priority 0 and a canonical-hash-derived
    discovered_seq (arrival-order independence). Returns #rows added.

    ``robots``: the run's robots table (REP-rules or legacy
    disallow_prefixes shape). The engine maintains the invariant "every
    frontier row is robots-allowed at insert" (engine.seed), so streamed
    seeds MUST pass the same filter here — without it, disallowed URLs
    merged via the inbox would be scheduled and fetched.
    """
    if not os.path.isdir(inbox_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(inbox_dir)):
        return 0
    inbox = spark.read.parquet(inbox_dir)
    # read through the merge-on-read view (pending frontier_add/_rm deltas
    # fold in); the merge below commits a full REPLACE frontier, which IS a
    # compaction — the folded set plus the fresh seeds becomes the new base
    from ..frontier.engine import frontier_view
    frontier = frontier_view(store)
    seen = store.read("seen")

    fresh = (inbox
             .withColumn("priority", F.lit(0.0))
             .withColumn("discovered_seq",
                         F.pmod(F.col("url_hash"), F.lit(1 << 40))
                          .cast("long"))
             .withColumn("ref_url", F.lit(None).cast("string"))
             .select(*FRONTIER_COLS)
             .dropDuplicates(["url_hash"]))
    if robots is not None:
        from ..frontier.politeness import robots_allowed_col
        from ..frontier.robots import rep_allowed_col
        allowed = (rep_allowed_col() if "rules" in robots.columns
                   else robots_allowed_col())
        fresh = (fresh.join(F.broadcast(robots), "host", "left")
                 .filter(allowed)
                 .select(*FRONTIER_COLS))
    if frontier is not None:
        fresh = fresh.join(frontier.select("url_hash"), "url_hash",
                           "left_anti")
    if seen is not None:
        fresh = fresh.join(seen.select("url_hash"), "url_hash", "left_anti")
    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n == 0:
        return 0
    merged = (frontier.unionByName(fresh) if frontier is not None else fresh)
    r = store.last_round() + 1
    store.commit(r, {"frontier": merged}, counters=store.counters())
    return int(n)
