"""The crawl engine: each scheduling round is ONE declarative DataFrame job.

Semantic contract (shared verbatim with the pure-Python oracle,
crawlspark.oracle — BASELINE.json demands exact crawl-order/URL-seen match):

  Round r over state (frontier, seen, counters):
   1. DEDUP    the frontier is kept unique by url_hash at insert time
               (seed() and step 11), keeping the best row by
               (priority desc, discovered_seq asc)  [A6]
   2. SEEN     drop rows whose url_hash ∈ seen — Bloom/cuckoo pre-filter,
               exact anti-join decides  [J4]
   3. ROBOTS   drop rows whose path matches a disallow prefix of their host
   4. BUDGET   host_budget = k_global if delay==0 else
               max(1, (round_ms + credit_ms)//delay), where credit_ms is the
               host's carried-over unused round time (≤ one delay; committed
               per round in host_state, updated by politeness.next_host_state)
   5. TOP-K    per host by (priority desc, discovered_seq, url_hash), keep
               ≤ budget — salted two-level ranking (hot-host skew)  [A5]
   6. LIMIT    global rank by the same key via the distributed range-
               partitioned sequencer (plans/ordering.py), keep idx < k_global
   7. FETCH    join pages on canonical URL; absent page ⇒ status 404
   8. REFRESH  2xx pages with meta_refresh_url resolve it against
               coalesce(base_href, canon) (reference: response.go:86-94,
               page.go:18-31); depth 1 (session.go:304-307). A refresh fires
               iff target ∉ seen ∪ {this round's scheduled} and it is the
               first (by parent idx) to claim that target. It occupies its
               own fetch slot immediately after its parent — the analog of
               invokeCount++ per invoke (session.go:160).
   9. SEQ      fetch_seq = base + 1 + global rank of (parent slot,
               is_refresh) over primaries ∪ refreshes — a refresh lands in
               its parent's next slot, distributed (no global window).
  10. EXPAND   2xx fetches (incl. refresh fetches) emit their links, resolved
               against coalesce(base_href, canon), canonicalized; child
               priority = parent - 1, discovered_seq = parent_seq*100 + pos
               (pos = document order — the FollowLink tiebreaker,
               session.go:343-358).
  11. STATE    seen += scheduled ∪ refresh targets; frontier' = (survivors of
               1-3 not scheduled) ∪ children, deduped (best of a total
               order — associative across rounds) and filtered against THIS
               round's fetches. Children are NOT exact-checked against the
               historical seen set at insert: the next round's pop-time
               bloom+exact filter makes the identical decision (seen-ness
               is a function of url_hash alone, and dedup merges equal
               hashes first), and each round rebuilds frontier' from
               post-filter survivors, so stale rows never outlive a round.
               Politeness credit (step 4) rolls forward in host_state.
  12. COMMIT   one atomic snapshot (fetch_log, seen, seen_shards,
               host_state, metrics, frontier deltas) — resume replays
               byte-identically (the record/replay contract,
               session.go:147-266). The frontier itself commits
               MERGE-ON-READ: normal rounds write only O(k) deltas
               (frontier_add / frontier_rm, tagged delta_round); reads
               reconstruct base ∖ removals ∪ (adds ∖ later removals); every
               cfg.frontier_compact_every rounds a compaction rewrites the
               full REPLACE table — the Iceberg MOR + compaction pattern,
               because rewriting a 10^10-row frontier every round is O(n)
               I/O the crawl cannot afford.

Non-2xx fetches are LOGGED and not expanded — the reference rejects non-2xx
(session.go:197-199) as an error; our engine dead-letters them as rows, never
exceptions (errors-as-data).

Determinism: every ordering is a pure function of data (no
monotonically_increasing_id, no rand(), no wall clock); the only Python code
on the hot path is Arrow-batched (canonicalize, bloom probe, payload decode).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..plans import with_global_seq
from ..session import ckpt, clear_ckpts
from ..urltools import (canonicalize_udf, host_udf, path_udf,
                        registrable_domain, url_parts_udf)
from .politeness import (budget_col, next_host_state, order_cols,
                         prune_to_global_topk, robots_allowed_col,
                         topk_per_host)
from .robots import rep_allowed_col
from .seen import SeenFilter
from .state import SnapshotStore

FRONTIER_COLS = ["canon", "url_hash", "host", "path", "priority",
                 "discovered_seq", "ref_url"]

FETCH_LOG_SCHEMA = ("round int, fetch_seq long, canon string, ref_url string, "
                    "status int, is_refresh boolean, image_id string, "
                    "host string, priority double")


from .fetcher import CorpusFetcher, Fetcher, _broadcast_lookup  # noqa: E402,F401
# (_broadcast_lookup re-exported for API stability; it moved to fetcher.py)


def frontier_view(store, base: DataFrame | None = None,
                  base_round=...) -> DataFrame | None:
    """Merge-on-read frontier: reconstruct the live frontier from the last
    compacted base plus the delta tables committed since.

        frontier = (base ∖ ⋃removals) ∪ ⋃(adds_i ∖ removals with
                    delta_round > i)

    The strict ``>`` matters: a hash removed in round j and re-added in a
    round j' ≥ j (a zombie re-discovery — children are not exact-checked
    against the historical seen set at insert) must keep the round-j' row,
    exactly as the eager rebuild did. Removals are O(k·C) hashes (C =
    compaction cadence) — always broadcast; the base, the 10^10 side, is
    never shuffled by the view. EVERY consumer of the frontier table
    (engine rounds, streaming seed merge) must read through this view."""
    if base is None:
        base = store.read("frontier")
        if base is None:
            return None
    if base_round is ...:
        base_round = store.last_committed_round("frontier")
    adds = store.read("frontier_add")
    if adds is not None and base_round is not None:
        adds = adds.filter(F.col("delta_round") > base_round)
    rms = store.read("frontier_rm")
    if rms is not None and base_round is not None:
        rms = rms.filter(F.col("delta_round") > base_round)
    if rms is not None:
        base = base.join(F.broadcast(rms.select("url_hash")),
                         "url_hash", "left_anti")
        if adds is not None:
            later_rm = rms.select(F.col("url_hash").alias("_rh"),
                                  F.col("delta_round").alias("_rr"))
            adds = adds.join(
                F.broadcast(later_rm),
                (adds["url_hash"] == F.col("_rh"))
                & (F.col("_rr") > adds["delta_round"]),
                "left_anti")
    if adds is not None:
        base = base.unionByName(adds.drop("delta_round"))
    return base


@dataclass
class CrawlConfig:
    round_ms: int = 30_000        # reference navigation timeout (30 s)
    k_global: int = 1_000         # scheduled fetches per round
    max_rounds: int = 100
    salt_buckets: int = 8         # hot-host two-level ranking fan-out
    seen_kind: str = "bloom"      # or "cuckoo"
    seen_shards: int = 8
    seen_m_bits: int = 1 << 22    # per shard; scale-out: 2^30 × 16-64 shards
    validate_fraction: float = 0.02  # payload fidelity sampling
    shuffle_partitions: int | None = None
    # broadcast the exact seen table into anti-joins while it has fewer rows
    # than this (8M × 8B hashes ≈ 64 MB); beyond it, the per-bucket
    # executor-side probe against the hash-partitioned seen table takes over.
    seen_broadcast_rows: int = 8_000_000
    seen_buckets: int = 64        # hash partitions of the seen table at rest
    # broadcast the Bloom/cuckoo shard blobs into the probe UDF while their
    # total size stays under this; beyond it (the 10^10 sizing is 16-64
    # shards × 128 MiB = 2-8 GiB) the probe goes shard-partitioned instead:
    # rows exchange by pmod(url_hash, n_shards) and each task reads only its
    # own shard's blob from the shard-partitioned seen_shards files — peak
    # filter memory per task is ONE shard, the driver never loads a blob.
    seen_blob_broadcast_bytes: int = 256 << 20
    # full-PSL cookie-Domain validation: a crawlspark.psl.PslRules
    # (load_psl()) swaps the literal-IN suffix-subset fast path for the
    # broadcast-join resolver with wildcard/exception rules. None ⇒ the
    # subset path (byte-identical on every suffix the subset covers —
    # tests/test_psl.py pins the superset property).
    psl: object | None = None
    # raw-body corpus mode (pages carry `body binary` + `content_type`):
    forced_charset: str | None = None   # session.Encoding analog (U4 chain)
    debug_sample_rows: int = 100  # S11: non-2xx samples kept per round
    # S3 (form.go:338-401): a 2xx page carrying a GET form also discovers
    # its submit URL (action + sorted urlencoded defaults, values
    # re-encoded into forced_charset — the U5 outbound path) as a child in
    # document-order slot oracle.FORM_POS. Off by default: submitting is a
    # crawl POLICY (the reference leaves it to user code).
    auto_submit_forms: bool = False
    # phash payload dedup (the north rule's per-round "phash dedup" stage):
    # dedup fetched 2xx image payloads by exact perceptual hash, in-round
    # AND across rounds (phash_seen append state). The first fetch in
    # fetch_seq order wins; every later fetch of the same phash lands in
    # the payload_dups table with dup_of = the winning fetch_seq, so a
    # downstream store can skip the duplicate payload. Off by default:
    # dropping duplicate payloads is a crawl policy, not a fetch semantic.
    phash_dedup: bool = False
    # payload curation (LAION/DataComp gate applied in the round loop):
    # 2xx image fetches whose metadata fails the training-corpus predicate
    # (min side / integer aspect envelope / caption token floor — the SAME
    # arithmetic as functions/curation.curation_predicate) are recorded in
    # the image_rejects append table with the FIRST failing reason
    # (min_side → aspect → caption, fixed order). A side record like
    # payload_dups: the fetch log is unchanged. Off by default.
    curate_images: bool = False
    curate_min_side: int = 48
    curate_aspect_num: int = 3
    curate_aspect_den: int = 1
    curate_min_caption_tokens: int = 4
    # crawler-trap suppression (frontier/traps.py applied to the round
    # loop): once a (host, digit-collapsed path template) has accumulated
    # this many FETCHED urls, further children matching it are dropped at
    # insert — the standard template-explosion mitigation (calendar pages,
    # session-id permutations). Counts ride an APPEND state table
    # (trap_counts: this round's per-template fetch counts, O(k) rows);
    # the flagged set is the aggregate ≥ threshold, broadcast into ONE
    # anti-join on the O(k·fanout) children — the frontier itself is never
    # touched. Round r's insert uses counts through round r-1 (the
    # committed state), which the oracle mirrors exactly. None ⇒ off
    # (trap policy, like auto_submit_forms).
    trap_max_urls: int | None = None
    # adaptive per-host error backoff (circuit breaker): a host whose
    # non-2xx fetch count summed over the trailing `backoff_window`
    # committed rounds reaches `backoff_errors` is excluded from
    # SCHEDULING this round — its frontier rows stay in place (the
    # standing frontier is untouched; conflict resolution still sees
    # them) and become eligible again once the errors age out of the
    # window. Counts ride an APPEND state table (host_errors: this
    # round's per-host non-2xx counts, O(hosts touched) rows); the
    # suppressed set is a windowed aggregate ≥ threshold, broadcast into
    # ONE anti-join on the narrow scheduling pool AFTER the seen filter
    # (so seen-ness decisions are identical with or without backoff).
    # A round where every candidate host is suppressed schedules 0 rows
    # and terminates the crawl, same as an empty frontier — the oracle
    # mirrors that. None ⇒ off (retry policy, like trap_max_urls).
    backoff_errors: int | None = None
    backoff_window: int = 2
    # merge-on-read frontier commits: a normal round writes only the O(k)
    # deltas (frontier_add: children kept; frontier_rm: removal hashes) and
    # the read reconstructs frontier = base ∖ removals ∪ (adds ∖ any
    # strictly-later removal); every Nth round compacts — rewrites the full
    # REPLACE "frontier" table (the Iceberg merge-on-read + compaction
    # pattern). At 10^10 rows rewriting the frontier per round is THE
    # scale-killer this removes: per-round frontier I/O drops from O(n) to
    # O(k·fanout). 1 ⇒ compact every round (the old behavior).
    frontier_compact_every: int = 4


class CrawlEngine:
    def __init__(self, spark, store: SnapshotStore, pages: DataFrame,
                 robots: DataFrame, images: DataFrame | None = None,
                 cfg: CrawlConfig = CrawlConfig(), body_filter=None,
                 fetcher: Fetcher | None = None):
        self.spark = spark
        self.store = store
        self.cfg = cfg
        self.pages = pages
        self.robots = robots
        self.images = images
        self.filter = SeenFilter(cfg.seen_kind, cfg.seen_shards, cfg.seen_m_bits)
        # fetch strategy (the UnifiedScraper analog — see fetcher.py):
        # default = corpus lookup, auto-selecting the structured or raw
        # (parse-at-fetch, P1/U4 body path) flavor by corpus shape. Any
        # object with .lookup(probe, key) swaps in.
        self.fetcher = fetcher if fetcher is not None else CorpusFetcher(
            pages, forced_charset=cfg.forced_charset, body_filter=body_filter)
        self._raw = getattr(self.fetcher, "raw", "body" in pages.columns)
        self.body_filter = body_filter
        # robots table shape: REP rules array (frontier.robots parser
        # output) or the legacy disallow_prefixes fixture form
        self._robots_allowed = (rep_allowed_col()
                                if "rules" in robots.columns
                                else robots_allowed_col())

    def _corpus_lookup(self, probe: DataFrame, key: str) -> DataFrame:
        """Fetch via the configured strategy (see fetcher.Fetcher)."""
        return self.fetcher.lookup(probe, key)

    # -- cookies (S7/J3 — the Session cookie jar, re-expressed) ---------------
    #
    # The reference attaches a cookiejar (Go cookiejar = RFC 6265 scoping
    # incl. Domain/Path/expiry) to its HTTP client so cookies set by one
    # response ride on every later request, persisted via LoadCookie/
    # SaveCookie (/root/reference/session.go:67-110). The batch analog:
    #   * a tiny `cookies` state table (domain, host_only, path, name,
    #     value, set_seq, expires_round) in every snapshot — the
    #     SaveCookie file, resumable like all round state;
    #   * fetches in round r carry the jar AS OF the end of round r-1
    #     (fetches within a round are parallel — there is no intra-round
    #     ordering a cookie could ride; the oracle snapshots identically);
    #   * a corpus page may REQUIRE a cookie (`require_cookie` = "name" or
    #     "name=value"): unsatisfied ⇒ the fetch is a 403 and the response
    #     content (links, image, Set-Cookie, form) is not served;
    #   * 2xx responses may SET cookies (`set_cookies` array, elements
    #     optionally carrying RFC 6265 attributes `domain` — subdomain
    #     scope, validated against the setting host's registrable domain —
    #     `path`, and `max_age` in ROUNDS, the batch analog of seconds).
    #     Harvested per round, latest set_seq per (domain, host_only,
    #     path, name) wins; expired rows prune at the round-end merge.
    #   * matching (RFC 6265 §5.4): domain-match via the request host's
    #     bounded label-suffix chain (pure-Column explode ⇒ the jar join
    #     stays a broadcast EQUI-join — never a theta join), path-prefix
    #     match on "/" boundaries, per-name selection by longest path
    #     then earliest creation (set_seq).
    # Scale shape: the jar is per-host state (robots-cache-sized), so the
    # gate is a broadcast join against the ≤k require_cookie rows — never
    # a corpus or frontier shuffle; the suffix explode multiplies only
    # those ≤k rows by the host's label count (bounded, ~3).

    _COOKIE_CONTENT_COLS = ("links", "meta_refresh_url", "base_href",
                            "image_id", "title", "form_action",
                            "form_method", "form_inputs", "set_cookies",
                            "effective_charset")

    #: legacy → scoped jar normalization: (host, name, value[, set_seq])
    #: preloads become host-only cookies with path "/" and no expiry
    _JAR_COLS = ("domain", "host_only", "path", "name", "value",
                 "set_seq", "expires_round")

    @staticmethod
    def _normalize_jar(jar: DataFrame) -> DataFrame:
        cols = set(jar.columns)
        if "domain" not in cols:          # legacy (host, name, value[,seq])
            jar = (jar.withColumn("domain", F.col("host"))
                   .withColumn("host_only", F.lit(True))
                   .withColumn("path", F.lit("/")))
        if "set_seq" not in cols:
            jar = jar.withColumn("set_seq", F.lit(0).cast("long"))
        if "expires_round" not in jar.columns:
            jar = jar.withColumn("expires_round",
                                 F.lit(None).cast("long"))
        return jar.select(*CrawlEngine._JAR_COLS)

    def _cookie_gate(self, looked: DataFrame, jar: DataFrame | None,
                     r: int, key_col: str, url_col: str) -> DataFrame:
        """Apply the cookie gate to corpus-lookup output (which still carries
        the page host as ``_phost``): rows whose ``require_cookie`` is not
        satisfied by the round-start jar become status-403 dead letters with
        all content columns nulled (the page body was never served).

        RFC 6265 matching (§5.4): a jar row (domain, host_only, path,
        name, value, set_seq, expires_round) rides on request (H, P) in
        round r iff H == domain (host-only) or H domain-matches domain
        (H == domain or H ends with "."+domain), P path-matches path
        (equal, or prefix on a "/" boundary), and the row is unexpired
        (expires_round null or ≥ r). Among same-name matches the
        longest-path, then earliest-creation (set_seq) row wins."""
        if "require_cookie" not in looked.columns:
            return looked
        if jar is not None:
            need = (looked
                    .filter(F.col("require_cookie").isNotNull())
                    .select(key_col, "_phost",
                            path_udf(F.col(url_col)).alias("_rpath")))
            # bounded label-suffix chain of the request host: jar domains
            # are never shorter than the setting host's registrable
            # domain (enforced at harvest), so exploding every ≥2-label
            # suffix can only produce joinable keys — the domain-match
            # becomes a broadcast hash EQUI-join
            labels = F.split(F.col("_phost"), r"\.")
            n = F.size(labels)
            sfx = F.when(n >= 2, F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.array_join(
                    F.slice(labels, i, n - i + F.lit(1)), "."))
            ).otherwise(F.array(F.col("_phost")))
            cand = need.select(key_col, "_phost", "_rpath",
                               F.explode(sfx).alias("_dom"))
            jn = (cand.join(F.broadcast(jar),
                            cand["_dom"] == jar["domain"], "inner")
                  .filter((~F.col("host_only"))
                          | (F.col("_phost") == F.col("domain")))
                  .filter(F.col("expires_round").isNull()
                          | (F.col("expires_round") >= F.lit(int(r))))
                  .filter((F.col("_rpath") == F.col("path"))
                          | (F.col("_rpath").startswith(F.col("path"))
                             & (F.col("path").endswith("/")
                                | (F.col("_rpath").substr(
                                    F.length("path") + 1, F.lit(1))
                                   == "/")))))
            # per-name RFC selection: longest path, then earliest set_seq;
            # full determinism via (domain, path, host_only, value) tail
            sel = (jn.groupBy(key_col, "name")
                   .agg(F.min_by("value", F.struct(
                       (-F.length("path")).alias("_npl"),
                       F.col("set_seq"), F.col("domain"), F.col("path"),
                       F.col("host_only"), F.col("value")))
                        .alias("value")))
            maps = (sel.groupBy(key_col)
                    .agg(F.map_from_entries(
                        F.collect_list(F.struct("name", "value")))
                         .alias("_jar")))
            looked = looked.join(F.broadcast(maps), key_col, "left")
        else:
            looked = looked.withColumn(
                "_jar", F.lit(None).cast("map<string,string>"))
        parts = F.split(F.col("require_cookie"), "=", 2)
        # try_element_at: missing key ⇒ null (plain element_at throws under
        # ANSI mode, Spark 4's default)
        got = F.try_element_at(F.col("_jar"), parts.getItem(0))
        satisfied = F.col("require_cookie").isNull() | F.when(
            F.size(parts) > 1,
            F.coalesce(got == parts.getItem(1), F.lit(False))
        ).otherwise(got.isNotNull())
        gated = ~satisfied
        looked = looked.withColumn(
            "status", F.when(gated, F.lit(403)).otherwise(F.col("status")))
        for f in looked.schema.fields:
            if f.name in self._COOKIE_CONTENT_COLS:
                looked = looked.withColumn(
                    f.name, F.when(gated, F.lit(None).cast(f.dataType))
                             .otherwise(F.col(f.name)))
        return looked.drop("_jar")

    # -- seeding ---------------------------------------------------------------

    def seed(self, seeds: DataFrame, cookies: DataFrame | None = None) -> None:
        """Initialize round -0 state from seeds(url, seed_pos).

        ``cookies``: optional initial jar (host, name, value[, set_seq]) —
        the LoadCookie analog (/root/reference/session.go:92-110).

        Robots disallow rules are applied at INSERT time (here and on
        children in step 10): robots are static for a run, so insert-time
        and pop-time filtering make identical decisions, and the invariant
        "every frontier row is robots-allowed" lets each round skip the
        robots join and the path column on both full-frontier passes."""
        fr = (seeds
              .withColumn("_u", url_parts_udf(
                  F.col("url"), F.lit(None).cast("string")))
              .filter(F.col("_u.canon").isNotNull())
              .withColumn("canon", F.col("_u.canon"))
              .withColumn("url_hash", F.xxhash64("canon"))
              .withColumn("host", F.col("_u.host"))
              .withColumn("path", F.col("_u.path"))
              .withColumn("priority", F.lit(0.0))
              .withColumn("discovered_seq", F.col("seed_pos").cast("long"))
              .withColumn("ref_url", F.lit(None).cast("string"))
              .join(F.broadcast(self.robots), "host", "left")
              .filter(self._robots_allowed)
              .select(*FRONTIER_COLS))
        wdup = W.partitionBy("url_hash").orderBy(
            F.col("priority").desc(), F.col("discovered_seq").asc())
        fr = (fr.withColumn("_rn", F.row_number().over(wdup))
              .filter(F.col("_rn") == 1).drop("_rn"))
        empty_log = self.spark.createDataFrame([], FETCH_LOG_SCHEMA)
        tables = {"frontier": fr, "fetch_log": empty_log}
        if cookies is not None:
            # legacy (host, name, value[, set_seq]) preloads normalize to
            # host-only scope; scoped preloads pass through unchanged
            tables["cookies"] = self._normalize_jar(cookies)
        self.store.commit(-1, tables, counters={"fetched_total": 0})

    # -- one round ---------------------------------------------------------------

    @staticmethod
    def _tick(t0, label):
        if os.environ.get("CRAWLSPARK_TIMING"):
            print(f"    [timing] {label}: {time.time() - t0:.1f}s", flush=True)
        return time.time()

    def _unpersist_new_rdds(self, before_ids: set) -> None:
        """Free RDD blocks persisted during this round (eager
        localCheckpoints) while keeping pre-existing caches (e.g. the pages
        corpus). Committed state is on disk; the blocks are pure scratch —
        without this they accumulate round over round."""
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            if int(rid) not in before_ids:
                jmap.get(rid).unpersist(False)

    @staticmethod
    def _persistent_rdd_ids(spark) -> set:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(i) for i in jmap.keySet().toArray()}

    def _bucketed_seen_flag(self, df, hash_col: str = "url_hash"):
        """Attach ``_seen`` (True / null) by probing the hash-partitioned
        seen table bucket-by-bucket, executor-side: one applyInPandas task
        per bucket reads ONLY its ``bucket=<b>`` parquet files from every
        committed round (pyarrow, numpy isin — no per-row Python). The seen
        table is never shuffled; only ``df`` exchanges, by bucket id. This
        is the beyond-broadcast exact-decide path (J4 at 10^10 scale): the
        Bloom prefilter bounds ``df`` to suspects, bucketing bounds each
        task's read to |seen|/B keys. On a cluster the same code runs
        against the shared store (executors read the table files directly,
        the storage-partitioned-join pattern)."""
        import glob as _glob

        from pyspark.sql.types import BooleanType, StructField, StructType

        B = self.cfg.seen_buckets
        dirs = self.store.table_dirs("seen") or []
        schema = StructType(list(df.schema.fields)
                            + [StructField("_seen", BooleanType())])

        def probe(key, pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(key[0])
            pdf = pdf.drop(columns=["_bkt"])
            chunks = []
            for d in dirs:
                for f in sorted(_glob.glob(
                        os.path.join(d, f"bucket={b}", "*.parquet"))):
                    import pyarrow.parquet as pq
                    chunks.append(pq.read_table(
                        f, columns=["url_hash"]).column(0).to_numpy())
            if chunks:
                hit = np.isin(pdf[hash_col].to_numpy(),
                              np.concatenate(chunks))
            else:
                hit = np.zeros(len(pdf), dtype=bool)
            pdf["_seen"] = pd.array(
                [True if h else None for h in hit], dtype="boolean")
            return pdf

        bkt = F.pmod(F.col(hash_col), F.lit(B)).cast("int")
        return (df.withColumn("_bkt", bkt)
                .groupBy("_bkt").applyInPandas(probe, schema))

    def _frontier_view(self, base: DataFrame, base_round) -> DataFrame:
        return frontier_view(self.store, base, base_round)

    def run_round(self, r: int) -> dict:
        # cfg.shuffle_partitions: small crawls (k in the hundreds) drown in
        # per-task scheduler + Python-worker latency when every shuffle
        # fans out to the session default (32+ tasks for 100 rows —
        # measured as the flagship entry's dominant cost). Scoped to the
        # round, restored after.
        if self.cfg.shuffle_partitions is not None:
            conf = self.spark.conf
            prev = conf.get("spark.sql.shuffle.partitions")
            conf.set("spark.sql.shuffle.partitions",
                     str(self.cfg.shuffle_partitions))
            try:
                return self._run_round(r)
            finally:
                conf.set("spark.sql.shuffle.partitions", prev)
        return self._run_round(r)

    def _run_round(self, r: int) -> dict:
        cfg = self.cfg
        store = self.store
        _t = time.time()
        _rdds_before = self._persistent_rdd_ids(self.spark)
        frontier = store.read("frontier")
        base_round = store.last_committed_round("frontier")
        if frontier is not None:
            frontier = self._frontier_view(frontier, base_round)
        seen = store.read("seen")
        shards_df = store.read("seen_shards")
        host_state = store.read("host_state")
        jar = store.read("cookies")        # round-start cookie state (S7)
        if jar is not None:
            jar = self._normalize_jar(jar)
        # trap suppression: flagged templates as of ROUND START (counts
        # through round r-1 — append table, aggregated at read)
        trap_flagged = None
        if cfg.trap_max_urls is not None:
            tc = store.read("trap_counts")
            if tc is not None:
                trap_flagged = (tc.groupBy("host", "template")
                                .agg(F.sum("n").alias("n"))
                                .filter(F.col("n")
                                        >= F.lit(int(cfg.trap_max_urls)))
                                .select("host", "template"))
        # host backoff: suppressed hosts as of ROUND START (non-2xx counts
        # over committed rounds [r - backoff_window, r-1] — append table,
        # aggregated at read; O(hosts) rows, broadcast below)
        backoff_hosts = None
        if cfg.backoff_errors is not None:
            he = store.read("host_errors")
            if he is not None:
                backoff_hosts = (he.filter(
                                     F.col("round")
                                     >= F.lit(int(r - cfg.backoff_window)))
                                 .groupBy("host")
                                 .agg(F.sum("n_err").alias("n"))
                                 .filter(F.col("n")
                                         >= F.lit(int(cfg.backoff_errors)))
                                 .select("host"))
        base_seq = store.counters().get("fetched_total", 0)

        if frontier is None:
            raise RuntimeError("seed() first")

        # 1. dedup: the frontier is ALREADY unique by url_hash — seed()
        # dedups the seed list and step 11 dedups every frontier' before
        # commit (dedup keeps the min of a total order, so insert-time and
        # pop-time dedup choose identically — associative across rounds).
        # Re-deduping here cost one full-frontier shuffle+sort per round.
        #
        # PROJECTION DISCIPLINE (SURVEY §4): the whole scheduling decision
        # runs on NARROW columns — (url_hash, host, priority,
        # discovered_seq) ≈ 50 B/row vs ~150 B with the canon/ref_url
        # strings. Parquet is columnar, so the narrow scan never reads the
        # string pages; wide rows are touched only by no-shuffle
        # broadcast-filtered scans (scheduled join-back, commit). At 10^10
        # rows this is the difference between shuffling keys and shuffling
        # the crawl's entire string payload.
        #
        # 2-4 fused into ONE pass ending in the round's single narrow
        # materialization: robots broadcast join (no shuffle) → budget col →
        # Bloom/cuckoo pre-filter UDF → fresh/suspect split → exact
        # anti-join on suspects only → checkpoint. Seen-filter and
        # robots-filter commute (both are row filters).
        # frontier rows are robots-allowed by construction (insert-time
        # filtering, see seed()); the pop path only needs crawl-delay
        # budgets — no disallow re-check, no path column read.
        delays = self.robots.select("host", "crawl_delay_ms")
        robots_aug = (delays.join(host_state, "host", "left")
                      if host_state is not None
                      else delays.withColumn(
                          "credit_ms", F.lit(0).cast("long")))
        narrow = frontier.select("url_hash", "host", "priority",
                                 "discovered_seq")
        allowed = (narrow.join(F.broadcast(robots_aug), "host", "left")
                   .withColumn("host_budget",
                               budget_col(cfg.round_ms, cfg.k_global))
                   .select("url_hash", "host", "priority", "discovered_seq",
                           "host_budget"))

        confirmed_seen = None  # hashes the exact check removed this round
        if seen is not None:
            # Exact-join strategy: the approximate filter shrinks the LEFT
            # side to suspects; when the cumulative seen set is still small
            # (row count tracked in counters — it equals fetched_total) a
            # broadcast hint shrinks the RIGHT side too, making the exact
            # decide shuffle-free. At 10^10 scale the hint drops out and
            # suspects shuffle against the bucketed seen table.
            # The verdict rides the checkpoint as a _seen flag instead of
            # dropping rows: `allowed` and `confirmed_seen` (needed again at
            # commit) both read the SAME materialization — without the flag,
            # rebuilding confirmed_seen at commit re-ran the bloom UDF over
            # the whole frontier.
            seen_small = base_seq <= cfg.seen_broadcast_rows
            seen_flag = (seen.select("url_hash")
                         .withColumn("_seen", F.lit(True)))
            seen_keys = F.broadcast(seen_flag) if seen_small else seen_flag
            # While the seen set is broadcastable the approximate pre-filter
            # is pure overhead: the exact decide is already ONE codegen
            # broadcast hash join over the narrow frontier, and the
            # Bloom/cuckoo probe would add a full-frontier Arrow round-trip
            # through Python plus a two-branch union to avoid... that same
            # broadcast join. The filter earns its keep only beyond
            # broadcast, where it bounds the rows that must meet the
            # bucketed seen table. (Shard BUILDS are deferred to this
            # regime — see the commit-phase build rules: while the seen
            # set stays broadcastable no shards exist, and the first
            # regime flip does a one-time full rebuild from the exact
            # seen set, so the probe here always sees complete shards.)
            if shards_df is not None and not seen_small:
                shard_dirs = store.table_dirs("seen_shards") or []
                blob_bytes = cfg.seen_shards * (cfg.seen_m_bits // 8)
                if shard_dirs and blob_bytes > cfg.seen_blob_broadcast_bytes:
                    # beyond-broadcast filter regime (see cfg note): one
                    # narrow exchange of the frontier by shard id; blobs
                    # are read where they probe, never driver-collected
                    allowed = self.filter.might_contain_sharded(
                        allowed, "url_hash", shard_dirs)
                    _t = self._tick(_t, 'sharded probe plan')
                else:
                    shard_rows = store.read_local("seen_shards")
                    _t = self._tick(_t, 'shards collect')
                    maybe = self.filter.might_contain_col(
                        shard_rows, F.col("url_hash"), self.spark)
                    allowed = allowed.withColumn("_maybe", maybe)
                fresh = (allowed.filter(~F.col("_maybe")).drop("_maybe")
                         .withColumn("_seen",
                                     F.lit(None).cast("boolean")))
                suspect = allowed.filter(F.col("_maybe")).drop("_maybe")
                if self.store.table_dirs("seen"):
                    # beyond-broadcast regime: per-bucket executor-side
                    # probe against the hash-partitioned seen table — the
                    # seen set is read (its relevant buckets only), never
                    # shuffled; only the suspects exchange, by bucket id.
                    suspect = self._bucketed_seen_flag(suspect)
                else:  # store without a file layout (catalog adapter)
                    suspect = suspect.join(seen_keys, "url_hash", "left")
                allowed = fresh.unionByName(suspect)
            else:
                allowed = allowed.join(seen_keys, "url_hash", "left")

        # eager lineage truncation: deep round-DAGs otherwise re-run
        # Catalyst analysis per action (driver-side seconds each). On a
        # cluster swap for reliable checkpoint or rely on Iceberg round
        # tables; local mode keeps blocks on executor memory/disk.
        # lazy (eager=False): the pivot materializes INSIDE its first
        # full-scan consumer's job (the schedule_stats collect) instead
        # of a dedicated job — one fewer job/round, same frozen blocks.
        # (fetched stays EAGER: its first consumer is a limit-style
        # probe, which would only partially materialize the pivot.)
        allowed = ckpt(allowed, eager=False)
        if seen is not None:
            confirmed_seen = (allowed.filter(F.col("_seen"))
                              .select("url_hash"))
            allowed = allowed.filter(F.col("_seen").isNull()).drop("_seen")

        # 5-6. politeness top-K (budget-gated: only over-budget hosts are
        # ranked — politeness.topk_per_host), then global take-k. ONE small
        # (host, bucket) stats pass over the narrow frontier answers both
        # the budget gate AND the exact post-cap priority-histogram cut
        # (politeness.schedule_stats — the separate survivors-histogram job
        # previously re-executed the salted ranking just to count buckets).
        # The cut shrinks the take-k input to an exact superset of the
        # top-k, O(k) rows, before the distributed range-partitioned
        # sequencer (plans/ordering.py) assigns ranks; take-k is a filter
        # on the rank. Neither an unpartitioned window NOR
        # orderBy().limit(k) appears here: both funnel every survivor
        # through one task (TakeOrdered's final merge is single-task, and k
        # is of the same order as the round width) — measured as the serial
        # fraction that froze N-vs-4N scaling at ~0.25 efficiency.
        from .politeness import over_budget_hosts, postcap_cut, schedule_stats
        # host backoff: suppressed hosts leave the SCHEDULING pool only —
        # `allowed` (hence rem_meta's conflict resolution and the frontier
        # at rest) still contains their rows, so nothing is lost and the
        # unique-by-url_hash invariant holds; applied AFTER the seen
        # filter so confirmed_seen is identical with or without backoff.
        pool = allowed
        if backoff_hosts is not None:
            pool = allowed.join(F.broadcast(backoff_hosts), "host",
                                "left_anti")
        stats = ckpt(schedule_stats(pool), eager=False)
        cut = postcap_cut(stats, cfg.k_global)
        # the cut is applied BEFORE the salted ranking, not after: priority
        # is the leading sort key, so each host's ≥cut rows are a PREFIX of
        # its priority-desc order and cap∘cut ≡ cut∘cap (top-budget of a
        # prefix = top-budget ∩ prefix) — provably identical output, but
        # the windows sort only the O(k) rows above the cut instead of the
        # whole over-budget slice (at a 30%-hot frontier that is the
        # round's largest sort). The cut itself is computed from post-cap
        # counts (postcap_cut), so ≥ k rows survive, exactly as before.
        cand = (pool if cut is None else pool.filter(
            F.floor(F.col("priority") * 64) >= cut))
        pruned = topk_per_host(cand, cfg.salt_buckets,
                               over=over_budget_hosts(stats))
        # materialized once: the sequencer's repartitionByRange runs a
        # range-boundary SAMPLING job over its child before the exchange
        # executes it again — without this pivot the salted two-level
        # ranking (two window shuffles over the hot-host slice, the most
        # expensive part of scheduling) executed TWICE per round. pruned
        # is O(k) narrow rows (post-cut), so the pivot is cheap at any
        # scale. (CRAWLSPARK_NO_SEQ_PIVOT=1 is a measurement hook for
        # interleaved A/B trials, not a tuning knob.)
        if not os.environ.get("CRAWLSPARK_NO_SEQ_PIVOT"):
            pruned = ckpt(pruned, eager=False)
        seq_df, n_pruned = with_global_seq(pruned, order_cols(), out="idx",
                                           start=0, return_count=True)
        scheduled = (seq_df.filter(F.col("idx") < cfg.k_global)
                     .drop("host_budget"))
        n_scheduled = min(cfg.k_global, n_pruned)
        _t = self._tick(_t, 'schedule+count')
        if n_scheduled == 0:
            self._unpersist_new_rdds(_rdds_before)
            clear_ckpts()
            return {"round": r, "scheduled": 0, "fetched": 0, "done": True}

        # join-back: re-attach the wide columns (canon, ref_url) to the k
        # scheduled rows by broadcasting the narrow schedule into a plain
        # frontier scan — no shuffle of string payloads, ever.
        scheduled_wide = (frontier.select("url_hash", "canon", "ref_url")
                          .join(F.broadcast(scheduled), "url_hash"))

        # 7. fetch = look up the k scheduled URLs in the page corpus. An
        # outer join would have to shuffle the corpus (Spark cannot build
        # the preserved side of an outer broadcast join), so the lookup is
        # decomposed: inner join with the k rows BROADCAST into a plain
        # corpus scan, plus an anti-join recovering the missing rows (page
        # columns null ⇒ status 404 downstream). The corpus — the 100 TB
        # side — is never shuffled, at any scale.
        fetched = self._cookie_gate(
            self._corpus_lookup(scheduled_wide, "canon"), jar, r,
            "url_hash", "canon")
        fetched = (fetched
                   .withColumn("status", F.coalesce(F.col("status"),
                                                    F.lit(404)))
                   .drop("_phost"))

        # 8. meta-refresh (depth 1): resolve against base, claim targets
        is2xx = (F.floor(F.col("status") / 100) == 2)
        # materialized once: both consumers (refr, primaries) would
        # otherwise re-run the k-row parse (raw corpora: the Arrow-batched
        # charset+link extraction) inside the sequencer job — and at the
        # 100 TB target, re-evaluate the lookup's corpus scan
        fetched = ckpt(fetched)

        # refresh-empty gate: one tiny probe over the k-row checkpoint
        # (limit-1, never the corpus) decides whether the refresh branch
        # runs at all. Meta refreshes are rare in real crawls and absent in
        # many corpora — without the gate every round pays the branch's
        # corpus scan + seen probe + joins for an empty set. The probe is
        # pure column logic and the canonicalize UDF runs only INSIDE the
        # branch, over the refresh candidates — Spark extracts pandas UDFs
        # into an unconditional projection, so putting the UDF on the
        # k-row `fetched` plan paid a full-k Arrow round-trip (URL + base
        # strings both ways) every round even with zero refreshes.
        # Semantics are unchanged: with zero candidate rows the union
        # below was a no-op and every downstream table is a pure function
        # of the primaries; a candidate whose target canonicalizes to null
        # is dropped inside the branch exactly as before.
        refresh_cand = is2xx & F.col("meta_refresh_url").isNotNull()
        has_refresh = not fetched.filter(refresh_cand).isEmpty()

        refr = None
        if has_refresh:
            refr = (fetched
                    .filter(refresh_cand)
                    .withColumn("refresh_canon", canonicalize_udf(
                        F.col("meta_refresh_url"),
                        F.coalesce(F.col("base_href"), F.col("canon"))))
                    .filter(F.col("refresh_canon").isNotNull())
                    .select(F.col("idx").alias("parent_idx"),
                            F.col("canon").alias("parent_canon"),
                            F.col("priority").alias("parent_priority"),
                            F.col("refresh_canon"),
                            F.xxhash64("refresh_canon").alias("r_hash")))
            if seen is not None:
                if seen_small or not self.store.table_dirs("seen"):
                    refr = refr.join(seen_keys,
                                     refr.r_hash == seen.url_hash,
                                     "left_anti")
                else:
                    refr = (self._bucketed_seen_flag(refr, hash_col="r_hash")
                            .filter(F.col("_seen").isNull()).drop("_seen"))
            refr = (refr.join(F.broadcast(scheduled.select(
                                  F.col("url_hash").alias("r_hash"))),
                              "r_hash", "left_anti")
                    .withColumn("_rn", F.row_number().over(
                        W.partitionBy("r_hash").orderBy("parent_idx")))
                    .filter(F.col("_rn") == 1).drop("_rn"))

        # 9. fetch_seq: interleave refreshes right after their parents.
        # Sorting the primary∪refresh union by (parent slot, is_refresh)
        # gives exactly "refresh occupies its parent's next slot"
        # (invokeCount++ per invoke, session.go:160) — assigned by the
        # distributed sequencer, replacing the former single-partition
        # global window + cumulative refresh count.
        primaries_pre = (fetched
                         .withColumn("is_refresh", F.lit(False))
                         .withColumn("_slot", F.col("idx")))

        # form/cookie columns ride along only when the corpus provides them
        form_cols = [c for c in ("form_action", "form_method", "form_inputs",
                                 "set_cookies")
                     if c in fetched.columns]
        pre_cols = ["canon", "url_hash", "host", "ref_url", "priority",
                    "status", "base_href", "links", "image_id",
                    *form_cols, "is_refresh", "_slot"]
        all_pre = primaries_pre.select(*pre_cols)
        if has_refresh:
            refresh_pre = (self._cookie_gate(
                    self._corpus_lookup(refr, "refresh_canon"), jar, r,
                    "r_hash", "refresh_canon")
                .withColumn("status", F.coalesce(F.col("status"),
                                                 F.lit(404)))
                .select(F.col("refresh_canon").alias("canon"),
                        F.col("r_hash").alias("url_hash"),
                        host_udf("refresh_canon").alias("host"),
                        F.col("parent_canon").alias("ref_url"),
                        F.col("parent_priority").alias("priority"),
                        F.col("status"), F.col("base_href"),
                        F.col("links"), F.col("image_id"),
                        *[F.col(c) for c in form_cols],
                        F.lit(True).alias("is_refresh"),
                        F.col("parent_idx").alias("_slot")))
            all_pre = all_pre.unionByName(refresh_pre.select(*pre_cols))
        all_fetched, n_fetched = with_global_seq(
            all_pre, [F.col("_slot").asc(), F.col("is_refresh").asc()],
            out="fetch_seq", start=base_seq + 1, return_count=True)
        all_fetched = all_fetched.drop("_slot")
        _t = self._tick(_t, 'fetch+count')

        # 10. expansion: links (and, opted in, form-submit URLs) of 2xx
        # fetches → child frontier rows
        is2 = F.floor(F.col("status") / 100) == 2
        exp = (all_fetched
               .filter(is2)
               .filter(F.size(F.col("links")) > 0)
               .select("canon", "priority", "fetch_seq",
                       F.coalesce(F.col("base_href"), F.col("canon"))
                        .alias("base"),
                       F.explode("links").alias("link"))
               .select("canon", "priority", "fetch_seq", "base",
                       F.col("link.href").alias("href"),
                       F.col("link.pos").alias("pos")))
        if cfg.auto_submit_forms and "form_action" in all_fetched.columns:
            from ..operators.forms import submit_href
            from ..oracle import FORM_POS
            enc = cfg.forced_charset

            def _submit_kernel(actions: pd.Series, inputs: pd.Series
                               ) -> pd.Series:
                return pd.Series(
                    [None if a is None else submit_href(a, ins, enc)
                     for a, ins in zip(actions, inputs)])

            submit_udf = F.pandas_udf(_submit_kernel, "string")
            forms_exp = (all_fetched
                         .filter(is2)
                         .filter(F.col("form_action").isNotNull())
                         .filter(F.lower(F.coalesce(
                             F.col("form_method"), F.lit("get"))) == "get")
                         .select("canon", "priority", "fetch_seq",
                                 F.coalesce(F.col("base_href"),
                                            F.col("canon")).alias("base"),
                                 submit_udf(
                                     F.col("form_action"),
                                     F.col("form_inputs")).alias("href"),
                                 F.lit(FORM_POS).cast("int").alias("pos")))
            exp = exp.unionByName(forms_exp)
        # fused URL kernel: one Arrow stage computes (canon, host, path)
        # per child — the chained canonicalize→host→path UDFs paid three
        # Python stages and re-split the canon string twice, on the
        # round's largest Python input (O(k·fanout) rows)
        children = (exp
                    .withColumn("_u", url_parts_udf(
                        F.col("href"), F.col("base")))
                    .filter(F.col("_u.canon").isNotNull())
                    .select(F.col("_u.canon").alias("canon"),
                            F.xxhash64("_u.canon").alias("url_hash"),
                            F.col("_u.host").alias("host"),
                            F.col("_u.path").alias("path"),
                            (F.col("priority") - 1).alias("priority"),
                            (F.col("fetch_seq") * 100
                             + F.col("pos")).cast("long")
                            .alias("discovered_seq"),
                            F.col("canon").alias("ref_url"))
                    # robots disallow applies at insert (static rules —
                    # identical decision to the former pop-time check)
                    .join(F.broadcast(self.robots), "host", "left")
                    .filter(self._robots_allowed)
                    .select(*FRONTIER_COLS))
        if trap_flagged is not None:
            # flagged templates are O(templates) — broadcast anti-join on
            # the O(k·fanout) children; the wide frontier is never touched
            children = (children
                        .withColumn("_tpl", F.regexp_replace(
                            F.col("path"), "[0-9]+", "N"))
                        .join(F.broadcast(trap_flagged.withColumnRenamed(
                            "template", "_tpl")),
                            ["host", "_tpl"], "left_anti")
                        .drop("_tpl"))

        # 11. next state. `remaining` was already seen-filtered this round
        # (it is a subset of `allowed`), so only the round's own fetches
        # (new_seen, ≤ k rows — broadcast) need removing from it. Children
        # are NOT exact-checked at insert: the next round's pop-time
        # bloom+exact filter makes the identical decision (seen-ness is a
        # function of url_hash alone, and dedup merges equal hashes before
        # the filter), so deferring costs at most one round of zombie rows
        # in the frontier — self-cleaning, since each round rebuilds
        # frontier' from post-filter survivors. This removes the former
        # full-frontier × full-seen anti-join from every commit.
        # materialized once: four downstream plans broadcast this set.
        # No distinct(): all_fetched is ALREADY unique by url_hash — the
        # scheduled set is unique at rest, refresh targets are first-claim
        # deduped (_rn == 1) and anti-joined against both the scheduled
        # hashes and the seen set — so the shuffle a distinct would add is
        # pure waste (goldens pin seen-set equality either way).
        new_seen = ckpt(all_fetched.select("url_hash"), eager=False)

        # dedup (A6) without shuffling the frontier. Invariant: the standing
        # frontier is unique by url_hash, so only (a) children vs children
        # and (b) children vs standing rows can collide. (a) is a groupBy
        # over the children alone (O(k·links) rows); (b) is resolved by
        # broadcasting the deduped children into ONE narrow no-shuffle scan
        # of the allowed checkpoint, emitting the collision list with both
        # sides' (priority, discovered_seq) keys. The wide frontier' is then
        # a plain frontier scan with broadcast anti-joins — the union+groupBy
        # that previously shuffled every wide row per round is gone.
        # Comparator = best by (priority desc, discovered_seq asc); exact
        # key ties imply the same parent fetch, hence identical rows (a
        # ref_url-hash tiebreaker keeps the order total regardless).
        _cmp = F.struct(
            F.col("priority"),
            (-F.col("discovered_seq")).alias("_nds"),
            (-F.xxhash64(F.coalesce(F.col("ref_url"), F.lit("")))).alias("_nrh"))
        child_best = (children
                      .groupBy("url_hash")
                      .agg(F.max_by(F.struct(*FRONTIER_COLS), _cmp)
                           .alias("_best"))
                      .select("_best.*")
                      .join(F.broadcast(new_seen), "url_hash", "left_anti")
                      .transform(lambda d: ckpt(d, eager=False)))

        rem_meta = allowed.join(F.broadcast(new_seen), "url_hash",
                                "left_anti")
        # materialized once (tiny): both broadcast consumers (replaced /
        # child_lost) would otherwise re-scan the narrow checkpoint
        conflicts = ckpt(rem_meta
                         .select("url_hash",
                                 F.col("priority").alias("_rp"),
                                 F.col("discovered_seq").alias("_rd"))
                         .join(F.broadcast(child_best.select(
                             "url_hash",
                             F.col("priority").alias("_cp"),
                             F.col("discovered_seq").alias("_cd"))),
                             "url_hash"), eager=False)
        child_wins = (
            F.struct(F.col("_cp").alias("p"), (-F.col("_cd")).alias("n"))
            > F.struct(F.col("_rp").alias("p"), (-F.col("_rd")).alias("n")))
        replaced = conflicts.filter(child_wins).select("url_hash")
        child_lost = conflicts.filter(~child_wins).select("url_hash")

        # merge-on-read commit (the Iceberg MOR + compaction pattern): a
        # normal round writes only the O(k) deltas — additions (children
        # kept) and removal hashes — and the next round's _frontier_view
        # reconstructs the identical set; every cfg.frontier_compact_every
        # rounds the full frontier is rebuilt and REPLACE-written (the wide
        # `remaining` scan below — broadcast-only anti-joins, zero string
        # shuffles), folding the delta stack into a fresh base. Per-round
        # frontier I/O is O(k·fanout), not O(n) — at 10^10 rows the
        # every-round full rewrite was the remaining scale-killer.
        additions = child_best.join(F.broadcast(child_lost), "url_hash",
                                    "left_anti")
        removals = new_seen.unionByName(replaced)
        if confirmed_seen is not None:
            removals = removals.unionByName(confirmed_seen)
        compact = (base_round is None
                   or (r - base_round) >= cfg.frontier_compact_every)
        frontier_next = None
        if compact:
            remaining = (frontier.select(*FRONTIER_COLS)
                         .join(F.broadcast(removals), "url_hash",
                               "left_anti"))
            frontier_next = remaining.unionByName(additions)

        # seen-filter shard maintenance, deferred to the regime that reads
        # it (round-4 serial-fraction cut): while the seen set stays
        # broadcastable the probe path skips the approximate filter
        # entirely, so building + writing shards every round was two pure-
        # overhead jobs/round on small crawls. Build rules:
        #   * next round still broadcastable and no shards exist → skip;
        #   * regime FLIP (first round whose committed total crosses
        #     cfg.seen_broadcast_rows with no shards on disk) → ONE full
        #     rebuild from the exact seen set (bounded, once per crawl);
        #   * shards exist (incl. forced-filter configs) → incremental
        #     build every round, exactly as before, so the shard set is
        #     never stale where the probe can read it.
        next_small = (base_seq + n_fetched) <= cfg.seen_broadcast_rows
        if shards_df is None and not store.table_dirs("seen_shards") \
                and next_small:
            shards_next = None
        elif shards_df is None and not store.table_dirs("seen_shards") \
                and not next_small and seen is not None:
            # regime flip with prior rounds unsharded: rebuild from ALL
            # seen hashes (committed ∪ this round)
            shards_next = self.filter.build(
                seen.select("url_hash").unionByName(new_seen))
        else:
            shards_next = self.filter.build(
                new_seen, existing_df=shards_df,
                # file layout present → each build task reads its own
                # shard's prior blob executor-side (no driver load)
                existing_dirs=(store.table_dirs("seen_shards") or None))
        host_state_next = next_host_state(
            self.robots, scheduled, host_state, cfg.round_ms)

        # cookie-jar update (S7): harvest this round's Set-Cookie headers
        # (2xx, served rows only — the gate nulls set_cookies on 403s) and
        # merge latest-wins per (host, name). All inputs are ≤k rows or the
        # per-host jar — no corpus-scale work. Deterministic tie-break:
        # max(struct(set_seq, value)).
        cookies_next = None
        if "set_cookies" in all_fetched.columns:
            raw = (all_fetched
                   .filter(is2 & F.col("set_cookies").isNotNull())
                   .select("host",
                           path_udf(F.col("canon")).alias("_ppath"),
                           F.col("fetch_seq").alias("set_seq"),
                           F.explode("set_cookies").alias("_c")))
            cfields = {f.name for f in all_fetched.schema["set_cookies"]
                       .dataType.elementType.fields}
            dattr = (F.lower(F.regexp_replace(F.col("_c.domain"),
                                              r"^\.", ""))
                     if "domain" in cfields
                     else F.lit(None).cast("string"))
            pattr = (F.col("_c.path") if "path" in cfields
                     else F.lit(None).cast("string"))
            mage = (F.col("_c.max_age").cast("long")
                    if "max_age" in cfields
                    else F.lit(None).cast("long"))
            # RFC 6265 §5.3 setting rules: a Domain attribute must cover
            # the setting host (host domain-matches it) and stay within
            # the host's registrable domain (never a public suffix) —
            # otherwise the cookie is IGNORED. No attribute ⇒ host-only.
            # cfg.psl swaps the literal-IN subset fast path for the
            # full-PSL broadcast-join resolver (wildcard/exception
            # rules, crawlspark.psl) — raw is ≤k exploded cookie rows,
            # so the K extra broadcast joins are noise.
            if self.cfg.psl is not None:
                from ..psl import with_registrable_domain
                raw = with_registrable_domain(
                    raw, self.cfg.psl, host_col="host",
                    out_col="_psl_rd")
                rd = F.col("_psl_rd")
            else:
                rd = registrable_domain(F.col("host"))
            dom_match = ((F.col("host") == dattr)
                         | F.col("host").endswith(
                             F.concat(F.lit("."), dattr)))
            rd_ok = rd.isNotNull() & ((dattr == rd)
                                      | dattr.endswith(
                                          F.concat(F.lit("."), rd)))
            valid = dattr.isNull() | (dom_match & rd_ok)
            # default path (§5.1.4): the setting URL's path up to (not
            # including) the last "/", floored at "/"
            dp0 = F.regexp_replace(F.col("_ppath"), "/[^/]*$", "")
            dpath = F.when(dp0 == "", F.lit("/")).otherwise(dp0)
            harvested = (raw
                         .withColumn("_d", dattr)
                         .filter(valid)
                         .select(
                             F.coalesce(F.col("_d"), F.col("host"))
                              .alias("domain"),
                             F.col("_d").isNull().alias("host_only"),
                             F.when(pattr.isNotNull()
                                    & pattr.startswith("/"), pattr)
                              .otherwise(dpath).alias("path"),
                             F.col("_c.name").alias("name"),
                             F.col("_c.value").alias("value"),
                             "set_seq",
                             F.when(mage.isNotNull(),
                                    F.lit(int(r)) + mage)
                              .cast("long").alias("expires_round")))
            merged = (jar.unionByName(harvested) if jar is not None
                      else harvested)
            cookies_next = (merged
                            .groupBy("domain", "host_only", "path", "name")
                            .agg(F.max(F.struct("set_seq", "value",
                                                "expires_round"))
                                 .alias("_m"))
                            .select("domain", "host_only", "path", "name",
                                    F.col("_m.value").alias("value"),
                                    F.col("_m.set_seq").alias("set_seq"),
                                    F.col("_m.expires_round")
                                     .alias("expires_round"))
                            # prune rows that can never ride again
                            .filter(F.col("expires_round").isNull()
                                    | (F.col("expires_round")
                                       >= F.lit(int(r) + 1))))
        elif jar is not None:
            cookies_next = jar   # carry the loaded jar forward unchanged

        # 12. metrics + lineage (A7: per host and per partition)
        host_metrics = (all_fetched
                        .groupBy("host")
                        .agg(F.count("*").alias("n_fetched"),
                             F.sum(F.when(F.floor(F.col("status") / 100) == 2,
                                          1).otherwise(0)).alias("n_2xx"))
                        .withColumn("round", F.lit(r))
                        .withColumn("partition_id", F.lit(-1))
                        .withColumn("kind", F.lit("host")))
        lineage = (all_fetched
                   .withColumn("partition_id", F.spark_partition_id())
                   .groupBy("partition_id")
                   .agg(F.count("*").alias("n_fetched"))
                   .withColumn("n_2xx", F.lit(None).cast("long"))
                   .withColumn("round", F.lit(r))
                   .withColumn("host", F.lit(None).cast("string"))
                   .withColumn("kind", F.lit("partition"))
                   .select(*host_metrics.columns))
        metrics = host_metrics.unionByName(lineage)

        fetch_log = (all_fetched
                     .withColumn("round", F.lit(r))
                     .select("round", "fetch_seq", "canon", "ref_url",
                             "status", "is_refresh", "image_id", "host",
                             "priority"))

        # S11 (chrome.go:53-95 analog): on-failure debug snapshots — the
        # round's non-2xx fetches, capped deterministically by fetch_seq
        # (orderBy+limit over ≤k rows, never the corpus).
        debug_samples = (all_fetched
                         .filter(F.floor(F.col("status") / 100) != 2)
                         .withColumn("round", F.lit(r))
                         .select("round", "fetch_seq", "canon", "ref_url",
                                 "status", "is_refresh", "host")
                         .orderBy("fetch_seq")
                         .limit(cfg.debug_sample_rows))

        # phash payload dedup (north rule): the first fetch of each exact
        # perceptual hash wins, in fetch_seq order, across rounds. Every
        # input here is ≤k rows except the two scans that are probed by
        # BROADCASTING the round's keys into them — the images table (one
        # column-pruned scan; in a live crawl the phash is computed from
        # the payload at fetch time and this join disappears) and the
        # committed phash_seen state (append-only at rest, never shuffled).
        payload_dups = None
        phash_winners = None
        if cfg.phash_dedup and self.images is not None:
            keys = (all_fetched
                    .filter(is2 & F.col("image_id").isNotNull())
                    .select("image_id", "fetch_seq"))
            ph = ckpt(self.images.select("image_id", "phash")
                      .join(F.broadcast(keys), "image_id"))
            phash_seen = store.read("phash_seen")
            prior = None
            if phash_seen is not None:
                prior = (phash_seen
                         .join(F.broadcast(ph.select("phash").distinct()),
                               "phash")
                         .groupBy("phash")
                         .agg(F.min("first_seq").alias("_prior_seq")))
            round_min = (ph.groupBy("phash")
                         .agg(F.min("fetch_seq").alias("_round_min")))
            enriched = ph.join(F.broadcast(round_min), "phash")
            enriched = (enriched.join(F.broadcast(prior), "phash", "left")
                        if prior is not None
                        else enriched.withColumn(
                            "_prior_seq", F.lit(None).cast("long")))
            dup_of = F.coalesce(
                F.col("_prior_seq"),
                F.when(F.col("fetch_seq") > F.col("_round_min"),
                       F.col("_round_min")))
            enriched = ckpt(enriched.withColumn("_dup_of", dup_of))
            payload_dups = (enriched
                            .filter(F.col("_dup_of").isNotNull())
                            .withColumn("round", F.lit(r))
                            .select("round", "fetch_seq", "image_id",
                                    "phash",
                                    F.col("_dup_of").alias("dup_of")))
            phash_winners = (enriched
                             .filter(F.col("_dup_of").isNull())
                             .select("phash",
                                     F.col("fetch_seq").alias("first_seq")))

        # payload curation gate (cfg.curate_images): metadata-only probe
        # of the images scan — broadcast this round's ≤k keys INTO it, no
        # shuffle of the corpus; reasons evaluated in fixed order so the
        # record is deterministic. Same side-record posture as phash
        # dedup: the fetch log itself is untouched.
        image_rejects = None
        if cfg.curate_images and self.images is not None:
            ckeys = (all_fetched
                     .filter(is2 & F.col("image_id").isNotNull())
                     .select("image_id", "fetch_seq"))
            cmeta = (self.images.select("image_id", "w", "h", "caption")
                     .join(F.broadcast(ckeys), "image_id"))
            _w, _h = F.col("w"), F.col("h")
            _toks = F.size(F.filter(F.split(F.col("caption"), " "),
                                    lambda t: t != ""))
            _reason = (
                F.when(F.least(_w, _h) < cfg.curate_min_side,
                       F.lit("min_side"))
                .when((_w * cfg.curate_aspect_den
                       > _h * cfg.curate_aspect_num)
                      | (_h * cfg.curate_aspect_den
                         > _w * cfg.curate_aspect_num), F.lit("aspect"))
                .when(_toks < cfg.curate_min_caption_tokens,
                      F.lit("caption")))
            image_rejects = (cmeta.withColumn("reason", _reason)
                             .filter(F.col("reason").isNotNull())
                             .withColumn("round", F.lit(r))
                             .select("round", "fetch_seq", "image_id",
                                     "reason"))

        # payload fidelity sampling (input_hint invariant), if corpus
        # present. The decode/count action overlaps the commit's table
        # writes (it runs in its own thread; the store joins it AFTER the
        # writes and BEFORE the manifest replace), so a fidelity failure
        # still precedes the atomic commit point — same crash-before-commit
        # semantics, minus the serial wall time.
        validate_gate = None
        if self.images is not None and cfg.validate_fraction > 0:
            from threading import Thread

            from .validate import validate_payloads
            _vres: dict = {}
            _imgs, _frac = self.images, cfg.validate_fraction

            def _validate():
                try:
                    _vres["n_bad"] = validate_payloads(all_fetched, _imgs,
                                                       _frac)
                except BaseException as e:   # surfaced by the gate
                    _vres["err"] = e
            _vthread = Thread(target=_validate, daemon=True)
            _vthread.start()

            def validate_gate():
                _vthread.join()
                if "err" in _vres:
                    raise _vres["err"]
                if _vres["n_bad"]:
                    raise RuntimeError(
                        f"payload fidelity violated on {_vres['n_bad']} rows")

        _t = self._tick(_t, 'plan build')
        tables = {
            "fetch_log": fetch_log,
            "seen": new_seen.withColumn(
                "bucket", F.pmod(F.col("url_hash"),
                                 F.lit(cfg.seen_buckets)).cast("int")),
            "host_state": host_state_next,
            "metrics": metrics,
            "debug_samples": debug_samples,
        }
        if shards_next is not None:
            tables["seen_shards"] = shards_next
        if cookies_next is not None:
            tables["cookies"] = cookies_next
        if cfg.trap_max_urls is not None:
            # this round's per-template FETCH counts (append table, O(k)
            # rows/round; host+path derived from canon with pure Column
            # ops — refreshes carry no path column)
            _rest = F.regexp_replace(F.col("canon"),
                                     "^[a-z][a-z0-9+.-]*://", "")
            _hp = F.substring_index(_rest, "/", 1)
            _path = F.substring_index(
                F.substr(_rest, F.length(_hp) + F.lit(1)), "?", 1)
            tables["trap_counts"] = (
                all_fetched
                .select("host", F.regexp_replace(
                    _path, "[0-9]+", "N").alias("template"))
                .groupBy("host", "template")
                .agg(F.count(F.lit(1)).alias("n")))
        if cfg.backoff_errors is not None:
            # this round's per-host non-2xx counts (append table,
            # O(hosts touched)/round; all_fetched is ≤2k rows)
            tables["host_errors"] = (
                all_fetched
                .filter(F.floor(F.col("status") / 100) != 2)
                .groupBy("host")
                .agg(F.count(F.lit(1)).alias("n_err"))
                .withColumn("round", F.lit(r)))
        if payload_dups is not None:
            tables["payload_dups"] = payload_dups
            tables["phash_seen"] = phash_winners
        if image_rejects is not None:
            tables["image_rejects"] = image_rejects
        if compact:
            tables["frontier"] = frontier_next
        else:
            tables["frontier_add"] = additions.withColumn(
                "delta_round", F.lit(r))
            tables["frontier_rm"] = removals.withColumn(
                "delta_round", F.lit(r))
        store.commit(r, tables,
                     counters={"fetched_total": int(base_seq + n_fetched)},
                     precommit=validate_gate)
        _t = self._tick(_t, 'commit writes')
        self._unpersist_new_rdds(_rdds_before)
        clear_ckpts()

        return {"round": r, "scheduled": int(n_scheduled),
                "fetched": int(n_fetched), "done": False}

    # -- driver loop -------------------------------------------------------------

    def run(self, max_rounds: int | None = None) -> list[dict]:
        """Run rounds from the last committed snapshot (resume-safe)."""
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        stats = []
        start = self.store.last_round() + 1
        for r in range(start, start + limit):
            st = self.run_round(r)
            stats.append(st)
            if st["done"]:
                break
        return stats
