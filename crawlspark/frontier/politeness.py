"""Per-host politeness budgets + skew-safe top-K ranking.

The reference enforces politeness implicitly: one blocking connection, and
explicit ``Sleep`` between actions that replay *skips* while logging
(/root/reference/chrome.go:905-920) — i.e. politeness is *accounted*, not
slept, when reproducing a run. Our engine keeps that contract: crawl-delay is
pure arithmetic on the round budget, never a wall-clock sleep in an executor,
so resume/replay reproduces identical schedules.

Budget: within one scheduling round of ``round_ms`` (default 30 000 ms — the
reference's navigation timeout, /root/reference/scraper_interface.go:8-13), a
host with ``crawl_delay_ms = d`` admits
    budget = k_global            if d == 0
           = max(1, round_ms // d) otherwise
(≥ crawl_delay spacing ⇒ at most round_ms/d fetches per round; min 1 avoids
starvation of max-delay hosts).

Skew ("salted repartition by host-bucket to kill hot-host skew", north rule):
a naive ``Window.partitionBy(host)`` sends a 90 %-hot host to ONE task, and
ranking EVERY host shuffles the whole frontier twice. Two structural moves:

  1. **Budget gate**: a map-side-combinable `groupBy(host).count()` (tiny
     shuffle: n_hosts × P partial rows) finds the hosts whose row count
     exceeds their budget. Only THOSE rows are ranked; everyone else passes
     through untouched (count ≤ budget ⇒ every row survives top-budget).
     In a typical frontier only the hot/throttled hosts are over budget, so
     the two full-frontier window shuffles collapse to a shuffle of the hot
     slice.
  2. **Salted two-level rank** on the over-budget slice: rank within
     (host, salt), salt = pmod(url_hash, S) — S-way parallel even for a
     single host; keep local rank ≤ budget (any row with ≥ budget better
     rows in its own salt cell has ≥ budget better rows in the whole host),
     then final rank within host over ≤ S·budget survivors.

`prune_to_global_topk` is the same idea for the GLOBAL take-k: an exact
priority-histogram threshold shrinks the take-k input from O(frontier) to
O(k) before the distributed sequencer sorts it. Bucket counts are exact, so
the returned set provably contains the true top-k: every kept row has
priority ≥ every dropped row, and ≥ k rows are kept (priority dominates the
lexicographic order (priority desc, discovered_seq, url_hash)).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

def order_cols():
    """Deterministic frontier ordering (SURVEY.md §3.4): priority desc,
    discovery order asc, url_hash as the final data-derived tiebreaker.
    (A function — building Columns requires an active SparkContext.)"""
    return [F.col("priority").desc(), F.col("discovered_seq").asc(),
            F.col("url_hash").asc()]


def budget_col(round_ms: int, k_global: int):
    """Per-round budget with cross-round crawl-delay carryover (§2.7).

    A throttled host's unused round time rolls into the next round as
    ``credit_ms`` (≤ one delay — never a burst): budget =
    (round_ms + credit) // delay. The analytic-window framing (lag of the
    per-host last-fetch time) reduces to exactly this arithmetic because
    fetch i of a round lands at offset i·delay; the oracle implements the
    identical rule, and budgets stay *accounted*, never slept (the Sleep
    record/replay contract, /root/reference/chrome.go:905-920)."""
    d = F.col("crawl_delay_ms")
    t = F.lit(round_ms) + F.coalesce(F.col("credit_ms"), F.lit(0))
    return (F.when(d.isNull() | (d == 0), F.lit(k_global))
            .otherwise(F.greatest(F.lit(1), (t / d).cast("long")))
            .alias("host_budget"))


def next_host_state(robots, scheduled, prev_state, round_ms: int):
    """credit_ms' per throttled host after a round: min(delay,
    max(0, round_ms + credit − used·delay)). ``used`` counts the round's
    primary fetches (refreshes are outside politeness accounting, matching
    the budget tests). All inputs are host-keyed small tables."""
    used = scheduled.groupBy("host").agg(F.count("*").alias("_used"))
    throttled = robots.filter(
        F.col("crawl_delay_ms").isNotNull() & (F.col("crawl_delay_ms") > 0)
    ).select("host", "crawl_delay_ms")
    j = throttled.join(prev_state, "host", "left") if prev_state is not None \
        else throttled.withColumn("credit_ms", F.lit(0).cast("long"))
    d = F.col("crawl_delay_ms")
    credit = F.least(
        d,
        F.greatest(
            F.lit(0).cast("long"),
            (F.lit(round_ms) + F.coalesce(F.col("credit_ms"), F.lit(0))
             - F.coalesce(F.col("_used"), F.lit(0)) * d).cast("long")))
    return (j.join(used, "host", "left")
            .select("host", credit.alias("credit_ms")))


def schedule_stats(df, resolution: int = 64):
    """ONE pass over the narrow frontier → the small (host, bucket) count
    table that answers BOTH scheduling questions of a round:

      * which hosts are over budget (budget gate, topk_per_host), and
      * the exact post-cap priority histogram (prune cut) — derivable
        without executing the capping, because per-host capping keeps each
        host's top-budget rows in (priority desc, ...) order, so its kept
        bucket counts are "buckets desc until the budget is spent" with a
        clamp at the boundary bucket.

    Replaces two separate full-frontier jobs (the budget-gate groupBy and
    the survivors histogram — the latter also re-executed the salted
    ranking just to count buckets). Output is O(hosts × active buckets)
    rows — never collected to the driver; downstream cuts/gates are tiny
    jobs over this table.
    """
    b = F.floor(F.col("priority") * resolution)
    return (df.groupBy("host", b.alias("_b"))
            .agg(F.count("*").alias("_cnt"),
                 F.first("host_budget").alias("_bud")))


def over_budget_hosts(stats):
    """(host, _over) rows for hosts whose frontier rows exceed their
    budget — the topk_per_host gate, derived from schedule_stats."""
    return (stats.groupBy("host")
            .agg(F.sum("_cnt").alias("_cnt"), F.first("_bud").alias("_bud"))
            .filter(F.col("_cnt") > F.col("_bud"))
            .select("host", F.lit(True).alias("_over")))


def postcap_cut(stats, k: int, max_buckets: int = 4096):
    """The prune_to_global_topk bucket cut, computed EXACTLY from
    schedule_stats instead of a pass over the capped survivors.

    Per host: capped bucket counts = walk its buckets desc, keep
    min(cnt, budget − already_kept) — exact because capping selects the
    host's top-budget rows under a priority-leading order. Sum per bucket,
    then the usual cumulative cut. All work is over the small stats table;
    the driver sees ≤ max_buckets bucket rows."""
    w = (W.partitionBy("host")
         .orderBy(F.col("_b").desc())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum("_cnt").over(w)
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_cnt").cast("long"),
                (F.col("_bud") - (cum - F.col("_cnt"))).cast("long")))
    rows = (stats.withColumn("_kept", kept)
            .groupBy("_b").agg(F.sum("_kept").alias("count"))
            .orderBy(F.col("_b").desc())
            .limit(max_buckets)
            .collect())
    cum_n, cut = 0, None
    for r in rows:
        cum_n += r["count"]
        if cum_n >= k:
            cut = r["_b"]
            break
    return cut


def topk_per_host(df, salt_buckets: int = 8, over=None):
    """Keep ≤ host_budget rows per host by ORDER_COLS, skew-safely.

    Expects columns: host, url_hash, priority, discovered_seq, host_budget.
    Hosts within budget pass through with no shuffle at all (budget gate);
    over-budget hosts get the salted two-level rank. ``over``: optional
    precomputed over_budget_hosts(schedule_stats(df)) — the engine fuses
    the gate into its single stats pass."""
    if over is None:
        over = (df.groupBy("host")
                .agg(F.count("*").alias("_cnt"),
                     F.first("host_budget").alias("_bud"))
                .filter(F.col("_cnt") > F.col("_bud"))
                .select("host", F.lit(True).alias("_over")))
    tagged = df.join(F.broadcast(over), "host", "left")
    uncapped = tagged.filter(F.col("_over").isNull()).drop("_over")
    capped = tagged.filter(F.col("_over")).drop("_over")

    salted = capped.withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int"))
    local = W.partitionBy("host", "salt").orderBy(*order_cols())
    pruned = (salted
              .withColumn("local_rank", F.row_number().over(local))
              .filter(F.col("local_rank") <= F.col("host_budget")))
    final = W.partitionBy("host").orderBy(*order_cols())
    ranked = (pruned
              .withColumn("host_rank", F.row_number().over(final))
              .filter(F.col("host_rank") <= F.col("host_budget"))
              .drop("salt", "local_rank", "host_rank"))
    return uncapped.unionByName(ranked)


def prune_to_global_topk(df, k: int, resolution: int = 64,
                         max_buckets: int = 4096):
    """Exact superset of the global top-k by ORDER_COLS, via a priority
    histogram (bucket = floor(priority · resolution)).

    Finds the largest bucket cut b* with count(bucket ≥ b*) ≥ k and keeps
    those rows: every kept row has priority ≥ b*/resolution > every dropped
    row's priority, and bucket counts are exact, so the true top-k (priority
    is the leading sort key) is contained. Falls back to no pruning when the
    histogram is too spread out or holds < k rows — never wrong, only ever
    a no-op.
    """
    b = F.floor(F.col("priority") * resolution)
    rows = (df.groupBy(b.alias("_b")).count()
            .orderBy(F.col("_b").desc())
            .limit(max_buckets)
            .collect())
    cum, cut = 0, None
    for r in rows:
        cum += r["count"]
        if cum >= k:
            cut = r["_b"]
            break
    if cut is None:
        return df
    return df.filter(F.floor(F.col("priority") * resolution) >= cut)


def robots_allowed_col():
    """Boolean Column: path blocked by no disallow prefix.

    Mirrors longest-prefix-free robots semantics at the granularity the
    fixture uses (plain prefix match). Null rules (host absent from
    robots_cache) ⇒ allowed.
    """
    prefixes = F.col("disallow_prefixes")
    return (prefixes.isNull() |
            ~F.exists(prefixes, lambda p: F.col("path").startswith(p)))
