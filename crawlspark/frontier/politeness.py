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
a naive ``Window.partitionBy(host)`` sends a 90 %-hot host to ONE task. We
rank in two levels instead:
  1. local: rank within (host, salt) where salt = pmod(url_hash, S) —
     S-way parallel even for a single host; keep local rank ≤ budget.
     (Any row with ≥ budget better rows in its own salt cell has ≥ budget
     better rows in the whole host, so this prunes no true survivor.)
  2. final: rank within host over ≤ S·budget survivors — tiny.
This is the classic salted two-level top-K; AQE skew-join handles the join
side, salting handles the grouped ranking side (SURVEY.md §4).
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
    d = F.col("crawl_delay_ms")
    return (F.when(d.isNull() | (d == 0), F.lit(k_global))
            .otherwise(F.greatest(F.lit(1), (F.lit(round_ms) / d)
                                  .cast("long"))).alias("host_budget"))


def topk_per_host(df, salt_buckets: int = 8):
    """Keep ≤ host_budget rows per host by ORDER_COLS, skew-safely.

    Expects columns: host, url_hash, priority, discovered_seq, host_budget.
    """
    salted = df.withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)).cast("int"))
    local = W.partitionBy("host", "salt").orderBy(*order_cols())
    pruned = (salted
              .withColumn("local_rank", F.row_number().over(local))
              .filter(F.col("local_rank") <= F.col("host_budget")))
    final = W.partitionBy("host").orderBy(*order_cols())
    return (pruned
            .withColumn("host_rank", F.row_number().over(final))
            .filter(F.col("host_rank") <= F.col("host_budget"))
            .drop("salt", "local_rank", "host_rank"))


def robots_allowed_col():
    """Boolean Column: path blocked by no disallow prefix.

    Mirrors longest-prefix-free robots semantics at the granularity the
    fixture uses (plain prefix match). Null rules (host absent from
    robots_cache) ⇒ allowed.
    """
    prefixes = F.col("disallow_prefixes")
    return (prefixes.isNull() |
            ~F.exists(prefixes, lambda p: F.col("path").startswith(p)))
