"""Freshness-driven recrawl scheduling over per-URL fetch history.

The reference crawls on demand and replays from cache (session.go
invoke/saveToCache + the NotModified path); a continuous crawler must
instead DECIDE which cached URLs to refetch. The classic policy (Cho &
Garcia-Molina, "Estimating Frequency of Change", ACM TOIT 2003 — public)
models each page as a Poisson change process: estimate the change rate
from observed fetch→changed history, then prioritize pages by how stale
they are expected to be now.

Two scores, one exact and one smooth:

* ``stale_score_ppm`` — the first-order expected number of unseen changes
  since the last fetch, in parts-per-million and EXACT INTEGER math:

      λ̂_naive = n_changes / span_s        (changes per second, observed)
      score    = λ̂_naive · age_s
      ppm      = n_changes · age_s · 1_000_000 // span_s

  Integer arithmetic end to end, so the driver oracle (DuckDB) reproduces
  it bit-for-bit — no float rounding contract needed.

* ``p_stale`` — the Poisson staleness probability with Cho's bias-corrected
  rate estimator (their eq. for repeated accesses at varying intervals):

      λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δt̄,   Δt̄ = span / (n - 1)
      p_stale(now) = 1 - exp(-λ̂ · age)

  Float columns (java.lang.Math on the JVM side); unit-tested against a
  numpy mirror, deliberately NOT part of the exact driver contract.

Scale shape: ONE groupBy(url) shuffle builds the per-URL stats (partial
aggregation map-side; the history table never moves twice); every score
is a pure Column expression on the aggregated rows, and the per-host
recrawl ranking reuses the same salted top-k discipline as the frontier
(bounded window per host). At 10^10 URLs the stats table is the same
~50 B/row narrow shape the scheduler already shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def change_history_stats(fetches: DataFrame, url_col: str = "url",
                         host_col: str = "host", ts_col: str = "ts_s",
                         changed_col: str = "changed") -> DataFrame:
    """Per-URL history rollup in ONE shuffle:
    (url, host, n_fetches, n_changes, first_s, last_s, span_s).
    ``ts_col`` is integer epoch seconds; ``changed_col`` is 0/1 per fetch
    (content hash differs from the previous fetch)."""
    return (fetches.groupBy(url_col, host_col)
            .agg(F.count(F.lit(1)).alias("n_fetches"),
                 F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
                 F.min(ts_col).alias("first_s"),
                 F.max(ts_col).alias("last_s"))
            .withColumn("span_s", F.col("last_s") - F.col("first_s")))


def stale_score_ppm(now_s: int):
    """Exact-integer first-order staleness: n_changes·age·1e6 div span.
    ``div`` is Spark's integral division (bigint in, bigint out — never a
    double, so the DuckDB ``//`` oracle matches bit-for-bit). URLs fetched
    once (span 0) score null — no rate is observable."""
    return F.expr(
        f"CASE WHEN span_s > 0 THEN "
        f"(n_changes * ({int(now_s)} - last_s) * 1000000) div span_s END")


def poisson_staleness(now_s: int):
    """(lambda_hat per second, p_stale) — Cho's bias-corrected estimator.
    Float columns for ranking quality; the exact contract lives in
    stale_score_ppm."""
    n = F.col("n_fetches").cast("double")
    x = F.col("n_changes").cast("double")
    dt_bar = F.col("span_s").cast("double") / (n - F.lit(1.0))
    lam = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / dt_bar
    age = (F.lit(float(now_s)) - F.col("last_s").cast("double"))
    p = F.lit(1.0) - F.exp(-lam * age)
    guard = (F.col("span_s") > 0) & (F.col("n_fetches") > 1)
    return (F.when(guard, lam).alias("lambda_hat"),
            F.when(guard, p).alias("p_stale"))


def recrawl_candidates(stats: DataFrame, now_s: int, per_host_k: int,
                       host_col: str = "host") -> DataFrame:
    """Top-k recrawl picks per host by exact staleness (ties: url asc).
    The window is per-host (politeness budgets are per-host too), so no
    unpartitioned sort; hot hosts are already capped at k rows out."""
    scored = (stats
              .withColumn("stale_ppm", stale_score_ppm(now_s))
              .filter(F.col("stale_ppm").isNotNull()))
    w = Window.partitionBy(host_col).orderBy(
        F.col("stale_ppm").desc(), F.col("url").asc())
    return (scored
            .withColumn("recrawl_rank",
                        F.row_number().over(w).cast("int"))
            .filter(F.col("recrawl_rank") <= per_host_k))


def change_drift(prev: DataFrame, curr: DataFrame,
                 id_col: str = "url_hash", sig_col: str = "sig",
                 threshold: int = 3) -> DataFrame:
    """Per-URL content-change detection between two crawl snapshots.

    Complements the Cho scheduling above: ``change_history_stats`` needs a
    per-fetch "did the content change" bit, and at crawl scale that bit
    comes from comparing compact content signatures (simhash/phash-style
    64-bit sketches stored per fetch — ``functions.dedup.simhash_signature``
    or the engine's phash column), never the payloads themselves. Given
    the previous and current snapshot tables of ``(id, sig)``, emit

        (id, sig_prev, sig_curr, hamming, changed)

    with ``hamming = popcount(sig_prev XOR sig_curr)`` and ``changed``
    iff hamming > threshold (near-duplicate edits — timestamps, counters,
    ad rotation — land within a few flipped bits; real rewrites are far
    beyond any sane threshold, per the simhash literature).

    Scale shape: ONE equi-join on the id column and pure Column bit math —
    no Python, no window. In a deployment both snapshots are stored
    bucketed by ``id_col`` (SnapshotStore writes seen/fetch tables that
    way), so the join is storage-partitioned and shuffle-free; URLs absent
    from either snapshot are inherently new/dead rather than changed,
    hence the inner join.
    """
    p = prev.select(F.col(id_col), F.col(sig_col).alias("sig_prev"))
    c = curr.select(F.col(id_col), F.col(sig_col).alias("sig_curr"))
    ham = F.bit_count(F.col("sig_prev").bitwiseXOR(F.col("sig_curr")))
    return (p.join(c, id_col)
            .select(id_col, "sig_prev", "sig_curr",
                    ham.cast("int").alias("hamming"),
                    (ham > F.lit(int(threshold))).alias("changed")))
