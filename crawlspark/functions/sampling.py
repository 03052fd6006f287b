"""Deterministic sampling for training-data pipelines.

Two operators, both pure Column expressions (scan-speed, zero shuffle for
the rate sampler, one per-stratum shuffle for the fixed-size sampler):

  stratified_sample   — keep each row iff hash(key) mod M < rate[stratum]*M.
                        Per-language / per-source downsampling at corpus
                        scale: the decision is a pure function of the row,
                        so it is reproducible, streamable, and needs no
                        coordination — the canonical 100 TB shape. Rates
                        ride a broadcast-joined dim table (at 10^10 docs
                        the rate table is still tiny).
  topn_per_stratum    — the N rows with the smallest hash per stratum:
                        a deterministic distributed "reservoir" that is a
                        rank window over (stratum), i.e. exactly one
                        shuffle by stratum. Unlike rate sampling it yields
                        a FIXED sample size per stratum regardless of
                        stratum cardinality.

The default hash is xxhash64 (JVM-side, bit-mirrored in
crawlspark/hashing.py for oracles). The driver entry passes a portable
multiplicative mixer instead — ((key mod 1000003) * 2654435761) mod
2^31-1 — chosen because it is overflow-free BIGINT arithmetic that ANSI
SQL engines (DuckDB) evaluate identically, making the oracle fully
independent; production callers should keep the xxhash64 default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Knuth multiplicative mixer over a Mersenne-prime field: (key % 1000003)
# caps the operand so key * 2654435761 < 2^63 for ANY bigint key — the
# whole pipeline stays in exact BIGINT arithmetic on every engine.
PORTABLE_MIX_SQL = "((({key}) % 1000003) * 2654435761) % 2147483647"


def portable_mix(key: str | Column) -> Column:
    k = F.col(key) if isinstance(key, str) else key
    return ((k % F.lit(1000003)) * F.lit(2654435761)) % F.lit(2147483647)


def default_hash(key: str | Column, buckets: int = 1_000_000) -> Column:
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(k), F.lit(buckets))


def stratified_sample(df: DataFrame, strata_col: str, rates: DataFrame,
                      key_col: str, hash_bucket: Column | None = None,
                      buckets: int = 1000) -> DataFrame:
    """Keep each row iff its hash bucket < rate_ppb for its stratum.

    ``rates``: a small DataFrame (strata_col, rate double in [0,1]) —
    broadcast-joined. ``hash_bucket``: an integer Column in [0, buckets);
    defaults to xxhash64(key_col) mod buckets. Rows whose stratum has no
    rate row are DROPPED (explicit-allowlist semantics).
    """
    if hash_bucket is None:
        hash_bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets))
    thresh = rates.select(
        strata_col,
        F.round(F.col("rate") * buckets).cast("long").alias("_thresh"))
    return (df.join(F.broadcast(thresh), strata_col)
            .filter(hash_bucket < F.col("_thresh"))
            .drop("_thresh"))


def topn_per_stratum(df: DataFrame, strata_col: str, n: int,
                     order_col: Column, tiebreak_col: str) -> DataFrame:
    """The n rows with the smallest (order_col, tiebreak) per stratum —
    deterministic fixed-size per-stratum sampling in one shuffle."""
    w = Window.partitionBy(strata_col).orderBy(
        order_col.asc(), F.col(tiebreak_col).asc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn"))


def mixture_plan(df: DataFrame, source_col: str,
                 target_frac_ppm: int) -> list[tuple]:
    """Per-source keep counts for a temperature-0.5 (sqrt-weighted)
    training mixture, in EXACT integer arithmetic so any oracle can
    reproduce it bit-for-bit (no pow/float anywhere):

        w_s    = isqrt(c_s)            (floor square root)
        T      = (Σc · ppm) div 10^6   (global row budget)
        keep_s = min(c_s, (T · w_s) div Σw)

    sqrt-weighting is the standard low-resource upweighting: a source
    with 1% of the corpus gets ~√-proportionally more than its raw share.
    Returns [(source, c_s, keep_s)]; one hash-agg + a tiny collect."""
    import math
    rows = sorted((r[0], int(r[1])) for r in
                  df.groupBy(source_col).count().collect())
    total = sum(c for _, c in rows)
    sw = sum(math.isqrt(c) for _, c in rows)
    t = (total * int(target_frac_ppm)) // 1_000_000
    return [(s, c, min(c, (t * math.isqrt(c)) // sw)) for s, c in rows]


def temperature_mixture(df: DataFrame, source_col: str, key_col: str,
                        target_frac_ppm: int,
                        hash_col: Column | None = None) -> DataFrame:
    """Deterministic sqrt-temperature mixture sample: keep exactly
    ``keep_s`` rows per source (mixture_plan), chosen as the rows with
    the smallest (hash, key) per source — the fixed-size deterministic
    reservoir. One corpus shuffle (the per-source rank window); the plan
    is a broadcast dim. The default hash is xxhash64; the driver entry
    passes portable_mix so DuckDB replays the identical choice."""
    spark = df.sparkSession
    plan = mixture_plan(df, source_col, target_frac_ppm)
    plan_df = spark.createDataFrame(
        [(s, k) for s, _, k in plan], f"{source_col} string, _keep long")
    h = hash_col if hash_col is not None else F.xxhash64(F.col(key_col))
    w = Window.partitionBy(source_col).orderBy(h.asc(),
                                               F.col(key_col).asc())
    return (df.join(F.broadcast(plan_df), source_col)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_keep"))
            .drop("_rn", "_keep"))


def dataset_split(df: DataFrame, key_col: str,
                  val_pct: int = 10, test_pct: int = 10,
                  hash_bucket: Column | None = None) -> DataFrame:
    """Deterministic train/val/test assignment: the key's hash bucket in
    [0, 100) maps to val (< val_pct), test (< val_pct + test_pct), else
    train. A pure row-local Column predicate — ZERO shuffle, stable
    across runs/engines, and a row's split never changes when the corpus
    grows (the property random() splits lack). ``hash_bucket`` defaults
    to xxhash64 (production); pass
    ``pmod(portable_mix(key), lit(100))`` when a cross-engine oracle
    must reproduce the arithmetic."""
    if hash_bucket is None:
        hash_bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(100))
    split = (F.when(hash_bucket < val_pct, "val")
             .when(hash_bucket < val_pct + test_pct, "test")
             .otherwise("train"))
    return df.withColumn("split", split)


def epoch_shuffle(df: DataFrame, key_col: str, epoch: int,
                  shuffle_key: Column | None = None,
                  out: str = "order_idx") -> DataFrame:
    """Deterministic global training-order shuffle for one epoch: rank
    rows by a per-epoch seeded hash of the key (ties broken by the key
    itself, so the order is total and reproducible), assigning a dense
    0-based ``out`` index with the distributed range sequencer.

    Epoch N and epoch N+1 produce different — but each individually
    reproducible — permutations, which is exactly the contract a
    multi-epoch training loader wants (and what a naive .orderBy(rand())
    cannot give: rand() re-draws on every recompute/retry).

    100 TB shape: ONE range exchange + per-partition sort (the same
    plans/ordering.with_global_seq machinery as the crawl's fetch_seq) —
    no unpartitioned window, no orderBy().limit() funnel, no driver-side
    permutation table. Downstream shard assignment is order_idx div
    rows_per_shard, a pure codegen projection.

    Default shuffle key = xxhash64(key, epoch) (production path). Pass
    ``shuffle_key=`` (e.g. portable_mix-based) when a cross-engine
    reproducible ordering is required — the driver oracle does, so DuckDB
    can replay the identical arithmetic.
    """
    from ..plans.ordering import with_global_seq

    k = (F.xxhash64(F.col(key_col), F.lit(int(epoch)))
         if shuffle_key is None else shuffle_key)
    seq = with_global_seq(df.withColumn("_sk", k),
                          [F.col("_sk").asc(), F.col(key_col).asc()],
                          out=out)
    return seq.drop("_sk")
