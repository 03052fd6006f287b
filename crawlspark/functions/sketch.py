"""KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable.

The crawl engine needs cheap cardinality answers at 100 TB (distinct URLs
per host, distinct documents per shard) without the full shuffle an exact
COUNT(DISTINCT) costs. KMV keeps the k smallest distinct hash values of a
column; since xxhash64 spreads keys uniformly on [0, 2^64), the kth
smallest value U_k estimates density: E[distinct] = (k-1) / (U_k / 2^64).

Scale shape: ONE map pass over the data (mapInPandas keeps a running
k-minimum set per partition across its Arrow batches, emitting k rows per
partition at the end), then a driver-side merge of P*k longs — no shuffle
of the input at any point, and the sketch is mergeable across partitions,
tables, or days by construction (union + re-take k smallest).

Determinism: the sketch value is a pure function of the input SET (order
independent — min-k of a set), and xxhash64 is bit-equal between the JVM
and the pure-Python mirror (crawlspark.hashing, pinned by test_hashing), so
the driver oracle reproduces the estimate EXACTLY — no tolerance band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

_U64 = float(1 << 64)


def _estimate(kmins: np.ndarray, k: int) -> int:
    """Point estimate from the k smallest distinct unsigned-64 hashes."""
    if len(kmins) < k:          # sketch saw every distinct value: exact
        return int(len(kmins))
    u_k = float(kmins[k - 1]) / _U64
    return int((k - 1) / u_k)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (k_used, n_mins, kth_hash, est_distinct).

    ``kth_hash`` is the kth smallest hash as signed int64 (-1 when the
    sketch is exact), so the row is fully value-checkable by the oracle.
    """
    hashed = df.select(F.xxhash64(F.col(col)).alias("h"))

    def partition_mins(batches):
        mins = np.empty(0, dtype=np.uint64)
        for pdf in batches:
            h = pdf["h"].to_numpy(dtype=np.int64).astype(np.uint64)
            mins = np.unique(np.concatenate([mins, h]))[:k]
        yield pd.DataFrame({"h": mins.astype(np.int64)})

    part = hashed.mapInPandas(partition_mins, "h long")
    rows = part.collect()  # <= partitions * k longs — bounded by design
    mins = np.unique(np.asarray([r["h"] for r in rows],
                                dtype=np.int64).astype(np.uint64))[:k]
    est = _estimate(mins, k)
    kth = int(mins[k - 1].astype(np.int64)) if len(mins) >= k else -1
    spark = df.sparkSession
    return spark.createDataFrame(
        [(k, int(len(mins)), kth, est)],
        "k_used int, n_mins int, kth_hash long, est_distinct long")


def kmv_distinct_by(df: DataFrame, key_col: str, col: str, k: int = 64
                    ) -> DataFrame:
    """Per-group KMV: (key, n_mins, kth_hash, est_distinct).

    One shuffle of distinct (key, hash) pairs (map-side combine; the full
    rows never move), then a sort-based window keeps each key's k smallest
    hashes — spillable, no per-key buffer ever exceeds the sort run, unlike
    a collect_list of a hot key's whole hash set."""
    from pyspark.sql import Window as W

    flip = F.lit(-(1 << 63)).cast("long")  # sign-bit flip: unsigned order
    hashed = (df.select(F.col(key_col).alias("key"),
                        F.xxhash64(F.col(col)).alias("h"))
              .dropDuplicates(["key", "h"])
              .withColumn("hu", F.col("h").bitwiseXOR(flip)))
    w = W.partitionBy("key").orderBy("hu")
    mins = (hashed.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
    agg = (mins.groupBy("key")
           .agg(F.count("*").cast("int").alias("n_mins"),
                F.max("hu").alias("max_hu")))  # rank<=k ⇒ max == kth
    u_k = F.col("max_hu").bitwiseXOR(flip)
    u_kd = (u_k.cast("double")
            + F.when(u_k < 0, F.lit(_U64)).otherwise(F.lit(0.0)))
    n_mins = F.col("n_mins")
    return agg.select(
        "key", "n_mins",
        F.when(n_mins >= k, u_k).otherwise(F.lit(-1)).alias("kth_hash"),
        F.when(n_mins < k, n_mins.cast("long"))
         .otherwise(F.floor((k - 1) / (u_kd / F.lit(_U64))))
         .alias("est_distinct"))


# --- HyperLogLog ---------------------------------------------------------------

def _hll_point(reg: dict[int, int], m: int) -> tuple[int, int]:
    """HLL point estimate from a sparse register map (Flajolet et al. 2007).

    The indicator sum Z^-1 = sum_j 2^-M_j is computed as the EXACT integer
    sum of 2^(64-M_j) (python bigint), converted to float once — so the
    estimate is a pure function of the register multiset with a single,
    reproducible rounding point, and the pure-Python oracle mirror lands on
    the identical bits (no tolerance band). Linear counting below 2.5m with
    empty registers, per the paper; the 64-bit-hash variant needs no
    large-range correction.
    """
    import math
    s_int, nz = 0, 0
    for j in range(m):
        mj = reg.get(j, 0)
        if mj:
            nz += 1
        s_int += 1 << (64 - mj)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m * float(1 << 64) / float(s_int)
    v = m - nz
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return int(e), nz


def _hll_cols(h, p: int):
    """(register index, rho) Columns from a 64-bit hash Column: idx = top
    p bits, rho = 1 + leading zeros of the remaining 64-p bits (so rho in
    [1, 64-p+1]); all JVM-side (shift + bin-string length), no Python."""
    idx = F.shiftrightunsigned(h, 64 - p).cast("int")
    suf = F.shiftleft(h, p)
    rho = (F.when(suf == 0, F.lit(64 - p + 1))
           .when(suf < 0, F.lit(1))
           .otherwise(F.lit(65) - F.length(F.bin(suf)))).cast("int")
    return idx, rho


def hll_distinct(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """One-row DataFrame: (p, m, n_nonzero, est_distinct) — the classic
    HLL cardinality sketch, complementing KMV (HLL: fixed 2^p-register
    footprint, ~1.04/sqrt(m) error; KMV: k hashes, exact below k).

    Scale shape: rows reduce to (idx, rho) pairs with map-side combine
    (partial max per register per partition), so the only exchange carries
    at most partitions * 2^p tiny rows; the driver folds <= 2^p registers.
    Mergeable by construction (max per register) across tables or days.
    """
    m = 1 << p
    idx, rho = _hll_cols(F.xxhash64(F.col(col)), p)
    rows = (df.select(idx.alias("idx"), rho.alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("r"))
            .collect())  # <= 2^p rows — bounded by design
    est, nz = _hll_point({int(r["idx"]): int(r["r"]) for r in rows}, m)
    return df.sparkSession.createDataFrame(
        [(p, m, nz, est)],
        "p int, m int, n_nonzero int, est_distinct long")


def hll_distinct_by(df: DataFrame, key_col: str, col: str, p: int = 10
                    ) -> DataFrame:
    """Per-group HLL: (key, n_nonzero, est_distinct).

    One (key, idx) hash-agg with map-side combine — the exchange carries
    at most keys * 2^p register rows, never the input — then a grouped
    Arrow stage folds each key's registers through the same exact-integer
    estimator the global sketch and the oracle mirror use.
    """
    m = 1 << p
    idx, rho = _hll_cols(F.xxhash64(F.col(col)), p)
    regs = (df.select(F.col(key_col).alias("key"), idx.alias("idx"),
                      rho.alias("rho"))
            .groupBy("key", "idx").agg(F.max("rho").alias("r")))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        reg = dict(zip(pdf["idx"].astype(int), pdf["r"].astype(int)))
        est, nz = _hll_point(reg, m)
        return pd.DataFrame([{"key": pdf["key"].iloc[0],
                              "n_nonzero": nz, "est_distinct": est}])

    return regs.groupBy("key").applyInPandas(
        fold, "key string, n_nonzero int, est_distinct long")


# --- Count-Min sketch ----------------------------------------------------------

def _cm_positions(h, w: int, d: int):
    """d counter columns from one 64-bit hash via Kirsch–Mitzenmacher
    double hashing (g_i = h1 + i*h2 mod w over the hash's two 32-bit
    halves) — one xxhash64 per value, d derived positions, all JVM-side."""
    h1 = h.bitwiseAND(F.lit((1 << 32) - 1))
    h2 = F.shiftrightunsigned(h, 32)
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(w)).cast("int")
                     for i in range(d)])


def cm_sketch(df: DataFrame, col: str, w: int = 1024, d: int = 4
              ) -> DataFrame:
    """Count-Min frequency sketch: (row, cm_col, cnt), nonzero counters
    only. ONE hash-agg whose exchange carries at most d*w counter rows
    per partition (map-side combine) regardless of input size; mergeable
    across tables/days by counter-wise addition."""
    pos = _cm_positions(F.xxhash64(F.col(col)), w, d)
    return (df.select(F.posexplode(pos).alias("row", "cm_col"))
            .groupBy("row", "cm_col")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cm_estimate(sketch: DataFrame, queries: DataFrame, col: str,
                w: int = 1024, d: int = 4) -> DataFrame:
    """Point-estimate the frequency of each distinct query value:
    (value, est_count) with est_count = min over the d counters — the
    classic upward-biased CM estimate (never under the true count).
    The sketch (<= d*w rows) broadcasts; the input never reshuffles."""
    pos = (queries.select(
        F.col(col).alias("value"),
        F.posexplode(_cm_positions(F.xxhash64(F.col(col)), w, d))
        .alias("row", "cm_col")))
    joined = pos.join(F.broadcast(sketch), ["row", "cm_col"], "left")
    return (joined.groupBy("value")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def sample_quantiles(df: DataFrame, value_col: str, key_col: str,
                     q_ppms=(500_000, 900_000, 990_000), m: int = 4096,
                     hash_col=None) -> DataFrame:
    """Bottom-m uniform-sample quantile sketch — deterministic, mergeable.

    Keeps the m rows with the smallest (hash(key), key) — a simple random
    sample without replacement (bottom-m hashing over unique keys), the
    same mergeable-by-construction shape as KMV: the bottom-m of a union
    is the re-taken bottom-m of the parts, so shards/tables/days merge by
    union + re-limit. Quantile q is then the sample's exact
    percentile_disc-lower element, whose rank against the full corpus is
    within O(1/sqrt(m)) of q with high probability (classical
    sample-quantile bound).

    Scale shape: ONE corpus pass — sort+limit plans as
    TakeOrderedAndProject (per-partition top-m, single P*m-row merge);
    the ranking window below runs over the m sampled rows only, never the
    corpus (the unpartitioned-window ban is about corpus-scale inputs).
    Quantile indices are exact integer arithmetic (q_ppm parts-per-
    million, ceil-division), so a same-sample oracle matches bit-for-bit.

    Default hash = xxhash64(key); pass ``hash_col=`` (e.g. the portable
    mixer) when a cross-engine reproducible sample is required — the
    driver oracle does.
    """
    from pyspark.sql import Window as W

    h = F.xxhash64(F.col(key_col)) if hash_col is None else hash_col
    # (_h, _k, v): the value column is the FINAL tiebreaker so the
    # bottom-m cut is a total order even when key_col repeats across rows
    # (round-3 ADVICE: with (_h, _k) alone, rows tied at the limit-m
    # boundary — and the v carried per sampled key — were selected
    # nondeterministically). With unique keys the tail key is inert.
    sample = (df.select(F.col(value_col).alias("v"), h.alias("_h"),
                        F.col(key_col).alias("_k"))
              .orderBy(F.col("_h").asc(), F.col("_k").asc(),
                       F.col("v").asc())
              .limit(int(m))
              .select("v"))
    w_all = W.partitionBy(F.lit(1))
    ranked = sample.select(
        "v",
        F.row_number().over(w_all.orderBy(F.col("v").asc())).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"))
    qs = df.sparkSession.createDataFrame(
        [(int(p),) for p in q_ppms], "q_ppm long")
    # percentile_disc-lower index: ceil(q * n) in integer arithmetic
    idx = F.greatest(F.lit(1),
                     F.floor((F.col("q_ppm") * F.col("n")
                              + F.lit(999_999)) / F.lit(1_000_000)))
    return (qs.join(ranked, F.col("rn") == idx)
            .select("q_ppm", F.col("v").alias("value_est")))
