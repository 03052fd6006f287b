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
