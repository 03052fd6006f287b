"""Scalable global sequencing — distributed row_number without the
single-partition window.

`Window.orderBy(...)` with no partition key moves ALL rows to one task
(Spark even warns); at the 10^10-URL frontier target that is the serial
fraction that caps scaling, and it showed up directly in the N-vs-4N
efficiency measurements. This module assigns a gap-free global sequence in
three fully-distributed steps (the classic two-phase zipWithIndex,
DataFrame-native):

  1. `repartitionByRange(P, keys)` + `sortWithinPartitions(keys)` — range
     exchange puts partition p strictly before p+1 in key order.
  2. a JVM-side projection stamps (partition_id, local_rank) from
     `monotonically_increasing_id()`: within one partition mii is
     `pid * 2^33 + rowIndexInPartition`, and because mii is flagged
     nondeterministic Catalyst will not reorder it below the sort, so the
     row index IS the in-partition rank of the sorted order. No Python
     worker, no Arrow round-trip — the whole stamp stays in codegen.
  3. per-partition counts (P rows, collected) become prefix offsets,
     broadcast-joined back: seq = start + offset[pid] + local_rank.

Determinism: mii alone is banned on the hot path (SURVEY.md §3.4) because
its raw value depends on partitioning; here it is sandwiched between an
explicit range+sort and the offset normalization, which makes the OUTPUT a
pure function of the SORT ORDER, not of the partition boundaries —
range-sampling variation moves rows between partitions but never changes
`offset[pid] + local_rank` for a given row (boundaries respect key order;
ties within equal keys must be broken by the caller's key list being a
total order, which the engine guarantees). The localCheckpoint freezes the
stamped values before any consumer observes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..session import ckpt

_MII_ROW_BITS = 33  # monotonically_increasing_id: pid << 33 | row index


def with_global_seq(df: DataFrame, sort_cols, out: str = "seq",
                    start: int = 0, num_partitions: int | None = None,
                    return_count: bool = False):
    """Attach a gap-free global sequence `out` = start, start+1, ... ordered
    by `sort_cols` (list of Columns forming a total order). Returns an
    eagerly-materialized (localCheckpoint) DataFrame — or, with
    ``return_count``, a (DataFrame, total_rows) pair: the per-partition
    counts pass already knows the total, so callers never need a separate
    count() action over the result."""
    spark = df.sparkSession
    # session shuffle partitions, not defaultParallelism: the engine scopes
    # spark.sql.shuffle.partitions to the round (CrawlConfig
    # .shuffle_partitions), and the range exchange should fan out like
    # every other shuffle in the plan
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (df.repartitionByRange(P, *sort_cols)
              .sortWithinPartitions(*sort_cols))

    mii = F.monotonically_increasing_id()
    stamped = (ranged
               .withColumn("_mii", mii)
               .withColumn("_pid",
                           F.shiftright(F.col("_mii"), _MII_ROW_BITS)
                           .cast("int"))
               .withColumn("_lrn",
                           F.col("_mii").bitwiseAND((1 << _MII_ROW_BITS) - 1))
               .drop("_mii")
               .transform(ckpt))

    counts = {r["_pid"]: r["c"] for r in
              stamped.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        res = stamped.withColumn(out, F.lit(None).cast("long")) \
                     .drop("_pid", "_lrn")
        return (res, 0) if return_count else res
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    res = (stamped.join(F.broadcast(off_df), "_pid")
           .withColumn(out, F.lit(start) + F.col("_off") + F.col("_lrn"))
           .drop("_pid", "_lrn", "_off"))
    return (res, acc) if return_count else res


def with_global_cumsum(df: DataFrame, sort_cols, value_col: str,
                       out: str = "cumsum",
                       num_partitions: int | None = None) -> DataFrame:
    """EXCLUSIVE global running sum of ``value_col`` over the total order
    ``sort_cols`` — row r gets the sum of all values strictly before it —
    without an unpartitioned window (same two-phase shape as
    ``with_global_seq``: the per-partition aggregate is a SUM instead of a
    COUNT, and the in-partition rank becomes an in-partition running sum).

    Plan: range exchange + in-partition sort + codegen (pid, lrn) stamp,
    one P-row collect of per-partition sums → prefix offsets broadcast
    back, then a window partitioned BY pid ordered by lrn adds the
    in-partition exclusive sum. The window's hash exchange on pid is the
    only extra shuffle and carries exactly the caller's projection — at
    the packing use-site that is (doc_id, n_tokens), 16 B/row, so the
    prefix sum over a 10^10-doc corpus moves ~160 GB, the same order as
    the sequencer itself. Determinism: identical sandwich argument as
    with_global_seq (output is a pure function of the sort order; the
    stamp is frozen by the localCheckpoint before any consumer sees it).
    """
    from pyspark.sql import Window
    spark = df.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (df.repartitionByRange(P, *sort_cols)
              .sortWithinPartitions(*sort_cols))
    stamped = (ranged
               .withColumn("_mii", F.monotonically_increasing_id())
               .withColumn("_pid",
                           F.shiftright(F.col("_mii"), _MII_ROW_BITS)
                           .cast("int"))
               .withColumn("_lrn",
                           F.col("_mii").bitwiseAND((1 << _MII_ROW_BITS) - 1))
               .drop("_mii")
               .transform(ckpt))
    sums = {r["_pid"]: r["s"] for r in
            stamped.groupBy("_pid")
            .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
            .collect()}
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid] or 0)
    if not offsets:
        return stamped.withColumn(out, F.lit(None).cast("long")) \
                      .drop("_pid", "_lrn")
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = (Window.partitionBy("_pid").orderBy("_lrn")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (stamped.join(F.broadcast(off_df), "_pid")
            .withColumn(out, F.col("_off") + F.coalesce(
                F.sum(F.col(value_col).cast("long")).over(w), F.lit(0)))
            .drop("_pid", "_lrn", "_off"))
