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
