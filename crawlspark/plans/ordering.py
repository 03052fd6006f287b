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
  2. one Arrow pass stamps (partition_id, local_rank) — order-preserving
     mapInPandas, numpy arange per batch, no per-row Python.
  3. per-partition counts (P rows, collected) become prefix offsets,
     broadcast-joined back: seq = start + offset[pid] + local_rank.

Determinism: the sequence is a pure function of the SORT ORDER, not of the
partition boundaries — range-sampling variation moves rows between
partitions but never changes `offset[pid] + local_rank` for a given row
(boundaries respect key order; ties within equal keys must be broken by the
caller's key list being a total order, which the engine guarantees —
SURVEY.md §3.4 bans non-data-derived ordering).

The intermediate is eagerly localCheckpoint'ed: the counts pass and every
downstream consumer then reuse one materialization (the engine was already
checkpointing at this point in the round, so this adds no extra pass).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def with_global_seq(df: DataFrame, sort_cols, out: str = "seq",
                    start: int = 0, num_partitions: int | None = None
                    ) -> DataFrame:
    """Attach a gap-free global sequence `out` = start, start+1, ... ordered
    by `sort_cols` (list of Columns forming a total order). Returns an
    eagerly-materialized (localCheckpoint) DataFrame."""
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(P, *sort_cols)
              .sortWithinPartitions(*sort_cols))

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("_pid", IntegerType()),
           StructField("_lrn", LongType())])

    def stamp(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        base = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = np.int32(pid)
            pdf["_lrn"] = np.arange(base, base + len(pdf), dtype=np.int64)
            base += len(pdf)
            yield pdf

    stamped = ranged.mapInPandas(stamp, out_schema).localCheckpoint(eager=True)

    counts = {r["_pid"]: r["c"] for r in
              stamped.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return stamped.withColumn(out, F.lit(None).cast("long")) \
                      .drop("_pid", "_lrn")
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    return (stamped.join(F.broadcast(off_df), "_pid")
            .withColumn(out, F.lit(start) + F.col("_off") + F.col("_lrn"))
            .drop("_pid", "_lrn", "_off"))
