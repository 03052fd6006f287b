"""Data-layout clustering: Z-order (Morton) keys and file-layout planning.

At 100 TB, scan cost is governed by how many files a filtered read must
open; clustering the rows of a table so each file covers a tight range in
EVERY filter dimension lets min/max file stats prune most of them
(Iceberg's ``rewrite_data_files`` with a z-order strategy is the public
model). The key is a pure Column expression (bit interleave in whole-stage
codegen, zero Python); the layout plan reuses the engine's distributed
range sequencer (plans/ordering.with_global_seq) — a range exchange plus a
P-row offset broadcast, never an unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..plans.ordering import with_global_seq


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of the given non-negative
    integer columns into one long: bit j of column i lands at position
    j*k + (k-1-i), so the FIRST column owns the most significant bit of
    each level. k*bits must fit a signed long (<= 63)."""
    k = len(cols)
    if k < 1:
        raise ValueError("zorder_key needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * k + (k - 1 - i))
    return key


def zorder_layout(df: DataFrame, cols: list[str], rows_per_file: int,
                  tiebreak: str, bits: int = 16) -> DataFrame:
    """Plan a z-order-clustered rewrite of ``df``: assign every row to a
    target file in z-key order and emit per-file stats,

        (file_id, n_rows, min_key, max_key)

    — the min/max columns being exactly the file-level stats a pruning
    reader would use. Rank = the distributed gap-free sequencer over
    (z-key, tiebreak); file_id = rank div rows_per_file. ONE range
    exchange over a narrow projection; no driver loop, no global window.
    """
    keyed = df.select(F.col(tiebreak).alias("_tb"),
                      zorder_key(cols, bits).alias("_zkey"))
    seq = with_global_seq(keyed, [F.col("_zkey"), F.col("_tb")],
                          out="_seq")
    return (seq
            .withColumn("file_id",
                        F.expr(f"_seq div {int(rows_per_file)}"))
            .groupBy("file_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("_zkey").alias("min_key"),
                 F.max("_zkey").alias("max_key")))
