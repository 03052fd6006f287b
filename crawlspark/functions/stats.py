"""Exact distribution statistics over grouped data.

exact_group_quantiles computes exact (not approximate) per-group
quantiles with a RANK-BASED definition that is engine-portable: the
p-quantile of a group of n ordered values is the value at 1-based rank

    rank(p) = (p_num * (n - 1)) div p_den + 1      (integer arithmetic)

i.e. lower-interpolation percentile_disc. Using integer rank arithmetic
(p as an exact num/den pair) instead of float interpolation makes the
result BIT-identical across Spark and any ANSI SQL engine — no
(1-a)*x + a*y float-order hazard, no round-contract to keep in sync.

Shape: one shuffle by group for the rank window, then a hash aggregate
over the same partitioning (no second exchange). Per-group data is
sorted within its partition — the same cost profile as any exact
quantile; for sketch-based approximate quantiles at unbounded group
cardinality, KMV/percentile_approx remain the cheap path
(functions/sketch.py).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window, functions as F


def exact_group_quantiles(df: DataFrame, group_col: str, value: Column,
                          tiebreak: Column,
                          ps: dict[str, tuple[int, int]]) -> DataFrame:
    """One row per group: (group, n, <one column per ps key>).

    ``ps`` maps output column name -> (p_num, p_den) with 0 <= p <= 1.
    ``value`` is the ordered measure; ``tiebreak`` makes the total order
    (hence the selected element) deterministic under ties.
    """
    for name, (num, den) in ps.items():
        if not (0 <= Fraction(num, den) <= 1):
            raise ValueError(f"quantile {name} outside [0,1]")
    w = Window.partitionBy(group_col).orderBy(value.asc(), tiebreak.asc())
    ranked = df.select(
        group_col, value.alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("_n"))
    aggs = [F.max("_n").alias("n")]
    for name, (num, den) in ps.items():
        rank = F.expr(f"({num} * (_n - 1)) div {den} + 1")
        aggs.append(F.max(F.when(F.col("_rn") == rank, F.col("_v")))
                    .alias(name))
    return ranked.groupBy(group_col).agg(*aggs)


def quantile_gate(df: DataFrame, group_col: str, value: Column,
                  tiebreak: Column, p_num: int, p_den: int,
                  value_name: str = "score") -> DataFrame:
    """Per-group dynamic-threshold filter (the CCNet LM-filter shape:
    "keep each language's top (1-p) by quality"): compute each group's
    exact p-quantile (rank-based, integer arithmetic — see
    exact_group_quantiles) and keep rows with value >= that group's
    threshold. The per-group threshold table is tiny (one row per group)
    and broadcasts; the input shuffles ONCE for the quantile ranking and
    the kept rows stream through a broadcast join — no second exchange
    of the corpus.

    Output: the input rows that pass, plus ``threshold`` (the group's
    cut value) and ``value_name`` (the row's measure) for auditability.
    """
    th = exact_group_quantiles(df, group_col, value, tiebreak,
                               {"threshold": (p_num, p_den)}) \
        .select(group_col, "threshold")
    measured = df.withColumn(value_name, value)
    return (measured.join(F.broadcast(th), group_col)
            .filter(F.col(value_name) >= F.col("threshold")))
