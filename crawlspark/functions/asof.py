"""As-of (point-in-time) join — the time-series operator Spark lacks.

For every left row, attach the most recent right row with the same key
whose timestamp is <= the left row's timestamp (inclusive). The classic
uses: enrich events with the latest prior state update, price trades with
the prevailing quote, stamp crawl fetches with the robots/cookie state in
force at fetch time.

Implementation is the union-window trick, NOT a range-explosion join:
tag both sides, union on the shared (key, ts) spine, sort within key by
(ts, side, tiebreak) with right rows ordering before left rows at equal
ts (inclusive semantics), then ``last(value, ignorenulls=True)`` over an
unbounded-preceding running window. Exactly ONE shuffle of (|L|+|R|)
narrow rows by the join key; no |L|x|R| candidate pairs, no per-row
Python. At 100 TB both sides hash-partition by key once and the sort is
the window's sort — the same shape a per-key merge join would take.
Hot-key skew: a single user's events all land in one task, which is
inherent to per-key ordering semantics; mitigate upstream by bounding
per-key history (the reference crawl's per-host rows are bounded by the
politeness budget the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              right_tiebreak: str | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row with
    ``right[on] == left[on]`` and ``right[right_ts] <= left[left_ts]``.

    ``value_cols``: the right columns to carry (null when no right row
    precedes). ``right_tiebreak``: orders right rows that share (key, ts)
    — the max wins, making the result deterministic. Output keeps every
    left column plus ``value_cols``.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    dup = set(value_cols) & set(left.columns)
    if dup:
        raise ValueError(f"value_cols collide with left columns: {sorted(dup)}")
    left_cols = left.columns

    # side 0 = right (sorts first at equal ts => inclusive <=), 1 = left
    tb = (F.col(right_tiebreak) if right_tiebreak
          else F.lit(0)).cast("long").alias("_tb")
    r = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"), tb,
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols])
    l = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"), F.lit(0).cast("long").alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in value_cols],
        *[F.col(c) for c in left_cols])

    w = (Window.partitionBy("_k").orderBy("_ts", "_side", "_tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = r.unionByName(l).select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
               for c in value_cols])
    return (filled.filter(F.col("_side") == 1)
            .select(*left_cols,
                    *[F.col(f"_f_{c}").alias(c) for c in value_cols]))


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, start_col: str, end_col: str,
                  bucket: int, broadcast_intervals: bool = False
                  ) -> DataFrame:
    """Point-in-interval join (``start <= point <= end``, both inclusive)
    without the cross-product a naive theta-join degenerates to.

    The other temporal join Spark lacks: sessions x maintenance windows,
    fetches x outage ranges, reads x IP/key ranges. Catalyst plans a
    BETWEEN predicate with no equi-key as BroadcastNestedLoopJoin —
    |P|x|I| comparisons — which dies long before 100 TB.

    Implementation is interval bucketing: pick a ``bucket`` width in the
    point column's units, explode every interval to the bucket ids it
    overlaps (``sequence(start div b, end div b)``), stamp every point
    with its single bucket id, hash-join on the bucket id, then apply the
    exact BETWEEN as a post-filter. Each qualifying (point, interval)
    pair meets in EXACTLY one bucket (the point's), so no dedup pass is
    needed. Cost: ONE equi-join shuffle; the interval side inflates by
    ceil(len/bucket)+1 per row — choose ``bucket`` near the median
    interval length so the inflation is ~2x. Long-tail intervals inflate
    more; at the extreme (an interval spanning the whole domain) pull
    those few rows into a broadcast side instead.

    ``broadcast_intervals=True`` broadcasts the EXPLODED interval side —
    the right call when the interval table is a dim (thousands of rows):
    the plan becomes a map-side BroadcastHashJoin and points never
    shuffle at all.

    All arithmetic is exact integer division (Spark ``div`` == DuckDB
    ``//`` on the non-negative domain; float ``/`` + floor would wobble at
    epoch-microsecond magnitudes, where doubles have <1us of mantissa
    left) — cast timestamps to epoch micros first (see sessions.py).
    Columns must be non-negative integers.
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be positive, got {bucket}")
    b = int(bucket)
    pcol, s, e = F.col(point_col), F.col(start_col), F.col(end_col)
    iv = intervals.withColumn(
        "_bkt", F.explode(F.sequence(
            F.expr(f"`{start_col}` div {b}").cast("long"),
            F.expr(f"`{end_col}` div {b}").cast("long"))))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn(
        "_bkt", F.expr(f"`{point_col}` div {b}").cast("long"))
    return (pt.join(iv, "_bkt")
            .filter((pcol >= s) & (pcol <= e))
            .drop("_bkt"))
