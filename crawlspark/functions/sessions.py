"""Gap-based sessionization over an event stream/table.

The classic clickstream transform a 100 TB training-data pipeline needs
for per-user grouping: a user's events split into sessions wherever the
inter-event gap exceeds a threshold. The lag → boolean → running-sum
pattern (SURVEY §2.7) does it in ONE shuffle (the per-user window's
partitioning is reused by both window functions), plus one more for the
per-session aggregate.

Scale notes: windows are PARTITIONED by user — parallelism = users, never
a global sort. Time arithmetic is integer microseconds (unix_micros) so
the oracle (DuckDB epoch_us) is bit-identical; no double timestamps.
A pathologically hot user (bot traffic) is the same skew problem as a hot
host in the crawl engine — cap or salt upstream if a single user's events
exceed a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Stamp every event with its (user, session_seq) session id.

    session_seq is a pure function of data: events ordered by
    (ts, id_col) per user; a session starts at the first event and at
    every gap > gap_s seconds."""
    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc(), F.col(id_col).asc()))
    # parquet timestamps are NTZ; unix_micros needs TIMESTAMP —
    # the cast is wall-time identity in the UTC session
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_s = (F.lag(us).over(w).isNull()
             | ((us - F.lag(us).over(w)) > gap_s * 1_000_000)).cast("int")
    seq = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.withColumn("session_seq", seq)


def session_stats(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id") -> DataFrame:
    """One row per (user, session): event count, bounds, duration (µs)."""
    return (sessionize(events, gap_s, user_col, ts_col, id_col)
            .groupBy(user_col, "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.unix_micros(F.max(ts_col).cast("timestamp"))
                  - F.unix_micros(F.min(ts_col).cast("timestamp")))
                 .alias("duration_us")))
