"""Event-time windowed metrics rollup with watermark-bounded late data.

The streaming twin of the engine's per-round metrics rollup (A7,
frontier/engine.py metrics table; reference log lines `session.go:217,235`):
fetch/event records stream in carrying an event-time column, and the rollup
is a tumbling-window groupBy. The watermark is what makes this run forever
at crawl scale:

  * rows later than the watermark are DROPPED (bounded lateness contract);
  * rows late but inside the watermark MERGE into their open window;
  * a window finalizes — and, in append mode, emits exactly once — when
    the watermark passes its end, so per-(window, event_type) state is
    freed and the state store stays O(open windows), not O(history).

window() buckets are epoch-aligned, so the batch twin (`windowed_rollup`,
driver entry `event_window_rollup`) computes identical boundaries with
plain column arithmetic and is value-checked against DuckDB's
time_bucket; the streaming path reuses the same aggregation expressions.
SUMs accumulate in DECIMAL(28,4) — the repo-wide float contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _agg_exprs():
    # sum/avg derive from an exact decimal accumulation (not F.avg over
    # doubles): double partial-aggregation order would flip round()
    # boundaries vs the oracle — the same float contract as
    # event_metrics (__spark_entry__.py)
    dec = F.sum(F.col("value").cast("decimal(28,6)"))
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.round(dec, 4).cast("double").alias("sum_value"),
        F.round(dec.cast("double") / F.count(F.lit(1)), 6)
         .alias("avg_value"),
    ]


def windowed_rollup(events: DataFrame, window_dur: str = "30 minutes",
                    ts_col: str = "ts", key_col: str = "event_type"
                    ) -> DataFrame:
    """Batch tumbling-window rollup — same plan shape as one micro-batch of
    the streaming rollup: one hash-agg shuffle on (window, key)."""
    return (events
            .groupBy(F.window(ts_col, window_dur).alias("w"),
                     F.col(key_col))
            .agg(*_agg_exprs())
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "n_events", "sum_value", "avg_value"))


def metrics_stream(events: DataFrame, window_dur: str = "30 seconds",
                   watermark: str = "60 seconds", ts_col: str = "ts",
                   key_col: str = "event_type") -> DataFrame:
    """Streaming rollup: watermarked event-time tumbling windows.

    Append output mode is the scale-correct choice for a metrics sink:
    each (window, key) row is written exactly once, after the watermark
    guarantees no more in-watermark late rows can arrive for it.
    """
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window_dur).alias("w"),
                     F.col(key_col))
            .agg(*_agg_exprs())
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "n_events", "sum_value", "avg_value"))
