"""Streaming exactly-once-per-key dedup with watermark-bounded state.

The crawl's delivery layers are at-least-once (a retried fetch, a
replayed micro-batch, a dual-written log row); downstream tables want
each key once. ``dropDuplicatesWithinWatermark`` is Structured
Streaming's built-in for exactly this: per-key state remembers keys seen
inside the watermark horizon and drops re-deliveries; once the watermark
passes a key's event time its state is FREED — the store stays O(keys
per horizon), not O(history). The documented consequence (pinned by the
test): a duplicate arriving after its key's state expired is emitted
again — the horizon is the dedup contract, by design.

Batch twin ``dedup_batch``: one (key) hash-agg keeping the minimum value
per key plus the delivery count — the same decision a single micro-batch
makes, value-checked at the driver (`event_dedup`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(events: DataFrame, key_cols=("event_id",),
                 ts_col: str = "ts",
                 watermark: str = "60 seconds") -> DataFrame:
    """Drop re-deliveries of the same key within the watermark horizon."""
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def dedup_batch(events: DataFrame, key_cols=("event_id",),
                val_col: str = "value") -> DataFrame:
    """(keys..., value=min per key, n_seen): the batch-mode dedup twin —
    ONE hash-agg shuffle with map-side combine; min over raw doubles is
    order-independent (no accumulation), so the oracle needs no float
    rounding contract."""
    return (events.groupBy(*key_cols)
            .agg(F.min(val_col).alias(val_col),
                 F.count(F.lit(1)).alias("n_seen")))
