"""Streaming image-ingest twin of the batch curation path.

The north rule's per-round phash-dedup stage (engine cfg.phash_dedup:
first fetch of each exact perceptual hash wins, later fetches recorded as
duplicates) re-expressed as a Structured Streaming stage for a live
ingest: curation filters (the SAME predicate images_clean uses —
functions/curation.curation_predicate, one definition so batch and stream
cannot drift) followed by watermark-bounded first-wins phash dedup.

``dropDuplicatesWithinWatermark`` keeps the first arrival of each phash
per micro-batch order — the streaming analog of the engine's
fetch_seq-ordered first-fetch-wins — and FREES a phash's state once the
watermark passes its event time, so state is O(distinct phashes per
horizon), not O(corpus). The documented consequence (pinned by the
test): a duplicate payload arriving after its phash's state expired is
admitted again; cross-horizon exactness belongs to the batch path
(engine phash_seen state table / images_clean), same division of labor
as dedup_stream vs the fetch-log dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.curation import curation_predicate


def images_ingest_stream(images: DataFrame, ts_col: str = "fetched_at",
                         watermark: str = "60 seconds",
                         min_side: int = 48, aspect_num: int = 3,
                         aspect_den: int = 1,
                         min_caption_tokens: int = 4) -> DataFrame:
    """Curate + first-wins phash-dedup a streaming images table.

    Input: the north-rule images shape plus an event-time column
    (``ts_col``). Filters are stateless Column exprs evaluated before any
    state is touched, so rejected rows never enter the dedup store.
    """
    kept = images.filter(curation_predicate(
        min_side, aspect_num, aspect_den, min_caption_tokens))
    return (kept.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["phash"]))
