"""Fetcher strategy — the UnifiedScraper analog (SURVEY.md §2.11).

The reference abstracts its two backends (net/http Session vs Chrome
browser automation) behind ONE interface so caller code never knows which
is driving (/root/reference/scraper_interface.go:16-55). The batch engine's
analog of "perform the navigation" is the corpus lookup: given the ≤k
scheduled request rows, return them with the page columns attached (miss ⇒
nulls, which the engine turns into status 404). That stage is now a
strategy object:

  * ``CorpusFetcher`` over a STRUCTURED corpus (links/base_href columns
    pre-parsed — the fixture form) — the "HTTP session" flavor;
  * ``CorpusFetcher`` over a RAW corpus (body binary + content_type,
    decoded and parsed at fetch time through the U4 charset chain and P1
    link extraction) — the "real browser" flavor;
  * any user object with the same ``lookup(probe, key)`` method — e.g. a
    wrapper injecting failures, a cache/replay layer, or a real HTTP
    micro-batch fetcher on a cluster with egress.

Whatever the strategy, the contract the engine relies on is: the result
contains every probe row exactly once, page columns (status, base_href,
meta_refresh_url, links, image_id, title) null on miss, and the corpus —
the 100 TB side — is NEVER shuffled (see _broadcast_lookup).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, functions as F


@runtime_checkable
class Fetcher(Protocol):
    def lookup(self, probe: DataFrame, key: str) -> DataFrame:
        """probe (≤k scheduled rows) → probe ⟕ page columns by ``key``."""
        ...


def _broadcast_lookup(big: DataFrame, probe: DataFrame, key: str) -> DataFrame:
    """Left-outer lookup of ``probe`` (small) against ``big`` without ever
    shuffling ``big``: inner broadcast-hash join (probe broadcast into a
    plain scan of ``big``) unioned with the probe rows that matched nothing
    (recovered by a broadcast anti-join against the hit keys). Missing rows
    carry nulls for ``big``'s columns.

    ``hits`` (≤k rows) is eagerly materialized so the whole lookup costs
    ONE scan of ``big``: without it, the anti-join's key build re-scanned
    the corpus, and every downstream consumer of the lookup re-ran the
    scan again — at the 100 TB corpus target each extra scan is the
    round's dominant I/O."""
    from ..session import ckpt
    hits = ckpt(big.join(F.broadcast(probe), key, "inner"))
    misses = probe.join(F.broadcast(hits.select(key)), key, "left_anti")
    for f in big.schema.fields:
        if f.name != key and f.name not in probe.columns:
            misses = misses.withColumn(f.name, F.lit(None).cast(f.dataType))
    return hits.unionByName(misses.select(*hits.columns))


class CorpusFetcher:
    """Fetch = look up scheduled URLs in a page-corpus DataFrame.

    ``raw`` corpora (a ``body`` binary column present) are parsed at fetch
    time: the decode chain + link extraction rides on the ≤k FETCHED rows
    only, exactly like a real crawl — the corpus scan stays a narrow
    columnar read and the per-round Python work is O(k), not O(|corpus|).
    """

    def __init__(self, pages: DataFrame, forced_charset: str | None = None,
                 body_filter=None):
        self.pages = pages
        self.raw = "body" in pages.columns
        self.forced_charset = forced_charset
        # BodyFilter hook (P10, /root/reference/session.go:40,
        # response.go:71-76): decoded-body rewrite between fetch and parse
        self.body_filter = body_filter

    def lookup(self, probe: DataFrame, key: str) -> DataFrame:
        pages = (self.pages.withColumnRenamed("url", key)
                 .withColumnRenamed("host", "_phost"))
        looked = _broadcast_lookup(pages, probe, key)
        if self.raw:
            from ..operators.parse import parse_pages
            looked = parse_pages(looked, body_col="body",
                                 ct_col="content_type",
                                 forced_charset=self.forced_charset,
                                 body_filter=self.body_filter)
        return looked
