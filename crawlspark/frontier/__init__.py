"""Frontier engine: snapshot state store, seen-filters, politeness, round job."""

from .engine import CrawlConfig, CrawlEngine  # noqa: F401
from .fetcher import CorpusFetcher, Fetcher  # noqa: F401
from .state import SnapshotStore  # noqa: F401
