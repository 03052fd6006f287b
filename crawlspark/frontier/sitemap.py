"""Sitemap (sitemaps.org XML) parsing — seed discovery for the crawl
frontier, as pure Column expressions.

The reference discovers URLs only by following links/forms from fetched
pages (session.go FollowLink / FollowForm); real crawls additionally seed
from ``/sitemap.xml``. This module parses sitemap bodies the same way the
engine parses robots bodies (frontier/robots.py): the raw XML arrives as a
string column on fetched rows and every extraction is a JVM-side regexp —
no XML library, no Python in the loop, so at 100 TB the parse runs at scan
speed inside WholeStageCodegen.

Two document kinds per the protocol:
  * ``<urlset>``      — leaf sitemaps: ``<url>`` blocks with ``<loc>`` and
                        optional ``<lastmod>`` / ``<priority>``
  * ``<sitemapindex>`` — ``<sitemap><loc>`` children pointing at further
                        sitemap files (fetched like any other URL; the
                        helper just surfaces the locs)

Regex-over-XML is deliberate: sitemaps are machine-generated, the protocol
pins the element vocabulary, and the crawl envelope needs tolerance (junk
between elements, attribute-carrying ``<url>`` tags, whitespace inside
``<loc>``) rather than validation. Entity unescaping covers the five XML
built-ins, ``&amp;`` last so it cannot re-introduce escapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_URL_BLOCK = r"(?s)<url\b[^>]*>(.*?)</url>"
_INDEX_BLOCK = r"(?s)<sitemap\b[^>]*>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"


def xml_unescape(c: Column) -> Column:
    """The five XML predefined entities; ``&amp;`` decoded LAST so
    ``&amp;lt;`` yields the literal ``&lt;`` (never a second decode)."""
    out = c
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _field(block: Column, pattern: str) -> Column:
    return F.nullif(F.regexp_extract(block, pattern, 1), F.lit(""))


def sitemap_url_entries(body: Column) -> Column:
    """array<struct<loc,lastmod,priority>> of a ``<urlset>`` document.
    Blocks without a ``<loc>`` are dropped (the protocol requires loc);
    absent lastmod/priority are null."""
    blocks = F.regexp_extract_all(body, F.lit(_URL_BLOCK), 1)
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            xml_unescape(_field(b, _LOC)).alias("loc"),
            _field(b, _LASTMOD).alias("lastmod"),
            # try_cast: a malformed <priority> is null, never an ANSI
            # cast error killing the whole scan
            _field(b, _PRIORITY).try_cast("double").alias("priority")))
    return F.filter(entries, lambda e: e.loc.isNotNull())


def sitemap_index_locs(body: Column) -> Column:
    """array<string> child-sitemap locs of a ``<sitemapindex>`` document."""
    locs = F.transform(
        F.regexp_extract_all(body, F.lit(_INDEX_BLOCK), 1),
        lambda b: xml_unescape(_field(b, _LOC)))
    return F.filter(locs, lambda l: l.isNotNull())


_ROBOTS_SITEMAP = (r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*"
                   r"([^#\r\n]+?)[ \t]*(?:#[^\r\n]*)?$")


def robots_sitemap_urls(body: Column) -> Column:
    """array<string> of ``Sitemap:`` directive URLs in a robots.txt body.
    Per the sitemaps protocol the directive is group-independent (it
    applies regardless of any User-agent section), so this is a flat
    line scan: case-insensitive key, inline comments stripped, value
    trimmed. Pure Column regexp — runs at scan speed next to
    robots_cache_from_bodies over the same bodies."""
    return F.regexp_extract_all(body, F.lit(_ROBOTS_SITEMAP), 1)


def parse_sitemaps(df: DataFrame, body_col: str = "body",
                   src_cols: tuple = ()) -> DataFrame:
    """Explode sitemap bodies to one row per ``<url>`` entry:
    (*src_cols, entry_pos, loc, lastmod, priority). ``entry_pos`` is the
    entry's 0-based position inside its document — document order is
    meaningful (it seeds ``seed_pos``)."""
    return (df.select(*src_cols,
                      F.posexplode(sitemap_url_entries(F.col(body_col)))
                      .alias("entry_pos", "_e"))
            .select(*src_cols, "entry_pos", "_e.loc", "_e.lastmod",
                    "_e.priority"))


def sitemap_seeds(parsed: DataFrame, order_cols: tuple = ("entry_pos",),
                  start_pos: int = 0) -> DataFrame:
    """(url, seed_pos) rows for ``CrawlEngine.seed`` from parsed entries.
    seed_pos is a dense total order over ``order_cols`` (then loc as the
    final tiebreak), assigned by the distributed sequencer — no
    single-partition window."""
    from ..plans.ordering import with_global_seq
    cols = [F.col(c).asc() for c in order_cols] + [F.col("loc").asc()]
    seq, _ = with_global_seq(parsed.select(F.col("loc").alias("url"),
                                           *[F.col(c) for c in order_cols]),
                             cols, out="seed_pos", start=start_pos,
                             return_count=True)
    return seq.select("url", "seed_pos")
