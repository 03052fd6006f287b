"""Main-content extraction (boilerplate removal) over HTML bodies.

The reference extracts WHAT the user's selectors name (page.go Find /
unmarshal.go); a training-data crawl additionally needs the opposite
operation — strip the navigation/footer/link-farm boilerplate and keep
the prose — before any text-quality or dedup stage sees the document.
The heuristic here is the public text-density family (jusText, Pomikálek
2011; boilerpipe, Kohlschütter WSDM 2010), simplified to a deterministic
two-rule classifier so the driver oracle can reproduce decisions exactly:

  1. segment the DOM into text BLOCKS at block-level tags, dropping
     chrome subtrees entirely (script/style/nav/header/footer/aside);
  2. a block is content iff it has ≥ ``min_words`` words AND its link
     density (chars inside <a>, per hundred total chars, INTEGER
     percentage) is below ``max_link_pct``.

Scale shape: one Arrow-batched mapInPandas over the body column — a
narrow map, no shuffle at all; the per-doc work is one stdlib
html.parser pass (the same envelope discipline as operators/parse.py,
which this mirrors: tolerant of unclosed tags, entities decoded by the
parser). Block rows are ~80 B; the downstream text pipeline (quality,
dedup) consumes is_content=true rows only, so boilerplate never reaches
a corpus shuffle.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, functions as F

BLOCK_TAGS = {"p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
              "td", "th", "blockquote", "pre", "article", "section",
              "main", "figcaption", "dd", "dt"}
DROP_SUBTREES = {"script", "style", "nav", "header", "footer", "aside",
                 "noscript", "template"}

BLOCKS_SCHEMA = ("block_idx int, text string, n_words int, "
                 "link_pct int, is_content boolean")


class _BlockParser(HTMLParser):
    """Segment HTML into text blocks; count anchor chars per block."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []   # (raw_text, link_chars)
        self._buf: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._a_depth = 0

    def _flush(self):
        raw = "".join(self._buf)
        if raw.split():
            self.blocks.append((raw, self._link_chars))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in DROP_SUBTREES:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1
        elif tag == "br":
            self._buf.append(" ")

    def handle_endtag(self, tag):
        if tag in DROP_SUBTREES:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

    def handle_data(self, data):
        if self._drop_depth:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len("".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def extract_blocks(body: str, min_words: int = 5,
                   max_link_pct: int = 50) -> list[dict]:
    """One HTML body → classified text blocks in document order.
    ``link_pct`` is an integer percentage (link chars per 100 non-space
    chars, floor) so the classification — and the driver oracle — never
    touches a float."""
    p = _BlockParser()
    p.feed(body or "")
    p.close()
    out = []
    for idx, (raw, link_chars) in enumerate(p.blocks):
        words = raw.split()
        text = " ".join(words)
        total = len("".join(words))
        pct = (link_chars * 100) // total if total else 0
        out.append({
            "block_idx": idx, "text": text, "n_words": len(words),
            "link_pct": pct,
            "is_content": len(words) >= min_words and pct < max_link_pct,
        })
    return out


def main_content_blocks(df: DataFrame, body_col: str = "body",
                        id_col: str = "doc_id", min_words: int = 5,
                        max_link_pct: int = 50) -> DataFrame:
    """(id, block_idx, text, n_words, link_pct, is_content) rows, one
    Arrow batch at a time — a narrow map, zero shuffle."""
    id_field = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, body in zip(pdf[id_col], pdf[body_col]):
                for b in extract_blocks(body, min_words, max_link_pct):
                    rows.append({id_col: did, **b})
            yield pd.DataFrame(
                rows, columns=[id_col, "block_idx", "text", "n_words",
                               "link_pct", "is_content"])

    return (df.select(id_col, body_col)
            .mapInPandas(gen, f"{id_col} {id_field}, {BLOCKS_SCHEMA}"))


def main_text(df: DataFrame, body_col: str = "body",
              id_col: str = "doc_id", min_words: int = 5,
              max_link_pct: int = 50) -> DataFrame:
    """(id, main_text, n_blocks, n_content_blocks): content blocks joined
    with newlines in document order. The groupBy is keyed by the doc id —
    one narrow shuffle of the already-extracted text rows."""
    blocks = main_content_blocks(df, body_col, id_col,
                                 min_words, max_link_pct)
    kept = F.when(F.col("is_content"),
                  F.struct("block_idx", "text"))
    return (blocks.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_blocks"),
                 F.count(F.when(F.col("is_content"), 1)).cast("int")
                 .alias("n_content_blocks"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept)),
                                 lambda s: s.text), "\n")
                 .alias("main_text")))
