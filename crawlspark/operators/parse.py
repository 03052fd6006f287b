"""Raw-HTML page parsing: fetched bytes → decoded text → structured columns.

This is the reference's universal row source (SURVEY.md §2.2 P1, §2.3 U4),
re-derived — NOT a port of the goquery code:

  * charset chain (/root/reference/response.go:27-38, 55-65, 106-141):
    precedence forced session encoding > <head> meta (a ``charset`` attr on
    the FIRST head <meta>, overridden by the ``content`` of the first head
    <meta http-equiv="Content-Type">) > Content-Type header ``charset=``.
    Only Shift_JIS / EUC-JP / ISO-2022-JP are actively transformed; anything
    else passes through as UTF-8.
  * BodyFilter hook (/root/reference/session.go:40, response.go:71-76):
    an arbitrary body rewrite applied AFTER decode, BEFORE the DOM parse.
  * base-href override (/root/reference/response.go:83-94): exactly one
    ``<head><base href>`` replaces the document URL as the resolution base.
  * meta-refresh (/root/reference/page.go:18-31): first
    ``meta[http-equiv=refresh]``'s content matched with ``[uU][rR][lL]=(.*)$``;
    the RAW capture is emitted — resolution against coalesce(base_href, url)
    happens downstream (engine step 8), like Page.MetaRefresh resolves
    against page.BaseUrl.
  * links (/root/reference/session.go:343-358, 399-427): every ``<a>`` with
    an ``href`` attr, in document order (``pos`` = the FollowLink ordering
    tiebreaker); ``text`` = concatenated character data of the element
    (goquery .Text()); ``img_alt`` = the alt of the first child <img> that
    has one (the FollowAnchorText CheckAlt channel). Anchors without href
    are skipped — the attr-missing skip semantics (unmarshal.go:104-109).

Layers:
  1. ``parse_page`` — pure-Python kernel (html.parser stdlib), unit-testable
     and shared with the synthetic-HTML round-trip tests.
  2. ``parse_pages`` — mapInPandas over Arrow batches: one Python invocation
     per ~10k-row batch, the fetched-page analog of robots_cache_from_bodies.
     Runs only on FETCHED rows (k per round), never the corpus.
  3. ``body_filter_stage`` — standalone mapInArrow raw-bytes rewrite slot
     (P10) for filters that must see bytes before the decode chain.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from ..charsets import charset_from_content_type, codec_for

_REFRESH_RE = re.compile(r"[uU][rR][lL]=(.*)$")

LINK_TYPE = ArrayType(StructType([
    StructField("href", StringType()),
    StructField("text", StringType()),
    StructField("img_alt", StringType()),
    StructField("pos", IntegerType()),
]))

# form elements in document order (Page.Form's input/select collection,
# /root/reference/form.go:71-178): the shape forms.resolve_values consumes
from pyspark.sql.types import BooleanType  # noqa: E402

FORM_INPUT_TYPE = ArrayType(StructType([
    StructField("name", StringType()),
    StructField("type", StringType()),
    StructField("value", StringType()),
    StructField("checked", BooleanType()),
    StructField("selected", BooleanType()),
    StructField("pos", IntegerType()),
]))

PARSED_FIELDS = [
    StructField("base_href", StringType()),
    StructField("meta_refresh_url", StringType()),
    StructField("links", LINK_TYPE),
    StructField("title", StringType()),
    StructField("effective_charset", StringType()),
    StructField("form_action", StringType()),
    StructField("form_method", StringType()),
    StructField("form_inputs", FORM_INPUT_TYPE),
]

_EMPTY = {"base_href": None, "meta_refresh_url": None, "links": None,
          "title": None, "effective_charset": None,
          "form_action": None, "form_method": None, "form_inputs": None}

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
         "meta", "param", "source", "track", "wbr"}


class _PageParser(HTMLParser):
    """One pass over the document collecting exactly what the engine needs:
    head metas (document order), head base hrefs, title, the first
    meta[http-equiv=refresh] content, and anchors with text/img_alt."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.head_metas: list[dict] = []     # attrs of <meta> inside <head>
        self.base_hrefs: list[str] = []      # href of <base> inside <head>
        self.title_parts: list[str] = []
        self.refresh_content: str | None = None
        self.anchors: list[dict] = []
        self._in_head = False
        self._in_title = False
        self._a: dict | None = None          # open anchor being collected
        self._a_text: list[str] = []
        # FIRST form only (the crawl auto-submit target; the reference's
        # Page.Form takes a selector — a crawl rule has no user in the loop)
        self.form_action: str | None = None
        self.form_method: str | None = None
        self.form_inputs: list[dict] = []
        self._in_form = False        # inside the captured (first) form
        self._form_seen = False
        self._in_select: str | None = None   # open <select name=...>

    def handle_starttag(self, tag, attrs):
        ad = dict(attrs)
        if tag == "head":
            self._in_head = True
        elif tag == "body":
            self._in_head = False
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            if self._in_head:
                self.head_metas.append(ad)
            # the reference's refresh selector is NOT head-restricted
            # (page.go:19: Find("meta[http-equiv=refresh]"))
            if (self.refresh_content is None
                    and ad.get("http-equiv") == "refresh"
                    and "content" in ad):
                self.refresh_content = ad["content"]
        elif tag == "base":
            if self._in_head and "href" in ad:
                self.base_hrefs.append(ad["href"])
        elif tag == "a":
            self._a = {"href": ad.get("href"), "img_alt": None}
            self._a_text = []
        elif tag == "form":
            if not self._form_seen:
                self._form_seen = True
                self._in_form = True
                self.form_action = ad.get("action")
                self.form_method = (ad.get("method") or "get").lower()
        elif tag == "input" and self._in_form:
            self.form_inputs.append({
                "name": ad.get("name"), "type": ad.get("type"),
                "value": ad.get("value"),
                "checked": "checked" in ad, "selected": False,
                "pos": len(self.form_inputs)})
        elif tag == "select" and self._in_form:
            self._in_select = ad.get("name")
        elif tag == "option" and self._in_select is not None:
            # options become type='select' rows under the select's name;
            # a missing value attr stays None (ignored by resolution,
            # form.go:140-178)
            self.form_inputs.append({
                "name": self._in_select, "type": "select",
                "value": ad.get("value"),
                "checked": False, "selected": "selected" in ad,
                "pos": len(self.form_inputs)})
        elif tag == "img":
            if (self._a is not None and self._a["img_alt"] is None
                    and ad.get("alt") is not None):
                self._a["img_alt"] = ad["alt"]

    # html.parser reports <img .../> via startendtag, not starttag
    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag == "head":
            self._in_head = False
        elif tag == "title":
            self._in_title = False
        elif tag == "form":
            self._in_form = False
        elif tag == "select":
            self._in_select = None
        elif tag == "a" and self._a is not None:
            a = self._a
            self._a = None
            if a["href"] is None:
                return              # attr-missing ⇒ skip (P2 semantics)
            a["text"] = "".join(self._a_text)
            a["pos"] = len(self.anchors)
            self.anchors.append(a)

    def handle_data(self, data):
        if self._a is not None:
            self._a_text.append(data)
        elif self._in_title:
            self.title_parts.append(data)


def _charset_from_head(metas: list[dict]) -> str | None:
    """goquery Attr() reads the FIRST element of the selection
    (response.go:106-118): the ``charset`` attr of the first head meta
    (present or not), then the first http-equiv='Content-Type' meta's
    content — which OVERRIDES the charset attr when it carries charset=."""
    charset = metas[0].get("charset") if metas else None
    for m in metas:
        if m.get("http-equiv") == "Content-Type" and "content" in m:
            cs = charset_from_content_type(m["content"])
            if cs is not None:
                charset = cs
            break
    return charset


def parse_page(body: bytes | None, content_type: str | None = None,
               forced_charset: str | None = None,
               body_filter: Callable[[bytes], bytes] | None = None) -> dict:
    """bytes + Content-Type → the parsed-page dict (see PARSED_FIELDS).

    Mirrors Response.PageOpt (response.go:55-100): sniff head charset from
    the raw bytes (the head is ASCII-compatible in every supported
    encoding), resolve precedence, decode, apply the body filter, parse.
    Undecodable bytes become replacement chars (errors-as-data, never
    exceptions)."""
    if body is None:
        return dict(_EMPTY)
    body = bytes(body)

    charset = forced_charset
    if charset is None:
        sniffer = _PageParser()
        try:
            sniffer.feed(body.decode("utf-8", errors="replace"))
            sniffer.close()
        except Exception:
            pass
        charset = _charset_from_head(sniffer.head_metas)
    if charset is None:
        charset = charset_from_content_type(content_type)

    text = body.decode(codec_for(charset), errors="replace")
    if body_filter is not None:
        # the reference filters the decoded body bytes (response.go:71-76)
        text = body_filter(text.encode("utf-8")).decode(
            "utf-8", errors="replace")

    p = _PageParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        return dict(_EMPTY, effective_charset=charset)

    refresh = None
    if p.refresh_content is not None:
        m = _REFRESH_RE.search(p.refresh_content)
        if m:
            refresh = m.group(1)
    return {
        # exactly-1 rule for <head base> (response.go:86-94)
        "base_href": p.base_hrefs[0] if len(p.base_hrefs) == 1 else None,
        "meta_refresh_url": refresh,
        "links": p.anchors,
        "title": "".join(p.title_parts) or None,
        "effective_charset": charset,
        "form_action": p.form_action,
        "form_method": p.form_method,
        "form_inputs": p.form_inputs if p.form_action is not None else None,
    }


def parse_pages(df: DataFrame, body_col: str = "body",
                ct_col: str | None = "content_type",
                forced_charset: str | None = None,
                body_filter: Callable[[bytes], bytes] | None = None,
                drop_body: bool = True) -> DataFrame:
    """Attach the parsed-page columns via one Arrow-batched pass.

    Input rows keep every column except (optionally) the raw body — the
    engine calls this on the k FETCHED rows of a round, so the payload
    bytes never ride past the parse. Null body (fetch miss ⇒ 404 path)
    yields null parsed columns."""
    keep = [f for f in df.schema.fields
            if not (drop_body and f.name == body_col)]
    out_schema = StructType(keep + PARSED_FIELDS)
    keep_names = [f.name for f in keep]
    parsed_names = [f.name for f in PARSED_FIELDS]

    def run(batches):
        for pdf in batches:
            cts = (pdf[ct_col] if ct_col and ct_col in pdf.columns
                   else pd.Series([None] * len(pdf)))
            parsed = [parse_page(b, ct, forced_charset, body_filter)
                      for b, ct in zip(pdf[body_col], cts)]
            out = pdf[keep_names].copy()
            for name in parsed_names:
                out[name] = [d[name] for d in parsed]
            yield out

    return df.mapInPandas(run, out_schema)


def body_filter_stage(df: DataFrame,
                      fn: Callable[[bytes], bytes],
                      body_col: str = "body") -> DataFrame:
    """P10 as a standalone stage: a mapInArrow slot between fetch and parse
    that rewrites the RAW body bytes (for filters that must act before the
    decode chain; decoded-body filters pass ``body_filter=`` to parse_pages
    instead, matching the reference's hook position)."""
    import pyarrow as pa

    idx = df.schema.fieldNames().index(body_col)

    def rewrite(batches):
        for batch in batches:
            col = batch.column(idx)
            new = pa.array(
                [None if v is None else fn(v)
                 for v in col.to_pylist()], type=col.type)
            yield batch.set_column(idx, batch.schema.field(idx), new)

    return df.mapInArrow(rewrite, df.schema)
