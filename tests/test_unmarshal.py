"""Extraction-spec compiler vs the reference's own test vectors
(/root/reference/unmarshal_test.go) — favnovel nested struct (40-76),
int/uint with commas (79-123), regex capture (125-166), slice (300-320),
slice-of-struct (421-448), html (474-502), ignore (504-560) — plus the
spec-validation errors the reference raises at run time."""
import datetime

import pytest
from pyspark.sql import functions as F

from crawlspark.operators import unmarshal as um

FAVNOVEL_HTML = """<div id="favnovel">
  <div class="favnovel_list">
    <a href="novel-url" class="favnovel_hover"><img />series title</a>
    <span class="no">
      <a href="novel-url/bookmark/">part n</a>
    </span>
    <span class="favnovel_info">
      <a href="novel-url/latest/">latest n [done]</a>
    </span>
  </div>
</div>"""

FAVNOVEL_SPEC = {"type": "struct", "fields": {
    "novel_url": {"find": "a.favnovel_hover", "attr": "href"},
    "title": {"find": "a.favnovel_hover"},
    "bookmark_url": {"find": "span.no a", "attr": "href"},
    "latest_url": {"find": "span.favnovel_info a", "attr": "href"},
}}


def _run_one(spark, html, spec):
    df = spark.createDataFrame([(html,)], "text string")
    out = um.unmarshal_spec(df, spec).collect()[0]
    return out["data"], out["unmarshal_err"]


def test_favnovel_nested_struct(spark):
    data, err = _run_one(spark, FAVNOVEL_HTML, FAVNOVEL_SPEC)
    assert err is None
    assert data["novel_url"] == "novel-url"
    assert data["title"] == "series title"
    assert data["bookmark_url"] == "novel-url/bookmark/"
    assert data["latest_url"] == "novel-url/latest/"


def test_int_uint_comma(spark):
    html = ('<div><p>42</p><span id="int">123,456</span>'
            '<span id="uint">654321</span></div>')
    spec = {"type": "struct", "fields": {
        "p": {"find": "p", "type": "int"},
        "i": {"find": "span#int", "type": "int"},
        "u": {"find": "span#uint", "type": "uint"},
    }}
    data, err = _run_one(spark, html, spec)
    assert err is None
    assert (data["p"], data["i"], data["u"]) == (42, 123456, 654321)


def test_regex_capture_int(spark):
    # TestUnmarshallIntRegEx: "$123US" re:"\\$([0-9]+)" -> 123
    data, err = _run_one(spark, "<div>$123US</div>",
                         {"type": "struct", "fields": {
                             "v": {"find": "div", "re": r"\$([0-9]+)",
                                   "type": "int"}}})
    assert err is None and data["v"] == 123


def test_slice_of_strings(spark):
    data, err = _run_one(spark, "<div><p>1</p><p>2</p></div>",
                         {"type": "struct", "fields": {
                             "p": {"find": "p", "many": True}}})
    assert err is None and data["p"] == ["1", "2"]


def test_slice_of_structs(spark):
    # TestUnmarshallStructArrayInStruct + typed fields (favnovel []Chapter)
    html = ("<div><p><b>a</b><i>1</i></p><p><b>b</b><i>2,000</i></p>"
            "<p><b>c</b><i>3</i></p></div>")
    spec = {"type": "struct", "fields": {
        "items": {"find": "p", "many": True, "type": "struct", "fields": {
            "name": {"find": "b"},
            "n": {"find": "i", "type": "int"}}}}}
    data, err = _run_one(spark, html, spec)
    assert err is None
    assert [(r["name"], r["n"]) for r in data["items"]] == \
        [("a", 1), ("b", 2000), ("c", 3)]


def test_html_flag(spark):
    # TestUnmarshallHtml: inner HTML of the div
    html = '<div><a href="https://example.com">link</a><p>p</p></div>'
    data, err = _run_one(spark, html,
                         {"type": "struct", "fields": {
                             "h": {"find": "div", "html": True}}})
    assert err is None
    assert data["h"] == '<a href="https://example.com">link</a><p>p</p>'


def test_ignore_zero_values(spark):
    spec = {"type": "struct", "fields": {
        "s": {"find": "p.s", "ignore": "test"},
        "n": {"find": "p.n", "type": "int", "ignore": "out of stock"},
        "f": {"find": "p.f", "type": "float", "ignore": "-"},
    }}
    data, err = _run_one(
        spark, '<div><p class="s">test</p><p class="n">out of stock</p>'
               '<p class="f">-</p></div>', spec)
    assert err is None
    assert (data["s"], data["n"], data["f"]) == ("", 0, 0.0)
    data, _ = _run_one(
        spark, '<div><p class="s">keep</p><p class="n">7</p>'
               '<p class="f">1.5</p></div>', spec)
    assert (data["s"], data["n"], data["f"]) == ("keep", 7, 1.5)


def test_missing_attr_skips_and_optional(spark):
    # attr-missing elements are skipped (unmarshal.go:104-109); optional
    # (*T) yields null on zero matches (147-150)
    html = '<div><a>no href</a><a href="x">yes</a><em>e</em></div>'
    spec = {"type": "struct", "fields": {
        "href": {"find": "a", "attr": "href"},       # 1 after skip
        "miss": {"find": "b.nope", "optional": True},
    }}
    data, err = _run_one(spark, html, spec)
    assert err is None
    assert data["href"] == "x" and data["miss"] is None


def test_cardinality_error_dotted_path(spark):
    # exactly-one violation errs with the UnmarshalFieldError dotted path
    html = "<div><p>1</p><p>2</p></div>"
    spec = {"type": "struct", "fields": {
        "outer": {"find": "div", "type": "struct", "fields": {
            "p": {"find": "p"}}}}}
    data, err = _run_one(spark, html, spec)
    assert data is None and err == "outer.p: length(2) != 1"


def test_time_go_layout(spark):
    data, err = _run_one(
        spark, "<div><p>2024/3/7 15:04</p></div>",
        {"type": "struct", "fields": {
            "t": {"find": "p", "type": "time", "time": "2006/1/2 15:04"}}})
    assert err is None
    assert data["t"] == datetime.datetime(2024, 3, 7, 15, 4)


def test_custom_unmarshaller_hook(spark):
    # the named Unmarshaller escape hatch (unmarshal.go:15-17): a str->str
    # canonicalizer per match; None = skip like a missing attr
    spec = {"type": "struct", "fields": {
        "v": {"find": "p", "type": "int",
              "custom": lambda s: s.replace("k", "000") if "k" in s
              else None}}}
    data, err = _run_one(spark, "<div><p>no dice</p><p>4k</p></div>", spec)
    assert err is None and data["v"] == 4000


def test_build_time_validation():
    with pytest.raises(ValueError, match="capture group"):
        um.compile_spec({"fields": {"x": {"find": "p", "re": "(a)(b)"}}})
    with pytest.raises(ValueError, match="`re` tag must be empty"):
        um.compile_spec({"fields": {}, "re": "(a)"})
    with pytest.raises(ValueError, match="`attr` tag must be empty"):
        um.compile_spec({"fields": {}, "attr": "href"})
    with pytest.raises(ValueError, match="time tag is required"):
        um.compile_spec({"fields": {"t": {"find": "p", "type": "time"}}})
    with pytest.raises(ValueError, match="unless"):
        um.compile_spec({"fields": {"t": {"find": "p", "time": "2006"}}})
    with pytest.raises(ValueError, match="unsupported CSS"):
        um.compile_spec({"fields": {"x": {"find": "p ~ q"}}})
    with pytest.raises(ValueError, match="unknown spec keys"):
        um.compile_spec({"fields": {"x": {"find": "p", "regex": "(a)"}}})


def test_css_subset_selectors():
    html = ('<div id="a" class="x y"><p>1</p><span><p>2</p></span></div>'
            '<div class="x"><p>3</p></div><p>4</p>')
    root = um.build_dom(html)

    def sel(s):
        return [um.node_text(n)
                for n in um._CompiledSelector(s).find([root])]

    assert sel("p") == ["1", "2", "3", "4"]
    assert sel("div p") == ["1", "2", "3"]
    assert sel("div > p") == ["1", "3"]
    assert sel("#a p") == ["1", "2"]
    assert sel("div.x.y p") == ["1", "2"]
    assert sel("span p, div.x > p") == ["1", "2", "3"]
    assert sel("[class=x] p") == ["3"]
    assert sel("div p:nth-of-type(1)") == ["1", "2", "3"]
    assert sel("div:nth-child(2) p") == ["3"]


def test_kernel_matches_reference_shape_no_spark():
    # pure-Python phase-A check (no session): errors never raise
    cspec = um.compile_spec(FAVNOVEL_SPEC)
    raw, err = um.extract_raw(FAVNOVEL_HTML, cspec)
    assert err is None and raw["title"] == "series title"
    raw, err = um.extract_raw("<div></div>", cspec)
    assert raw is None and "novel_url" in err
