"""Raw-HTML page parsing (operators.parse): unit vectors mirroring the
reference's charset matrix (/root/reference/response_test.go:52-329), the
full-corpus render→parse round trip (the raw-body golden contract), and the
Spark mapInPandas layer."""

import pytest

from crawlspark import synth
from crawlspark.charsets import charset_from_content_type, codec_for
from crawlspark.operators.parse import (body_filter_stage, parse_page,
                                        parse_pages)

JP = "日本語"


def doc(head="", body_html=""):
    return (f"<html><head>{head}<title>{JP}</title></head>"
            f"<body>{body_html}</body></html>")


# --- charset chain (response_test.go:105-199) --------------------------------

def test_plain_utf8():
    p = parse_page(doc().encode("utf-8"), "text/html")
    assert p["title"] == JP
    assert p["effective_charset"] is None


def test_forced_encoding():
    raw = doc().encode("shift_jis")
    p = parse_page(raw, "text/html", forced_charset="Shift_JIS")
    assert p["title"] == JP


def test_meta_charset():
    raw = doc('<meta charset="Shift_JIS">').encode("shift_jis")
    p = parse_page(raw, "text/html")
    assert p["title"] == JP
    assert p["effective_charset"] == "Shift_JIS"


def test_header_charset():
    raw = doc().encode("shift_jis")
    p = parse_page(raw, "text/html; charset=Shift_JIS")
    assert p["title"] == JP
    assert p["effective_charset"] == "Shift_JIS"


def test_forced_stronger_than_meta():
    # meta lies (EUC-JP); the body is Shift_JIS; forced wins
    raw = doc('<meta charset="EUC-JP">').encode("shift_jis")
    p = parse_page(raw, "text/html", forced_charset="Shift_JIS")
    assert p["title"] == JP


def test_meta_stronger_than_header():
    raw = doc('<meta charset="Shift_JIS">').encode("shift_jis")
    p = parse_page(raw, "text/html; charset=EUC-JP")
    assert p["title"] == JP
    assert p["effective_charset"] == "Shift_JIS"


def test_http_equiv_overrides_meta_charset():
    # getCharsetFromHead: the http-equiv content OVERRIDES the charset attr
    # (response.go:106-118)
    raw = doc('<meta charset="EUC-JP">'
              '<meta http-equiv="Content-Type" '
              'content="text/html; charset=Shift_JIS">').encode("shift_jis")
    p = parse_page(raw, "text/html")
    assert p["title"] == JP
    assert p["effective_charset"] == "Shift_JIS"


def test_first_meta_without_charset_attr_hides_later_one():
    # goquery Attr() reads the FIRST head meta only (response.go:108)
    raw = doc('<meta name="generator" content="x">'
              '<meta charset="Shift_JIS">').encode("shift_jis")
    p = parse_page(raw, "text/html")
    assert p["effective_charset"] is None   # charset attr not on first meta
    assert p["title"] != JP                 # mojibake, by design


@pytest.mark.parametrize("name,codec", [
    ("UTF-8", "utf-8"), ("unknown", "utf-8"),
    ("Shift_JIS", "shift_jis"), ("windows-31j", "cp932"),
    ("cp932", "cp932"), ("shift-jis", "shift_jis"), ("sjis", "shift_jis"),
    ("x-sjis", "shift_jis"), ("EUC-JP", "euc_jp"),
    ("ISO-2022-JP", "iso2022_jp"),
])
def test_codec_alias_table(name, codec):
    # response_test.go:201-244 (getEncodingFromCharset matrix)
    assert codec_for(name) == codec
    assert codec_for(name.lower()) == codec


def test_charset_from_content_type():
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(
        "text/html; charset=Shift_JIS") == "Shift_JIS"


# --- structure: base / refresh / links ---------------------------------------

def test_base_href_exactly_one():
    one = doc('<base href="http://example.com/">').encode()
    two = doc('<base href="/a/"><base href="/b/">').encode()
    assert parse_page(one)["base_href"] == "http://example.com/"
    assert parse_page(two)["base_href"] is None


def test_meta_refresh_case_insensitive_url():
    for u in ("url", "URL", "Url"):
        raw = doc(f'<meta http-equiv="refresh" content="5; {u}=/next">')
        assert parse_page(raw.encode())["meta_refresh_url"] == "/next"
    # no url= param -> no refresh (page.go:22-27)
    raw = doc('<meta http-equiv="refresh" content="5">')
    assert parse_page(raw.encode())["meta_refresh_url"] is None


def test_links_document_order_and_skip_semantics():
    body = ('<a href="/a">A</a>'
            '<a name="x">no href</a>'                     # skipped (P2)
            '<a href="/b">B<img src="t.png" alt="altB"></a>'
            '<a href="/c?x=1&amp;y=2">C &amp; D</a>')     # entity unescape
    p = parse_page(doc(body_html=body).encode())
    assert [l["href"] for l in p["links"]] == ["/a", "/b", "/c?x=1&y=2"]
    assert [l["pos"] for l in p["links"]] == [0, 1, 2]
    assert p["links"][1]["img_alt"] == "altB"
    assert p["links"][2]["text"] == "C & D"


def test_null_body():
    p = parse_page(None)
    assert p["links"] is None and p["title"] is None


# --- BodyFilter hook (P10, response_test.go:277-329) -------------------------

def test_body_filter_rewrites_before_parse():
    raw = doc(body_html='<a href="/x">x</a>').encode()
    swap = lambda b: b.replace(b'href="/x"', b'href="/y"')
    p = parse_page(raw, "text/html", body_filter=swap)
    assert [l["href"] for l in p["links"]] == ["/y"]


def test_body_filter_after_decode():
    # the filter sees DECODED text bytes (response.go:71-76 runs after
    # Body()): a filter matching the UTF-8 form must hit a Shift_JIS page
    raw = doc('<meta charset="Shift_JIS">',
              f'<a href="/j">{JP}</a>').encode("shift_jis")
    drop = lambda b: b.replace(JP.encode("utf-8"), b"nihongo")
    p = parse_page(raw, "text/html", body_filter=drop)
    assert p["links"][0]["text"] == "nihongo"


# --- full-corpus round trip (the raw-body golden contract) -------------------

def test_render_parse_round_trip_t1():
    tier = synth.TIERS["t1"]
    counts = synth.page_counts(tier)
    starts = synth.page_index_bounds(counts)
    for g in range(tier.n_pages):
        h, k = synth.locate_page(g, starts)
        row = synth.gen_page_row(h, k, counts, tier.n_images, g)
        body, ct = synth.render_page_html(h, k, counts)
        p = parse_page(body, ct)
        assert p["base_href"] == row["base_href"], (h, k)
        assert p["meta_refresh_url"] == row["meta_refresh_url"], (h, k)
        assert p["title"] == row["title"], (h, k)
        want = [{"href": l["href"], "text": l["text"],
                 "img_alt": l["img_alt"], "pos": int(l["pos"])}
                for l in row["links"]]
        assert p["links"] == want, (h, k)


# --- Spark layer -------------------------------------------------------------

def test_parse_pages_spark(spark):
    tier = synth.TIERS["t1"]
    counts = synth.page_counts(tier)
    raw = synth.spark_raw_pages(spark, tier, parallelism=4).limit(300)
    parsed = parse_pages(raw).orderBy("url").collect()
    assert len(parsed) == 300
    starts = synth.page_index_bounds(counts)
    by_url = {}
    for g in range(tier.n_pages):
        h, k = synth.locate_page(g, starts)
        by_url[synth.page_url(h, k)] = (h, k)
    for r in parsed:
        h, k = by_url[r["url"]]
        row = synth.gen_page_row(h, k, counts, tier.n_images, 0)
        assert r["title"] == row["title"]
        assert r["base_href"] == row["base_href"]
        got = [(l["href"], l["text"], l["img_alt"], l["pos"])
               for l in (r["links"] or [])]
        want = [(l["href"], l["text"], l["img_alt"], int(l["pos"]))
                for l in row["links"]]
        assert got == want
        assert "body" not in r.asDict()      # payload dropped at parse


def test_body_filter_stage_spark(spark):
    tier = synth.TIERS["t1"]
    raw = synth.spark_raw_pages(spark, tier, parallelism=2).limit(20)
    killed = body_filter_stage(raw, lambda b: b.replace(b"<a href=",
                                                        b"<a data-href="))
    parsed = parse_pages(killed).collect()
    assert all(not r["links"] for r in parsed)   # every link stripped
