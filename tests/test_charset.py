"""Charset precedence matrix — /root/reference/response_test.go:111-159."""
from pyspark.sql import functions as F

from crawlspark.operators.charset import decode_page

JP = "日本語"
SCHEMA = ("body binary, forced string, meta_charset string, "
          "meta_http_equiv string, header_ct string")


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = decode_page(df, "body", "forced", "meta_charset",
                      "meta_http_equiv", "header_ct")
    return [(r["effective_charset"], r["text"]) for r in out.collect()]


def test_precedence_chain(spark):
    sjis = JP.encode("shift_jis")
    eucjp = JP.encode("euc_jp")
    iso = JP.encode("iso2022_jp")
    utf8 = JP.encode("utf-8")
    rows = [
        # forced wins over everything
        (sjis, "shift_jis", "euc-jp", None, "text/html; charset=euc-jp"),
        # head meta charset attr
        (eucjp, None, "euc-jp", None, "text/html; charset=shift_jis"),
        # meta http-equiv content OVERRIDES meta charset (response.go:106-118)
        (iso, None, "shift_jis", "text/html; charset=iso-2022-jp", None),
        # header fallback
        (sjis, None, None, None, "text/html; charset=Shift_JIS"),
        # nothing → passthrough utf-8 (response.go:129-141 returns nil)
        (utf8, None, None, None, "text/html"),
        # unknown charset → passthrough
        (utf8, None, "utf-8", None, None),
    ]
    got = run(spark, rows)
    assert got[0] == ("shift_jis", JP)
    assert got[1] == ("euc-jp", JP)
    assert got[2] == ("iso-2022-jp", JP)
    assert got[3] == ("Shift_JIS", JP)
    assert got[4] == (None, JP)
    assert got[5] == ("utf-8", JP)


def test_charset_aliases(spark):
    # response.go:129-141 alias table
    for alias in ["shift_jis", "windows-31j", "x-sjis", "sjis", "cp932",
                  "shift-jis", "SHIFT_JIS"]:
        rows = [(JP.encode("cp932" if "31j" in alias or "932" in alias
                           else "shift_jis"), alias, None, None, None)]
        got = run(spark, rows)
        assert got[0][1] == JP, alias
