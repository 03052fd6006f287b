"""Extraction operator vectors — ported from the reference's tests
(FIXTURES.md §4; /root/reference/unmarshal_test.go, UNMARSHAL_REFERENCE.md)."""
import datetime

import pytest
from pyspark.sql import functions as F

from crawlspark.operators import extract as X


def col_vals(spark, vals, expr):
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    return [r["o"] for r in df.select(expr(F.col("s")).alias("o")).collect()]


def test_extract_number(spark):
    # UNMARSHAL_REFERENCE.md:183-188 + FIXTURES.md num_strings
    vals = ["￥1,234.56円", "$12.34 USD", "123,456", "42", "test",
            "価格: 999", "3.14159265", ""]
    got = col_vals(spark, vals, X.extract_number)
    assert got == [1234.56, 12.34, 123456.0, 42.0, None, 999.0,
                   3.14159265, None]


def test_comma_int(spark):
    # unmarshal_test.go:77-123: 42, "123,456"→123456; %d rejects garbage
    vals = ["42", "123,456", " 654321 ", "12abc", "12.5", "-7", "test"]
    got = col_vals(spark, vals, X.comma_int)
    assert got == [42, 123456, 654321, None, None, -7, None]


def test_comma_uint(spark):
    got = col_vals(spark, ["654321", "-7", "1,000"], X.comma_uint)
    assert got == [654321, None, 1000]


def test_go_time_layouts(spark):
    # unmarshal_test.go:240-304: 12-hour "03" without PM keeps literal hour
    cases = [
        ("1986/4/1 12:34", "2006/1/2 03:04",
         datetime.datetime(1986, 4, 1, 12, 34)),
        ("1999/04/01 12:34", "2006/01/02 03:04",
         datetime.datetime(1999, 4, 1, 12, 34)),
        ("2001年2月3日", "2006年1月2日", datetime.datetime(2001, 2, 3)),
        ("abc", "2006/1/2 03:04", None),
    ]
    for s, layout, want in cases:
        got = col_vals(spark, [s], lambda c, la=layout: X.go_time(c, la))[0]
        assert got == want, (s, layout, got)


def test_go_layout_translation():
    assert X.go_layout_to_jdk("2006/1/2 03:04") == "yyyy/M/d HH:mm"
    assert X.go_layout_to_jdk("2006年1月2日") == "yyyy'年'M'月'd'日'"
    assert X.go_layout_to_jdk("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert X.go_layout_to_jdk("03:04 PM") == "hh:mm a"


def test_regex_capture(spark):
    # unmarshal_test.go:125-185: $123US with \$([0-9]+)US → 123
    got = col_vals(spark, ["$123US", "no match"],
                   lambda c: X.regex_capture(c, r"\$([0-9]+)US"))
    assert got == ["123", None]
    with pytest.raises(ValueError):
        X.regex_capture(F.lit("x"), r"(a)(b)")  # 2 groups → build-time error
    with pytest.raises(ValueError):
        X.regex_capture(F.lit("x"), r"ab")      # 0 groups


def test_ignore_zero(spark):
    # unmarshal_test.go:506-550: matched ignore → zero value ("" not null)
    got = col_vals(spark, ["test", "other"],
                   lambda c: X.ignore_zero(c, "test"))
    assert got == ["", "other"]


def test_exactly_one(spark):
    df = spark.createDataFrame([([1],), ([1, 2],), ([],)], ["a"])
    got = [r["e"] for r in
           df.select(X.exactly_one(F.col("a")).alias("e")).collect()]
    assert got == [None, "length(2) != 1", "length(0) != 1"]


def test_anchor_text_match(spark):
    # session.go:399-427: text equality (opt trim) or child img[alt]
    df = spark.createDataFrame(
        [("next", None), ("  next  ", None), ("x", "next"), ("x", None)],
        ["t", "alt"])
    got = [r["m"] for r in df.select(
        X.anchor_text_match(F.col("t"), F.col("alt"), "next",
                            trim_space=False).alias("m")).collect()]
    assert got == [True, None, True, None]  # null alt → null OR false
    got_trim = [r["m"] for r in df.select(
        X.anchor_text_match(F.col("t"), F.col("alt"), "next",
                            trim_space=True).alias("m")).collect()]
    assert got_trim[1] is True


def test_meta_refresh_and_charset(spark):
    got = col_vals(spark, ["5; URL=/next.html", "0;url=http://x.test/",
                           "nothing"], X.meta_refresh_url)
    assert got == ["/next.html", "http://x.test/", None]
    got = col_vals(spark, ["text/html; charset=Shift_JIS", "text/html"],
                   X.charset_of_content_type)
    assert got == ["Shift_JIS", None]


def test_glob_to_regex(spark):
    assert X.glob_to_regex("*.csv") == r"^[^/]*\.csv$"
    df = spark.createDataFrame(
        [("report.csv",), ("report.csv.crdownload",), ("a/b.csv",)], ["n"])
    got = [r["m"] for r in df.select(
        F.col("n").rlike(X.glob_to_regex("*.csv")).alias("m")).collect()]
    assert got == [True, False, False]


def test_name_from_selector(spark):
    """P11 (session.go:693-703): the reference's own doc examples plus the
    quoting variants and the no-match zero value."""
    from pyspark.sql import functions as F

    from crawlspark.operators.extract import name_from_selector
    rows = [("input[name=username]", "username"),
            ('[name="password"]', "password"),
            ("form > input[name='q']", "q"),
            ("div#x.cls", ""),
            ("[name=]", "")]
    df = spark.createDataFrame([(s,) for s, _ in rows], "sel string")
    got = [r["n"] for r in
           df.select(name_from_selector(F.col("sel")).alias("n")).collect()]
    assert got == [w for _, w in rows]
