"""nth-of-type vectors — /root/reference/chrome_unmarshal_test.go:152-307."""
import pytest
from pyspark.sql import functions as F

from crawlspark.operators import nth


@pytest.mark.parametrize("selector,n,want", [
    ("div:nth-of-type(odd)", 1, "div:nth-of-type(3)"),
    ("div:nth-of-type(even)", 1, "div:nth-of-type(4)"),
    ("div:nth-of-type(even)", 0, "div:nth-of-type(2)"),
    ("div:nth-of-type(2n)", 1, "div:nth-of-type(4)"),
    ("div:nth-of-type(2n+1)", 1, "div:nth-of-type(3)"),
    ("div:nth-of-type(2)", 1, "div:nth-of-type(2)"),
    ("div", 1, "div:nth-of-type(2)"),
    ("div div:nth-of-type(2n+1)", 1, "div div:nth-of-type(3)"),
])
def test_rewrite_vectors(selector, n, want):
    assert nth.rewrite_selector(selector, n) == want


def test_first_last_child_bypass():
    assert nth.rewrite_selector("div:first-child", 3) == "div:first-child"
    assert nth.rewrite_selector("div:last-child", 3) == "div:last-child"


def test_nth_child_rejected():
    # chrome_unmarshal.go:61-73: slice fields reject nth-child family
    for sel in ("div:nth-child(2)", "p:nth-last-child(1)",
                "a:nth-last-of-type(odd)"):
        with pytest.raises(ValueError):
            nth.rewrite_selector(sel, 0)


def test_array_semantics(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d", "e"],)], ["els"])
    # odd = positions 1,3,5
    got = df.select(nth.nth_of_type_filter(
        F.col("els"), 2, 1).alias("o")).collect()[0]["o"]
    assert got == ["a", "c", "e"]
    got = df.select(nth.nth_of_type_filter(
        F.col("els"), 2, 0).alias("o")).collect()[0]["o"]
    assert got == ["b", "d"]
    got = df.select(nth.nth_element(
        F.col("els"), 1, 2, 1).alias("o")).collect()[0]["o"]
    assert got == "c"  # slice index 1 of odd → absolute 3
    got = df.select(nth.nth_element(
        F.col("els"), 9, 2, 1).alias("o")).collect()[0]["o"]
    assert got is None  # out of range → null
