"""change_drift / interval_join / compaction_plan unit tests (brute-force
mirrors + edge cases; the driver entries pin the DuckDB differential at
sf0.01)."""

import pytest
from pyspark.sql import functions as F

from crawlspark.frontier.catalog import compaction_plan
from crawlspark.frontier.recrawl import change_drift
from crawlspark.functions.asof import interval_join


# -- change_drift -------------------------------------------------------------

def test_change_drift_hamming_and_threshold(spark):
    prev = spark.createDataFrame(
        [(1, 0b1111), (2, 0), (3, -1), (4, 42)], ["url_hash", "sig"])
    curr = spark.createDataFrame(
        # url 1: 4 bits flipped; 2: identical; 3: one bit; 5: only in curr
        [(1, 0), (2, 0), (3, -2), (5, 7)], ["url_hash", "sig"])
    out = {r.url_hash: r for r in
           change_drift(prev, curr, threshold=3).collect()}
    assert set(out) == {1, 2, 3}          # inner join: 4 and 5 dropped
    assert out[1].hamming == 4 and out[1].changed
    assert out[2].hamming == 0 and not out[2].changed
    assert out[3].hamming == 1 and not out[3].changed


def test_change_drift_threshold_boundary(spark):
    prev = spark.createDataFrame([(1, 0b111)], ["url_hash", "sig"])
    curr = spark.createDataFrame([(1, 0)], ["url_hash", "sig"])
    # hamming == threshold is NOT changed (strict >)
    assert not change_drift(prev, curr, threshold=3).collect()[0].changed
    assert change_drift(prev, curr, threshold=2).collect()[0].changed


# -- interval_join ------------------------------------------------------------

def _brute(points, intervals):
    return sorted((p, i) for (p,) in points for (i, s, e) in intervals
                  if s <= p <= e)


@pytest.mark.parametrize("bucket", [1, 3, 7, 100])
def test_interval_join_matches_brute_force(spark, bucket):
    # overlapping intervals, duplicates, zero-length, boundary-exact points
    intervals = [(0, 5, 14), (1, 10, 10), (2, 0, 100), (3, 14, 20),
                 (4, 99, 99)]
    points = [(p,) for p in (0, 5, 9, 10, 11, 14, 15, 99, 100, 101)]
    pdf = spark.createDataFrame(points, ["x"])
    idf = spark.createDataFrame(intervals, ["iid", "s", "e"])
    got = sorted((r.x, r.iid) for r in
                 interval_join(pdf, idf, "x", "s", "e", bucket).collect())
    assert got == _brute(points, intervals)


def test_interval_join_no_duplicate_pairs_and_broadcast(spark):
    # an interval spanning many buckets must still yield each pair ONCE
    pdf = spark.createDataFrame([(50,), (50,)], ["x"])   # duplicate points
    idf = spark.createDataFrame([(1, 0, 1000)], ["iid", "s", "e"])
    got = interval_join(pdf, idf, "x", "s", "e", 10).collect()
    assert len(got) == 2                     # one per point row, not per bucket
    got_b = interval_join(pdf, idf, "x", "s", "e", 10,
                          broadcast_intervals=True).collect()
    assert len(got_b) == 2
    plan = interval_join(pdf, idf, "x", "s", "e", 10,
                         broadcast_intervals=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_interval_join_rejects_bad_bucket(spark):
    pdf = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="bucket"):
        interval_join(pdf, pdf, "x", "x", "x", 0)


def test_interval_join_epoch_micros_exact(spark):
    # magnitudes where double-precision floor would be unreliable
    t0 = 1_700_000_000_000_000
    pdf = spark.createDataFrame([(t0 + 1,), (t0 + 10 ** 9,)], ["us"])
    idf = spark.createDataFrame([(1, t0, t0 + 2)], ["iid", "s", "e"])
    got = interval_join(pdf, idf, "us", "s", "e", 3_600_000_000).collect()
    assert [r.us for r in got] == [t0 + 1]


# -- compaction_plan ----------------------------------------------------------

def test_compaction_plan_packs_by_size_desc(spark):
    files = spark.createDataFrame(
        [("p1", "a", 60), ("p1", "b", 50), ("p1", "c", 40), ("p1", "d", 10),
         ("p2", "e", 5)],
        ["part", "path", "size_bytes"])
    out = {(r.part, r.path): r.bin
           for r in compaction_plan(files, target_bytes=100).collect()}
    # size-desc order: a(60) b(50) c(40) d(10); running-before 0,60,110,150
    assert out[("p1", "a")] == 0 and out[("p1", "b")] == 0
    assert out[("p1", "c")] == 1 and out[("p1", "d")] == 1
    assert out[("p2", "e")] == 0            # partitions pack independently


def test_compaction_plan_oversize_file_isolated(spark):
    files = spark.createDataFrame(
        [("p", "big", 1000), ("p", "s1", 10), ("p", "s2", 10)],
        ["part", "path", "size_bytes"])
    out = {r.path: r.bin for r in
           compaction_plan(files, target_bytes=100).collect()}
    assert out["big"] == 0
    assert out["s1"] == 10 and out["s2"] == 10   # 1000 div 100 / 1010 div 100


def test_compaction_plan_tie_breaks_on_path(spark):
    files = spark.createDataFrame(
        [("p", "z", 50), ("p", "a", 50), ("p", "m", 50)],
        ["part", "path", "size_bytes"])
    out = {r.path: r.bin for r in
           compaction_plan(files, target_bytes=100).collect()}
    # a,m,z by path at equal size: before 0,50,100
    assert out["a"] == 0 and out["m"] == 0 and out["z"] == 1
