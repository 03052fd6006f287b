"""xxh64 == Spark xxhash64; mix/probe helpers are stable."""
import numpy as np
from pyspark.sql import functions as F

from crawlspark.hashing import (bloom_probes, mix64, xxh64, xxh64_long,
                                xxh64_str)


def test_xxh64_matches_spark(spark):
    vals = ["", "a", "hello world", "http://host1.test/p/42?a=1&b=2",
            "x" * 100, "日本語テスト", " 　", "a" * 31, "b" * 32,
            "c" * 33]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"]
           for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxh64_str(v), v


def test_xxh64_long_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**63), 2**63 - 1,
            123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"]
           for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxh64_long(v), v


def test_xxh64_deterministic():
    assert xxh64(b"abc") == xxh64(b"abc")
    assert xxh64(b"abc") != xxh64(b"abd")


def test_mix64_vectorized_matches_scalar():
    arr = np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64)
    out = mix64(arr)
    assert out.dtype == np.uint64
    assert len(set(out.tolist())) == 4


def test_bloom_probes_shape_and_range():
    h = np.array([1, 2, 3], dtype=np.uint64)
    p = bloom_probes(h, k=5, m_bits=1024)
    assert p.shape == (3, 5)
    assert (p < 1024).all()
