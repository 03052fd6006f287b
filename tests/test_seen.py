"""Seen-filter contracts: Bloom/cuckoo no false negatives; exactness via
anti-join; incremental shard updates."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlspark.frontier.seen import (SeenFilter, _bloom_build,
                                      _bloom_contains, _ck_build,
                                      _ck_contains)


def test_bloom_no_false_negatives():
    h = np.arange(1, 5000, dtype=np.uint64) * np.uint64(2654435761)
    bits = _bloom_build(h, m_bits=1 << 17, k=7)
    assert _bloom_contains(bits, h, 1 << 17, 7).all()
    other = np.arange(10**6, 10**6 + 5000, dtype=np.uint64)
    fp = _bloom_contains(bits, other, 1 << 17, 7).mean()
    assert fp < 0.05, fp


def test_cuckoo_no_false_negatives_and_low_fp():
    h = np.arange(1, 3000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    bits = _ck_build(h, m_bits=1 << 17)
    assert _ck_contains(bits, h, 1 << 17).all()
    other = np.arange(5 * 10**6, 5 * 10**6 + 3000, dtype=np.uint64)
    fp = _ck_contains(bits, other, 1 << 17).mean()
    assert fp < 0.01, fp


def test_incremental_build_and_membership(spark):
    filt = SeenFilter("bloom", n_shards=4, m_bits=1 << 14)
    df1 = spark.range(0, 500).select(F.xxhash64("id").alias("url_hash"))
    shards1 = filt.build(df1)
    rows1 = shards1.collect()
    assert {r["shard"] for r in rows1} <= {0, 1, 2, 3}

    df2 = spark.range(500, 600).select(F.xxhash64("id").alias("url_hash"))
    shards2 = filt.build(df2, existing_df=shards1).collect()

    both = spark.range(0, 600).select(F.xxhash64("id").alias("url_hash"))
    flags = both.withColumn(
        "m", filt.might_contain_col(shards2, F.col("url_hash"))).collect()
    assert all(r["m"] for r in flags)  # no false negatives, incl. old keys


def test_cuckoo_overflow_raises():
    h = np.arange(1, 20000, dtype=np.uint64)
    with pytest.raises(RuntimeError):
        _ck_build(h, m_bits=1 << 10)  # way over capacity


def test_sharded_probe_reads_flat_legacy_layout(spark, tmp_path):
    """A store written before seen_shards was shard-partitioned keeps flat
    parquet files with a `shard` column; the per-shard blob reader must
    still find prior bits there (a silently-missing blob would become
    Bloom false negatives and break the exactness contract)."""
    from pyspark.sql import functions as F

    from crawlspark.frontier.seen import SeenFilter, _read_shard_blob

    filt = SeenFilter("bloom", n_shards=4, m_bits=1 << 12)
    df = spark.createDataFrame([(i,) for i in range(500)], "url_hash long")
    shards = filt.build(df)
    flat_dir = str(tmp_path / "flat")
    shards.write.parquet(flat_dir)           # legacy: NOT partitionBy(shard)

    for s in range(4):
        blob = _read_shard_blob([flat_dir], s)
        assert blob is not None and blob.any(), s

    # and the sharded probe over that legacy dir flags every inserted hash
    probed = filt.might_contain_sharded(df, "url_hash", [flat_dir])
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_incremental_dirs_only_keeps_untouched_shards(spark, tmp_path):
    """build(existing_dirs=..., existing_df=None): shards that receive no
    new hashes this round must STILL appear in the rebuilt table with
    their prior bits (round-2 ADVICE: they were silently dropped, a
    future Bloom-false-negative hazard)."""
    filt = SeenFilter("bloom", n_shards=4, m_bits=1 << 12)
    df = spark.createDataFrame([(i,) for i in range(400)], "url_hash long")
    prior_dir = str(tmp_path / "prior")
    filt.build(df).write.partitionBy("shard").parquet(prior_dir)

    # one new hash touching exactly one shard
    new = spark.createDataFrame([(100_003,)], "url_hash long")
    rebuilt = filt.build(new, existing_dirs=[prior_dir]).collect()
    assert {r["shard"] for r in rebuilt} == {0, 1, 2, 3}

    # no false negatives over old AND new keys
    both = spark.createDataFrame([(i,) for i in range(400)] + [(100_003,)],
                                 "url_hash long")
    flags = both.withColumn(
        "m", filt.might_contain_col(rebuilt, F.col("url_hash"))).collect()
    assert all(r["m"] for r in flags)
