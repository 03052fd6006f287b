"""with_global_cumsum (distributed exclusive prefix sum) and sequence
packing. The driver entries (pack_sequences, pack_blocks) pin the DuckDB
differential; these pin the invariants and edge semantics."""

from pyspark.sql import functions as F

from crawlspark.functions.packing import explode_blocks, pack_sequences
from crawlspark.plans.ordering import with_global_cumsum


def test_cumsum_matches_serial(spark):
    rows = [(i, (i * 37 + 11) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r.k: r.cs for r in
           with_global_cumsum(df, [F.col("k").asc()], "v", out="cs").collect()}
    acc = 0
    for k, v in rows:          # already in k order
        assert out[k] == acc, k
        acc += v


def test_cumsum_is_exclusive_and_partition_invariant(spark):
    df = spark.createDataFrame([(3, 10), (1, 5), (2, 7)], ["k", "v"])
    for p in (1, 2, 7):
        got = {r.k: r.cs for r in with_global_cumsum(
            df.repartition(p), [F.col("k").asc()], "v",
            out="cs", num_partitions=p).collect()}
        assert got == {1: 0, 2: 5, 3: 12}, p


def test_cumsum_empty(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert with_global_cumsum(df, [F.col("k").asc()], "v").count() == 0


def test_pack_straddle_and_mass(spark):
    docs = spark.createDataFrame(
        [(1, "a " * 6), (2, "b " * 3), (3, "c " * 4)], ["doc_id", "text"])
    p = {r.doc_id: r for r in
         pack_sequences(docs, block_tokens=4).collect()}
    # stream: doc1 toks 0-5, doc2 6-8, doc3 9-12; blocks of 4
    assert (p[1].offset, p[1].block_start, p[1].block_end,
            p[1].n_blocks) == (0, 0, 1, 2)
    assert (p[2].offset, p[2].block_start, p[2].block_end) == (6, 1, 2)
    assert (p[3].offset, p[3].block_start, p[3].block_end) == (9, 2, 3)

    eb = explode_blocks(pack_sequences(docs, block_tokens=4), 4)
    rows = {(r.block_id, r.doc_id): (r.tok_start, r.tok_end)
            for r in eb.collect()}
    # block-local [start, end) spans; mass per doc == n_tokens
    assert rows[(0, 1)] == (0, 4) and rows[(1, 1)] == (0, 2)
    assert rows[(1, 2)] == (2, 4) and rows[(2, 2)] == (0, 1)
    assert sum(e - s for s, e in rows.values()) == 13
    # within each block, spans tile without overlap
    for b in (0, 1, 2, 3):
        spans = sorted(v for (bid, _), v in rows.items() if bid == b)
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2


def test_pack_drops_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "   "), (3, "")], ["doc_id", "text"])
    got = [r.doc_id for r in pack_sequences(docs, block_tokens=8).collect()]
    assert got == [1]
