"""connected_components / dedup_keep_canonical vs a pure-Python union-find.

The Spark side is alternating large-star/small-star (Kiveris et al.
SoCC'14); the mirror here is a textbook union-find — independent algorithm,
identical answer: every node labeled with the min id of its component.
"""

import random

import pytest
from pyspark.sql import functions as F

from crawlspark.functions.dedup import (connected_components,
                                        dedup_keep_canonical)


def uf_components(edges):
    """min-label components via union-find (path compression + rank)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


def spark_components(spark, edges):
    if not edges:
        pairs = spark.createDataFrame([], "left_id long, right_id long")
    else:
        pairs = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], ["left_id", "right_id"])
    out = connected_components(pairs)
    return {r["node"]: r["component"] for r in out.collect()}


def test_empty(spark):
    assert spark_components(spark, []) == {}


def test_single_edge(spark):
    assert spark_components(spark, [(5, 3)]) == {3: 3, 5: 3}


def test_self_loops_and_duplicates(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (7, 7)]
    got = spark_components(spark, edges)
    # self-loop-only nodes never enter the graph; (2,3) is one component
    assert got == {2: 2, 3: 2}


def test_chain_worst_case_diameter(spark):
    """A 64-node path: naive min-label propagation needs 63 rounds;
    star-contraction must finish well inside max_iters=50 (O(log n))."""
    edges = [(i, i + 1) for i in range(63)]
    got = spark_components(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_two_components_and_star(spark):
    edges = [(10, 11), (11, 12), (20, 21), (22, 21), (23, 21)]
    got = spark_components(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


@pytest.mark.parametrize("seed,n,m", [(0, 40, 30), (1, 100, 60),
                                      (2, 200, 300), (3, 50, 120)])
def test_random_graphs_match_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    want = uf_components([e for e in edges if e[0] != e[1]])
    assert spark_components(spark, edges) == want


def test_reversed_and_unordered_edges_agree(spark):
    edges = [(4, 9), (9, 4), (9, 2), (2, 7)]
    got = spark_components(spark, edges)
    assert got == {2: 2, 4: 2, 7: 2, 9: 2}


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], ["left_id", "right_id"])
    out = dedup_keep_canonical(docs, pairs).orderBy("doc_id").collect()
    comp = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in out}
    assert comp == {0: (0, True), 1: (1, True), 2: (2, True),
                    3: (1, False), 4: (4, True), 5: (1, False),
                    6: (6, True), 7: (6, False)}
    kept = [r["doc_id"] for r in out if r["is_canonical"]]
    assert kept == [0, 1, 2, 4, 6]


def test_components_output_partition_shape(spark):
    """The result must be derivable without collecting the graph: check
    the plan has no driver-side loop remnants (pure DataFrame ops) by
    asserting it is still lazy/executable and unions cleanly."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["left_id", "right_id"])
    out = connected_components(pairs)
    # reuse twice (members + roots both read the persisted edge set)
    assert out.count() == 3
    assert out.agg(F.min("component")).collect()[0][0] == 1


def test_string_node_ids(spark):
    """String ids pass through untyped (image_id clustering): min-id
    canonicals follow binary string order, the schema stays string, and
    an empty pair set yields an empty string-typed frame."""
    pairs = spark.createDataFrame(
        [("img02", "img05"), ("img05", "img01"), ("imgZZ", "img09_v")],
        ["left_id", "right_id"])
    out = connected_components(pairs)
    assert dict(out.dtypes) == {"node": "string", "component": "string"}
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp == {"img01": "img01", "img02": "img01", "img05": "img01",
                    "img09_v": "img09_v", "imgZZ": "img09_v"}
    empty = connected_components(pairs.limit(0))
    assert dict(empty.dtypes) == {"node": "string", "component": "string"}
    assert empty.count() == 0
