"""pagerank_fixed_point: exact fixed-point mirror, float sanity, DuckDB
oracle bit-equality, dangling/teleport edge cases."""

import duckdb
import numpy as np
import pytest

from crawlspark.functions.graph import pagerank_fixed_point, pagerank_sql

SCALE = 10 ** 12


def py_pagerank_fp(edges, n, iters=5, scale=SCALE, d_num=85, d_den=100):
    """Independent pure-Python fixed-point mirror (dict arithmetic)."""
    e = sorted(set((int(s), int(d)) for s, d in edges))
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    tele = (scale * (d_den - d_num)) // (d_den * n)
    r = {v: scale // n for v in range(n)}
    for _ in range(iters):
        dang = sum(rv for v, rv in r.items() if v not in deg)
        inflow = {v: 0 for v in range(n)}
        for s, d in e:
            inflow[d] += (r[s] * d_num) // (d_den * deg[s])
        share = (dang * d_num) // (d_den * n)
        r = {v: tele + share + inflow[v] for v in range(n)}
    return r


def _spark_pr(spark, edges, n, iters=5):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank_fixed_point(df, n, iters=iters)
    return {row["node"]: row["pagerank"] for row in out.collect()}


def test_matches_python_mirror_small(spark):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0)]  # 4 nodes, no dangling? 3 has out-edge
    got = _spark_pr(spark, edges, 4)
    assert got == py_pagerank_fp(edges, 4)


def test_dangling_node_mass_redistributed(spark):
    # node 2 has no out-edges: its mass must come back via the dangling
    # share, not vanish
    edges = [(0, 1), (1, 2)]
    got = _spark_pr(spark, edges, 3)
    exp = py_pagerank_fp(edges, 3)
    assert got == exp
    # total mass stays within iters * (floor losses) of scale
    assert abs(sum(got.values()) - SCALE) < 5 * (len(edges) + 3 + 2)


def test_matches_real_valued_pagerank(spark):
    rng = np.random.RandomState(7)
    n = 40
    edges = sorted(set((int(rng.randint(n)), int(rng.randint(n)))
                       for _ in range(200)))
    got = _spark_pr(spark, edges, n, iters=20)
    # float power iteration with identical semantics (self-consistency of
    # the fixed-point quantization, tolerance ~iters*edges/scale)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        dang = sum(r[v] for v in range(n) if v not in deg)
        nxt = np.full(n, 0.15 / n + 0.85 * dang / n)
        for s, d in edges:
            nxt[d] += 0.85 * r[s] / deg[s]
        r = nxt
    for v in range(n):
        assert abs(got[v] / SCALE - r[v]) < 1e-6


def test_duckdb_oracle_bit_equal(spark):
    """The unrolled-CTE SQL twin computes the identical longs in DuckDB."""
    rng = np.random.RandomState(3)
    n = 64
    edges = sorted(set((int(rng.randint(n)), int(rng.randint(n)))
                       for _ in range(300)))
    got = _spark_pr(spark, edges, n, iters=5)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    sql = pagerank_sql("SELECT DISTINCT src, dst FROM e", n, iters=5)
    oracle = dict(con.execute(sql).fetchall())
    assert got == oracle


def test_empty_and_invalid(spark):
    df = spark.createDataFrame([], "src long, dst long")
    out = {r["node"]: r["pagerank"]
           for r in pagerank_fixed_point(df, 3, iters=2).collect()}
    exp = py_pagerank_fp([], 3, iters=2)
    assert out == exp  # pure teleport + dangling recirculation
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, 0)
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, 3, d_num=100)


def test_hits_matches_duckdb_twin_bit_exact(spark):
    """Spark integer HITS vs the DuckDB unrolled-CTE twin on a small
    asymmetric graph — every (node, hub, authority) triple bit-equal."""
    import duckdb

    from crawlspark.functions.graph import hits_fixed_point, hits_sql

    edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4), (4, 2), (5, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits_fixed_point(df, 8, iters=4).collect())
    sql = hits_sql(
        "SELECT * FROM (VALUES " +
        ", ".join(f"({s}, {d})" for s, d in edges) + ") AS t(src, dst)", 8,
        iters=4)
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
    by_node = {n: (h, a) for n, h, a in got}
    assert by_node[2][1] > by_node[1][1]      # 2 is the authority hub-magnet
    assert by_node[0][0] > by_node[3][0]      # 0 points at more mass than 3
    assert by_node[6] == (0, 0) and by_node[7] == (0, 0)  # isolated
    # L1 normalization: each side sums to ~scale (floor drift only)
    assert sum(h for h, _ in by_node.values()) <= 10 ** 9
    assert sum(h for h, _ in by_node.values()) > 10 ** 9 - 8


def test_hits_guards(spark):
    import pytest as _pt

    from crawlspark.functions.graph import hits_fixed_point
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with _pt.raises(ValueError, match="iteration"):
        hits_fixed_point(df, 2, iters=0)
    with _pt.raises(ValueError, match="overflow"):
        hits_fixed_point(df, 2, scale=4 * 10 ** 9)
    with _pt.raises(ValueError, match="positive"):
        hits_fixed_point(df, 0)


def test_anchor_text_summary_topk(spark):
    from crawlspark.functions.graph import anchor_text_summary
    rows = [("s1", "d1", "Best Cat pictures"),
            ("s2", "d1", "cat PICTURES here"),
            ("s3", "d1", "dog pictures"),
            ("s4", "d2", "one two")]
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    out = {(r["dst"], r["term_rank"]): (r["term"], r["tf"], r["n_inlinks"])
           for r in anchor_text_summary(df, k=2).collect()}
    assert out[("d1", 1)] == ("pictures", 3, 3)
    assert out[("d1", 2)] == ("cat", 2, 3)
    assert out[("d2", 1)] == ("one", 1, 1)   # tie of 1s: term asc
    assert out[("d2", 2)] == ("two", 1, 1)
    assert len(out) == 4
