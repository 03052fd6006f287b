"""Link-graph analytics for frontier prioritization.

A crawl frontier wants authority-aware priorities: the reference's
priority is parent-derived (``priority - 1`` per hop, oracle.py _expand),
which is exactly in-degree-blind. PageRank over the discovered link graph
is the standard upgrade — it needs only the narrow (src, dst) edge table
the engine already materializes per round (children expansion,
engine.py), so it composes with the crawl as a periodic re-prioritization
job.

Fixed-point integer arithmetic throughout (rank is a long in units of
1/scale): every operation is an exact integer add / multiply / floor
divide, so the result is BIT-IDENTICAL regardless of partitioning, sum
order, or engine (Spark vs DuckDB) — no float-accumulation-order hazard
in the driver's value-hash compare, and no rounding contract to keep in
sync. The fixed-point quantization error vs real-valued PageRank is
bounded by iters * n_edges / scale (each floor loses < 1 unit), i.e.
~1e-6 relative at scale=1e12 — far below any ranking-relevant signal.

Scale shape (10^10-edge graph): edges are repartitioned by src ONCE and
lineage-truncated; each iteration is one shuffle-join of the narrow rank
table (node, rank — 16 B/row) against the pre-partitioned edges plus one
groupBy(dst) hash aggregate with map-side partial sums. The dangling-mass
and teleport terms ride a 1-row broadcast. Rank rows localCheckpoint per
iteration — the same lineage-truncation pattern as connected_components
(dedup.py): iterative self-reference compounds the logical plan per round
and Catalyst plan construction, not data, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_fixed_point(edges: DataFrame, n_nodes: int, iters: int = 5,
                         scale: int = 10 ** 12, d_num: int = 85,
                         d_den: int = 100) -> DataFrame:
    """(node, pagerank) over nodes 0..n_nodes-1 after ``iters`` exact
    fixed-point power iterations; damping = d_num/d_den.

    Per iteration, with integer floor division throughout:
      contrib(edge u->v) = (rank(u) * d_num) div (d_den * out_deg(u))
      dangling           = sum(rank(u) : out_deg(u) = 0)
      rank'(v) = tele + (dangling * d_num) div (d_den * n)
                      + sum(contrib over in-edges of v)
      tele     = (scale * (d_den - d_num)) div (d_den * n)

    Self-loops count (a page linking to itself keeps some of its own
    mass); parallel edges are deduplicated. Total mass drifts below
    ``scale`` by the dropped floor remainders — deterministically, the
    same on every engine.
    """
    if n_nodes <= 0:
        raise ValueError("n_nodes must be positive")
    if not (0 < d_num < d_den):
        raise ValueError("need 0 < d_num < d_den")
    spark = edges.sparkSession
    e = (edges.select(F.col("src").cast("long").alias("src"),
                      F.col("dst").cast("long").alias("dst"))
         .distinct()
         # partitioned by the per-iteration join key once, reused every
         # round (the rank side is the small, changing one)
         .repartition("src")
         .localCheckpoint(eager=True))
    deg = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .localCheckpoint(eager=True))
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    tele = (scale * (d_den - d_num)) // (d_den * n_nodes)
    r = nodes.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("rank"))
    for _ in range(iters):
        dang = (r.join(deg, r["node"] == deg["src"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0))
                     .cast("long").alias("dang")))
        contrib = F.expr(f"(rank * {d_num}) div ({d_den} * deg)")
        inflow = (e.join(deg, "src")
                  .join(r.withColumnRenamed("node", "src"), "src")
                  .groupBy("dst")
                  .agg(F.sum(contrib).cast("long").alias("inflow")))
        dang_share = F.expr(f"(dang * {d_num}) div ({d_den} * {n_nodes})")
        r = (nodes
             .join(inflow.withColumnRenamed("dst", "node"), "node", "left")
             .crossJoin(F.broadcast(dang))
             .select("node",
                     (F.lit(tele) + dang_share
                      + F.coalesce(F.col("inflow"), F.lit(0)))
                     .cast("long").alias("rank"))
             .localCheckpoint(eager=True))
    return r.select("node", F.col("rank").alias("pagerank"))


def pagerank_sql(edges_sql: str, n_nodes: int, iters: int = 5,
                 scale: int = 10 ** 12, d_num: int = 85,
                 d_den: int = 100) -> str:
    """The ANSI-SQL twin of pagerank_fixed_point: an unrolled CTE chain
    (one dangling + inflow + rank CTE per iteration) DuckDB evaluates
    independently — a true differential oracle, not a replay. Exact
    integer arithmetic makes the two bit-identical; the only cross-engine
    care is DuckDB's SUM(BIGINT) -> HUGEINT widening (CAST back) and its
    ``//`` floor division matching Spark's ``div`` on the all-positive
    domain here.

    ``edges_sql``: a SELECT producing DISTINCT (src BIGINT, dst BIGINT).
    """
    tele = (scale * (d_den - d_num)) // (d_den * n_nodes)
    parts = [
        f"WITH edges AS ({edges_sql}),\n"
        f"nodes AS (SELECT CAST(range AS BIGINT) AS node "
        f"FROM range({n_nodes})),\n"
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM edges GROUP BY src),\n"
        f"r0 AS (SELECT node, CAST({scale // n_nodes} AS BIGINT) AS rank "
        "FROM nodes)"
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f",\nd{i} AS (SELECT COALESCE(CAST(SUM(r.rank) AS BIGINT), 0)"
            f" AS dang\n"
            f"  FROM r{p} r LEFT JOIN deg g ON r.node = g.src"
            f" WHERE g.src IS NULL),\n"
            f"in{i} AS (SELECT e.dst AS node,\n"
            f"    CAST(SUM((r.rank * {d_num}) // ({d_den} * g.deg))"
            f" AS BIGINT) AS inflow\n"
            f"  FROM edges e JOIN deg g ON e.src = g.src"
            f" JOIN r{p} r ON e.src = r.node\n"
            f"  GROUP BY e.dst),\n"
            f"r{i} AS (SELECT n.node,\n"
            f"    CAST({tele} + ((SELECT dang FROM d{i}) * {d_num})"
            f" // ({d_den} * {n_nodes})\n"
            f"         + COALESCE(i.inflow, 0) AS BIGINT) AS rank\n"
            f"  FROM nodes n LEFT JOIN in{i} i ON n.node = i.node)")
    parts.append(
        f"\nSELECT node, rank AS pagerank FROM r{iters} ORDER BY node")
    return "".join(parts)


def hits_fixed_point(edges: DataFrame, n_nodes: int, iters: int = 4,
                     scale: int = 10 ** 9) -> DataFrame:
    """(node, hub, authority) after ``iters`` exact integer HITS
    (Kleinberg 1999, public) iterations with L1 normalization:

        a_raw(v) = Σ hub(u)  over in-edges u→v
        auth(v)  = a_raw(v)·scale div Σ a_raw      (0 if the total is 0)
        h_raw(u) = Σ auth(v) over out-edges u→v
        hub(u)   = h_raw(u)·scale div Σ h_raw

    Every step is integer add / floor-div, so the DuckDB unrolled-CTE
    twin (hits_sql) is bit-identical — same discipline as
    pagerank_fixed_point. Overflow bound: after L1 normalization the
    score vector sums to ≤ scale, so any raw mass ≤ scale and
    raw·scale ≤ scale² — keep scale ≤ 3·10^9 to stay inside int64.

    Scale shape: per iteration, two keyed (long,long) aggregations over
    the edge table (repartitioned by its join key ONCE, reused every
    round) + a 1-row total broadcast; rank rows localCheckpoint per
    iteration (iterative self-reference compounds the logical plan).
    """
    if n_nodes <= 0:
        raise ValueError("n_nodes must be positive")
    if iters < 1:
        raise ValueError("need at least one iteration")
    if scale * scale >= 2 ** 63:
        raise ValueError("scale too large for the int64 overflow bound")
    spark = edges.sparkSession
    e = (edges.select(F.col("src").cast("long").alias("src"),
                      F.col("dst").cast("long").alias("dst"))
         .distinct()
         .repartition("src")
         .localCheckpoint(eager=True))
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    h = nodes.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("score"))

    def _norm(raw: DataFrame) -> DataFrame:
        total = raw.agg(F.coalesce(F.sum("raw"), F.lit(0))
                        .cast("long").alias("t"))
        return (nodes.join(raw, "node", "left")
                .crossJoin(F.broadcast(total))
                .select("node",
                        F.expr(f"CASE WHEN t > 0 THEN "
                               f"(coalesce(raw, 0) * {scale}) div t "
                               f"ELSE 0 END").cast("long").alias("score"))
                .localCheckpoint(eager=True))

    a = None
    for _ in range(iters):
        a = _norm(e.join(h.withColumnRenamed("node", "src"), "src")
                  .groupBy("dst").agg(F.sum("score").cast("long")
                                      .alias("raw"))
                  .withColumnRenamed("dst", "node"))
        h = _norm(e.join(a.withColumnRenamed("node", "dst"), "dst")
                  .groupBy("src").agg(F.sum("score").cast("long")
                                      .alias("raw"))
                  .withColumnRenamed("src", "node"))
    return (h.withColumnRenamed("score", "hub")
            .join(a.withColumnRenamed("score", "authority"), "node"))


def hits_sql(edges_sql: str, n_nodes: int, iters: int = 4,
             scale: int = 10 ** 9) -> str:
    """SQL twin of hits_fixed_point: unrolled CTE chain (raw, total,
    normalized per side per iteration) — a true differential oracle.
    ``edges_sql``: a SELECT producing DISTINCT (src BIGINT, dst BIGINT).

    Every CTE is ``AS MATERIALIZED``: DuckDB inlines plain CTEs per
    REFERENCE, and each normalization level here references the previous
    one ~3× (raw join + total), so un-materialized the evaluation tree
    grows ~9^iters — a 7-edge graph at 4 iterations ran for minutes.
    Materialization makes it one evaluation per level, like the Spark
    side's per-iteration localCheckpoint. The total rides a CROSS JOIN
    (one reference) instead of twin scalar subqueries."""
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql}),\n"
        f"nodes AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS node "
        f"FROM range({n_nodes})),\n"
        f"h0 AS MATERIALIZED (SELECT node, "
        f"CAST({scale // n_nodes} AS BIGINT) AS score FROM nodes)"
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(
            f",\nar{i} AS MATERIALIZED (SELECT e.dst AS node, "
            f"CAST(SUM(h.score) AS BIGINT) AS raw\n"
            f"  FROM edges e JOIN h{p} h ON e.src = h.node GROUP BY e.dst),\n"
            f"at{i} AS MATERIALIZED (SELECT "
            f"COALESCE(CAST(SUM(raw) AS BIGINT), 0) AS t FROM ar{i}),\n"
            f"a{i} AS MATERIALIZED (SELECT n.node, "
            f"CAST(CASE WHEN t.t > 0 THEN (COALESCE(r.raw, 0) * {scale})"
            f" // t.t ELSE 0 END AS BIGINT) AS score\n"
            f"  FROM nodes n LEFT JOIN ar{i} r ON n.node = r.node"
            f" CROSS JOIN at{i} t),\n"
            f"hr{i} AS MATERIALIZED (SELECT e.src AS node, "
            f"CAST(SUM(a.score) AS BIGINT) AS raw\n"
            f"  FROM edges e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),\n"
            f"ht{i} AS MATERIALIZED (SELECT "
            f"COALESCE(CAST(SUM(raw) AS BIGINT), 0) AS t FROM hr{i}),\n"
            f"h{i} AS MATERIALIZED (SELECT n.node, "
            f"CAST(CASE WHEN t.t > 0 THEN (COALESCE(r.raw, 0) * {scale})"
            f" // t.t ELSE 0 END AS BIGINT) AS score\n"
            f"  FROM nodes n LEFT JOIN hr{i} r ON n.node = r.node"
            f" CROSS JOIN ht{i} t)")
    parts.append(
        f"\nSELECT h.node, h.score AS hub, a.score AS authority\n"
        f"FROM h{iters} h JOIN a{iters} a ON h.node = a.node")
    return "".join(parts)


def anchor_text_summary(links: DataFrame, k: int = 3,
                        src_col: str = "src", dst_col: str = "dst",
                        anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor-text rollup — the classic crawl/indexing signal
    (the anchor words OTHER pages use for a URL describe it better than
    its own content; public lore since Brin & Page 1998 §2.2). For every
    dst: total in-links and the top-k anchor TERMS by frequency (ties:
    term asc): (dst, term, tf, term_rank, n_inlinks).

    Scale shape: one explode of anchor tokens → ONE (dst, term) hash-agg
    (map-side combine), one (dst) inlink count agg, a per-dst window over
    that dst's DISTINCT terms only, and an aggregated-table equi-join —
    nothing touches raw links twice without combining first.
    """
    from pyspark.sql import Window
    from .text import ws_tokens

    terms = (links
             .select(F.col(dst_col).alias("dst"),
                     F.explode(ws_tokens(F.lower(F.col(anchor_col))))
                     .alias("term"))
             .groupBy("dst", "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    w = Window.partitionBy("dst").orderBy(F.col("tf").desc(),
                                          F.col("term").asc())
    top = (terms.withColumn("term_rank",
                            F.row_number().over(w).cast("int"))
           .filter(F.col("term_rank") <= k))
    inlinks = (links.groupBy(F.col(dst_col).alias("dst"))
               .agg(F.count(F.lit(1)).alias("n_inlinks")))
    return top.join(inlinks, "dst")
