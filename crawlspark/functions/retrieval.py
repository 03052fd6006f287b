"""BM25 top-k retrieval over the documents table — keyword search as a
DataFrame plan.

Okapi BM25 (Robertson/Sparck Jones; the Lucene-default scoring family):

    score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
                             ─────────────────────────────────
                             tf(t,d) + k1·(1 − b + b·dl(d)/avgdl)
    idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Scale shape: the corpus-side work is the same two hash-agg shuffles the
TF-IDF operator already pays (doc-term tf, per-doc dl); the QUERY side is
broadcast — query terms join into the tf table so only matching doc-terms
survive into scoring, df is computed only for query terms (tiny), and the
final per-query ranking partitions by query_id. Nothing corpus-sized is
ever shuffled by anything but a 8-byte-ish (doc, term-hash) key, and no
Python runs anywhere.

Float discipline (driver-contract rule): per-(query, doc) scores sum ≤ a
handful of per-term doubles and are rounded to 6 dp BEFORE ranking on both
the Spark and the oracle side, with doc_id as the final tiebreak — the
same convention as tfidf_top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import ws_tokens


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 5,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``queries``: (query_id, term) rows — distinct terms per query.
    Returns (query_id, doc_id, score, rank) with rank ≤ k per query,
    ordered by (rounded score desc, doc_id asc)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(ws_tokens(F.col(text_col)),
                              lambda t: F.lower(t))).alias("term"))
    # tf persisted: three consumers (dl derivation, df agg, scoring join)
    # would otherwise each re-run the corpus explode+agg (SURVEY §4
    # multi-consumer rule); dl = Σ tf per doc, no second explode
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")).persist())
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    # one tiny collect: corpus cardinality + total tokens (2 longs)
    row = dl.agg(F.count(F.lit(1)).alias("n"),
                 F.sum("dl").alias("tot")).first()
    n, avgdl = int(row["n"]), float(row["tot"]) / float(row["n"])

    q = queries.select("query_id", "term").distinct()
    # df only for query terms: tf ⋈ broadcast(distinct query terms)
    qterms = q.select("term").distinct()
    dfreq = (tf.join(F.broadcast(qterms), "term")
             .groupBy("term").agg(F.count(F.lit(1)).alias("df")))

    idf = F.log(F.lit(1.0)
                + (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom

    scored = (tf.join(F.broadcast(q), "term")
              .join(F.broadcast(dfreq), "term")
              .join(dl, "doc_id")
              .groupBy("query_id", "doc_id")
              .agg(F.round(F.sum(term_score), 6).alias("score")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("score"), F.asc("doc_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def postings(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Inverted-index postings: (term, doc_id, tf, positions) with
    0-based token positions as a comma-joined string (deterministically
    sorted; a string rather than array<int> keeps the driver's value-hash
    canonicalizer trivial). ONE corpus shuffle — the (term, doc) hash-agg
    with map-side combine; position lists are per-(term,doc) bounded by
    doc length. This is the indexing complement of bm25_topk: the same
    shuffle shape the full-text index build pays at any scale."""
    from .text import ws_tokens

    tok = docs.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.lower(F.col(text_col))))
        .alias("pos", "term"))
    return (tok.groupBy("term", id_col)
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list("pos")),
                                 lambda x: x.cast("string")), ",")
                 .alias("positions")))
