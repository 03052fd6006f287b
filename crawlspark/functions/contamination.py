"""Benchmark decontamination — flag training docs sharing n-grams with an
eval/benchmark set.

The standard LLM-pipeline hygiene pass: any training document that
contains an n-gram (token window) also present in a held-out benchmark
document is contaminated and must be dropped or flagged before training.

Scale shape (100 TB corpus, benchmark sets are small — thousands of
docs): the benchmark gram set is built once, deduplicated, and BROADCAST;
the corpus side explodes its grams and probes the broadcast hash set —
one scan of the corpus, no corpus-scale shuffle at all. The only
exchanges carry contamination HITS (post-probe), which are ≈0 rows for a
clean corpus — the per-doc distinct/aggregate runs after the probe, never
over the raw gram stream.
Grams travel as xxhash64 longs, never strings — 8 B/gram instead of
~50 B. Tokenization = the shared lowercased whitespace tokens
(functions/text.ws_tokens), so fingerprints line up with the dedup
family's shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import ws_tokens


def ngram_array(text_col: Column, n: int) -> Column:
    """All n-token windows of the lowercased whitespace tokens, joined by
    a single space; < n tokens => empty array."""
    toks = F.transform(ws_tokens(text_col), lambda t: F.lower(t))
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def contamination(docs: DataFrame, bench: DataFrame, n: int = 8,
                  doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """(doc_id, n_hits, contaminated) for every ``docs`` row: n_hits =
    count of DISTINCT n-grams the doc shares with any ``bench`` doc.
    Docs with no overlap are kept with n_hits = 0 (the caller decides the
    drop policy; an inner-join result would hide the clean majority).
    """
    bench_grams = (bench
                   .select(F.explode(ngram_array(F.col(text), n))
                           .alias("gram"))
                   .select(F.xxhash64("gram").alias("gh"))
                   .distinct())
    # Broadcast-probe FIRST, dedup SECOND: the (doc_id, gh) distinct needs
    # a shuffle, and run before the bench filter it would carry the FULL
    # corpus gram set; after the map-side broadcast join it carries only
    # contamination hits (≈0 rows for a clean corpus). Equivalent result:
    # bench_grams is distinct, so the 1:1 join preserves per-doc gram
    # multiplicity and distinct-after == distinct-before ∩ bench.
    hits = (docs
            .select(doc_id,
                    F.explode(ngram_array(F.col(text), n)).alias("gram"))
            .select(doc_id, F.xxhash64("gram").alias("gh"))
            .join(F.broadcast(bench_grams), "gh")
            .distinct()
            .groupBy(doc_id)
            .agg(F.count(F.lit(1)).alias("n_hits")))
    return (docs.select(doc_id)
            .join(hits, doc_id, "left")
            .select(doc_id,
                    F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
                    (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
                    .alias("contaminated")))
