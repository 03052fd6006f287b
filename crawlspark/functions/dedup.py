"""Deduplication operators over the documents / embeddings / images tables.

Five dedup families, each designed for the 100 TB shape (candidate
generation by bucket-join, never all-pairs):

  exact_dedup        — hash-groupBy on md5(text); keeps min doc_id.
  minhash_lsh        — word-shingle → 64-perm MinHash (numpy, one Arrow
                       batch per partition) → banding (b bands × r rows) →
                       bucket equi-join → candidate pairs → exact Jaccard
                       verify. Classic Broder MinHash + LSH banding.
  simhash            — 64-bit SimHash over token hashes (Charikar);
                       candidate pairs via 4×16-bit chunk equality (any pair
                       within Hamming distance 3 shares ≥1 exact chunk —
                       pigeonhole), verified by popcount.
  ngram_jaccard      — exact word-3-gram Jaccard for candidate pairs
                       (array_intersect/array_union, JVM-side).
  embedding_neardup  — cosine ≥ τ pairs over embeddings; bucketed by an
                       LSH sign-hash to avoid all-pairs (exact verify).
  phash_dedup        — images whose 64-bit perceptual hash match exactly
                       (the phash column of the input_hint table).

Self-join convention: pairs are emitted once with left_id < right_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..hashing import mix64

def _fan_out(df: DataFrame, key: str) -> DataFrame:
    """Spread a too-few-partitions input (e.g. one unsplittable parquet
    row group — Spark can split files only at row-group boundaries) across
    the session's parallelism before the heavy per-doc gram/hash work.
    No-op when the scan already has enough partitions, so at scale (many
    splits) this adds no shuffle."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, key)
    return df


# -- exact ---------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id + duplicate count."""
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


def exact_dup_pairs(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    a = docs.select(F.col(id_col).alias("left_id"),
                    F.md5(F.col(text_col)).alias("h"))
    b = docs.select(F.col(id_col).alias("right_id"),
                    F.md5(F.col(text_col)).alias("h"))
    return (a.join(b, "h")
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id"))


# -- shingles + exact Jaccard (JVM-side) ----------------------------------------

def word_ngrams(c, n: int = 3):
    """Distinct, sorted word n-grams of a text column (array<string>).
    A doc shorter than n yields its whole token string as the single gram.
    The token array is let-bound via a single-element transform so the
    split runs once per row, not once per gram (interpreted HOF eval
    re-executes lambda-body subexpressions per element)."""
    def _grams(toks):
        n_grams = F.greatest(F.size(toks) - n + 1, F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.array_join(F.slice(toks, i, n), " "))

    grams = F.element_at(
        F.transform(F.array(F.split(F.lower(F.trim(c)), r"\s+")), _grams), 1)
    return F.array_sort(F.array_distinct(grams))


def jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        candidates: DataFrame | None = None,
                        materialize: bool = True) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold pairs. Without a candidate set this
    prunes by a shared-first-gram bucket join (cheap candidate generation:
    near-identical docs share their first shingle); with `candidates`
    (left_id, right_id) it verifies those pairs exactly."""
    with_grams = (_fan_out(docs, id_col)
                  .select(F.col(id_col).alias("id"),
                          word_ngrams(F.col(text_col), n).alias("grams")))
    if materialize:
        # The gram projection feeds THREE consumers (the df-stats explode
        # and both verify join sides). Unmaterialized, Spark re-scans the
        # corpus and recomputes every doc's gram array per consumer — and
        # the explode's inferred size(grams)>0 predicate is pushed into the
        # scan, so an unsplittable small-file scan pays the full gram
        # compute serially on ONE task (measured: 2 single-task stages =
        # half the sf0.1 wall). One MEMORY_AND_DISK materialization is
        # strictly less work at any scale; persist (not checkpoint) keeps
        # lineage for block-loss recompute, and the ContextCleaner frees
        # the blocks when the plan is garbage-collected.
        with_grams = with_grams.persist()
    if candidates is None:
        # Candidate buckets = each doc's K RAREST grams (min document
        # frequency, lexicographic tiebreak) — prefix filtering. Rare grams
        # give near-uniform tiny buckets; a common-first-gram bucket
        # degenerates into one giant bucket on repetitive corpora
        # (quadratic pair blowup). The gram-frequency pass is one extra
        # shuffle — the standard prefix-filter statistics step; near-dup
        # pairs share one of their K rarest grams with high probability
        # (and the oracle mirrors the scheme exactly).
        k_rarest = 5
        exploded = with_grams.select("id", F.explode("grams").alias("gram"))
        gram_df = exploded.groupBy("gram").agg(F.count("*").alias("df"))
        # K smallest (df, gram) per doc via hash-agg (collect_list is
        # bounded by the doc's gram count) — same selection as a
        # row_number window over (df, gram) but without the per-partition
        # SORT a window imposes on the whole exploded×df join
        buckets = (exploded.join(gram_df, "gram")
                   .groupBy("id")
                   .agg(F.slice(F.array_sort(F.collect_list(
                       F.struct("df", "gram"))), 1, k_rarest)
                       .alias("_rare"))
                   .select("id", F.explode("_rare.gram").alias("bucket")))
        a = buckets.select(F.col("id").alias("left_id"), "bucket")
        b = buckets.select(F.col("id").alias("right_id"), "bucket")
        cand = (a.join(b, "bucket")
                .filter(F.col("left_id") < F.col("right_id"))
                .select("left_id", "right_id").distinct())
        pairs = (cand
                 .join(with_grams.select(F.col("id").alias("left_id"),
                                         F.col("grams").alias("lg")),
                       "left_id")
                 .join(with_grams.select(F.col("id").alias("right_id"),
                                         F.col("grams").alias("rg")),
                       "right_id"))
    else:
        pairs = (candidates
                 .join(with_grams.withColumnRenamed("id", "left_id")
                       .withColumnRenamed("grams", "lg"), "left_id")
                 .join(with_grams.withColumnRenamed("id", "right_id")
                       .withColumnRenamed("grams", "rg"), "right_id"))
    return (pairs
            .withColumn("jaccard", F.round(jaccard(F.col("lg"),
                                                   F.col("rg")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("left_id", "right_id", "jaccard"))


# -- MinHash + LSH ----------------------------------------------------------------

N_PERM = 64


def _minhash_batch(hash_arrays, n_perm: int) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signatures from per-doc gram-hash
    arrays — fully numpy-vectorized (the per-gram string hashing happens
    JVM-side; empty docs keep the all-max sentinel signature)."""
    seeds = (np.arange(1, n_perm + 1, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    out = np.full((len(hash_arrays), n_perm), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    for i, hashes in enumerate(hash_arrays):
        if hashes is None or len(hashes) == 0:
            continue
        base = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            perms = mix64(base[:, None] ^ seeds[None, :])
        out[i] = perms.min(axis=0)
    return out


def minhash_signatures(docs: DataFrame, n: int = 3, n_perm: int = N_PERM,
                       text_col: str = "text", id_col: str = "doc_id"
                       ) -> DataFrame:
    """id → array<long> MinHash signature (one Arrow batch per partition).

    Shingling AND per-gram hashing are JVM-side (word_ngrams + codegen'd
    xxhash64, seed 42 — bit-equal to crawlspark.hashing.xxh64); Python only
    runs the vectorized per-permutation mix/min, so the hot path ships
    array<long> through Arrow, never strings."""
    with_hashes = _fan_out(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.transform(word_ngrams(F.col(text_col), n),
                    lambda g: F.xxhash64(g)).alias("gram_hashes"))

    def sig(batches):
        for pdf in batches:
            sigs = _minhash_batch(list(pdf["gram_hashes"]), n_perm)
            yield pd.DataFrame({
                "id": pdf["id"],
                "sig": [row.astype(np.int64).tolist() for row in sigs],
            })

    return with_hashes.mapInPandas(sig, "id long, sig array<long>")


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.7,
                      n: int = 3, bands: int = 16,
                      text_col: str = "text", id_col: str = "doc_id"
                      ) -> DataFrame:
    """Candidate pairs via LSH banding, verified by exact n-gram Jaccard.

    bands=16 × rows=4 over 64 perms ⇒ collision prob ≈ 1-(1-s^4)^16 — steep
    around s≈0.6. The band bucket join is the only shuffle that scales with
    corpus size; verification touches candidates only.
    """
    rows = N_PERM // bands
    sigs = minhash_signatures(docs, n, N_PERM, text_col, id_col)
    banded = sigs.select(
        "id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.xxhash64(
                F.concat_ws(",", F.transform(
                    F.slice("sig", bnd * rows + 1, rows),
                    lambda v: v.cast("string")),
                    bnd.cast("string"))))).alias("band", "bucket"))
    # banded feeds BOTH self-join sides; unmaterialized, the Arrow
    # signature stage (scan → gram-hash → mapInPandas min/mix) runs once
    # per side. The persisted relation is narrow — (id, band, bucket) =
    # docs × bands rows of three longs — so this is the cheapest point to
    # cut the pipeline in half (same reasoning as ngram_jaccard_pairs'
    # gram materialization; ContextCleaner frees the blocks).
    banded = banded.persist()
    a = banded.select(F.col("id").alias("left_id"), "band", "bucket")
    b = banded.select(F.col("id").alias("right_id"), "band", "bucket")
    cands = (a.join(b, ["band", "bucket"])
             .filter(F.col("left_id") < F.col("right_id"))
             .select("left_id", "right_id").distinct())
    return ngram_jaccard_pairs(docs, threshold, n, text_col, id_col,
                               candidates=cands)


# -- SimHash ----------------------------------------------------------------------

def _simhash_votes_kernel(hashes: pd.Series) -> pd.Series:
    """array<long> token hashes → signed-64 SimHash (per-bit majority vote).

    numpy-vectorized per row: the 64 vote counters come from ONE
    ``unpackbits`` over the hash bytes (little-endian: column j = bit j),
    the final hash from ``packbits`` of the majority mask."""
    out = np.zeros(len(hashes), dtype=np.int64)
    null = np.zeros(len(hashes), dtype=bool)
    for i, hs in enumerate(hashes):
        if hs is None:
            null[i] = True
            continue
        a = np.asarray(hs, dtype=np.int64)
        if a.size == 0:
            continue
        bits = np.unpackbits(a.view(np.uint8).reshape(-1, 8),
                             axis=1, bitorder="little")
        mask = bits.sum(axis=0, dtype=np.int64) * 2 > a.size
        out[i] = np.packbits(mask, bitorder="little").view(np.int64)[0]
    return pd.Series(pd.array(out, dtype="Int64")).mask(null)


def simhash_col(c, n_bits: int = 64):
    """64-bit SimHash from whitespace tokens. Tokenize + per-token xxhash64
    stay JVM-side (codegen); the per-bit majority vote runs in ONE
    Arrow-batched numpy kernel over the hash arrays (_simhash_votes) —
    the minhash pattern (JVM hash, vectorized Python mix).

    Two rejected forms, both measured slower: 64 unrolled vote projections
    re-evaluate the split/transform/xxhash64 subtree per bit (Catalyst does
    not CSE a repeated higher-order-array subtree across projections; 9.2 s
    for sf0.1 docs), and a single JVM ``aggregate`` with a 65-counter
    accumulator is interpreted, not codegen'd, per token (15.7 s). The
    Arrow kernel does the same votes in ~1 s."""
    assert n_bits == 64, "kernel is fixed at 64 bits"
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    # udf built per call: the decorator parses the DDL type, which needs an
    # active session — module import must stay session-free
    votes = F.pandas_udf(_simhash_votes_kernel, "long")
    return votes(F.transform(toks, lambda t: F.xxhash64(t)))


def hamming64_col(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(docs: DataFrame, max_distance: int = 3,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> DataFrame:
    """Pairs within Hamming distance ≤ max_distance. Candidates: 4×16-bit
    chunk buckets (pigeonhole: d≤3 ⇒ ≥1 of 4 chunks equal), then exact
    popcount verify."""
    sh = _fan_out(docs, id_col).select(
        F.col(id_col).alias("id"),
        simhash_col(F.col(text_col)).alias("simhash"))
    chunked = sh.select(
        "id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", 16 * i)
             .bitwiseAND(F.lit(0xFFFF)) for i in range(4)
        ])).alias("chunk_idx", "chunk"))
    a = chunked.select(F.col("id").alias("left_id"),
                       F.col("simhash").alias("lh"), "chunk_idx", "chunk")
    b = chunked.select(F.col("id").alias("right_id"),
                       F.col("simhash").alias("rh"), "chunk_idx", "chunk")
    return (a.join(b, ["chunk_idx", "chunk"])
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id",
                    hamming64_col(F.col("lh"), F.col("rh"))
                    .alias("distance"))
            .distinct()
            .filter(F.col("distance") <= max_distance))


# -- embedding cosine near-dup -------------------------------------------------------

def cosine_sim(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(0.0)


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            n_planes: int = 8, seed: int = 42,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """cosine ≥ τ pairs, bucketed by an n_planes sign-LSH (exact verify).

    Deterministic hyperplanes from mix64(seed) — no RNG state. At τ≥0.95 the
    angle ≤ 18°, so sign agreement on 8 planes has high recall; raise
    n_planes/multi-probe for stricter recall targets.
    """
    from .similarity import signhash_udf
    keyed = emb.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v")) \
               .withColumn("bucket", signhash_udf(n_planes, seed)(F.col("v")))
    a = keyed.select(F.col("id").alias("left_id"), F.col("v").alias("lv"),
                     "bucket")
    b = keyed.select(F.col("id").alias("right_id"), F.col("v").alias("rv"),
                     "bucket")
    cast = lambda c: c.cast("array<double>")
    return (a.join(b, "bucket")
            .filter(F.col("left_id") < F.col("right_id"))
            .withColumn("cosine", F.round(
                cosine_sim(cast(F.col("lv")), cast(F.col("rv"))), 6))
            .filter(F.col("cosine") >= threshold)
            .select("left_id", "right_id", "cosine").distinct())


# -- phash (images) --------------------------------------------------------------------

def phash_dup_pairs(images: DataFrame) -> DataFrame:
    """Image pairs with identical 64-bit perceptual hash (input_hint column)."""
    a = images.select(F.col("image_id").alias("left_id"), "phash")
    b = images.select(F.col("image_id").alias("right_id"), "phash")
    return (a.join(b, "phash")
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id", "phash"))


def phash_near_dup(images: DataFrame, max_distance: int = 3,
                   id_col: str = "image_id") -> DataFrame:
    """Image pairs whose 64-bit perceptual hashes are within Hamming
    distance ``max_distance`` — re-encoded / slightly-perturbed duplicates
    that exact phash equality (phash_dup_pairs) misses.

    Same 100 TB shape as simhash_pairs: pigeonhole candidates (d<=3 => at
    least one of 4 disjoint 16-bit chunks equal) via a chunk-bucket
    equi-join — the only corpus-scale shuffle — then exact popcount verify
    on candidates only. All JVM Column expressions (xxhash-free: the phash
    is already a column of the input_hint images table).
    """
    n_chunks = max_distance + 1
    base = 64 // n_chunks
    # ragged last chunk so the n_chunks disjoint windows cover all 64 bits
    # (pigeonhole needs full coverage: d flipped bits can dirty at most d of
    # the n_chunks = d+1 windows, so one window is always clean)
    widths = [base] * (n_chunks - 1) + [64 - base * (n_chunks - 1)]
    offsets = [base * i for i in range(n_chunks)]
    chunk_exprs = []
    for off, wd in zip(offsets, widths):
        e = F.shiftrightunsigned("phash", off)
        if off + wd < 64:
            e = e.bitwiseAND(F.lit((1 << wd) - 1))
        chunk_exprs.append(e)
    chunked = images.select(
        F.col(id_col).alias("id"), "phash",
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_idx", "chunk"))
    a = chunked.select(F.col("id").alias("left_id"),
                       F.col("phash").alias("lh"), "chunk_idx", "chunk")
    b = chunked.select(F.col("id").alias("right_id"),
                       F.col("phash").alias("rh"), "chunk_idx", "chunk")
    return (a.join(b, ["chunk_idx", "chunk"])
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id",
                    hamming64_col(F.col("lh"), F.col("rh"))
                    .alias("distance"))
            .distinct()
            .filter(F.col("distance") <= max_distance))


# -- connected components (dup-pair graph → clusters) -----------------------------

def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node connects its STRICTLY LARGER neighbors
    to the minimum of its closed neighborhood min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges larger→smaller; every node connects
    its smaller neighbors AND itself to min(N(u))."""
    d = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v")))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (d.join(mins, "u")
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (rewired.union(self_edges)
            .filter(F.col("u") != F.col("v"))
            .distinct())


def connected_components(pairs: DataFrame,
                         left_col: str = "left_id",
                         right_col: str = "right_id",
                         max_iters: int = 50) -> DataFrame:
    """(node, component) for every node of the dup-pair graph, where
    `component` is the smallest node id reachable from `node`.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in O(log n)
    rounds on any graph — NOT O(diameter) like naive min-label propagation,
    so a 10^9-node chain still finishes in ~30 rounds. Each round is two
    keyed shuffles over narrow (long, long) edges; no driver-side graph
    state — the only driver traffic is one (count, hash-sum) fingerprint
    per round for the convergence test, confirmed by an exact set compare
    (count equality + one-direction exceptAll) before returning.

    Every round `localCheckpoint`s the edge set: iterative self-reference
    otherwise compounds the LOGICAL plan ~6× per round (persist() caches
    blocks but not the plan) and Catalyst plan construction OOMs the
    driver near round ~10. Lineage truncation is the documented pattern
    for iterative DataFrame algorithms; on a real cluster with executor
    loss concerns, swap for reliable `checkpoint()` via a checkpoint dir —
    the algorithm is unchanged.

    This is the clustering step the pair generators above feed: near-dup
    PAIRS (minhash/simhash/embedding/phash) are not directly actionable
    for dedup — a keep-one-per-cluster policy needs the transitive closure
    (a~b, b~c ⇒ {a,b,c} one cluster even when a≁c).
    """
    # node ids: any ordered type works (the algorithm only compares /
    # takes minima). Numeric ids are normalized to long (the historical
    # contract); string ids (e.g. image_id) pass through unchanged —
    # min-id canonicals then follow binary string order, which matches
    # DuckDB VARCHAR MIN for the ASCII ids used throughout.
    node_t = dict(pairs.dtypes)[left_col]
    u, v = F.col(left_col), F.col(right_col)
    if node_t != "string":
        node_t = "long"
        u, v = u.cast("long"), v.cast("long")
    e = (pairs.select(u.alias("u"), v.alias("v"))
         .filter(F.col("u") != F.col("v"))
         .distinct())
    spark = pairs.sparkSession

    def _sig(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h")
        ).collect()[0]
        return (row["n"], row["h"])

    e = e.localCheckpoint(eager=True)
    prev_sig = _sig(e)
    if prev_sig[0] == 0:
        return spark.createDataFrame(
            [], f"node {node_t}, component {node_t}")
    for _ in range(max_iters):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _sig(e2)
        if sig == prev_sig and e2.exceptAll(e).isEmpty():
            e = e2
            break
        e, prev_sig = e2, sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")
    # Converged state is a star forest: every non-root points at its
    # component min; roots appear only on the right. groupBy-min is a
    # cheap belt-and-braces normalization (already unique per node here).
    members = (e.select(F.col("u").alias("node"),
                        F.col("v").alias("component"))
               .groupBy("node").agg(F.min("component").alias("component")))
    roots = (e.select(F.col("v").alias("node")).distinct()
             .join(members.select("node"), "node", "left_anti")
             .select("node", F.col("node").alias("component")))
    # e is checkpointed: the lazy result reads its blocks twice (members +
    # roots); the ContextCleaner frees them when the plan is GC'd.
    return members.union(roots)


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         left_col: str = "left_id",
                         right_col: str = "right_id") -> DataFrame:
    """Stamp every doc with its near-dup cluster id (singletons = self) and
    an `is_canonical` flag — keep rows where is_canonical to dedup.

    Canonical = smallest id in the cluster (deterministic, join-free given
    connected_components' min-label convention). The components table is
    tiny relative to the corpus (only docs that matched SOME pair), so the
    join is broadcast-able at any corpus scale where the dup fraction is
    bounded."""
    comp = (connected_components(pairs, left_col, right_col)
            .withColumnRenamed("node", id_col))
    return (docs.join(comp, id_col, "left")
            .withColumn("component",
                        F.coalesce(F.col("component"),
                                   F.col(id_col).cast("long")))
            .withColumn("is_canonical",
                        F.col(id_col).cast("long") == F.col("component")))


def dup_span_removal(docs: DataFrame, span_tokens: int = 16,
                     text_col: str = "text", id_col: str = "doc_id"
                     ) -> DataFrame:
    """Exact-substring dedup spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public): every length-L
    token window that occurs more than once in the corpus keeps only its
    globally-first occurrence (min (doc_id, pos)); each LATER occurrence
    marks its L tokens for removal, and overlapping/adjacent marked
    windows merge into maximal removal spans per document. Output: one
    row per span (doc_id, span_start, span_end, span_tokens) with
    token-index half-open bounds [span_start, span_end).

    This is the suffix-array pass of the paper re-expressed as windows:
    a duplicated substring of length >= L is exactly a run of duplicated
    L-windows, so the merged spans equal the paper's maximal duplicated
    regions (up to the L-1 tail tokens of a run, the standard windowed
    approximation).

    Scale shape: the window table is O(total tokens) rows of
    (doc_id, pos, hash) -- ~20 B/row, strings never leave the scan
    (xxhash64 of the window rides the exchange; a 64-bit collision merges
    two window groups, the same trade as segment_dedup, negligible below
    ~10^9 distinct windows). ONE corpus-scale shuffle keyed by the window
    hash ranks occurrences; only the FLAGGED rows (the duplicated tail,
    tiny on a clean corpus) reach the per-doc island merge, whose window
    is partitioned by doc id -- never unpartitioned.
    """
    from pyspark.sql import Window
    from .text import ws_tokens

    L = int(span_tokens)
    empty = F.array().cast("array<struct<pos:int,h:bigint>>")

    # Single-element-transform "let": bind the token array ONCE per row.
    # Referencing ws_tokens() directly inside the windows lambda inlines
    # the split into the lambda body, where interpreted HOF eval
    # recomputes it PER WINDOW — O(tokens × windows) per doc, a 1000×
    # blowup on 1k-token documents. The outer transform's argument is
    # evaluated once per row; the inner lambda slices the bound array.
    def _windows(t):
        nwin = (F.size(t) - F.lit(L) + F.lit(1)).cast("int")
        return F.when(
            nwin > 0,
            F.transform(
                F.sequence(F.lit(0), nwin - 1),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.xxhash64(F.array_join(F.slice(t, i + 1, L), " "))
                    .alias("h")))
        ).otherwise(empty)

    wins = F.element_at(
        F.transform(F.array(ws_tokens(F.col(text_col))), _windows), 1)

    ex = (docs.select(F.col(id_col), F.explode(wins).alias("w"))
          .select(id_col, F.col("w.pos").alias("pos"),
                  F.col("w.h").alias("h")))
    occ = Window.partitionBy("h").orderBy(id_col, "pos")
    flagged = (ex.withColumn("_rn", F.row_number().over(occ))
               .filter(F.col("_rn") > 1).drop("_rn", "h"))

    perdoc = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(perdoc)
    new_island = F.when(prev.isNull() | (F.col("pos") > prev + F.lit(L)),
                        F.lit(1)).otherwise(F.lit(0))
    islands = (flagged
               .withColumn("_isl", F.sum(new_island).over(
                   perdoc.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands.groupBy(id_col, "_isl")
            .agg(F.min("pos").cast("int").alias("span_start"),
                 (F.max("pos") + F.lit(L)).cast("int").alias("span_end"))
            .select(id_col, "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start"))
                    .alias("span_tokens")))
