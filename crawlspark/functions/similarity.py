"""Similarity search over the embeddings table (array<float> columns).

Two paths, per the driver mandate:
  brute_force_topk — exact cosine top-k of every query vector against the
    corpus: broadcast the (small) query set, JVM-side cosine via
    zip_with/aggregate, per-query row_number window. The correctness
    baseline; O(|Q|·|C|) compute but only ONE pass over the corpus — at
    100 TB this is a map-side broadcast join + local top-k (no all-pairs
    shuffle).
  lsh_topk — sign-LSH (random hyperplanes, deterministic from a seed)
    bucket join + exact re-rank within buckets: the scale path. Multi-probe
    (flip one bit) raises recall without widening the join.

Both return (query_id, neighbor_id, cosine, rank).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..hashing import mix64
from .dedup import cosine_sim


def _planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-Gaussian hyperplanes: Box-Muller over mix64
    streams — a pure function of (seed, n_planes, dim)."""
    n = n_planes * dim
    idx = np.arange(2 * n, dtype=np.uint64) + np.uint64(seed) * np.uint64(1 << 32)
    u = (mix64(idx).astype(np.float64) + 1.0) / 2.0**64  # (0,1]
    u1, u2 = u[:n], u[n:]
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(n_planes, dim)


def signhash_udf(n_planes: int, seed: int = 42):
    """Factory: pandas UDF mapping array<float> → long sign-bucket."""

    @pandas_udf(LongType())
    def sign_bucket(vecs: pd.Series) -> pd.Series:
        arrs = [np.asarray(v, dtype=np.float64) for v in vecs]
        if not arrs:
            return pd.Series([], dtype="int64")
        planes = _planes(n_planes, arrs[0].shape[0], seed)
        mat = np.stack(arrs)            # (n, dim)
        signs = (mat @ planes.T) >= 0    # (n, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    return sign_bucket


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_self: bool = True) -> DataFrame:
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
             n_planes: int = 8, seed: int = 42, multiprobe: bool = True,
             vec_col: str = "embedding", id_col: str = "vec_id"
             ) -> DataFrame:
    """Approximate top-k: candidates share a sign-bucket (or a 1-bit
    neighbor bucket with multiprobe), re-ranked by exact cosine."""
    bucket = signhash_udf(n_planes, seed)
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("cv"))
         .withColumn("bucket", bucket(F.col("cv"))))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("bucket0", bucket(F.col("qv"))))
    if multiprobe:
        probes = F.array(*([F.col("bucket0")] +
                           [F.col("bucket0").bitwiseXOR(F.lit(1 << i))
                            for i in range(n_planes)]))
    else:
        probes = F.array(F.col("bucket0"))
    q = q.withColumn("bucket", F.explode(probes)).drop("bucket0")
    cands = (c.join(q, "bucket")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", "qv", "cv").distinct())
    scored = cands.withColumn(
        "cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


# -- IVF (inverted-file) ANN ---------------------------------------------------------

def ivf_train(sample: np.ndarray, n_cells: int, iters: int = 2) -> np.ndarray:
    """Deterministic spherical k-means over a (bounded) sample — the IVF
    coarse quantizer. Init = first n_cells sample rows (the sample is
    id-sorted, so this is a pure function of the data); Lloyd iterations
    assign by max dot over normalized rows and re-normalize cell means.
    Runs on the DRIVER over a sample, never over the corpus: at 100 TB the
    sample stays ~10^4-10^5 rows while assignment below is the distributed
    step (one map pass, no shuffle of the corpus beyond the cell join)."""
    norm = sample / np.linalg.norm(sample, axis=1, keepdims=True).clip(
        min=1e-12)
    cents = norm[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(norm @ cents.T, axis=1)
        for c in range(n_cells):
            members = norm[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    cents[c] = v / nv
    return cents


def _ivf_udfs(cents: np.ndarray, n_probe: int):
    """Factories closing over the (tiny) centroid matrix: exact-cell
    assignment for corpus rows, top-n_probe cell list for queries."""
    from pyspark.sql.types import ArrayType, IntegerType

    def _normalize(vecs: pd.Series) -> np.ndarray:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        return mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(
            min=1e-12)

    @pandas_udf(IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int32")
        sims = _normalize(vecs) @ cents.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    @pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="object")
        sims = _normalize(vecs) @ cents.T
        # stable argsort of -sims: ties break by ascending cell id, the
        # same rule as np.argmax in cell_of (and in the pyref mirror)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return cell_of, probe_cells


def quantizer_sample(corpus: DataFrame, max_sample: int = 65536,
                     sample_stride: int | None = None,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> np.ndarray:
    """Deterministic, ABSOLUTELY bounded driver sample for quantizer
    training: hash-stride filter (pmod(xxhash64(id), stride) == 0, stride
    = ceil(count / max_sample) unless given) cuts the corpus to
    ~max_sample rows executor-side, then an id-ordered limit(max_sample)
    hard-caps what reaches the driver. The driver never holds more than
    max_sample vectors no matter the corpus size (the round-2 review
    flagged the old ``vec_id % 8`` fraction-of-corpus collect as a
    driver-OOM at 10^9 vectors). Pure function of (data, max_sample):
    mirrored row-for-row by pyref.py_ivf_topk_candidates."""
    if sample_stride is None:
        cnt = corpus.count()  # columnar count — no data movement
        sample_stride = max(1, -(-cnt // max_sample))
    samp_rows = (corpus
                 .filter(F.pmod(F.xxhash64(F.col(id_col).cast("long")),
                                F.lit(sample_stride)) == 0)
                 .select(id_col, F.col(vec_col).cast("array<double>"))
                 .orderBy(id_col).limit(max_sample).collect())
    return np.stack([np.asarray(r[1], dtype=np.float64)
                     for r in samp_rows])


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4, iters: int = 2,
             sample_stride: int | None = None, max_sample: int = 65536,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: train a coarse quantizer on a deterministic
    bounded sample (quantizer_sample — hard-capped at max_sample rows),
    assign every corpus row to its nearest cell, probe each query's
    n_probe nearest cells, exact-cosine re-rank within probed cells.

    Scale shape: centroids broadcast in UDF closures (n_cells x dim — KB),
    the corpus is touched by ONE vectorized assignment pass, and the only
    corpus-scale shuffle is the cell equi-join; the candidate set per query
    is n_probe/n_cells of the corpus. Raise n_cells with corpus size
    (sqrt(N) rule); the quantizer sample stays O(max_sample) regardless."""
    sample = quantizer_sample(corpus, max_sample=max_sample,
                              sample_stride=sample_stride,
                              vec_col=vec_col, id_col=id_col)
    cents = ivf_train(sample, n_cells, iters)
    cell_of, probe_cells = _ivf_udfs(cents, n_probe)

    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).cast("array<double>").alias("cv"))
         .withColumn("cell", cell_of(F.col("cv"))))
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).cast("array<double>").alias("qv"))
         .withColumn("cell", F.explode(probe_cells(F.col("qv")))))
    cands = (c.join(q, "cell")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id", "qv", "cv").distinct())
    scored = cands.withColumn(
        "cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                          F.col("neighbor_id").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))


def retrieval_true_rank(queries: DataFrame, corpus: DataFrame,
                        hits: tuple[int, ...] = (1, 5, 10)) -> DataFrame:
    """Retrieval evaluation: the rank of each query's TRUE pair in the
    corpus, without sorting anything — true_rank = 1 + count of corpus
    rows that beat the true item under the (cosine desc, neighbor_id asc)
    order (cosines rounded to 6 dp first, the repo-wide cross-engine
    contract). CLIP-style image↔text eval: recall@k is then a trivial
    aggregate of the hit flags.

    Inputs: queries (query_id, qv array<double>, true_id), corpus
    (neighbor_id, cv array<double>).
    Output: (query_id, true_rank, hit1, hit5, ... per ``hits``).

    100 TB shape: queries (eval sets are small) broadcast twice — once
    against their true rows (equi-join), once against the corpus for the
    better-count — so the corpus is scanned ONCE with no shuffle and no
    global sort; the count aggregate is map-side partial.
    """
    from .dedup import cosine_sim
    truth = (queries.join(
        corpus.select(F.col("neighbor_id").alias("true_id"),
                      F.col("cv").alias("tv")), "true_id")
        .withColumn("cos_true", F.round(cosine_sim("qv", "tv"), 6))
        .select("query_id", "qv", "true_id", "cos_true"))
    scored = (corpus.crossJoin(F.broadcast(truth))
              .withColumn("cos", F.round(cosine_sim("qv", "cv"), 6)))
    better = ((F.col("cos") > F.col("cos_true"))
              | ((F.col("cos") == F.col("cos_true"))
                 & (F.col("neighbor_id") < F.col("true_id"))))
    ranked = (scored.groupBy("query_id")
              .agg((F.sum(better.cast("int")) + 1).cast("int")
                   .alias("true_rank")))
    cols = [F.col("query_id"), F.col("true_rank")]
    cols += [(F.col("true_rank") <= k).alias(f"hit{k}") for k in hits]
    return ranked.select(*cols)
