"""URL-seen set: sharded Bloom / cuckoo approximate filters + exact anti-join.

The reference has NO seen-set (it refetches duplicates freely; the seen-set is
the north-rule scale addition — SURVEY.md §3.4). Exactness contract
(BASELINE.json "URL-seen exact match"): the approximate filter is only ever a
*pre-filter*; candidates it flags as "maybe seen" are decided by an exact
anti-join against the ``seen`` table, so false positives cost a shuffle row,
never a wrongly-skipped URL, and false negatives are impossible (every
inserted hash sets its bits).

Sharding: ``shard = pmod(url_hash, n_shards)``. Sizing for the 10^10-key
target: at 12 bits/key a shard of 2^30 bits (128 MiB) holds ~9e8 keys at
~1% FP, so 16-64 shards cover 10^10 keys with each shard buildable inside one
executor task (grouped applyInPandas) — the same math SURVEY.md §7.5 sketches.
In-sandbox tests run the identical code with small m_bits.

Both filter kinds share the storage row shape
(seen_shards: shard int, kind string, bits binary, n_items long, m_bits long,
k int) and the build path (groupBy(shard).applyInPandas — one numpy-vectorized
build per shard, no per-row Python). Membership pre-filtering broadcasts the
shard blobs (total size = n_shards × shard bytes, driver-bounded by design)
into an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..hashing import bloom_probes, mix64

SHARDS_SCHEMA = ("shard int, kind string, bits binary, n_items long, "
                 "m_bits long, k int")


# --- Bloom -------------------------------------------------------------------

def _bloom_build(hashes: np.ndarray, m_bits: int, k: int,
                 base: np.ndarray | None = None) -> np.ndarray:
    bits = (np.zeros(m_bits // 8, dtype=np.uint8) if base is None
            else base.copy())
    pos = bloom_probes(hashes, k, m_bits)
    np.bitwise_or.at(bits, (pos >> np.uint64(3)).ravel().astype(np.int64),
                     np.uint8(1) << (pos.ravel() & np.uint64(7)).astype(np.uint8))
    return bits


def _bloom_contains(bits: np.ndarray, hashes: np.ndarray, m_bits: int,
                    k: int) -> np.ndarray:
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    pos = bloom_probes(hashes, k, m_bits)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    mask = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    hit = (bits[byte_idx] & mask) != 0
    return hit.all(axis=1)


# --- Cuckoo ------------------------------------------------------------------
# 16-bit fingerprints, 4-slot buckets, partial-key cuckoo hashing (Fan et al.,
# "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14 — public paper).
# Supports deletion (Bloom does not); same exactness contract applies.

_CK_SLOTS = 4
_CK_MAX_KICKS = 500


def _ck_layout(m_bits: int) -> int:
    """Number of buckets (power of two) for a bit budget."""
    n_buckets = max(2, (m_bits // (16 * _CK_SLOTS)))
    return 1 << int(np.floor(np.log2(n_buckets)))


def _ck_fp(hashes: np.ndarray) -> np.ndarray:
    fp = (mix64(hashes) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _ck_index2(i1: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    alt = mix64(fp.astype(np.uint64)) & np.uint64(nb - 1)
    return (i1.astype(np.uint64) ^ alt).astype(np.int64)


def _ck_build(hashes: np.ndarray, m_bits: int,
              base: np.ndarray | None = None) -> np.ndarray:
    nb = _ck_layout(m_bits)
    table = (np.zeros((nb, _CK_SLOTS), dtype=np.uint16) if base is None
             else base.view(np.uint16).reshape(nb, _CK_SLOTS).copy())
    fps = _ck_fp(hashes.astype(np.uint64))
    i1s = (hashes.astype(np.uint64) & np.uint64(nb - 1)).astype(np.int64)
    rng_state = np.uint64(0x243F6A8885A308D3)  # deterministic kick chooser
    for fp, i1 in zip(fps, i1s):
        i2 = int(_ck_index2(np.array([i1]), np.array([fp]), nb)[0])
        placed = False
        for idx in (int(i1), i2):
            row = table[idx]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        idx = int(i1)
        cur = fp
        for _ in range(_CK_MAX_KICKS):
            rng_state = mix64(np.array([rng_state], dtype=np.uint64))[0]
            slot = int(rng_state % np.uint64(_CK_SLOTS))
            cur, table[idx, slot] = table[idx, slot], cur
            idx = int(_ck_index2(np.array([idx]), np.array([cur]), nb)[0])
            empty = np.flatnonzero(table[idx] == 0)
            if empty.size:
                table[idx, empty[0]] = cur
                break
        else:
            raise RuntimeError(
                "cuckoo shard over capacity — resize m_bits (shard sizing)")
    return table.reshape(-1).view(np.uint8)


def _ck_contains(bits: np.ndarray, hashes: np.ndarray, m_bits: int
                 ) -> np.ndarray:
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    nb = _ck_layout(m_bits)
    table = bits.view(np.uint16).reshape(nb, _CK_SLOTS)
    h = hashes.astype(np.uint64)
    fp = _ck_fp(h)
    i1 = (h & np.uint64(nb - 1)).astype(np.int64)
    i2 = _ck_index2(i1, fp, nb)
    hit1 = (table[i1] == fp[:, None]).any(axis=1)
    hit2 = (table[i2] == fp[:, None]).any(axis=1)
    return hit1 | hit2


# --- DataFrame-level API -------------------------------------------------------

class SeenFilter:
    """Sharded approximate filter over url_hash, stored as DataFrame rows."""

    def __init__(self, kind: str = "bloom", n_shards: int = 8,
                 m_bits: int = 1 << 20, k: int = 7):
        assert kind in ("bloom", "cuckoo")
        self.kind = kind
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k = k

    def build(self, hashes_df, existing_df=None):
        """(Re)build shard rows from a DataFrame with column ``url_hash``.

        ``existing_df``: prior seen_shards rows — new hashes are OR'd into the
        existing bit arrays (incremental per-round update, no full rebuild).
        One applyInPandas task per shard; the build loop is numpy-vectorized.
        """
        kind, m_bits, k, n_shards = self.kind, self.m_bits, self.k, self.n_shards
        with_shard = hashes_df.select(
            F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard"),
            F.col("url_hash"),
        )
        # Prior bits ride a Spark broadcast, never the task closure: at the
        # sized-for-10^10 shard counts the blobs are tens-to-hundreds of MB,
        # and a closure would re-serialize them into EVERY task binary.
        spark = hashes_df.sparkSession
        base = {}
        if existing_df is not None:
            for row in _shard_rows(existing_df):
                base[int(row["shard"])] = np.frombuffer(
                    bytes(row["bits"]), dtype=np.uint8)
        base_bc = spark.sparkContext.broadcast(base)

        def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
            prior = base_bc.value.get(shard)
            if kind == "bloom":
                bits = _bloom_build(hashes, m_bits, k, prior)
            else:
                bits = _ck_build(hashes, m_bits, prior)
            n_prior = 0  # n_items tracked approximately; exactness lives in `seen`
            return pd.DataFrame([{
                "shard": shard, "kind": kind, "bits": bits.tobytes(),
                "n_items": int(len(hashes) + n_prior),
                "m_bits": m_bits, "k": k,
            }])

        built = (with_shard.groupBy("shard")
                 .applyInPandas(build_shard, SHARDS_SCHEMA))
        if existing_df is not None:
            untouched = existing_df.join(
                with_shard.select("shard").distinct(), "shard", "left_anti")
            built = built.unionByName(untouched)
        return built

    def might_contain_col(self, shards_rows: list, hash_col, spark=None):
        """Column: approximate membership of ``hash_col`` via the shard bits.

        ``shards_rows``: seen_shards row dicts (read locally — see
        SnapshotStore.read_local; py4j collect of binary columns is slow).
        The blobs ship as ONE Spark broadcast (torrent, fetched once per
        executor), not in the UDF closure. Returns a boolean Column; True =
        maybe seen (must be exact-checked), False = definitely new.
        """
        kind, m_bits, k, n_shards = self.kind, self.m_bits, self.k, self.n_shards
        blobs = {int(r["shard"]): np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
                 for r in shards_rows}
        if spark is None:
            from pyspark.sql import SparkSession
            spark = SparkSession.getActiveSession()
        blobs_bc = spark.sparkContext.broadcast(blobs)

        @F.pandas_udf("boolean")
        def maybe_seen(h: pd.Series) -> pd.Series:
            blobs = blobs_bc.value
            hv = h.to_numpy(dtype=np.int64).view(np.uint64)
            shards = (h.to_numpy(dtype=np.int64) % n_shards + n_shards) % n_shards
            out = np.zeros(len(h), dtype=bool)
            for s in np.unique(shards):
                bits = blobs.get(int(s))
                if bits is None:
                    continue
                sel = shards == s
                if kind == "bloom":
                    out[sel] = _bloom_contains(bits, hv[sel], m_bits, k)
                else:
                    out[sel] = _ck_contains(bits, hv[sel], m_bits)
            return pd.Series(out)

        return maybe_seen(hash_col)


def _shard_rows(existing_df):
    """Rows of an existing seen_shards DataFrame, avoiding py4j collect of
    binary columns when the underlying files are locally readable."""
    files = [f.replace("file:", "") for f in existing_df.inputFiles()]
    if files and all(f.endswith(".parquet") for f in files):
        import pyarrow.parquet as pq
        rows = []
        for f in sorted(files):
            rows.extend(pq.read_table(f).to_pylist())
        return rows
    return existing_df.collect()
