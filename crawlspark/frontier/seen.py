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

    def build(self, hashes_df, existing_df=None, existing_dirs=None):
        """(Re)build shard rows from a DataFrame with column ``url_hash``.

        ``existing_df``: prior seen_shards rows — new hashes are OR'd into the
        existing bit arrays (incremental per-round update, no full rebuild).
        One applyInPandas task per shard; the build loop is numpy-vectorized.

        ``existing_dirs``: shard-partitioned (``shard=<s>`` hive dirs) file
        roots of the prior seen_shards table. When given, each build task
        reads ONLY its own shard's prior blob from those files,
        executor-side — the driver never loads or broadcasts the blob set.
        This is the at-scale path (SURVEY §7.5 sizing: 16-64 shards ×
        128 MiB): the driver-blob broadcast below would put the FULL
        multi-GiB filter on the driver and every executor each round.
        """
        kind, m_bits, k, n_shards = self.kind, self.m_bits, self.k, self.n_shards
        with_shard = hashes_df.select(
            F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int").alias("shard"),
            F.col("url_hash"),
        )
        spark = hashes_df.sparkSession
        if existing_dirs:
            base_bc = None
            dirs = list(existing_dirs)
            if existing_df is None:
                # Incremental contract guard (round-2 ADVICE): with only
                # file roots to merge from, a shard untouched this round
                # would otherwise produce NO group → be dropped from the
                # rebuilt table → later Bloom false negatives. Seed every
                # shard with a null-hash skeleton row so each build task
                # runs (reading its prior blob executor-side) even when
                # the round added nothing to that shard. The engine passes
                # existing_df, whose untouched-shard union covers this.
                skeleton = spark.range(n_shards).select(
                    F.col("id").cast("int").alias("shard"),
                    F.lit(None).cast("long").alias("url_hash"))
                with_shard = with_shard.unionByName(skeleton)
        else:
            # Prior bits ride a Spark broadcast, never the task closure: at
            # the sized-for-10^10 shard counts the blobs are tens-to-hundreds
            # of MB, and a closure would re-serialize them into EVERY task
            # binary.
            dirs = None
            base = {}
            if existing_df is not None:
                for row in _shard_rows(existing_df):
                    base[int(row["shard"])] = np.frombuffer(
                        bytes(row["bits"]), dtype=np.uint8)
            base_bc = spark.sparkContext.broadcast(base)

        def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            if dirs is not None:
                prior = _read_shard_blob(dirs, shard)
            else:
                prior = base_bc.value.get(shard)
            hashes = (pdf["url_hash"].dropna()
                      .to_numpy(dtype=np.int64).view(np.uint64))
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
                F.broadcast(with_shard.select("shard").distinct()),
                "shard", "left_anti")
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

    def might_contain_sharded(self, df, hash_col: str, shard_dirs: list):
        """``df`` + boolean ``_maybe``: the shard-partitioned probe regime.

        The broadcast probe above ships the FULL blob set to the driver and
        every executor — at the 10^10-key sizing (16-64 shards × 128 MiB)
        that is 2-8 GiB of resident filter per executor, a scale-killer.
        Here instead the PROBE moves to the blobs: ``df`` exchanges once by
        ``pmod(hash, n_shards)`` (narrow scheduling columns, ~50 B/row) and
        each applyInPandas task reads ONLY its own shard's blob from the
        shard-partitioned seen_shards files (``shard=<s>`` hive dirs —
        the same storage-partitioned pattern as engine._bucketed_seen_flag).
        Peak filter memory per task = ONE shard (128 MiB), independent of
        shard count; the driver never touches a blob.

        Semantics are identical to might_contain_col: True = maybe seen
        (exact check decides), False = definitely new.
        """
        kind, m_bits, k, n_shards = self.kind, self.m_bits, self.k, self.n_shards
        dirs = list(shard_dirs)

        from pyspark.sql.types import BooleanType, StructField, StructType
        schema = StructType(list(df.schema.fields)
                            + [StructField("_maybe", BooleanType())])

        def probe(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            pdf = pdf.drop(columns=["_shard"])
            bits = _read_shard_blob(dirs, shard)
            if bits is None:
                pdf["_maybe"] = False
                return pdf
            hv = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
            if kind == "bloom":
                pdf["_maybe"] = _bloom_contains(bits, hv, m_bits, k)
            else:
                pdf["_maybe"] = _ck_contains(bits, hv, m_bits)
            return pdf

        return (df.withColumn(
                    "_shard",
                    F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int"))
                .groupBy("_shard").applyInPandas(probe, schema))


def _read_shard_blob(dirs: list, shard: int):
    """OR of a shard's blob files under ``<dir>/shard=<s>/*.parquet``
    (replace-table reads see one dir; defensive OR if several exist).
    Returns None when the shard has no committed blob yet."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    blobs = []
    for d in dirs:
        hit = sorted(_glob.glob(_os.path.join(d, f"shard={shard}",
                                              "*.parquet")))
        if hit:
            for f in hit:
                t = pq.read_table(f, columns=["bits", "kind"])
                for blob, kind in zip(t.column(0).to_pylist(),
                                      t.column(1).to_pylist()):
                    blobs.append((np.frombuffer(blob, dtype=np.uint8), kind))
        else:
            # pre-shard-partitioned layout (flat files with a shard
            # column): a resume from an older store must still find its
            # prior bits — a silently-missing blob would turn into Bloom
            # false negatives, which break the exactness contract
            for f in sorted(_glob.glob(_os.path.join(d, "*.parquet"))):
                t = pq.read_table(f, columns=["shard", "bits", "kind"])
                for s, blob, kind in zip(t.column(0).to_pylist(),
                                         t.column(1).to_pylist(),
                                         t.column(2).to_pylist()):
                    if int(s) == shard:
                        blobs.append(
                            (np.frombuffer(blob, dtype=np.uint8), kind))
    if not blobs:
        return None
    if len(blobs) == 1:
        return blobs[0][0].copy()
    # a replace-table read sees one dir with one row per shard; if several
    # blobs surface anyway, merging must stay conservative (a false
    # negative would skip the exact check and break the exactness contract)
    if any(k != "bloom" for _, k in blobs):
        raise RuntimeError(
            "multiple cuckoo blobs for one shard cannot be merged — "
            "rebuild seen_shards (cuckoo tables are not OR-able)")
    acc = blobs[0][0].copy()
    for b, _ in blobs[1:]:
        acc |= b
    return acc


def _shard_rows(existing_df):
    """Rows of an existing seen_shards DataFrame, avoiding py4j collect of
    binary columns when the underlying files are locally readable. With the
    shard-partitioned layout the ``shard`` value is directory-encoded
    (``shard=<s>/``), not stored in the leaf file — recover it from the
    path."""
    import re

    files = [f.replace("file:", "") for f in existing_df.inputFiles()]
    if files and all(f.endswith(".parquet") for f in files):
        import pyarrow.parquet as pq
        rows = []
        for f in sorted(files):
            part = re.search(r"[\\/]shard=(\d+)[\\/]", f)
            for row in pq.read_table(f).to_pylist():
                if part is not None and "shard" not in row:
                    row["shard"] = int(part.group(1))
                rows.append(row)
        return rows
    return existing_df.collect()
