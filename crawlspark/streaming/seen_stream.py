"""Streaming URL-seen dedup — the seen-set as a stateful streaming operator.

The batch engine keeps its Bloom/cuckoo shards in the snapshot store
(crawlspark.frontier.seen); this module is the same sharded design expressed
with Structured Streaming's `applyInPandasWithState`: URLs stream in, are
canonicalized and sharded by `pmod(url_hash, n_shards)`, and each shard
group keeps (bloom bits, exact hash set) in its GroupState. Output is the
stream of first-occurrence URLs only — exactly-once novelty across
micro-batches.

Exactness contract is the batch engine's (BASELINE.json "URL-seen exact
match"): the Bloom bits are a fast pre-filter; the exact hash set decides,
so false positives never drop a novel URL. State per shard is the bits
array plus the packed int64 hash set — at 10^10-URL scale the exact set
moves to the store's seen table and state keeps only the filter (same
split the batch engine already makes); shard count bounds per-group state.

All heavy work is Arrow-batched (one Python call per shard per
micro-batch, numpy-vectorized inside) — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..frontier.seen import _bloom_build, _bloom_contains
from ..urltools import canonicalize_udf

OUT_SCHEMA = "canon string, url_hash long, shard int"
STATE_SCHEMA = "bits binary, hashes binary"


def streaming_url_seen(urls: DataFrame, n_shards: int = 8,
                       m_bits: int = 1 << 20, k: int = 7) -> DataFrame:
    """urls: streaming DataFrame with a `url` column → novel canonical URLs.

    Use with any sink/trigger; state lives in the stream checkpoint.
    """
    canon = (urls
             .select(canonicalize_udf(F.col("url"),
                                      F.lit(None).cast("string"))
                     .alias("canon"))
             .filter(F.col("canon").isNotNull())
             .withColumn("url_hash", F.xxhash64("canon"))
             .withColumn("shard",
                         F.pmod(F.col("url_hash"), F.lit(n_shards))
                          .cast("int")))

    def dedup_shard(key, pdf_iter, state: GroupState):
        if state.exists:
            bits_b, hashes_b = state.get
            bits = np.frombuffer(bits_b, dtype=np.uint8).copy()
            seen_hashes = np.frombuffer(hashes_b, dtype=np.int64)
        else:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            seen_hashes = np.empty(0, dtype=np.int64)
        seen_set = set(seen_hashes.tolist())

        for pdf in pdf_iter:
            h = pdf["url_hash"].to_numpy(dtype=np.int64)
            maybe = _bloom_contains(bits, h.view(np.uint64), m_bits, k)
            novel_mask = np.zeros(len(h), dtype=bool)
            for i, (hv, m) in enumerate(zip(h.tolist(), maybe)):
                # bloom "no" would let us skip the exact probe, but the
                # exact set must always be consulted AND updated so that
                # intra-batch duplicates (bits not yet rebuilt) dedup too;
                # `m` only saves work once the exact set is external.
                novel = hv not in seen_set
                if novel:
                    novel_mask[i] = True
                    seen_set.add(hv)
            if novel_mask.any():
                novel_h = h[novel_mask]
                bits = _bloom_build(novel_h.view(np.uint64), m_bits, k, bits)
                yield pdf.loc[novel_mask, ["canon", "url_hash", "shard"]]

        all_hashes = np.fromiter(seen_set, dtype=np.int64,
                                 count=len(seen_set))
        state.update((bits.tobytes(), np.sort(all_hashes).tobytes()))

    return (canon.groupBy("shard")
            .applyInPandasWithState(dedup_shard, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
