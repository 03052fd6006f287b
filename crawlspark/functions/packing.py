"""Sequence packing — map a cleaned corpus onto fixed-capacity training
blocks, the last mile of an LLM data pipeline.

Semantics are the GPT-style "concatenate then chop": documents are laid
end-to-end in one deterministic global token stream (ordered by
``order_col``) and the stream is cut every ``block_tokens`` tokens; a
document therefore knows its absolute token offset and the range of blocks
it lands in (documents may straddle block boundaries — that is the point
of this packing flavor: zero padding waste).

Scale shape: the only non-map work is the distributed exclusive prefix sum
(plans/ordering.with_global_cumsum — range exchange + P-row collect + one
pid-partitioned window), over a projection of exactly (id, n_tokens): at
10^10 docs that is ~160 GB through two narrow exchanges, no strings, no
Python, no unpartitioned window. Block arithmetic is integer ``div`` in
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import token_count


def pack_sequences(docs: DataFrame, block_tokens: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   order_col: str | None = None) -> DataFrame:
    """Per-doc packing manifest: (id, n_tokens, offset, block_start,
    block_end, n_blocks). ``offset`` is the doc's absolute position in the
    concatenated token stream (exclusive running sum over ``order_col``,
    default the id), blocks are ``block_tokens`` wide. Empty docs are
    dropped (they occupy no stream positions)."""
    from ..plans.ordering import with_global_cumsum

    order_col = order_col or id_col
    t = (docs.select(F.col(id_col),
                     token_count(F.col(text_col)).alias("n_tokens"))
         .filter(F.col("n_tokens") > 0))
    c = with_global_cumsum(t, [F.col(order_col).asc()], "n_tokens",
                           out="offset")
    b = int(block_tokens)
    return (c.select(
        id_col, "n_tokens", "offset",
        F.expr(f"offset div {b}").alias("block_start"),
        F.expr(f"(offset + n_tokens - 1) div {b}").alias("block_end"))
        .withColumn("n_blocks",
                    F.col("block_end") - F.col("block_start") + 1))


def explode_blocks(packed: DataFrame, block_tokens: int,
                   id_col: str = "doc_id") -> DataFrame:
    """One row per (block_id, doc) incidence with the doc's token span
    inside the block: (block_id, id, tok_start, tok_end) where tok_* are
    block-local [start, end) positions."""
    b = int(block_tokens)
    blk = F.explode(F.sequence(F.col("block_start"),
                               F.col("block_end"))).alias("block_id")
    out = packed.select(F.col(id_col), "offset", "n_tokens", blk)
    doc_lo = F.col("offset")
    doc_hi = F.col("offset") + F.col("n_tokens")      # exclusive
    blk_lo = F.col("block_id") * b
    return (out
            .withColumn("tok_start",
                        (F.greatest(doc_lo, blk_lo) - blk_lo).cast("int"))
            .withColumn("tok_end",
                        (F.least(doc_hi, blk_lo + b) - blk_lo).cast("int"))
            .select("block_id", id_col, "tok_start", "tok_end"))
