"""Distributed BPE merge training + application (Sennrich et al. 2016).

Classic byte-pair-encoding trains on the WORD-FREQUENCY table, not the
raw corpus: one corpus pass builds (word, freq), then every merge round
works on word TYPES — at 100 TB the corpus is petabyte-scale but the
distinct-word table is ~10^7-10^8 rows, so each round is a small, fully
distributed job:

  round r: explode adjacent symbol pairs weighted by word freq
           → ONE hash-agg (map-side combine) on the pair
           → global argmax as a 1-row MIN aggregate over
             struct(-count, left, right)  — count desc, pair asc tie,
             NO global sort, NO orderBy().limit() funnel
           → rewrite each word's symbol array with a left-to-right
             aggregate() fold (leftmost-first merging, the reference
             greedy order), pure Column, zero Python.

The word table is localCheckpoint'd every few rounds — the fold nests
one lambda layer per merge, and un-truncated that compounds the logical
plan exactly like connected_components' iteration did (see dedup.py).

Application (tokenize with a learned merge list) is an Arrow-batched
pandas UDF with the merges in a broadcast-sized list: training is the
distributed part; applying n merges to a word is a local loop.

Determinism: ties broken by (count desc, left asc, right asc); merges
stop early when the best pair's count < min_freq. The pure-Python twin
(py_bpe_merges / py_bpe_token_count below) reproduces both bit-for-bit.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .text import ws_tokens

END = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-scale pass."""
    return (docs.select(F.explode(ws_tokens(F.col(text_col)))
                        .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _sym_init() -> F.Column:
    """word → initial symbol array: characters + the end-of-word mark."""
    return F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))


def _merge_fold(a: str, b: str, merged: str | None = None) -> F.Column:
    """Fold `syms` left-to-right, replacing each leftmost (a, b) with
    ``merged`` (default a+b; WordPiece passes a+b-without-"##"). State =
    (out, prev): prev holds the symbol that may start a
    match; emitting is deferred one step so a consumed symbol can't
    also start the next match (leftmost-first, non-overlapping)."""
    if merged is None:
        merged = a + b
    empty = F.array().cast("array<string>")
    null_s = F.lit(None).cast("string")
    init = F.struct(empty.alias("out"), null_s.alias("prev"))

    def step(acc, cur):
        return (F.when(acc["prev"].isNull(),
                       F.struct(acc["out"].alias("out"),
                                cur.alias("prev")))
                .when((acc["prev"] == a) & (cur == b),
                      F.struct(F.concat(acc["out"],
                                        F.array(F.lit(merged)))
                               .alias("out"), null_s.alias("prev")))
                .otherwise(F.struct(
                    F.concat(acc["out"], F.array(acc["prev"]))
                    .alias("out"), cur.alias("prev"))))

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(F.col("syms"), init, step, finish)


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text",
              min_freq: int = 2, checkpoint_every: int = 4
              ) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns [(rank, left, right,
    pair_freq)] — driver-side by design: the merge list is the model
    (KBs), each round collects exactly ONE row."""
    words = (word_freqs(docs, text_col)
             .withColumn("syms", _sym_init())
             .select("freq", "syms").localCheckpoint())
    merges: list[tuple[int, str, str, int]] = []
    for r in range(int(n_merges)):
        pairs = (words.filter(F.size("syms") >= 2)
                 .select("freq", F.explode(F.zip_with(
                     F.expr("slice(syms, 1, size(syms) - 1)"),
                     F.expr("slice(syms, 2, size(syms) - 1)"),
                     lambda x, y: F.struct(x.alias("l"), y.alias("r"))))
                     .alias("p"))
                 .groupBy("p").agg(F.sum("freq").alias("cnt")))
        best = pairs.agg(F.min(F.struct(
            (-F.col("cnt")).alias("neg"),
            F.col("p.l").alias("l"), F.col("p.r").alias("r")))
            .alias("b")).collect()[0]["b"]
        if best is None or -best["neg"] < min_freq:
            break
        a, b, cnt = best["l"], best["r"], -best["neg"]
        merges.append((r, a, b, int(cnt)))
        words = words.withColumn("syms", _merge_fold(a, b))
        if (r + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id"
                     ) -> DataFrame:
    """Per-doc BPE token count under a learned merge list. Arrow-batched;
    the merge list rides the UDF closure (KBs). Per-batch the distinct
    words are segmented once and reused (Zipf makes that ~10x fewer
    segmentations than tokens)."""
    mlist = [(a, b) for a, b in merges]

    def kern(batches):
        for pdf in batches:
            cache: dict[str, int] = {}
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                total = 0
                for w in (text or "").split():
                    n = cache.get(w)
                    if n is None:
                        n = len(_apply_merges(w, mlist))
                        cache[w] = n
                    total += n
                rows.append({"doc_id": did, "n_bpe_tokens": total})
            yield pd.DataFrame(rows, columns=["doc_id", "n_bpe_tokens"])

    return (docs.select(id_col, text_col)
            .mapInPandas(kern, "doc_id long, n_bpe_tokens int"))


# ---------------------------------------------------------------- pure twin

def py_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update((t or "").split())
    return c


def py_bpe_merges(texts: list[str], n_merges: int, min_freq: int = 2
                  ) -> list[tuple[int, str, str, int]]:
    """Sequential classic BPE — the independent oracle twin (Counter +
    explicit tie sort; shares no code with the Spark path)."""
    freqs = py_word_freqs(texts)
    words = {w: tuple(list(w) + [END]) for w in freqs}
    merges = []
    for r in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_freq:
            break
        merges.append((r, a, b, cnt))
        nw = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[w] = tuple(out)
        words = nw
    return merges


def py_bpe_token_count(text: str, merges: list[tuple[str, str]]) -> int:
    return sum(len(_apply_merges(w, merges)) for w in (text or "").split())
