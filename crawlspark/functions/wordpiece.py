"""Distributed WordPiece tokenizer training + application (Schuster &
Nakajima 2012 — the BERT tokenizer; completes the repo's tokenizer
family beside functions/bpe.py and functions/unigram.py, sharing their
word-TYPE discipline; the reference's extraction stack has no
tokenizer, this is training-data pipeline surface).

Training is a BPE-shaped merge loop with a LIKELIHOOD objective: each
round merges the symbol pair maximizing

    score(a, b) = count(ab) / (count(a) * count(b))

— the pair whose merge most increases a unigram LM's corpus likelihood
— instead of raw pair frequency. Symbols use the BERT surface form:
the word-initial character bare, continuations prefixed ``##``; the
merge of (a, ##b) is written ``a+b`` (the ``##`` marks position, not
content).

  round r: ONE pair hash-agg (freq-weighted, map-side combine)
           + ONE symbol hash-agg (current unit counts)
           → broadcast-join the vocab-sized unit counts onto the pair
             table (twice, for left and right)
           → score = cnt_pair / (double(cnt_l) * double(cnt_r)): the
             unit counts cast to double BEFORE the multiply (no int64
             overflow at 100 TB counts) — exactly two IEEE-754
             rounding points, the same two operations the twin
             performs, bit-identical on any engine
           → global argmax as a 1-row MIN aggregate over
             struct(-score, left, right) — score desc, pair-asc tie,
             no global sort, no orderBy().limit() funnel
           → the same pure-Column leftmost fold rewrite as BPE.

Application is BERT greedy longest-match-first: the longest vocab
prefix of the remaining word wins (continuations looked up with the
``##`` prefix); a word with no match at some position tokenizes as ONE
[UNK]. Arrow-batched with per-batch word memoization; the vocab rides
the closure as an O(V) set.

Determinism: ties broken by (score desc, left asc, right asc); stop
when the best pair's raw count < min_freq. The pure-Python twin
(py_wordpiece_merges / py_wordpiece_token_count below — its own
Counter loop and its own greedy matcher, no shared code with the
Spark path or with each other's scoring fold) reproduces training AND
application bit-for-bit.

100 TB shape: everything after the one corpus pass (word_freqs) runs
on word TYPES (~10^7-10^8 rows); per round two hash-aggs + one
broadcast join + a 1-row collect; localCheckpoint every few rounds
truncates the fold's logical-plan nesting exactly like bpe_train.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .bpe import _merge_fold, word_freqs

UNK = "[UNK]"


def _wp_sym_init() -> F.Column:
    """word → BERT symbols: first char bare, the rest ``##``-prefixed."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)))


def _wp_merged(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def wordpiece_train(docs: DataFrame, n_merges: int,
                    text_col: str = "text", min_freq: int = 2,
                    checkpoint_every: int = 4
                    ) -> tuple[list[tuple], list[str]]:
    """Learn ``n_merges`` WordPiece merges. Returns (merges, vocab):
    merges = [(rank, left, right, pair_freq, score_micro)] with
    score_micro = round(score * 1e6) of the exact-double likelihood
    score; vocab = sorted(initial symbols ∪ merged pieces) — the set
    the greedy tokenizer matches against."""
    words = (word_freqs(docs, text_col)
             .withColumn("syms", _wp_sym_init())
             .select("freq", "syms").localCheckpoint())
    # initial symbol inventory (chars + ##chars actually present):
    # vocab-bounded collect, once
    init_syms = [r["s"] for r in
                 (words.select(F.explode("syms").alias("s"))
                  .distinct().collect())]
    vocab = set(init_syms)
    merges: list[tuple] = []
    for r in range(int(n_merges)):
        pairs = (words.filter(F.size("syms") >= 2)
                 .select("freq", F.explode(F.zip_with(
                     F.expr("slice(syms, 1, size(syms) - 1)"),
                     F.expr("slice(syms, 2, size(syms) - 1)"),
                     lambda x, y: F.struct(x.alias("l"), y.alias("r"))))
                     .alias("p"))
                 .groupBy("p").agg(F.sum("freq").alias("cnt")))
        units = (words.select("freq", F.explode("syms").alias("s"))
                 .groupBy("s").agg(F.sum("freq").alias("u")))
        ul = units.select(F.col("s").alias("_l"), F.col("u").alias("ul"))
        ur = units.select(F.col("s").alias("_r"), F.col("u").alias("ur"))
        # score arithmetic (mirrored EXACTLY by the py twin): cast each
        # unit count to double FIRST, multiply, then divide — two IEEE
        # rounding points, identical on any engine, and no int64
        # multiply to overflow under ANSI at 100 TB unit counts (a
        # long·long product of ~1e9-scale counts would); the twin does
        # cnt / (float(ul) * float(ur)) — the same two operations
        scored = (pairs
                  .join(F.broadcast(ul), pairs["p.l"] == ul["_l"])
                  .join(F.broadcast(ur), pairs["p.r"] == ur["_r"])
                  .select("p", "cnt",
                          (F.col("cnt").cast("double")
                           / (F.col("ul").cast("double")
                              * F.col("ur").cast("double")))
                          .alias("score")))
        best = scored.agg(F.min(F.struct(
            (-F.col("score")).alias("neg"),
            F.col("p.l").alias("l"), F.col("p.r").alias("r"),
            F.col("cnt").alias("cnt")))
            .alias("b")).collect()[0]["b"]
        if best is None or best["cnt"] < min_freq:
            break
        a, b, cnt = best["l"], best["r"], int(best["cnt"])
        merged = _wp_merged(a, b)
        merges.append((r, a, b, cnt, round(-best["neg"] * 1e6)))
        vocab.add(merged)
        words = words.withColumn("syms", _merge_fold(a, b, merged))
        if (r + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges, sorted(vocab)


def _wp_greedy(word: str, vocab: set, max_len: int) -> list[str] | None:
    """BERT greedy longest-match-first; None = no cover → [UNK] word."""
    toks: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_len)
        hit = None
        while j > i:
            piece = word[i:j] if i == 0 else "##" + word[i:j]
            if piece in vocab:
                hit = (j, piece)
                break
            j -= 1
        if hit is None:
            return None
        toks.append(hit[1])
        i = hit[0]
    return toks


def wordpiece_token_counts(docs: DataFrame, vocab: list[str],
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_wp_tokens, n_unk): per-doc WordPiece token count under
    a trained vocab — greedy longest-match, [UNK] words count as ONE
    token and increment n_unk. Arrow-batched, per-batch memoization."""
    vset = set(vocab)
    max_len = max((len(p) - 2 if p.startswith("##") else len(p))
                  for p in vset) if vset else 1

    def kern(batches):
        memo: dict[str, tuple[int, int]] = {}   # per TASK, not per batch
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                nt = nu = 0
                for w in (text or "").split():
                    c = memo.get(w)
                    if c is None:
                        toks = _wp_greedy(w, vset, max_len)
                        c = (1, 1) if toks is None else (len(toks), 0)
                        memo[w] = c
                    nt += c[0]
                    nu += c[1]
                rows.append({"doc_id": did, "n_wp_tokens": nt,
                             "n_unk": nu})
            yield pd.DataFrame(rows,
                               columns=["doc_id", "n_wp_tokens", "n_unk"])

    return (docs.select(id_col, text_col)
            .mapInPandas(kern, "doc_id long, n_wp_tokens int, n_unk int"))


# ---------------------------------------------------------------- pure twin

def py_wordpiece_merges(texts: list[str], n_merges: int,
                        min_freq: int = 2) -> tuple[list[tuple],
                                                    list[str]]:
    """Sequential WordPiece trainer — the independent oracle twin
    (Counter + explicit tie sort; shares no code with the Spark path)."""
    wf: Counter = Counter()
    for t in texts:
        wf.update((t or "").split())
    words = {}
    vocab: set[str] = set()
    for w in wf:
        syms = tuple([w[0]] + ["##" + c for c in w[1:]])
        words[w] = syms
        vocab.update(syms)
    merges: list[tuple] = []
    for r in range(n_merges):
        pc: Counter = Counter()
        uc: Counter = Counter()
        for w, syms in words.items():
            f = wf[w]
            for s in syms:
                uc[s] += f
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = min(
            ((-(cnt / (float(uc[a]) * float(uc[b]))), a, b, cnt)
             for (a, b), cnt in pc.items()),
            key=lambda t: t[:3])
        neg, a, b, cnt = best
        if cnt < min_freq:
            break
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((r, a, b, cnt, round(-neg * 1e6)))
        vocab.add(merged)
        nw = {}
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[w] = tuple(out)
        words = nw
    return merges, sorted(vocab)


def py_wordpiece_token_count(text: str, vocab: list[str]
                             ) -> tuple[int, int]:
    """(n_tokens, n_unk) — its own greedy matcher (regex-free slicing
    written independently of _wp_greedy)."""
    vset = set(vocab)
    lens = sorted({(len(p) - 2 if p.startswith("##") else len(p))
                   for p in vset}, reverse=True) or [1]
    nt = nu = 0
    for w in (text or "").split():
        pos, toks, dead = 0, 0, False
        while pos < len(w):
            found = False
            for ln in lens:
                frag = w[pos:pos + ln]
                if len(frag) < ln:
                    continue
                cand = frag if pos == 0 else "##" + frag
                if cand in vset:
                    toks += 1
                    pos += ln
                    found = True
                    break
            if not found:
                dead = True
                break
        if dead:
            nt += 1
            nu += 1
        else:
            nt += toks
    return nt, nu
