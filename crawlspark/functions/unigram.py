"""Distributed unigram-LM tokenizer training + application (Kudo 2018 —
the SentencePiece unigram model; the reference's extraction stack has no
tokenizer, this is part of the training-data pipeline surface like
functions/bpe.py, whose word-TYPE discipline it shares).

Shape: one corpus pass builds the (word, freq) type table (reused from
bpe.word_freqs); everything after runs on word TYPES — at 100 TB the
corpus is petabyte-scale but the distinct-word table is ~10^7-10^8 rows:

  seed    : explode each word type's substrings (len 2..max_len, ~L²/2
            per word) weighted by word freq → ONE hash-agg with map-side
            combine → top-(V - |chars|) pieces by (weight desc, piece
            asc) via a per-partition top-V + driver merge (V is a
            tokenizer vocab — broadcast-sized BY DEFINITION, so the
            funnel is bounded at V rows); every single character is
            always included (coverage guarantee).
  EM round: E-step — per word type, integer Viterbi segmentation under
            the current scores (Arrow-batched pandas UDF, vocab dict
            broadcast in the closure: O(V) strings, NOT a blob);
            piece-usage counts weighted by word freq → ONE hash-agg.
            M-step — scores from counts, recomputed driver-side over V
            rows. Pieces that scored zero uses are pruned (except
            single chars — the simplification of SentencePiece's
            likelihood-loss pruning; documented, deterministic).
  apply   : per-doc token counts via the same Viterbi, memoized per
            Arrow batch.

Determinism (the whole contract): scores are integer micro-nats rounded
ONCE per M-step (round(ln(count) - ln(total), 6dp) · 1e6 — the
unigram_logprob discipline from text.py); Viterbi maximizes
(score_sum, -n_pieces, lexicographically-smallest piece tuple) in exact
integer/tuple arithmetic, so every word segments identically on any
engine and the pure-Python twin (py_unigram_* below) reproduces
training AND application bit-for-bit.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .bpe import word_freqs


def _micro_ln(x: int, total: int) -> int:
    """round(ln(x/total) * 1e6) with ONE rounding point — the exact
    integer score both engines and the twin share."""
    return round(math.log(x / total) * 1e6)


# score for a character absent from the vocab (possible only when a
# TRAINED vocab is applied to a DIFFERENT corpus — training always seeds
# every character it sees): far below any real micro-nat log-prob, so an
# unknown character segments as its own <unk>-style piece and never
# outcompetes an in-vocab segmentation.
UNK_SCORE = -(10 ** 9)


def _viterbi(word: str, scores: dict[str, int], max_len: int
             ) -> tuple[list[str], int]:
    """Best segmentation of `word` under integer piece scores: maximize
    sum_score, then fewer pieces, then the lexicographically SMALLEST
    piece tuple. Characters absent from the vocab fall back to
    single-character pieces at UNK_SCORE (graceful on foreign corpora).
    Pure integer / tuple arithmetic — deterministic everywhere."""
    n = len(word)
    # best[i] = (sum_score, neg_pieces, pieces_tuple) for word[:i];
    # "better" = higher (sum_score, neg_pieces), tie -> SMALLER tuple
    best: list = [None] * (n + 1)
    best[0] = (0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            sc = scores.get(piece)
            if sc is None:
                continue
            s, np_, tup = best[j]
            c = (s + sc, np_ - 1, tup + (piece,))
            if (cand is None or c[:2] > cand[:2]
                    or (c[:2] == cand[:2] and c[2] < cand[2])):
                cand = c
        if word[i - 1:i] not in scores:
            # OOV character: the single-char UNK fallback must COMPETE
            # against in-vocab pieces ending here under the same
            # ordering, not only fill the no-candidate gap — otherwise
            # a segmentation placing the OOV char AFTER an in-vocab
            # piece (e.g. 'baba' with {'aba':-2,'bab':-1} → 'bab'+'a'
            # at UNK-1) is never explored and a lower-scoring one wins.
            s, np_, tup = best[i - 1]
            c = (s + UNK_SCORE, np_ - 1, tup + (word[i - 1:i],))
            if (cand is None or c[:2] > cand[:2]
                    or (c[:2] == cand[:2] and c[2] < cand[2])):
                cand = c
        best[i] = cand
    s, np_, tup = best[n]
    return list(tup), s


def _seed_vocab(words: DataFrame, vocab_size: int, max_len: int
                ) -> DataFrame:
    """(piece, weight) seed: every single char + the top multi-char
    substrings by (weight desc, piece asc)."""
    w = F.col("word")
    # all substrings length 2..max_len via a start×len sequence explode —
    # pure Column, zero Python; per-word fanout is bounded by L·max_len
    subs = (words.select(
                "freq",
                F.explode(F.flatten(F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(2),
                            F.greatest(F.least(F.lit(max_len),
                                               F.length(w) - i + 1),
                                       F.lit(1))),
                        lambda L: F.substring(w, i, L))))).alias("piece"))
            .filter(F.length("piece") >= 2)
            .groupBy("piece").agg(F.sum("freq").alias("weight")))
    chars = (words.select(
                "freq", F.explode(F.split(w, "")).alias("piece"))
             .filter(F.length("piece") == 1)
             .groupBy("piece").agg(F.sum("freq").alias("weight")))
    n_chars = chars.count()
    top_multi = (subs.orderBy(F.col("weight").desc(), F.col("piece").asc())
                 .limit(max(0, vocab_size - n_chars)))
    return chars.unionByName(top_multi)


def unigram_train(docs: DataFrame, vocab_size: int = 200,
                  em_iters: int = 2, max_len: int = 6,
                  text_col: str = "text") -> list[tuple[str, int, int]]:
    """Train; returns [(piece, score_micro, count)] sorted by
    (count desc, piece asc), counts from the LAST E-step."""
    words = word_freqs(docs, text_col).localCheckpoint(eager=True)
    seed = _seed_vocab(words, vocab_size, max_len).collect()
    total0 = sum(r["weight"] for r in seed)
    scores = {r["piece"]: _micro_ln(r["weight"], total0) for r in seed}

    spark = docs.sparkSession
    counts: dict[str, int] = {}
    for _ in range(em_iters):
        sc, ml = dict(scores), max_len

        def estep(batches):
            memo: dict = {}
            for pdf in batches:
                agg: Counter = Counter()
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    pieces = memo.get(word)
                    if pieces is None:
                        pieces, _s = _viterbi(word, sc, ml)
                        memo[word] = pieces
                    for p in pieces:
                        agg[p] += int(freq)
                yield pd.DataFrame(
                    {"piece": list(agg.keys()),
                     "n": list(agg.values())})

        counts = {r["piece"]: r["n"] for r in
                  (words.mapInPandas(estep, "piece string, n long")
                   .groupBy("piece").agg(F.sum("n").alias("n"))
                   .collect())}
        # M-step + prune (drop unused multi-char pieces; chars stay)
        total = sum(counts.values())
        scores = {p: _micro_ln(n, total) for p, n in counts.items()}
        for p in list(sc):
            if len(p) == 1 and p not in scores:
                scores[p] = _micro_ln(1, total)  # unused char: floor score
    return sorted(((p, s, counts.get(p, 0)) for p, s in scores.items()),
                  key=lambda t: (-t[2], t[0]))


def unigram_token_counts(docs: DataFrame,
                         vocab: list[tuple[str, int, int]],
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         max_len: int = 6) -> DataFrame:
    """(id, n_unigram_tokens): per-doc token count under the trained
    vocab — Arrow-batched Viterbi with per-batch word memoization, the
    vocab riding the closure as an O(V) dict."""
    scores = {p: s for p, s, _ in vocab}

    def kern(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n = 0
                for wrd in (text or "").split():
                    c = memo.get(wrd)
                    if c is None:
                        c = len(_viterbi(wrd, scores, max_len)[0])
                        memo[wrd] = c
                    n += c
                out.append({"doc_id": did, "n_unigram_tokens": n})
            yield pd.DataFrame(out,
                               columns=["doc_id", "n_unigram_tokens"])

    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("text"))
            .mapInPandas(kern, "doc_id long, n_unigram_tokens int"))


# -- pure-Python twins (independent sequential mirror for the oracle) --------

def py_unigram_train(texts: list[str], vocab_size: int = 200,
                     em_iters: int = 2, max_len: int = 6
                     ) -> list[tuple[str, int, int]]:
    wf: Counter = Counter()
    for t in texts:
        for wrd in t.split():
            wf[wrd] += 1
    subs: Counter = Counter()
    chars: Counter = Counter()
    for wrd, f in wf.items():
        for ch in wrd:
            chars[ch] += f
        for i in range(len(wrd)):
            for L in range(2, min(max_len, len(wrd) - i) + 1):
                subs[wrd[i:i + L]] += f
    top = sorted(subs.items(), key=lambda t: (-t[1], t[0]))
    seed = dict(chars)
    for p, wt in top[:max(0, vocab_size - len(chars))]:
        seed[p] = wt
    total0 = sum(seed.values())
    scores = {p: _micro_ln(wt, total0) for p, wt in seed.items()}
    counts: Counter = Counter()
    for _ in range(em_iters):
        counts = Counter()
        for wrd, f in wf.items():
            for p in _viterbi(wrd, scores, max_len)[0]:
                counts[p] += f
        total = sum(counts.values())
        new = {p: _micro_ln(n, total) for p, n in counts.items()}
        for p in scores:
            if len(p) == 1 and p not in new:
                new[p] = _micro_ln(1, total)
        scores = new
    return sorted(((p, s, counts.get(p, 0)) for p, s in scores.items()),
                  key=lambda t: (-t[2], t[0]))


def py_unigram_token_count(text: str, vocab, max_len: int = 6) -> int:
    scores = {p: s for p, s, _ in vocab}
    return sum(len(_viterbi(w, scores, max_len)[0]) for w in text.split())
