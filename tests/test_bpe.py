"""Distributed BPE training/application (functions/bpe.py)."""

import pandas as pd

from crawlspark.functions.bpe import (END, _apply_merges, bpe_token_counts,
                                      bpe_train, py_bpe_merges,
                                      py_bpe_token_count, word_freqs)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_train_matches_sequential_twin(spark):
    texts = ["low low low low low", "lower lower newest newest",
             "newest newest newest newest", "wider wider wider new new",
             "  spacing   is ok  ", ""]
    got = bpe_train(_docs(spark, texts), n_merges=12, min_freq=2,
                    checkpoint_every=3)
    want = py_bpe_merges(texts, 12, min_freq=2)
    assert got == want
    assert len(got) >= 8          # the corpus supports several merges
    # classic BPE sanity: 'es' or ('e','s') family merges appear for
    # 'newest'-heavy corpora
    merged = {a + b for _, a, b, _ in got}
    assert any("es" in m or "est" in m for m in merged)


def test_bpe_train_min_freq_stops(spark):
    texts = ["ab ab", "cd"]
    got = bpe_train(_docs(spark, texts), n_merges=10, min_freq=3)
    want = py_bpe_merges(texts, 10, min_freq=3)
    assert got == want


def test_bpe_leftmost_merge_on_runs():
    # 'aaa' + merge (a,a) -> [aa, a, </w>]: leftmost-first, no overlap
    assert _apply_merges("aaa", [("a", "a")]) == ["aa", "a", END]
    assert _apply_merges("aaaa", [("a", "a")]) == ["aa", "aa", END]
    assert _apply_merges("aaaa", [("a", "a"), ("aa", "aa")]) == [
        "aaaa", END]


def test_bpe_token_counts_spark_matches_twin(spark):
    texts = ["low lower lowest", "new newest news", "a aa aaa aaaa"]
    merges_full = py_bpe_merges(texts, 8, min_freq=2)
    mlist = [(a, b) for _, a, b, _ in merges_full]
    out = {r.doc_id: r.n_bpe_tokens
           for r in bpe_token_counts(_docs(spark, texts), mlist).collect()}
    for i, t in enumerate(texts):
        assert out[i] == py_bpe_token_count(t, mlist), i


def test_word_freqs(spark):
    wf = {r.word: r.freq
          for r in word_freqs(_docs(spark, ["a b a", " b  c "])).collect()}
    assert wf == {"a": 2, "b": 2, "c": 1}
