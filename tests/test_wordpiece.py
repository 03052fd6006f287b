"""WordPiece tokenizer (functions/wordpiece.py): distributed trainer ==
sequential Counter twin bit-for-bit (likelihood argmax, ##-prefix
symbol surface), greedy longest-match application incl. [UNK], and
hand-computed golden vectors (non-shared-code pins)."""
import pytest


def test_wp_greedy_golden_vectors():
    from crawlspark.functions.wordpiece import _wp_greedy
    vocab = {"un", "##aff", "##able", "##ff", "a", "##b", "hug", "##s"}
    assert _wp_greedy("unaffable", vocab, 5) == ["un", "##aff", "##able"]
    assert _wp_greedy("hugs", vocab, 5) == ["hug", "##s"]
    # no word-initial match -> None ([UNK])
    assert _wp_greedy("zzz", vocab, 5) is None
    # greedy = LONGEST first: "##aff" beats "##a"+"##ff" even when both
    # cover (add ##a to prove it)
    v2 = vocab | {"##a"}
    assert _wp_greedy("unaffable", v2, 5) == ["un", "##aff", "##able"]
    # mid-word dead end -> None even though a prefix matched
    assert _wp_greedy("unq", v2, 5) is None


def test_wp_twin_matchers_agree():
    from crawlspark.functions.wordpiece import (_wp_greedy,
                                                py_wordpiece_token_count)
    vocab = ["a", "##b", "ab", "##ba", "x", "##yz", "q"]
    vset = set(vocab)
    texts = ["abba ab ba x xyz q qq zz", "ababab xyzyz", "", "a b ab"]
    for t in texts:
        nt = nu = 0
        for w in t.split():
            toks = _wp_greedy(w, vset, 3)
            if toks is None:
                nt += 1
                nu += 1
            else:
                nt += len(toks)
        assert (nt, nu) == py_wordpiece_token_count(t, vocab), t


def test_wp_train_spark_matches_twin(spark):
    from crawlspark.functions.wordpiece import (py_wordpiece_merges,
                                                py_wordpiece_token_count,
                                                wordpiece_token_counts,
                                                wordpiece_train)
    texts = ["the scan table scan fast", "table scan the fast scan",
             "unaffable hugs hug", "the the the fast zq"] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    ms, vs = wordpiece_train(docs, n_merges=16, min_freq=2)
    mp, vp = py_wordpiece_merges(texts, 16, min_freq=2)
    assert ms == mp          # ranks, pairs, counts AND micro-scores
    assert vs == vp          # identical vocab inventory
    got = {r["doc_id"]: (r["n_wp_tokens"], r["n_unk"]) for r in
           wordpiece_token_counts(docs, vs).collect()}
    want = {i: py_wordpiece_token_count(t, vp)
            for i, t in enumerate(texts)}
    assert got == want
    # coverage sanity: training corpus has no [UNK] words (every char
    # was seeded), so n_unk == 0 everywhere
    assert all(nu == 0 for _, nu in got.values())


def test_wp_unk_on_foreign_corpus(spark):
    from crawlspark.functions.wordpiece import (py_wordpiece_merges,
                                                wordpiece_token_counts)
    _, vocab = py_wordpiece_merges(["aa ab ba bb"], 4, min_freq=1)
    docs = spark.createDataFrame([(0, "aa zz azb")], ["doc_id", "text"])
    row = wordpiece_token_counts(docs, vocab).collect()[0]
    # "zz" -> [UNK]; "azb": 'a' matches, '##z' doesn't -> [UNK]
    assert row["n_unk"] == 2
