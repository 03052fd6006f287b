

def test_gopher_quality_rules(spark):
    """Each Gopher rule (Rae et al. 2021 App. A1) fires independently;
    thresholds are integer-exact (boundary cases pinned)."""
    from crawlspark.functions.text import gopher_quality

    good = ("the be to of words appear here and that have with more "
            "filler tokens keep this document healthy ") * 2
    rows = [
        (0, good),                                    # passes all rules
        (1, "the of and"),                            # too few words
        (2, "# " * 40 + good),                        # symbol ratio >= 0.1
        (3, "\n".join(["- bullet line"] * 19 + [good])),   # 95% bullets
        (4, "\n".join(["trailing..."] * 9 + [good])),  # 90% ellipsis lines
        (5, "the quick brown fox jumps high over rocks near water "
            "while birds sing sweet songs during early morning "
            "hours before sunrise comes gently "),    # only 1 stopword
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           gopher_quality(docs, min_words=20).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["n_words"] == 3
    assert got[2]["keep"] is False            # 10*n_symbols >= n_words
    assert got[3]["keep"] is False            # bullet lines >= 90%
    assert got[4]["keep"] is False            # ellipsis lines >= 30%
    assert got[4]["n_ellipsis_lines"] == 9 and got[4]["n_lines"] == 10
    assert got[5]["keep"] is False and got[5]["n_stop_hits"] < 2
    # boundary exactness: mean word length exactly 3.0 passes (>=)
    b = spark.createDataFrame(
        [(9, "the and foo bar baz qux " * 5)], ["doc_id", "text"])
    r9 = gopher_quality(b, min_words=20).collect()[0]
    assert r9["n_word_chars"] == 3 * r9["n_words"] and r9["keep"]


def test_bigram_logprob_hand_model(spark):
    """Hand-computed add-one bigram model on a tiny corpus: the operator
    reproduces exact micro-nat scores (non-shared-code pin)."""
    import math

    from crawlspark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "b a"), (3, "a")],
        ["doc_id", "text"])
    # corpus bigrams: doc0: (a,b)x2? -> a b a b: (a,b),(b,a),(a,b);
    # doc1: (a,b); doc2: (b,a). c12: (a,b)=3, (b,a)=2.
    # marginals: c1(a)=3, c1(b)=2. V=2.
    lp_ab = round(math.log((3 + 1) / (3 + 2)) * 1e6)
    lp_ba = round(math.log((2 + 1) / (2 + 2)) * 1e6)
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_lp_micro"],
                         r["mean_lp_micro"]) for r in
           bigram_logprob(docs).collect()}
    s0 = 2 * lp_ab + lp_ba
    assert got[0] == (3, s0, s0 // 3 if s0 >= 0 else -((-s0) // 3))
    assert got[1] == (1, lp_ab, lp_ab)
    assert got[2] == (1, lp_ba, lp_ba)
    assert 3 not in got          # single-token doc: no bigrams, no row


def test_trigram_logprob_hand_model(spark):
    """Hand-computed add-one TRIGRAM model on a tiny corpus — the
    order-3 widening of the bigram key (non-shared-code pin). Doc 4
    holds a token that occurs ONLY there (1-token doc): it appears in
    no trigram, so it pins the _vocab_size short-doc sweep — V must be
    4, not 3."""
    import math

    from crawlspark.functions.text import trigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b c"), (2, "b c a"),
         (3, "a b"), (4, "z")],
        ["doc_id", "text"])
    # trigrams — d0: (a,b,c),(b,c,a),(c,a,b),(a,b,c); d1: (a,b,c);
    # d2: (b,c,a). c123: abc=3, bca=2, cab=1.
    # contexts: c12(a,b)=3, c12(b,c)=2, c12(c,a)=1. V={a,b,c,z}=4.
    lp_abc = round(math.log((3 + 1) / (3 + 4)) * 1e6)
    lp_bca = round(math.log((2 + 1) / (2 + 4)) * 1e6)
    lp_cab = round(math.log((1 + 1) / (1 + 4)) * 1e6)
    got = {r["doc_id"]: (r["n_trigrams"], r["sum_lp_micro"],
                         r["mean_lp_micro"]) for r in
           trigram_logprob(docs).collect()}
    s0 = 2 * lp_abc + lp_bca + lp_cab
    t0 = s0 // 4 if s0 >= 0 else -((-s0) // 4)
    assert got[0] == (4, s0, t0)
    assert got[1] == (1, lp_abc, lp_abc)
    assert got[2] == (1, lp_bca, lp_bca)
    assert 3 not in got and 4 not in got   # <3 tokens: no trigrams


def test_bigram_vocab_counts_short_doc_only_tokens(spark):
    """_vocab_size regression for order 2: a token occurring ONLY in a
    1-token doc joins V even though it is in no bigram (the refactor
    away from the second corpus countDistinct pass must not drop it)."""
    import math

    from crawlspark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "q")], ["doc_id", "text"])
    # c12(a,b)=1, c1(a)=1, V={a,b,q}=3
    lp_ab = round(math.log((1 + 1) / (1 + 3)) * 1e6)
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_lp_micro"]) for r in
           bigram_logprob(docs).collect()}
    assert got == {0: (1, lp_ab)}


def test_chunk_documents_grammar(spark):
    """Chunk grammar pins: coverage (every token in >=1 chunk), exact
    overlap between consecutive chunks, short-doc single chunk, empty
    and null docs yield no rows, invalid params raise."""
    import pytest as _pt

    from crawlspark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))),
         (1, "a b"), (2, ""), (3, None)], ["doc_id", "text"])
    rows = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"].split()))
    c0 = [t for _i, t in sorted(by_doc[0])]
    assert [len(c) for c in c0] == [4, 4, 4]
    # stride 3: consecutive chunks share exactly 1 token
    assert c0[0][-1:] == c0[1][:1] and c0[1][-1:] == c0[2][:1]
    # full coverage in order
    assert c0[0] + c0[1][1:] + c0[2][1:] == [f"t{i}" for i in range(10)]
    assert by_doc[1] == [(0, ["a", "b"])]
    assert 2 not in by_doc and 3 not in by_doc
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_ws_tokens_python_split_semantics(spark):
    """ws_tokens == python str.split() on every whitespace edge: trailing
    newline/tab (the round-4 review divergence — trim strips 0x20 only),
    leading whitespace, interior runs, all-whitespace, empty."""
    from pyspark.sql import functions as F

    from crawlspark.functions.text import ws_tokens

    cases = ["a b\n", "a b\t", "\n a  b ", "a\n\nb", "\t\n ", "", "a",
             " a ", "x\r\ny"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               ["i", "t"])
    got = {r["i"]: r["toks"] for r in
           df.select("i", ws_tokens(F.col("t")).alias("toks")).collect()}
    for i, t in enumerate(cases):
        assert got[i] == t.split(), (t, got[i])


def test_ngram_logprob_random_corpora_vs_python(spark):
    """Hypothesis differential for the shared _ngram_logprob scorer
    (orders 2 and 3) against an independent Counter-based python model:
    random tiny corpora over a 4-word alphabet, including empty docs
    and docs shorter than the order (the _vocab_size short-doc sweep).
    Exact integer equality — micro-nat rounding, BIGINT sums, div mean."""
    import math
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from crawlspark.functions.text import bigram_logprob, trigram_logprob

    def py_ref(docs, order):
        toks = {i: [w.lower() for w in t.split()] for i, t in docs}
        dgrams = {i: Counter(zip(*[ws[j:] for j in range(order)]))
                  for i, ws in toks.items() if len(ws) >= order}
        cfull = Counter()
        for c in dgrams.values():
            cfull.update(c)
        cctx = Counter()
        for g, n in cfull.items():
            cctx[g[:-1]] += n
        vocab = set()
        for ws in toks.values():
            vocab.update(ws)
        v = len(vocab)
        out = {}
        for i, c in dgrams.items():
            s = n = 0
            for g, k in c.items():
                lp = round(math.log((cfull[g] + 1)
                                    / (cctx[g[:-1]] + v)) * 1e6)
                s += k * lp
                n += k
            out[i] = (n, s, s // n if s >= 0 else -((-s) // n))
        return out

    word = st.sampled_from(["a", "b", "cc", "Dd"])
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)

    @settings(derandomize=True, max_examples=12, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def check(texts):
        docs = list(enumerate(texts))
        sdf = spark.createDataFrame(docs, ["doc_id", "text"])
        for order, fn, ncol in ((2, bigram_logprob, "n_bigrams"),
                                (3, trigram_logprob, "n_trigrams")):
            got = {r["doc_id"]: (r[ncol], r["sum_lp_micro"],
                                 r["mean_lp_micro"])
                   for r in fn(sdf).collect()}
            assert got == py_ref(docs, order), (order, texts)

    check()
