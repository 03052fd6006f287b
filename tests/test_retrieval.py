"""bm25_topk unit tests: pure-Python differential on a small corpus plus
semantic properties (idf ordering, tf saturation, length normalization).
The driver entry pins the DuckDB differential at sf0.01."""

import math

from pyspark.sql import functions as F

from crawlspark.functions.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _py_bm25(docs, queries, k=5):
    toks = {d: t.lower().split() for d, t in docs if t.strip()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, terms in queries:
        scores = {}
        for t in set(terms):
            df = sum(1 for tk in toks.values() if t in tk)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for d, tk in toks.items():
                tf = tk.count(t)
                if tf:
                    scores[d] = scores.get(d, 0.0) + (
                        idf * tf * (K1 + 1)
                        / (tf + K1 * (1 - B + B * len(tk) / avgdl)))
        ranked = sorted(((round(s, 6), d) for d, s in scores.items()),
                        key=lambda x: (-x[0], x[1]))[:k]
        out[qid] = [(d, s) for s, d in ranked]
    return out


def _run(spark, docs, queries, k=5):
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        ["query_id", "term"])
    got = {}
    for r in bm25_topk(ddf, qdf, k=k).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    return {q: [(d, s) for _, d, s in sorted(v)] for q, v in got.items()}


def test_bm25_differential(spark):
    docs = [(i, " ".join("w%d" % ((i * 7 + j * 3) % 13)
                         for j in range(5 + i % 9))) for i in range(40)]
    queries = [(0, ["w0", "w5"]), (1, ["w1"]), (2, ["w12", "w3"]),
               (3, ["nosuchterm"])]
    exp = _py_bm25(docs, queries)
    got = _run(spark, docs, queries)
    for qid, want in exp.items():
        if not want:
            assert qid not in got
            continue
        assert [d for d, _ in got[qid]] == [d for d, _ in want], qid
        for (gd, gs), (wd, ws) in zip(got[qid], want):
            assert abs(gs - ws) < 1e-6, (qid, gd)


def test_bm25_rare_term_outranks_common(spark):
    docs = [(1, "common rare"), (2, "common other"), (3, "common thing"),
            (4, "common stuff")]
    got = _run(spark, docs, [(0, ["rare"]), (1, ["common"])])
    # the rare-term query puts doc 1 first with a higher score than any
    # common-term hit (idf of a 1-df term beats a 4-df term)
    assert got[0][0][0] == 1
    assert got[0][0][1] > got[1][0][1]


def test_bm25_length_normalization(spark):
    # same tf=1 for 'x': the SHORTER doc scores higher
    docs = [(1, "x " + "pad " * 20), (2, "x y")]
    got = _run(spark, docs, [(0, ["x"])])
    assert [d for d, _ in got[0]] == [2, 1]


def test_bm25_tf_saturation(spark):
    # tf 4 vs 1 at equal length: higher tf wins but sublinearly
    docs = [(1, "x x x x"), (2, "x y z w"), (3, "a b c d")]
    got = _run(spark, docs, [(0, ["x"])])
    assert [d for d, _ in got[0]] == [1, 2]
    assert got[0][0][1] < 4 * got[0][1][1]


# -- unigram LM scoring ---------------------------------------------------------

def test_unigram_logprob_exact_math(spark):
    import math
    from crawlspark.functions.text import unigram_logprob
    docs = [(1, "a a b"), (2, "b c")]
    # corpus: a:2 b:2 c:1, T=5
    got = {r.doc_id: r for r in
           unigram_logprob(spark.createDataFrame(
               docs, ["doc_id", "text"])).collect()}
    lp = {t: round(math.log(c / 5) * 1_000_000)
          for t, c in [("a", 2), ("b", 2), ("c", 1)]}
    want1 = 2 * lp["a"] + lp["b"]
    want2 = lp["b"] + lp["c"]
    assert (got[1].n_tokens, got[1].sum_lp_micro) == (3, want1)
    assert (got[2].n_tokens, got[2].sum_lp_micro) == (2, want2)
    # int() truncates toward zero like Spark div / DuckDB //
    assert got[1].mean_lp_micro == int(want1 / 3)
    # rarer tokens => lower (more negative) mean logprob
    assert got[2].mean_lp_micro < got[1].mean_lp_micro


def test_unigram_logprob_common_docs_score_higher(spark):
    from crawlspark.functions.text import unigram_logprob
    docs = [(i, "common words here") for i in range(9)] + [(9, "zzz qqq")]
    got = {r.doc_id: r.mean_lp_micro for r in
           unigram_logprob(spark.createDataFrame(
               docs, ["doc_id", "text"])).collect()}
    assert got[9] < min(got[i] for i in range(9))


def test_retrieval_true_rank_matches_sort_mirror(spark):
    import numpy as np

    from crawlspark.functions.similarity import retrieval_true_rank
    corpus_rows = [(i, [float(((i * 3 + j) % 7) - 3) for j in range(6)])
                   for i in range(0, 30, 2)]
    query_rows = [(i + 1, [float(((i * 3 + j + 1) % 7) - 3)
                           for j in range(6)], i)
                  for i in range(0, 30, 2)]
    q = spark.createDataFrame(
        query_rows, "query_id long, qv array<double>, true_id long")
    c = spark.createDataFrame(
        corpus_rows, "neighbor_id long, cv array<double>")
    got = {r.query_id: (r.true_rank, r.hit1, r.hit5, r.hit10)
           for r in retrieval_true_rank(q, c).collect()}
    # sequential mirror: full sort per query
    for qid, qv, tid in query_rows:
        qa = np.array(qv)
        scores = []
        for nid, cv in corpus_rows:
            ca = np.array(cv)
            na, nb = np.sqrt(qa @ qa), np.sqrt(ca @ ca)
            cos = float(qa @ ca / (na * nb)) if na > 0 and nb > 0 else 0.0
            scores.append((-round(cos, 6), nid))
        scores.sort()
        rank = 1 + [nid for _, nid in scores].index(tid)
        assert got[qid] == (rank, rank <= 1, rank <= 5, rank <= 10), qid
