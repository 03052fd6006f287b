"""Training-data operators: text analysis, dedup families, similarity,
multimodal plumbing."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlspark.functions import dedup, multimodal, similarity, text
from crawlspark.imaging import encode, make_pixels


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),   # near dup
        (3, "completely different text about spark engines here"),
        (4, "el gato y el perro en la casa de la abuela"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_counts(spark, docs):
    got = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", text.token_count(F.col("text")).alias("n")).collect()}
    assert got[0] == 9 and got[5] == 0


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([("hello, world! x2",)], ["t"])
    n = df.select(text.bpe_ish_token_count(
        F.col("t")).alias("n")).collect()[0]["n"]
    assert n == 6  # hello , world ! x 2


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["l"] for r in docs.select(
        "doc_id", text.lang_id(F.col("text")).alias("l")).collect()}
    assert got[0] == "en" and got[4] == "es" and got[5] == "unknown"
    jp = spark.createDataFrame([("日本語のテキストです",)], ["text"])
    assert jp.select(text.lang_id(
        F.col("text")).alias("l")).collect()[0]["l"] == "cjk"


def test_quality_and_fingerprint(spark, docs):
    rows = docs.select(
        "doc_id",
        text.quality_score(F.col("text")).alias("q"),
        text.fingerprint(F.col("text")).alias("fp")).collect()
    by = {r["doc_id"]: r for r in rows}
    assert 0 <= by[0]["q"] <= 1
    assert by[0]["fp"] == by[1]["fp"]          # identical prefix
    assert by[0]["fp"] != by[3]["fp"]


def test_exact_dedup(spark, docs):
    pairs = dedup.exact_dup_pairs(docs).collect()
    assert {(p["left_id"], p["right_id"]) for p in pairs} == {(0, 1)}
    groups = dedup.exact_dedup(docs).filter(F.col("n_copies") > 1).collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 0


def test_ngram_jaccard(spark, docs):
    pairs = {(p["left_id"], p["right_id"]): p["jaccard"]
             for p in dedup.ngram_jaccard_pairs(docs, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0


def test_minhash_lsh(spark, docs):
    pairs = {(p["left_id"], p["right_id"]): p["jaccard"]
             for p in dedup.minhash_lsh_pairs(docs, 0.5).collect()}
    assert (0, 1) in pairs     # identical docs always collide
    assert all(j >= 0.5 for j in pairs.values())


def test_simhash(spark, docs):
    pairs = dedup.simhash_pairs(docs, max_distance=10).collect()
    ids = {(p["left_id"], p["right_id"]) for p in pairs}
    assert (0, 1) in ids
    d = {(p["left_id"], p["right_id"]): p["distance"] for p in pairs}
    assert d[(0, 1)] == 0


@pytest.fixture(scope="module")
def vectors(spark):
    # i*7 % 11 has period 11 → keep i < 11 so all base vectors are distinct
    rng = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)], i % 3)
           for i in range(10)]
    rng.append((100, rng[0][1], 0))  # identical to vec 0
    return spark.createDataFrame(
        rng, "vec_id long, embedding array<float>, label int").cache()


def test_brute_force_topk(spark, vectors):
    top = similarity.brute_force_topk(
        vectors.filter(F.col("vec_id") == 0), vectors, k=3)
    rows = top.orderBy("rank").collect()
    assert rows[0]["neighbor_id"] == 100 and rows[0]["cosine"] == 1.0
    assert len(rows) == 3


def test_lsh_topk_recall_of_identical(spark, vectors):
    top = similarity.lsh_topk(
        vectors.filter(F.col("vec_id") == 0), vectors, k=3)
    rows = top.orderBy("rank").collect()
    assert rows and rows[0]["neighbor_id"] == 100  # same bucket guaranteed


def test_embedding_neardup(spark, vectors):
    pairs = dedup.embedding_neardup_pairs(vectors, threshold=0.999)
    got = {(p["left_id"], p["right_id"]) for p in pairs.collect()}
    assert (0, 100) in got


def test_phash_dup_pairs(spark):
    imgs = spark.createDataFrame(
        [("a", 42), ("b", 42), ("c", 7)], "image_id string, phash long")
    got = {(p["left_id"], p["right_id"])
           for p in dedup.phash_dup_pairs(imgs).collect()}
    assert got == {("a", "b")}


def test_image_features_and_resize(spark):
    rows = [(f"img{i}", encode(make_pixels(i, 32, 48), "png"), "png")
            for i in range(4)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    feats = multimodal.image_features(df).collect()
    assert len(feats) == 4
    assert all(r["w"] == 32 and r["h"] == 48 for r in feats)
    assert all(sum(r["luma_hist"]) == 32 * 48 for r in feats)
    rsz = multimodal.resize_images(df, 16, 16).collect()
    assert all(r["w"] == 16 for r in rsz)


def test_multimodal_stubs(spark):
    rows = [("m1", "audio", b"payload-1", multimodal.FAKE_AUDIO_FMT, {})]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.audio_features(media).collect()
    assert feats[0]["n_samples"] == 1600 and feats[0]["rms"] > 0
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio_batch([b"x"], ["mp3"])
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames([b"x"], ["mp4"])


def test_phash_near_dup_matches_bruteforce(spark):
    # hand-built phashes with known pairwise distances, incl. negatives and
    # the 3/4 threshold boundary
    rows = [
        ("a", 0x0123456789ABCDEF), ("b", 0x0123456789ABCDEE),   # d=1
        ("c", 0x0123456789ABCDEF ^ (0x7 << 20)),                # d=3 vs a
        ("d", 0x0123456789ABCDEF ^ 0xF),                        # d=4 vs a
        ("e", -6148914691236517206), ("f", -6148914691236517206),  # d=0
        ("g", -1), ("h", 0),                                    # d=64
    ]
    to_signed = lambda u: u - (1 << 64) if u >= (1 << 63) else u
    df = spark.createDataFrame(
        [(i, to_signed(h & ((1 << 64) - 1))) for i, h in rows],
        "image_id string, phash long")
    got = {(r["left_id"], r["right_id"]): r["distance"]
           for r in dedup.phash_near_dup(df, max_distance=3).collect()}
    exp = {}
    vals = [(i, h & ((1 << 64) - 1)) for i, h in rows]
    for x in range(len(vals)):
        for y in range(x + 1, len(vals)):
            d = bin(vals[x][1] ^ vals[y][1]).count("1")
            li, ri = sorted((vals[x][0], vals[y][0]))
            if d <= 3:
                exp[(li, ri)] = d
    assert got == exp and ("a", "d") not in got and got[("a", "c")] == 3


def test_ivf_topk_recall_vs_bruteforce(spark):
    # clustered synthetic embeddings: 4 well-separated direction clusters
    # => IVF with enough probes must recover the exact top-k
    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(160):
        v = base[i % 4] + 0.05 * rng.normal(size=16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 40 == 0)

    exact = similarity.brute_force_topk(queries, emb, k=5)
    approx = similarity.ivf_topk(queries, emb, k=5, n_cells=4, n_probe=2,
                                 sample_stride=2)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.95, recall


def test_ivf_quantizer_sample_is_absolutely_bounded(spark):
    # 10k-row corpus, max_sample=100: the driver-side sample must be
    # hard-capped at max_sample rows no matter the corpus size (round-2
    # review: the old stride-fraction sample was a driver OOM at 10^9)
    emb = (spark.range(10_000).selectExpr(
        "id as vec_id",
        "array(cast(id % 7 as double), cast(id % 11 as double), 1.0d)"
        " as embedding"))
    s = similarity.quantizer_sample(emb, max_sample=100)
    assert 4 <= len(s) <= 100, len(s)
    # deterministic: same data, same sample
    s2 = similarity.quantizer_sample(emb, max_sample=100)
    assert np.array_equal(s, s2)


def test_ivf_train_is_deterministic():
    rng = np.random.default_rng(3)
    sample = rng.normal(size=(64, 8))
    a = similarity.ivf_train(sample.copy(), n_cells=4)
    b = similarity.ivf_train(sample.copy(), n_cells=4)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_kmv_distinct_accuracy_and_exact_regime(spark):
    from crawlspark.functions import sketch
    # n >> k: estimate within the ~1/sqrt(k) relative-error envelope
    df = spark.range(0, 20000).select(
        F.concat(F.lit("v"), (F.col("id") % 5000).cast("string"))
        .alias("val"))
    row = sketch.kmv_distinct(df, "val", k=256).collect()[0]
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.2, row
    # distinct < k: the sketch holds everything — exact, kth_hash sentinel
    small = spark.range(0, 100).select(F.col("id").cast("string")
                                       .alias("val"))
    row = sketch.kmv_distinct(small, "val", k=256).collect()[0]
    assert row["est_distinct"] == 100 and row["kth_hash"] == -1


def test_kmv_by_key_matches_single_sketch(spark):
    from crawlspark.functions import sketch
    df = spark.range(0, 6000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        (F.col("id") % 900).alias("val"))
    rows = {r["key"]: r for r in
            sketch.kmv_distinct_by(df, "key", "val", k=64).collect()}
    assert set(rows) == {"0", "1", "2"}
    for r in rows.values():  # each key sees 300 distinct vals, k=64 << 300
        assert abs(r["est_distinct"] - 300) / 300 < 0.35, r


def test_image_features_on_progressive_payloads(spark):
    # progressive and baseline encode the same quantized coefficients, so
    # the whole Spark decode->feature pipeline must produce identical rows
    from crawlspark.imaging import make_pixels
    from crawlspark.jpegcodec import jpeg_encode, jpeg_encode_progressive

    rows = []
    for i in range(8):
        px = make_pixels(i, 32 + 8 * (i % 3), 24)
        rows.append(("base%d" % i, jpeg_encode(px), "jpeg"))
        rows.append(("prog%d" % i, jpeg_encode_progressive(px), "jpeg"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, "
                                     "fmt string")
    feats = {r["media_id"]: r for r in
             multimodal.image_features(df).collect()}
    for i in range(8):
        b, p = feats[f"base{i}"], feats[f"prog{i}"]
        assert b["phash"] == p["phash"]
        assert b["luma_hist"] == p["luma_hist"]
        assert (b["mean_r"], b["mean_g"], b["mean_b"]) == \
               (p["mean_r"], p["mean_g"], p["mean_b"])


def test_repetition_signals(spark):
    from crawlspark.functions.text import (dup_2gram_ratio, top_token_ratio,
                                           uniq_token_ratio)
    import pyspark.sql.functions as SF
    rows = [
        (1, "a a a a"),            # 1 uniq of 4; top=4/4; 2grams: "a a" ×3 → dup 2/3
        (2, "w x y z"),            # all distinct; no dup 2grams
        (3, ""),                   # empty → zeros
        (4, "spam spam ham"),      # top = 2/3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = SF.col("text")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        SF.round(uniq_token_ratio(c), 6).alias("u"),
        SF.round(top_token_ratio(c), 6).alias("t"),
        SF.round(dup_2gram_ratio(c), 6).alias("g")).collect()}
    assert got[1]["u"] == 0.25 and got[1]["t"] == 1.0
    assert got[1]["g"] == round(1 - 1 / 3, 6)
    assert got[2]["u"] == 1.0 and got[2]["g"] == 0.0
    assert got[3]["u"] == 0.0 and got[3]["t"] == 0.0
    assert got[4]["t"] == round(2 / 3, 6)


def test_tfidf_top_terms(spark):
    from crawlspark.functions.text import tfidf_top_terms
    import math
    rows = [(1, "cat cat dog"), (2, "dog fish"), (3, "fish fish fish cat")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: cat tf=2 df=2, dog tf=1 df=2 → cat ranks first
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["cat", "dog"]
    idf2 = math.log(4 / 3) + 1
    assert d1[0]["score"] == round(2 * idf2, 6)
    assert d1[0]["rank"] == 1
    # every doc has at most k rows, ranks contiguous from 1
    for doc, rs in by_doc.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 2


def test_sessionize_gap_boundaries(spark):
    from datetime import datetime

    from crawlspark.functions.sessions import session_stats, sessionize

    T = datetime
    rows = [  # user 1: 3 events, gap of exactly 1800s is NOT a new session
        (1, 1, T(2024, 1, 1, 10, 0, 0)),
        (2, 1, T(2024, 1, 1, 10, 30, 0)),    # +1800s → same session
        (3, 1, T(2024, 1, 1, 11, 0, 1)),     # +1801s → NEW session
        # user 2: single event
        (4, 2, T(2024, 1, 1, 9, 0, 0)),
        # user 1 again, far later
        (5, 1, T(2024, 1, 2, 0, 0, 0)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "ts timestamp_ntz")
    got = {r["event_id"]: r["session_seq"]
           for r in sessionize(ev, gap_s=1800).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 3}
    stats = {(r["user_id"], r["session_seq"]): r
             for r in session_stats(ev, gap_s=1800).collect()}
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["duration_us"] == 1800 * 1_000_000
    assert stats[(1, 2)]["n_events"] == 1
    assert stats[(2, 1)]["duration_us"] == 0


def test_hll_matches_pure_python_mirror_exactly(spark):
    from crawlspark.functions import pyref, sketch
    vals = [f"v{i % 1337}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "val string")
    row = sketch.hll_distinct(df, "val", p=12).collect()[0]
    want = pyref.py_hll(vals, p=12)
    assert row.asDict() == want
    # estimate inside the ~3*1.04/sqrt(m) envelope around true 1337
    assert abs(row["est_distinct"] - 1337) / 1337 < 0.05, row


def test_hll_rho_column_matches_bit_twiddling(spark):
    import pyspark.sql.functions as F

    from crawlspark.functions.pyref import _py_hll_registers
    from crawlspark.functions.sketch import _hll_cols
    p = 12
    # adversarial hash values: all-zero suffix, top-suffix-bit set,
    # single low bits, and a spread of pseudo-random longs
    hs = [0, 1, (1 << (64 - p)) - 1, 1 << 52, (1 << 63) | 5, -1 & ((1 << 64) - 1)]
    hs += [(0x9E3779B97F4A7C15 * i) & ((1 << 64) - 1) for i in range(1, 64)]
    signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hs]
    df = spark.createDataFrame([(h,) for h in signed], "h long")
    idx, rho = _hll_cols(F.col("h"), p)
    got = {(r["i"], r["r"]) for r in
           df.select(idx.alias("i"), rho.alias("r")).collect()}
    want = set()
    width = 64 - p
    for h in hs:
        w = h & ((1 << width) - 1)
        want.add((h >> width, width - w.bit_length() + 1))
    assert got == want


def test_hll_by_key_matches_mirror(spark):
    from crawlspark.functions import pyref, sketch
    pairs = [(f"k{i % 3}", (i * 7) % 500) for i in range(4000)]
    df = spark.createDataFrame(pairs, "key string, val long")
    rows = sorted((r.asDict() for r in
                   sketch.hll_distinct_by(df, "key", "val", p=10).collect()),
                  key=lambda r: r["key"])
    assert rows == pyref.py_hll_by(pairs, p=10)


def _py_zkey(vals, bits):
    key = 0
    k = len(vals)
    for j in range(bits):
        for i, v in enumerate(vals):
            key += ((v >> j) & 1) << (j * k + (k - 1 - i))
    return key


def test_zorder_key_hand_and_mirror(spark):
    from crawlspark.functions.layout import zorder_key
    # k=2, bits=2: w=2 (bit1 -> pos 3), h=1 (bit0 -> pos 0) => 9
    assert _py_zkey([2, 1], 2) == 9
    rows = [(w, h) for w in range(0, 16, 3) for h in range(0, 16, 5)]
    df = spark.createDataFrame(rows, "w int, h int")
    got = {(r.w, r.h): r.k for r in
           df.select("w", "h", zorder_key(["w", "h"], bits=4).alias("k"))
           .collect()}
    for w, h in rows:
        assert got[(w, h)] == _py_zkey([w, h], 4), (w, h)


def test_zorder_layout_matches_brute_force(spark):
    from crawlspark.functions.layout import zorder_layout
    rows = [(f"id{i:04d}", (i * 7) % 32, (i * 13) % 32)
            for i in range(100)]
    df = spark.createDataFrame(rows, "rid string, w int, h int")
    got = sorted((r.file_id, r.n_rows, r.min_key, r.max_key) for r in
                 zorder_layout(df, ["w", "h"], rows_per_file=16,
                               tiebreak="rid", bits=5).collect())
    order = sorted((_py_zkey([w, h], 5), rid) for rid, w, h in rows)
    want = {}
    for rank, (key, _) in enumerate(order):
        fid = rank // 16
        n, lo, hi = want.get(fid, (0, key, key))
        want[fid] = (n + 1, min(lo, key), max(hi, key))
    assert got == sorted((f, n, lo, hi)
                         for f, (n, lo, hi) in want.items())


def test_cm_sketch_estimate_matches_mirror_and_overestimates(spark):
    from crawlspark.functions import pyref, sketch
    vals = [f"t{i % 37}" for i in range(2000)] + ["hot"] * 500
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    sk = sketch.cm_sketch(df, "tok", w=256, d=4)
    est = {r["value"]: r["est_count"] for r in
           sketch.cm_estimate(sk, df.distinct(), "tok",
                              w=256, d=4).collect()}
    want = pyref.py_cm_topk(vals, w=256, d=4, k=38)
    for row in want:
        assert est[row["value"]] == row["est_count"], row
        assert row["est_count"] >= row["true_count"], row
    # wide sketch, few distinct values: no collisions, estimates exact
    sk2 = sketch.cm_sketch(df, "tok", w=65536, d=4)
    est2 = {r["value"]: r["est_count"] for r in
            sketch.cm_estimate(sk2, df.distinct(), "tok",
                               w=65536, d=4).collect()}
    assert est2["hot"] == 500 and est2["t0"] == 55


def test_cm_sketch_merges_by_counter_addition(spark):
    import pyspark.sql.functions as F

    from crawlspark.functions import sketch
    a = spark.createDataFrame([(f"x{i % 9}",) for i in range(300)],
                              "tok string")
    b = spark.createDataFrame([(f"x{i % 13}",) for i in range(200)],
                              "tok string")
    merged = (sketch.cm_sketch(a, "tok", w=128, d=3)
              .unionByName(sketch.cm_sketch(b, "tok", w=128, d=3))
              .groupBy("row", "cm_col").agg(F.sum("cnt").alias("cnt")))
    direct = sketch.cm_sketch(a.unionByName(b), "tok", w=128, d=3)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))



def test_nb_quality_scores_matches_sequential_mirror(spark):
    import math
    from collections import Counter

    from crawlspark.functions.text import nb_quality_scores
    texts = ["good clean prose here", "spam spam buy now", "clean text",
             "buy spam now now", "prose and text", "now now now"]
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = docs.withColumn("label", F.col("doc_id") % 2 == 0)
    got = {r.doc_id: (r.n_tokens, r.score_micro, r.predict_pos)
           for r in nb_quality_scores(train, docs).collect()}
    # sequential mirror with identical rounding discipline
    cp, cn = Counter(), Counter()
    n_pos = n_all = 0
    for i, t in rows:
        n_all += 1
        lab = i % 2 == 0
        n_pos += lab
        for w in t.lower().split():
            (cp if lab else cn)[w] += 1
    vocab = set(cp) | set(cn)
    tp, tn, v = sum(cp.values()), sum(cn.values()), len(vocab)
    odds = {w: round(math.log((cp[w] + 1) / (tp + v)) * 1e6)
            - round(math.log((cn[w] + 1) / (tn + v)) * 1e6)
            for w in vocab}
    prior = round(math.log((n_pos + 1) / (n_all - n_pos + 1)) * 1e6)
    for i, t in rows:
        toks = t.lower().split()
        score = prior + sum(odds[w] for w in toks if w in odds)
        assert got[i] == (len(toks), score, score > 0), i
    # sanity: the spammy doc scores below the clean one
    assert got[1][1] < got[0][1]


def test_c4_line_clean(spark):
    """C4 line rules (terminal punct + >=5 words + no 'javascript') and
    page rules (lorem ipsum / brace / min kept lines) — including the
    subtlety that a line-wise-kept 'lorem ipsum ...' sentence still
    page-drops the document."""
    df = spark.createDataFrame([
        (1, "Good line with many words here.\nshort line.\n"
            "Enable javascript to view this now.\n"
            "Another excellent line of text here!\n"
            "trailing no punct line words here"),
        (2, "lorem ipsum dolor sit amet today.\n"
            "Good line with many words here.\n"
            "Another excellent line of text here!\n"
            "A third very good long line here."),
        (3, "function f() { return 1; }\nGood line with many words here.\n"
            "Another excellent line of text here!\n"
            "A third very good long line here."),
        (4, "Good line with many words here.\n"
            "Another excellent line of text here!\n"
            "A third very good long line here."),
    ], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            text.c4_line_clean(df, min_kept_lines=3).collect()}
    assert (rows[1]["n_lines"], rows[1]["n_kept"], rows[1]["keep"]) == \
        (5, 2, False)
    # doc 2: all four lines pass the LINE rules (n_kept=4) but the page
    # drops on the lorem-ipsum substring
    assert (rows[2]["n_kept"], rows[2]["keep"]) == (4, False)
    assert rows[2]["clean_text"] is None
    assert (rows[3]["n_kept"], rows[3]["keep"]) == (3, False)  # brace
    assert rows[4]["keep"] is True
    assert rows[4]["clean_text"] == (
        "Good line with many words here.\n"
        "Another excellent line of text here!\n"
        "A third very good long line here.")


def test_sample_quantiles_accuracy_and_merge(spark):
    """Bottom-m sample quantiles: (a) within the O(1/sqrt(m)) band of the
    true quantiles; (b) exact percentile_disc-lower when m >= n; (c) the
    sample is mergeable — bottom-m of the union == re-taken bottom-m of
    per-part samples (KMV-style by construction)."""
    import pyspark.sql.functions as F
    from crawlspark.functions.sketch import sample_quantiles
    n = 20_000
    df = spark.range(n).selectExpr("id as k", "id as v")
    got = {r["q_ppm"]: r["value_est"]
           for r in sample_quantiles(df, "v", "k", m=1024).collect()}
    for ppm, est in got.items():
        true = (ppm / 1e6) * (n - 1)
        assert abs(est - true) <= 4 * n / (1024 ** 0.5), (ppm, est, true)
    # m >= n: the sample is the whole set, quantiles exact
    small = spark.range(100).selectExpr("id as k", "id as v")
    exact = {r["q_ppm"]: r["value_est"]
             for r in sample_quantiles(small, "v", "k", m=4096).collect()}
    # ceil(q*100) 1-based over 0..99 => value ceil(q*100)-1
    assert exact == {500_000: 49, 900_000: 89, 990_000: 98}
    # mergeability: union of two parts' bottom-m == bottom-m of the union
    h = F.xxhash64(F.col("k"))
    parts = [df.filter(F.col("k") % 2 == i) for i in (0, 1)]
    bm = lambda d: d.select("v", h.alias("h"), "k").orderBy("h", "k") \
                    .limit(256)
    merged = bm(bm(parts[0]).unionByName(bm(parts[1])))
    direct = bm(df)
    assert sorted(r["v"] for r in merged.collect()) == \
        sorted(r["v"] for r in direct.collect())


def test_c4_line_clean_idempotent(spark):
    """Cleaning a kept page's clean_text keeps everything unchanged: kept
    lines already satisfy every line rule, a kept page has >= the line
    floor, and page-kill substrings cannot appear in surviving lines."""
    docs = spark.createDataFrame(
        [(i,
          "\n".join(
              [f"Line number {i} with plenty of words here{p}"
               for p in (".", "!", "?", "")] +
              ["tiny line."] +
              (["lorem ipsum dolor sit amet today."] if i % 5 == 0 else [])
          )) for i in range(40)],
        ["doc_id", "text"])
    first = text.c4_line_clean(docs)
    kept = first.filter("keep").select(
        "doc_id", F.col("clean_text").alias("text"))
    again = {r["doc_id"]: r for r in
             text.c4_line_clean(kept).collect()}
    for r in first.filter("keep").collect():
        a = again[r["doc_id"]]
        assert a["keep"] is True
        assert a["clean_text"] == r["clean_text"]
        assert a["n_lines"] == a["n_kept"] == r["n_kept"]
    # and the lorem-ipsum docs were dropped in the first pass
    dropped = {r["doc_id"] for r in first.filter("NOT keep").collect()}
    assert {i for i in range(40) if i % 5 == 0} <= dropped
