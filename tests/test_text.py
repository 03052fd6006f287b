

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
        (4, "\n".join(["trailing..."] * 9 + [good])),  # 90% ellipsis... wait
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
    assert got[5]["keep"] is False and got[5]["n_stop_hits"] < 2
    # boundary exactness: mean word length exactly 3.0 passes (>=)
    b = spark.createDataFrame(
        [(9, "the and foo bar baz qux " * 5)], ["doc_id", "text"])
    r9 = gopher_quality(b, min_words=20).collect()[0]
    assert r9["n_word_chars"] == 3 * r9["n_words"] and r9["keep"]
