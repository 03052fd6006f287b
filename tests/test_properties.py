"""Property-based tests (hypothesis) over the pure-Python kernels.

The reference pins these semantics with table-driven Go tests; properties
generalize those tables: idempotence/normal-form laws for URL
canonicalization, an independent brute-force mirror for REP longest-match,
glob-vs-fnmatch agreement, codec round-trip laws, and a bit-exact unpack
mirror for the JPEG Huffman bit packer. No SparkSession needed — the same
functions run inside the Arrow UDFs, so laws proven here hold on-cluster.

derandomize=True: a flaky CI failure costs more than exhaustive novelty;
the example databases still grow per run.
"""

import fnmatch
import re

import numpy as np
from hypothesis import example, given, settings, strategies as st

from crawlspark.frontier.robots import rule_allows
from crawlspark.imaging import (hamming64, make_pixels, phash64, png_decode,
                                png_encode, psnr)
from crawlspark.jpegcodec import _pack_bits, jpeg_decode, jpeg_encode
from crawlspark.operators.extract import glob_to_regex
from crawlspark.urltools import canonicalize

SET = settings(derandomize=True, max_examples=200, deadline=None)

# --- URL canonicalization -------------------------------------------------------

_url_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00\r\n"),
    max_size=40)
_hosts = st.from_regex(r"[a-z]{1,10}(\.[a-z]{1,8}){1,2}", fullmatch=True)
_paths = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}", fullmatch=True)
_query_pairs = st.lists(
    st.tuples(st.from_regex(r"[a-z]{1,5}", fullmatch=True),
              st.from_regex(r"[a-zA-Z0-9]{0,6}", fullmatch=True)),
    max_size=5)


@SET
@given(_url_text)
def test_canonicalize_never_crashes_and_is_idempotent(u):
    c = canonicalize(u)
    if c is not None:
        assert canonicalize(c) == c  # canonical form is a fixed point
        assert c.startswith(("http://", "https://"))
        assert "#" not in c  # fragments always stripped


@SET
@given(_hosts, _paths, _query_pairs)
def test_canonicalize_query_order_invariance(host, path, pairs):
    from urllib.parse import urlencode
    base = f"http://{host}{path or '/'}"
    a = canonicalize(base + ("?" + urlencode(pairs) if pairs else ""))
    b = canonicalize(base + ("?" + urlencode(pairs[::-1]) if pairs else ""))
    if all(k != k2 for i, (k, _) in enumerate(pairs)
           for k2, _ in pairs[i + 1:]):  # duplicate keys keep insert order
        assert a == b


@SET
@given(_hosts, _paths)
def test_canonicalize_default_port_dropped(host, path):
    with_port = canonicalize(f"http://{host}:80{path or '/'}")
    without = canonicalize(f"http://{host}{path or '/'}")
    assert with_port == without
    odd = canonicalize(f"http://{host}:8080{path or '/'}")
    assert f":8080" in odd


# --- REP longest-match ------------------------------------------------------------

_rep_patterns = st.from_regex(r"/[a-z*]{0,6}\$?", fullmatch=True)
_rep_rules = st.lists(st.tuples(st.booleans(), _rep_patterns), max_size=6)
_rep_paths = st.from_regex(r"(/[a-z]{0,5}){1,3}", fullmatch=True)


def _brute_rep(path: str, rules):
    """Independent mirror: expand '*' via greedy regex, pick the longest
    matching pattern, allow wins ties, empty ruleset allows."""
    candidates = []
    for allow, pattern in rules:
        anchored = pattern.endswith("$")
        core = pattern[:-1] if anchored else pattern
        rx = "^" + "".join(".*" if ch == "*" else re.escape(ch)
                           for ch in core) + ("$" if anchored else "")
        if re.match(rx, path):
            candidates.append((len(pattern), allow))
    if not candidates:
        return True
    best = max(c[0] for c in candidates)
    return any(a for ln, a in candidates if ln == best)


@SET
@given(_rep_paths, _rep_rules)
def test_rep_longest_match_agrees_with_bruteforce(path, rules):
    assert rule_allows(path, rules) == _brute_rep(path, rules)


# --- glob → regex -------------------------------------------------------------------

_glob = st.from_regex(r"[a-z*?.]{0,10}", fullmatch=True)
_name = st.from_regex(r"[a-z.]{0,10}", fullmatch=True)


@SET
@given(_glob, _name)
def test_glob_to_regex_agrees_with_fnmatch(pattern, name):
    ours = re.fullmatch(glob_to_regex(pattern), name) is not None
    assert ours == fnmatch.fnmatchcase(name, pattern)


# --- codecs ---------------------------------------------------------------------------

_imgs = st.tuples(st.integers(1, 24), st.integers(1, 24), st.integers(0, 10))


@SET
@given(_imgs)
def test_png_roundtrip_exact(dims):
    w, h, seed = dims
    px = make_pixels(seed, w, h)
    assert np.array_equal(png_decode(png_encode(px)), px)


@settings(derandomize=True, max_examples=25, deadline=None)
@given(_imgs)
def test_jpeg_roundtrip_shape_determinism_and_sane_psnr(dims):
    w, h, seed = dims
    px = make_pixels(seed, w, h)
    b = jpeg_encode(px)
    assert b == jpeg_encode(px)
    out = jpeg_decode(b)
    assert out.shape == px.shape
    p = psnr(px, out)
    assert p == float("inf") or p >= 35.0  # corpus-style content: ~43 dB


@SET
@given(st.integers(0, 50), st.integers(0, 50))
def test_phash_metric_properties(i, j):
    a = phash64(make_pixels(i, 32, 32))
    b = phash64(make_pixels(j, 32, 32))
    assert hamming64(a, a) == 0
    assert hamming64(a, b) == hamming64(b, a)
    assert 0 <= hamming64(a, b) <= 64
    if i == j:
        assert a == b


# --- JPEG bit packer ---------------------------------------------------------------------

_symbols = st.lists(
    st.integers(1, 16).flatmap(
        lambda ln: st.tuples(st.integers(0, (1 << ln) - 1), st.just(ln))),
    min_size=0, max_size=64)


@SET
@given(_symbols)
def test_pack_bits_unpacks_exactly(pairs):
    codes = np.asarray([c for c, _ in pairs], dtype=np.uint64)
    lens = np.asarray([ln for _, ln in pairs], dtype=np.uint8)
    packed = _pack_bits(codes, lens)
    # independent unpacker: unstuff, then read MSB-first
    body = packed.replace(b"\xff\x00", b"\xff")
    bits = np.unpackbits(np.frombuffer(body, dtype=np.uint8))
    pos = 0
    for c, ln in pairs:
        got = int("".join(map(str, bits[pos:pos + ln])), 2) if ln else 0
        assert got == c, (pairs,)
        pos += ln
    assert np.all(bits[pos:] == 1)  # 1-padding to the byte boundary


# -- WARC round-trip (pure python, no spark) -----------------------------------

_payloads = st.binary(min_size=0, max_size=200)
_uris = st.from_regex(r"http://[a-z]{1,8}\.example/[a-z0-9/]{0,20}",
                      fullmatch=True)
_statuses = st.sampled_from([200, 204, 301, 404, 500])


@SET
@given(st.lists(st.tuples(_uris, _statuses, _payloads),
                min_size=1, max_size=8),
       st.booleans())
def test_warc_roundtrip_property(recs, gz):
    from crawlspark.warc import (build_record, build_warc,
                                 http_response_block, parse_warc_bytes)
    raw = [build_record(
        "response",
        {"WARC-Target-URI": uri, "WARC-Date": "2024-03-01T00:00:00Z",
         "WARC-Record-ID": f"<urn:uuid:r-{i}>",
         "Content-Type": "application/http;msgtype=response"},
        http_response_block(status, payload))
        for i, (uri, status, payload) in enumerate(recs)]
    parsed = parse_warc_bytes(build_warc(raw, gzip_records=gz))
    assert len(parsed) == len(recs)
    for got, (uri, status, payload) in zip(parsed, recs):
        assert got["target_uri"] == uri
        assert got["http_status"] == status
        assert got["payload"] == payload
        assert got["payload_len"] == len(payload)


# -- PII scrub: masking is idempotent and never leaves a raw match -------------

_pii_text = st.text(
    alphabet=st.sampled_from(list("abc .@0123456789")), max_size=60)


@SET
@given(_pii_text)
def test_scrub_pii_idempotent_pure(s):
    """The python mirror of the scrub chain (same patterns, same order)
    leaves no residual matches, and re-scrubbing is a fixpoint."""
    import re

    from crawlspark.functions.text import PII_PATTERNS

    def scrub(x):
        for _n, pat, tok in PII_PATTERNS:
            x = re.sub(pat, tok, x)
        return x

    once = scrub(s)
    for _n, pat, _t in PII_PATTERNS:
        assert not re.search(pat, once), (s, once, pat)
    assert scrub(once) == once


@given(st.text(alphabet="ab", min_size=1, max_size=7),
       st.dictionaries(
           st.text(alphabet="ab", min_size=1, max_size=3),
           st.integers(min_value=-50, max_value=-1),
           max_size=8))
@settings(max_examples=200, deadline=None)
@example(word="baba", scores={"aba": -2, "bab": -1})
def test_unigram_viterbi_total_and_optimal(word, scores):
    """_viterbi never crashes (single-char UNK fallback makes it total)
    and, when every position is coverable, its segmentation is optimal
    under (score desc, pieces asc, tuple asc) vs brute-force
    enumeration."""
    from crawlspark.functions.unigram import UNK_SCORE, _viterbi

    pieces, score = _viterbi(word, scores, 3)
    assert "".join(pieces) == word
    assert score == sum(scores.get(p, UNK_SCORE) for p in pieces)

    def segs(w):
        # candidate pieces = in-vocab substrings, or the single-char UNK
        # fallback (multi-char OOV pieces are not candidates in the DP)
        if not w:
            yield ()
            return
        for L in range(1, min(3, len(w)) + 1):
            head = w[:L]
            if L > 1 and head not in scores:
                continue
            for rest in segs(w[L:]):
                yield (head,) + rest

    # compare via the same ordering the DP uses: maximize score and
    # -n_pieces, break ties to the SMALLEST tuple
    cands = [(sum(scores.get(p, UNK_SCORE) for p in s), -len(s), s)
             for s in segs(word)]
    top = max(c[:2] for c in cands)
    want = min(c[2] for c in cands if c[:2] == top)
    assert tuple(pieces) == want


@given(st.text(alphabet="abc", min_size=1, max_size=10),
       st.sets(st.text(alphabet="abc", min_size=1, max_size=3),
               min_size=1, max_size=10))
@settings(max_examples=300, deadline=None)
@example(word="abba", pieces={"a", "ab", "##b", "##ba"})
def test_wordpiece_matchers_differential(word, pieces):
    """The engine's greedy matcher (_wp_greedy) and the oracle twin's
    independently-written matcher agree on every (word, vocab) draw —
    including vocabs with no word-initial piece ([UNK]) and continuation
    pieces shadowing initial ones."""
    from crawlspark.functions.wordpiece import (_wp_greedy,
                                                py_wordpiece_token_count)
    # vocab: the drawn pieces as word-initial AND ##-continuation forms,
    # assigned by a PROCESS-INDEPENDENT content hash (crc32 — builtin
    # hash() is PYTHONHASHSEED-randomized, which would make @example
    # replay and shrinking nondeterministic across runs)
    import zlib
    vocab = set()
    for p in pieces:
        if zlib.crc32(p.encode()) % 2:
            vocab.add(p)
        else:
            vocab.add("##" + p)
    if not vocab:
        vocab = {"a"}
    max_len = max((len(p) - 2 if p.startswith("##") else len(p))
                  for p in vocab)
    toks = _wp_greedy(word, vocab, max(1, max_len))
    want_nt, want_nu = py_wordpiece_token_count(word, sorted(vocab))
    if toks is None:
        assert (want_nt, want_nu) == (1, 1)
    else:
        assert (want_nt, want_nu) == (len(toks), 0)
        # matcher invariants: concatenation (## stripped) rebuilds word
        joined = "".join(t[2:] if t.startswith("##") else t for t in toks)
        assert joined == word
        assert not toks[0].startswith("##")
        assert all(t.startswith("##") for t in toks[1:])
