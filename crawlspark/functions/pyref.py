"""Pure-Python reference implementations of the hash-based dedup/ANN
operators — the differential oracles for the Spark paths.

These mirror the EXACT semantics of functions.dedup / functions.similarity
(same xxhash64 seed-42 string hashes via crawlspark.hashing — bit-equal to
Spark's F.xxhash64, proven in tests/test_hashing.py; same splitmix64 perm
mixing; same band/bucket/probe construction) with none of the Spark code:
plain dicts, loops and numpy. The driver's DuckDB oracle reads their output
materialized to parquet (__spark_entry__._ensure_oracle_files), giving the
formerly rows-only LSH entries a real value-hash check.

Two of them are exhaustive rather than replicated, which makes them strictly
stronger oracles:
  * py_simhash_pairs is ALL-PAIRS popcount — equal to the Spark pigeonhole
    bucketing by construction (Hamming ≤ 3 ⇒ ≥1 of 4 16-bit chunks equal,
    so chunk-bucketing loses nothing: a mathematical identity, not a
    probabilistic one).
  * jaccard/cosine verification emits RAW numerators (ints / unrounded
    doubles); the final round/filter/rank happens in the DuckDB SQL so both
    sides share one rounding implementation.
"""

from __future__ import annotations

import re

import numpy as np

from ..hashing import mix64, to_signed64, xxh64_str

_WS = re.compile(r"\s+")


def py_tokens(text: str) -> list[str]:
    """Mirror F.split(F.lower(F.trim(c)), r'\\s+') — including the
    empty-string token a blank text produces."""
    return _WS.split((text or "").strip().lower())


def py_word_ngrams(text: str, n: int = 3) -> list[str]:
    """Mirror functions.dedup.word_ngrams: sorted distinct word n-grams;
    a doc shorter than n yields its whole token string as the single gram
    (F.slice clamps at the array end)."""
    toks = py_tokens(text)
    n_grams = max(len(toks) - n + 1, 1)
    grams = {" ".join(toks[i:i + n]) for i in range(n_grams)}
    return sorted(grams)


# -- MinHash + LSH banding ----------------------------------------------------

def py_minhash_sig(gram_hashes: list[int], n_perm: int = 64) -> np.ndarray:
    """Mirror dedup._minhash_batch for one doc (uint64 signature)."""
    seeds = (np.arange(1, n_perm + 1, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    if not gram_hashes:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.asarray(gram_hashes, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        perms = mix64(base[:, None] ^ seeds[None, :])
    return perms.min(axis=0)


def py_minhash_lsh_pairs(docs: list[tuple[int, str]], n: int = 3,
                         bands: int = 16, n_perm: int = 64) -> list[dict]:
    """Mirror dedup.minhash_lsh_pairs UP TO the jaccard round/filter:
    emits every LSH candidate pair with integer intersection/union sizes
    (the SQL computes round(inter/union, 6) and applies the threshold)."""
    rows = n_perm // bands
    grams = {i: py_word_ngrams(t, n) for i, t in docs}
    sigs = {}
    for i, _ in docs:
        hashes = [xxh64_str(g) for g in grams[i]]
        sigs[i] = py_minhash_sig(hashes, n_perm).astype(np.int64)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, _ in docs:
        for b in range(bands):
            # F.xxhash64(concat_ws(',', values..., band)) on the signed
            # long decimal renderings — identical string, identical hash
            key = ",".join(str(int(v))
                           for v in sigs[i][b * rows:(b + 1) * rows])
            bucket = xxh64_str(f"{key},{b}")
            buckets.setdefault((b, bucket), []).append(i)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cands.add((ms[x], ms[y]))
    out = []
    for left, right in sorted(cands):
        lg, rg = set(grams[left]), set(grams[right])
        out.append({"left_id": left, "right_id": right,
                    "n_inter": len(lg & rg), "n_union": len(lg | rg)})
    return out


# -- SimHash ------------------------------------------------------------------

def py_simhash(text: str, n_bits: int = 64) -> int:
    """Mirror dedup.simhash_col (signed 64-bit); votes vectorized."""
    toks = py_tokens(text)
    h = np.array([xxh64_str(t) for t in toks], dtype=np.int64).view(np.uint64)
    bits = (h[:, None] >> np.arange(n_bits, dtype=np.uint64)[None, :]) & 1
    votes = bits.sum(axis=0)
    acc = 0
    for i in np.nonzero(votes * 2 > len(toks))[0]:
        acc |= (1 << int(i))
    return to_signed64(acc)


def py_simhash_pairs(docs: list[tuple[int, str]], max_distance: int = 3
                     ) -> list[dict]:
    """ALL-PAIRS Hamming ≤ max_distance over py_simhash — equals the Spark
    chunk-bucketed result exactly (pigeonhole identity, see module doc)."""
    sh = [(i, py_simhash(t) & 0xFFFFFFFFFFFFFFFF) for i, t in docs]
    out = []
    for x in range(len(sh)):
        for y in range(x + 1, len(sh)):
            d = bin(sh[x][1] ^ sh[y][1]).count("1")
            if d <= max_distance:
                left, right = sorted((sh[x][0], sh[y][0]))
                out.append({"left_id": left, "right_id": right,
                            "distance": d})
    return sorted(out, key=lambda r: (r["left_id"], r["right_id"]))


# -- sign-LSH over embeddings -------------------------------------------------

def py_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Mirror similarity._planes (identical numpy ops ⇒ identical bits)."""
    n = n_planes * dim
    idx = (np.arange(2 * n, dtype=np.uint64)
           + np.uint64(seed) * np.uint64(1 << 32))
    u = (mix64(idx).astype(np.float64) + 1.0) / 2.0**64
    u1, u2 = u[:n], u[n:]
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(n_planes, dim)


def py_sign_buckets(vecs: np.ndarray, n_planes: int, seed: int = 42
                    ) -> np.ndarray:
    """Mirror similarity.signhash_udf over a (n, dim) float64 matrix."""
    planes = py_planes(n_planes, vecs.shape[1], seed)
    signs = (vecs @ planes.T) >= 0
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    return signs.astype(np.int64) @ weights


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    na = float(np.sqrt((a * a).sum()))
    nb = float(np.sqrt((b * b).sum()))
    if na > 0 and nb > 0:
        return float((a * b).sum() / (na * nb))
    return 0.0


def py_embedding_lsh_pairs(emb: list[tuple[int, list[float]]],
                           n_planes: int = 8, seed: int = 42) -> list[dict]:
    """Mirror dedup.embedding_neardup_pairs up to the round/threshold:
    every same-bucket pair with its RAW float64 cosine (SQL rounds and
    filters)."""
    ids = [i for i, _ in emb]
    mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in emb])
    buckets = py_sign_buckets(mat, n_planes, seed)
    by_bucket: dict[int, list[int]] = {}
    for pos, b in enumerate(buckets):
        by_bucket.setdefault(int(b), []).append(pos)
    out = []
    seen = set()
    for members in by_bucket.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                px, py_ = members[x], members[y]
                left, right = sorted((ids[px], ids[py_]))
                if left == right or (left, right) in seen:
                    continue
                seen.add((left, right))
                out.append({"left_id": left, "right_id": right,
                            "cosine_raw": _cosine(mat[px], mat[py_])})
    return sorted(out, key=lambda r: (r["left_id"], r["right_id"]))


def py_lsh_topk_candidates(queries: list[tuple[int, list[float]]],
                           corpus: list[tuple[int, list[float]]],
                           n_planes: int = 8, seed: int = 42,
                           multiprobe: bool = True) -> list[dict]:
    """Mirror similarity.lsh_topk up to the round/rank: the distinct
    (query, neighbor) candidate set with RAW cosines (SQL rounds, windows,
    keeps rank ≤ k)."""
    c_ids = [i for i, _ in corpus]
    c_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in corpus])
    q_ids = [i for i, _ in queries]
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    c_buckets = py_sign_buckets(c_mat, n_planes, seed)
    q_buckets = py_sign_buckets(q_mat, n_planes, seed)
    by_bucket: dict[int, list[int]] = {}
    for pos, b in enumerate(c_buckets):
        by_bucket.setdefault(int(b), []).append(pos)
    out = []
    for qpos, q0 in enumerate(q_buckets):
        probes = [int(q0)]
        if multiprobe:
            probes += [int(q0) ^ (1 << i) for i in range(n_planes)]
        cand_pos = set()
        for p in probes:
            cand_pos.update(by_bucket.get(p, []))
        for cpos in sorted(cand_pos):
            if c_ids[cpos] == q_ids[qpos]:
                continue
            out.append({"query_id": q_ids[qpos],
                        "neighbor_id": c_ids[cpos],
                        "cosine_raw": _cosine(q_mat[qpos], c_mat[cpos])})
    return out


# -- U5 outbound re-encode oracle ---------------------------------------------

def u5_form_fixture(n_forms: int = 200) -> list[tuple[int, str, str]]:
    """Deterministic mixed-charset form params: ASCII, spaces, reserved
    chars, Shift_JIS-encodable Japanese, and chars UNMAPPABLE in Shift_JIS
    (é, emoji — exercising the transformed-prefix truncation,
    /root/reference/form.go:378-386 transform.String ignored error)."""
    words = ["hello world", "a&b=c", "テスト", "価格 1,234円", "café",
             "naïve+plus", "emoji😀tail", "日本語とlatin", "100%",
             "~tilde_ok.txt"]
    rows = []
    for f in range(n_forms):
        for p in range(1 + f % 4):
            w = words[(f * 7 + p * 3) % len(words)]
            rows.append((f, f"field{p}", f"{w}#{f}"))
    return rows


def _py_query_escape(bs: bytes) -> str:
    """Independent Go-QueryEscape reimplementation (own safe-set logic;
    the Spark operator uses a frozenset byte table instead)."""
    res = []
    for b in bs:
        c = chr(b)
        if c.isascii() and (c.isalnum() or c in "-_.~"):
            res.append(c)
        elif b == 0x20:
            res.append("+")
        else:
            res.append(f"%{b:02X}")
    return "".join(res)


def py_urlencode_forms(rows: list[tuple[int, str, str]],
                       encoding: str | None = None
                       ) -> list[tuple[int, str]]:
    """Mirror operators.forms.encoded_body: per form, keys sorted raw,
    values re-encoded into ``encoding`` keeping the encodable PREFIX on
    error (char-by-char — equivalent to transform.String for stateless
    codecs), then percent-encoded."""
    groups: dict[int, list[tuple[str, str]]] = {}
    for fid, name, val in rows:
        groups.setdefault(fid, []).append((name, val))
    out = []
    for fid in sorted(groups):
        parts = []
        for k, v in sorted(groups[fid]):
            if encoding is None:
                vb = v.encode("utf-8")
            else:
                acc = bytearray()
                for ch in v:
                    try:
                        acc += ch.encode(encoding)
                    except UnicodeEncodeError:
                        break
                vb = bytes(acc)
            parts.append(_py_query_escape(k.encode("utf-8")) + "="
                         + _py_query_escape(vb))
        out.append((fid, "&".join(parts)))
    return out


def py_ivf_topk_candidates(queries: list[tuple[int, list[float]]],
                           corpus: list[tuple[int, list[float]]],
                           n_cells: int = 16, n_probe: int = 4,
                           iters: int = 2, sample_stride: int | None = None,
                           max_sample: int = 65536) -> list[dict]:
    """Mirror similarity.ivf_topk up to the round/rank: deterministic
    spherical-k-means quantizer on the bounded sample (hash-stride filter
    pmod(xxhash64(id), ceil(n/max_sample)) == 0, id-sorted, capped at
    max_sample — row-for-row the engine's quantizer_sample), nearest-cell
    corpus assignment, n_probe query cells, candidate pairs with RAW
    cosines (SQL rounds, windows, keeps rank <= k)."""
    from ..hashing import xxh64_long
    c_ids = [i for i, _ in corpus]
    c_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in corpus])
    if sample_stride is None:
        sample_stride = max(1, -(-len(corpus) // max_sample))
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for i, v in sorted(corpus)
                       if xxh64_long(i) % sample_stride == 0][:max_sample])
    norm_s = sample / np.linalg.norm(sample, axis=1, keepdims=True).clip(
        min=1e-12)
    cents = norm_s[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(norm_s @ cents.T, axis=1)
        for c in range(n_cells):
            members = norm_s[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    cents[c] = v / nv

    def _norm(mat):
        return mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(
            min=1e-12)

    c_cells = np.argmax(_norm(c_mat) @ cents.T, axis=1)
    by_cell: dict[int, list[int]] = {}
    for pos, cell in enumerate(c_cells):
        by_cell.setdefault(int(cell), []).append(pos)
    q_ids = [i for i, _ in queries]
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    q_probes = np.argsort(-(_norm(q_mat) @ cents.T), axis=1,
                          kind="stable")[:, :n_probe]
    out = []
    for qpos in range(len(q_ids)):
        cand_pos = set()
        for cell in q_probes[qpos]:
            cand_pos.update(by_cell.get(int(cell), []))
        for cpos in sorted(cand_pos):
            if c_ids[cpos] == q_ids[qpos]:
                continue
            out.append({"query_id": q_ids[qpos],
                        "neighbor_id": c_ids[cpos],
                        "cosine_raw": _cosine(q_mat[qpos], c_mat[cpos])})
    return out


def py_kmv(values: list[str], k: int = 256) -> dict:
    """Mirror sketch.kmv_distinct over string values: k smallest distinct
    unsigned xxh64 hashes (JVM-bit-equal via crawlspark.hashing)."""
    from ..hashing import xxh64_str
    mask = (1 << 64) - 1
    mins = sorted({xxh64_str(v) & mask for v in values})[:k]
    if len(mins) < k:
        est = len(mins)
        kth = -1
    else:
        u_k = float(mins[k - 1]) / float(1 << 64)
        est = int((k - 1) / u_k)
        kth = mins[k - 1] - (1 << 64) if mins[k - 1] >= (1 << 63) \
            else mins[k - 1]
    return {"k_used": k, "n_mins": len(mins), "kth_hash": kth,
            "est_distinct": est}


def py_kmv_by(pairs: list[tuple[str, int]], k: int = 64) -> list[dict]:
    """Mirror sketch.kmv_distinct_by over (key, int64 value) pairs."""
    from ..hashing import xxh64
    mask = (1 << 64) - 1
    by_key: dict[str, set] = {}
    for key, v in pairs:
        h = xxh64(int(v).to_bytes(8, "little", signed=True)) & mask
        by_key.setdefault(key, set()).add(h)
    out = []
    for key in sorted(by_key):
        mins = sorted(by_key[key])[:k]
        if len(mins) < k:
            est, kth = len(mins), -1
        else:
            u_kd = float(mins[k - 1])
            est = int((k - 1) // (u_kd / float(1 << 64)))
            kth = mins[k - 1] - (1 << 64) if mins[k - 1] >= (1 << 63) \
                else mins[k - 1]
        out.append({"key": key, "n_mins": len(mins), "kth_hash": kth,
                    "est_distinct": est})
    return out


def py_wav_quantize(x: np.ndarray, bits: int, float_pcm: bool) -> np.ndarray:
    """Independent mirror of the WAV codec's quantization contract
    (crawlspark.audiocodec): encode clips to [-1, 1] and rounds to
    (2^(bits-1) - 1) full-scale; decode divides by 2^(bits-1) (8-bit is
    the unsigned-biased variant, same arithmetic after bias removal);
    IEEE-float is a float32 round-trip. Applied to GROUND-TRUTH samples it
    yields exactly what wav_decode(wav_encode(x)) must return — the
    codec-free half of the audio differential oracle."""
    x = np.clip(np.asarray(x, dtype=np.float64), -1.0, 1.0)
    if float_pcm:
        return x.astype(np.float32).astype(np.float64)
    full = (1 << (bits - 1)) - 1
    q = np.round(x * full)
    return q / float(1 << (bits - 1))


def py_wav_features(x: np.ndarray, rate: int, bits: int,
                    float_pcm: bool) -> dict:
    """Audio features from ground-truth samples through the quantization
    mirror — must equal multimodal.audio_features over the ENCODED bytes
    (proves wav_encode→wav_decode is the quantized identity AND the
    feature math)."""
    mono = py_wav_quantize(x, bits, float_pcm).mean(axis=1)
    n = int(mono.shape[0])
    mag = np.abs(np.fft.rfft(mono))
    tot = float(mag.sum())
    freqs = np.fft.rfftfreq(n, 1.0 / rate)
    return {
        "rms": float(np.sqrt(np.mean(mono ** 2))),
        "zero_crossings": int(np.sum(np.diff(np.sign(mono)) != 0)),
        "n_samples": n,
        "sample_rate": int(rate),
        "duration_s": n / rate,
        "centroid_hz": float((freqs * mag).sum() / tot) if tot > 0 else 0.0,
    }


def _py_hll_registers(hashes, p: int) -> dict[int, int]:
    """Registers from unsigned-64 hashes: idx = top p bits, rho = 1 +
    leading zeros of the remaining 64-p bits (independent bit twiddling —
    no shift/bin-string derivation shared with the Spark side)."""
    reg: dict[int, int] = {}
    width = 64 - p
    for h in hashes:
        idx = h >> width
        w = h & ((1 << width) - 1)
        rho = width - w.bit_length() + 1
        if rho > reg.get(idx, 0):
            reg[idx] = rho
    return reg


def py_hll(values: list[str], p: int = 12) -> dict:
    """Mirror sketch.hll_distinct over string values."""
    from ..hashing import xxh64_str
    from .sketch import _hll_point
    mask = (1 << 64) - 1
    reg = _py_hll_registers((xxh64_str(v) & mask for v in values), p)
    est, nz = _hll_point(reg, 1 << p)
    return {"p": p, "m": 1 << p, "n_nonzero": nz, "est_distinct": est}


def py_hll_by(pairs: list[tuple[str, int]], p: int = 10) -> list[dict]:
    """Mirror sketch.hll_distinct_by over (key, int64 value) pairs."""
    from ..hashing import xxh64
    from .sketch import _hll_point
    mask = (1 << 64) - 1
    by_key: dict[str, list] = {}
    for key, v in pairs:
        h = xxh64(int(v).to_bytes(8, "little", signed=True)) & mask
        by_key.setdefault(key, []).append(h)
    out = []
    for key in sorted(by_key):
        est, nz = _hll_point(_py_hll_registers(by_key[key], p), 1 << p)
        out.append({"key": key, "n_nonzero": nz, "est_distinct": est})
    return out


def py_cm_topk(values: list[str], w: int = 1024, d: int = 4, k: int = 20
               ) -> list[dict]:
    """Mirror the cm_topk composition: exact top-k values (count desc,
    value asc) with their Count-Min estimates — independent counter
    arithmetic over bit-equal xxh64, Kirsch–Mitzenmacher positions."""
    from collections import Counter

    from ..hashing import xxh64_str
    mask64, mask32 = (1 << 64) - 1, (1 << 32) - 1
    counts = Counter(values)
    counters = [[0] * w for _ in range(d)]
    pos_of = {}
    for v, c in counts.items():
        h = xxh64_str(v) & mask64
        h1, h2 = h & mask32, h >> 32
        pos_of[v] = [(h1 + i * h2) % w for i in range(d)]
        for i in range(d):
            counters[i][pos_of[v][i]] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [{"value": v,
             "true_count": c,
             "est_count": min(counters[i][pos_of[v][i]]
                              for i in range(d))}
            for v, c in top]
