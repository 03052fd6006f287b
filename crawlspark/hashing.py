"""xxHash64 — shared hash between the Spark engine and the Python oracle.

The engine computes ``url_hash = F.xxhash64(canon_url)`` JVM-side (fast,
codegen'd). The sequential oracle (crawlspark.oracle) must produce the *same*
64-bit values so "URL-seen exact match" is byte-testable, so this module
implements the public XXH64 algorithm (Collet's xxHash, seed=42 to match
Spark's default) in pure Python, plus a numpy-vectorized avalanche mixer used
to derive the k Bloom-filter probe positions from an already-computed hash.

Verified equal to Spark's ``F.xxhash64`` on ASCII, UTF-8 multibyte, empty and
long strings (tests/test_hashing.py).
"""

from __future__ import annotations

import numpy as np

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64 default


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` as an unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            vs = [v1, v2, v3, v4]
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (vs[j] + lane * _P2) & _M
                vs[j] = (_rotl(v, 31) * _P1) & _M
            v1, v2, v3, v4 = vs
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ v) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M)) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (h ^ ((data[i] * _P5) & _M)) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def to_signed64(x: int) -> int:
    """Map unsigned 64-bit to the signed value Spark's LongType carries."""
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed xxh64 of a string's UTF-8 bytes — equals ``F.xxhash64(lit(s))``."""
    return to_signed64(xxh64(s.encode("utf-8"), seed))


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed xxh64 of a 64-bit integer — equals ``F.xxhash64(bigint col)``
    (Spark hashes the 8-byte little-endian representation).
    Pinned bit-equal vs Spark in tests/test_hashing.py."""
    return to_signed64(xxh64((v & _M).to_bytes(8, "little"), seed))


# --- numpy-vectorized mixing (Bloom probe derivation) -----------------------

def mix64(arr: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 array (vectorized).

    Used to derive independent Bloom probe streams from url_hash without
    re-hashing strings: probe_i = mix64(h + i * GOLDEN) % m_bits.
    """
    z = arr.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bloom_probes(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) array of bit positions in [0, m_bits) for each hash (vectorized)."""
    h = hashes.astype(np.uint64, copy=False)
    out = np.empty((h.shape[0], k), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            out[:, i] = mix64(h + np.uint64(i + 1) * GOLDEN) % np.uint64(m_bits)
    return out
