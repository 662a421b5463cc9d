"""Hashing primitives shared by the engine and the single-process oracle.

``xxh64`` is a bit-exact pure-Python implementation of XXH64 matching Spark's
built-in ``xxhash64`` expression for STRING input (UTF-8 bytes, seed 42,
result interpreted as signed int64). The oracle crawler uses it so that the
deterministic tie-break ``(priority DESC, url_hash ASC)`` is identical between
the Spark engine and the Python reference — verified by
tests/test_hashing.py against live Spark output.

Also: splittable hash family for the partitioned Bloom filter, and 64-bit
mixers for minhash permutations.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data`` → signed int64 (Spark LongType convention)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    # Spark's LongType is signed.
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_XXHASH_SEED) -> int:
    """xxhash64 of a Python string, identical to Spark's xxhash64(col)."""
    return xxh64(s.encode("utf-8"), seed)


# ---------------------------------------------------------------------------
# Vectorized 64-bit mixers (numpy) — Bloom hash family / minhash permutations.
# ---------------------------------------------------------------------------

BLOOM_FAMILY = "xr2"  # xor-rotate family version tag (persisted filters
# from a different family are discarded on load — mixed-family bits would
# produce false NEGATIVES, which the exactness contract cannot absorb)


def bloom_streams(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split signed-int64 hashes into two uint64 streams for the Bloom
    probe family g_i = h1 XOR rot64(h2, r_i).

    Deliberately multiplication-free (xorshift64 13/7/17 for h2): every op
    here — xor, logical shifts, rotate, unsigned mod — has a bit-identical
    Spark SQL column expression even under ANSI mode (where a wrapping
    64-bit multiply raises ARITHMETIC_OVERFLOW), so the distributed probe
    can run entirely JVM-side in whole-stage codegen
    (``bloom.probe_words_joined``) while this numpy twin backs the
    driver/build paths and the oracles. The classic Kirsch–Mitzenmacher
    h1 + i*h2 family needs wrapping adds/multiplies, which ANSI forbids."""
    u = h.astype(np.uint64)
    x = u ^ (u << np.uint64(13))
    x = x ^ (x >> np.uint64(7))
    h2 = x ^ (x << np.uint64(17))
    return u, h2


def bloom_rotations(k: int) -> list[int]:
    """Rotation amounts r_i for the k probe functions (spread over [0,64))."""
    return [(13 + 17 * i) % 64 for i in range(k)]


def bloom_indices(h: np.ndarray, m: int, k: int):
    """Yield the k bit-index arrays (int64 in [0, m)) for the given hashes —
    the single numpy definition of the family's index math; the JVM
    expression in ``bloom.probe_words_joined`` mirrors it term for term.

    The mixed value is masked to 63 bits before the mod: the JVM twin works
    on SIGNED longs, and recovering unsigned-mod semantics there needs the
    probe value referenced twice per test (``pmod(g,m) + when(g<0, 2^64%m)``)
    — a duplication that measured 20-25× slower through Spark's generated
    code than a single-reference expression (method-split boundaries defeat
    subexpression reuse and JIT inlining). Dropping the sign bit costs the
    filter nothing (the 63 remaining bits are uniform) and makes the two
    twins the same one-reference expression: ``(g & MAX_LONG) % m``."""
    h1, h2 = bloom_streams(h)
    sign_mask = np.uint64((1 << 63) - 1)
    for r in bloom_rotations(k):
        rot = h2 if r == 0 else (h2 << np.uint64(r)) | (h2 >> np.uint64(64 - r))
        yield (((h1 ^ rot) & sign_mask) % np.uint64(m)).astype(np.int64)


def mix64(h: np.ndarray, seed: int) -> np.ndarray:
    """One cheap invertible 64-bit mix keyed by ``seed`` — the minhash
    'permutation' family applied to pre-hashed shingles (uint64 in/out)."""
    x = h.astype(np.uint64) ^ np.uint64(seed * 0x9E3779B97F4A7C15 & _MASK)
    x ^= x >> np.uint64(30)
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x = x * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x
