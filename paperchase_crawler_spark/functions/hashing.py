"""Pure-Python / numpy XXH64 matching Spark's ``F.xxhash64`` (seed 42).

The URL-seen filter is keyed on ``xxhash64(canon_url)`` (BASELINE.json
north_rule). The Spark engine computes it JVM-side with the built-in
``F.xxhash64``; the single-threaded Python oracle (oracle/crawler.py) and the
simweb fixture generator need the *identical* hash. Spark's
``XxHash64`` expression is the standard XXH64 algorithm with seed 42:

- for a StringType column it hashes the UTF-8 bytes;
- for a LongType column its ``hashLong`` fast path is bit-identical to XXH64
  over the 8-byte little-endian encoding of the value.

Both are implemented here and pinned against Spark in
tests/test_hashing.py. A numpy-vectorized variant ``xxh64_u64_vec`` covers
the fixed-width (8-byte) case for batch fixture generation.
"""

from __future__ import annotations

import struct

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` → signed int64 (to match Spark's LongType output)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k1 * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """== Spark ``F.xxhash64(string_col)``."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(x: int, seed: int = SPARK_SEED) -> int:
    """== Spark ``F.xxhash64(long_col)``: XXH64 over 8 LE bytes of x (mod 2^64)."""
    return xxh64(struct.pack("<Q", x & _M64), seed)


def h64(x: int) -> int:
    """FIXTURES.md helper: unsigned xxhash64 of the LE 8-byte encoding of x."""
    return xxh64_long(x) & _M64


def xxh64_u64_vec(x: np.ndarray, seed: int = SPARK_SEED) -> np.ndarray:
    """Vectorized XXH64 over 8-byte LE inputs: uint64 array → uint64 array.

    Bit-identical to ``h64`` elementwise (property-tested). Used by simweb
    batch fetch (outlink/host/image sub-hashes) so the mapInPandas hot path
    stays numpy-vectorized — no per-row Python (input_hint requirement).
    """
    with np.errstate(over="ignore"):
        k1 = x.astype(np.uint64)
        p1 = np.uint64(_P1)
        p2 = np.uint64(_P2)
        p3 = np.uint64(_P3)
        p4 = np.uint64(_P4)
        p5 = np.uint64(_P5)
        h = np.uint64((seed + _P5 + 8) & _M64)
        k1 = k1 * p2
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))
        k1 = k1 * p1
        h = h ^ k1
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * p1 + p4
        h ^= h >> np.uint64(33)
        h = h * p2
        h ^= h >> np.uint64(29)
        h = h * p3
        h ^= h >> np.uint64(32)
        return h
