"""Pure-Python twin of Spark's ``hash()`` (Murmur3 x86 32-bit, seed 42).

Needed driver-side so the query builder can compute which term-hash buckets
a query touches and emit an explicit partition-pruning predicate — Catalyst
cannot infer ``bucket = pmod(hash(term), B)`` pruning by itself
(SURVEY.md §4.3).  Parity with ``pyspark.sql.functions.hash`` is asserted
in tests/test_build.py.
"""

from __future__ import annotations


def _rotl32(x: int, r: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF


def _fmix32(h: int) -> int:
    h &= 0xFFFFFFFF
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """Spark-compatible Murmur3: processes trailing bytes one-at-a-time as
    *signed* ints (Spark's ``hashUnsafeBytes``), unlike canonical murmur3's
    unsigned tail block.  Returns a signed 32-bit int, matching
    ``F.hash(col)``'s IntegerType output.
    """
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & 0xFFFFFFFF
    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        k1 = (k1 * c1) & 0xFFFFFFFF
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    # Spark hashes remaining bytes individually through the same mix
    # (sign-extended), instead of the canonical tail handling.
    for i in range(n4, len(data)):
        byte = data[i]
        if byte > 127:
            byte -= 256  # sign-extend: Spark reads Java (signed) bytes
        k1 = (byte * c1) & 0xFFFFFFFF
        k1 = _rotl32(k1, 15)
        k1 = (k1 * c2) & 0xFFFFFFFF
        h1 ^= k1
        h1 = _rotl32(h1, 13)
        h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= len(data)
    h1 = _fmix32(h1)
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


def spark_hash_string(s: str, seed: int = 42) -> int:
    return murmur3_x86_32(s.encode("utf-8"), seed)


def term_bucket(term: str, num_buckets: int) -> int:
    """Driver-side twin of ``F.pmod(F.hash(term), num_buckets)``."""
    return spark_hash_string(term) % num_buckets
