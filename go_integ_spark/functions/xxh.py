"""Vectorized numpy twin of Spark's ``xxhash64`` over integer inputs.

Spark's ``xxhash64(a, b, ...)`` (the expression behind shuffle-free
minhash permutations and LSH band buckets) folds its arguments through
XXH64 one value at a time: ``hash = seed(42); for v in args: hash =
XXH64.hash{Int,Long}(v, hash)``. These kernels reproduce that math
bit-for-bit on uint64 numpy arrays, so an Arrow-batched Python stage
can compute the SAME hash values a JVM expression would — letting hot
per-row loops (64 minhash permutations x every shingle) move out of
interpreted higher-order functions without changing a single output
bit. Pure integer arithmetic: no float rounding, no engine divergence.

Reference semantics: org.apache.spark.sql.catalyst.expressions.XxHash64
/ org.apache.spark.unsafe.hash.XXH64 (public Apache Spark source).
``tests/test_dedup.py`` pins equality against ``F.xxhash64`` on
random inputs (extremes included) for every entry point here.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)

_U32_MASK = np.uint64(0xFFFFFFFF)
_U64 = np.uint64(64)

# uint64 wraparound is the point of every multiply below; numpy only
# warns for 0-d (scalar) operands, but seeds often ARE scalars.
# np.errstate instances are not reentrant, so each use site constructs
# its own rather than sharing one module-level context manager.
def _wrap() -> np.errstate:
    return np.errstate(over="ignore")


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> (_U64 - rr))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def xxh64_long(value: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashLong — one 8-byte (LongType) input folded into ``seed``.

    ``value`` and ``seed`` broadcast; both are interpreted as uint64
    bit patterns (pass int64 arrays through ``.astype(np.uint64)`` /
    ``.view(np.uint64)``).
    """
    with _wrap():
        value = np.asarray(value, dtype=np.uint64)
        h = np.asarray(seed, dtype=np.uint64) + (_P5 + np.uint64(8))
        k1 = _rotl(value * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def xxh64_int(value: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashInt — one 4-byte (IntegerType) input folded into
    ``seed``. Matches ``F.xxhash64(F.lit(i), ...)`` where the literal
    is a Python int small enough to infer as IntegerType."""
    with _wrap():
        v = np.asarray(value, dtype=np.uint64) & _U32_MASK
        h = np.asarray(seed, dtype=np.uint64) + (_P5 + np.uint64(4))
        h = h ^ (v * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def spark_xxhash64_longs(*columns: np.ndarray) -> np.ndarray:
    """``F.xxhash64(c1, c2, ...)`` over LongType columns: the chained
    fold starting at seed 42. Arguments broadcast elementwise."""
    h: np.ndarray | np.uint64 = SPARK_SEED
    for c in columns:
        h = xxh64_long(np.asarray(c, dtype=np.int64).view(np.uint64), h)
    return np.asarray(h)


def as_signed(h: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 hash bits as the signed int64 Spark exposes."""
    return np.ascontiguousarray(h).view(np.int64)
