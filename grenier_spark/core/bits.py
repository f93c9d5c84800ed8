"""Vectorized 64-bit hashing / bit-twiddling kernels.

Semantics follow the reference library (let-def/grenier) cited per function;
implementations are fresh numpy code designed for Arrow-batch vectorization.
All array kernels take/return ``numpy.uint64`` and rely on numpy's wrapping
modular arithmetic (exactly the two's-complement wrap the reference's OCaml
``Int64`` ops perform).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK64 = (1 << 64) - 1

# De Bruijn B(2,6) sequence multiplier + inverse table for O(1) index-of-LSB.
# Same public constant as /root/reference/hll/hll.ml:3-14 (chessprogramming
# "De Bruijn sequence"); the table below is recomputed here, not copied.
_DEBRUIJN64 = U64(0x022FDD63CC95386D)
_DEBRUIJN_TABLE = np.zeros(64, dtype=np.uint8)
for _i in range(64):
    _DEBRUIJN_TABLE[(0x022FDD63CC95386D << _i & _MASK64) >> 58] = _i
del _i


def ctz64(w: np.ndarray) -> np.ndarray:
    """Index of least-significant set bit per lane (undefined for w == 0).

    Vectorized analog of /root/reference/hll/hll.ml:3-14 ``first_setbit``:
    isolate the LSB, multiply by the De Bruijn constant, look up the shift.
    """
    w = w.astype(U64, copy=False)
    lsb = w & (~w + U64(1))  # two's-complement isolate-LSB, wraps mod 2^64
    idx = (lsb * _DEBRUIJN64) >> U64(58)
    return _DEBRUIJN_TABLE[idx.astype(np.intp)]


def wang64(x: np.ndarray) -> np.ndarray:
    """Thomas Wang's 64-bit integer mix, vectorized.

    Semantics of /root/reference/hll/hll.ml:159-172 ``hash_int64`` (7 rounds
    of shift/xor/add over wrapping 64-bit arithmetic). This is the canonical
    per-token hash fed to every sketch (mirrors hll/test.ml:7).

    Implementation is allocation-minimal (2 buffers, in-place ufuncs): each
    add-of-shifts round folds to one wrapping multiply —
    ``~x + (x << 21) == x * 2097151 - 1 (mod 2^64)``, ``x + (x<<3) + (x<<8)
    == x * 265``, ``x + (x<<2) + (x<<4) == x * 21``, ``x + (x<<31) ==
    x * 2147483649`` — which matters because 100TB-scale batches live in the
    Arrow hot path.
    """
    a = np.asarray(x).astype(U64, copy=True)
    t = np.empty_like(a)
    np.multiply(a, U64(2097151), out=a)
    np.subtract(a, U64(1), out=a)
    np.right_shift(a, U64(24), out=t)
    np.bitwise_xor(a, t, out=a)
    np.multiply(a, U64(265), out=a)
    np.right_shift(a, U64(14), out=t)
    np.bitwise_xor(a, t, out=a)
    np.multiply(a, U64(21), out=a)
    np.right_shift(a, U64(28), out=t)
    np.bitwise_xor(a, t, out=a)
    np.multiply(a, U64(2147483649), out=a)
    return a


def wang64_scalar(key: int) -> int:
    """Arbitrary-precision reference for :func:`wang64` (tests/oracles)."""
    m = _MASK64
    key &= m
    key = (~key + (key << 21)) & m
    key ^= key >> 24
    key = (key + (key << 3) + (key << 8)) & m
    key ^= key >> 14
    key = (key + (key << 2) + (key << 4)) & m
    key ^= key >> 28
    key = (key + (key << 31)) & m
    return key


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele/Lea/Flood 2014, public domain constants).

    Used to derive independent per-row seeds for count-min / Bloom hash
    families: ``h_i(k) = wang64(k ^ splitmix64(i+1))``.
    """
    x = np.asarray(x).astype(U64, copy=True)
    x = (x + U64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
    x = x ^ (x >> U64(31))
    return x


def splitmix64_scalar(x: int) -> int:
    m = _MASK64
    x = (x + 0x9E3779B97F4A7C15) & m
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
    return x ^ (x >> 31)
