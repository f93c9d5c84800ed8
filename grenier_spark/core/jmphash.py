"""Jump consistent hashing (Lamping & Veach, arXiv:1406.2294).

Replicates the reference's INTEGER-ARITHMETIC variant exactly
(/root/reference/jmphash/jmphash.ml:1-14, SURVEY.md quirk Q5), which differs
from the paper's float variant: per step the LCG advances first
(``key = key * 2862933555777941757 + 1``), then the candidate bucket is
``j' = ((j + 1) * 2**31) // ((key >> 33) + 1)`` in wrapping two's-complement
64-bit arithmetic; the loop returns the previous ``j`` once ``j' >= n``.

All intermediate quantities are non-negative and ``(j+1) * 2**31 <= 2**62``
for ``n < 2**31``, so OCaml's signed ``Int64.div`` equals unsigned floor
division here and numpy ``uint64`` reproduces it bit-exactly.

Key property (jmphash.mli:9-11): growing the bucket count n -> m relocates a
key with probability (m - n) / m — the basis for skew-controlled,
minimal-movement repartitioning in the Spark layer.
"""

from __future__ import annotations

import numpy as np

from .bits import U64

_LCG_MUL = U64(2862933555777941757)
_HASH_K_SHIFT = U64(31)  # hash_k = 2**31 (jmphash.ml:1)
_MASK64 = (1 << 64) - 1


def jump_bucket_scalar(key: int, n: int) -> int:
    """Arbitrary-precision reference implementation (tests/oracles)."""
    if n <= 0:
        raise ValueError("n must be positive")
    key &= _MASK64
    j = 0
    while True:
        key = (key * 2862933555777941757 + 1) & _MASK64
        jp = ((j + 1) << 31) // ((key >> 33) + 1)
        if jp >= n:
            return j
        j = jp


def jump_bucket(keys: np.ndarray, n: int) -> np.ndarray:
    """Vectorized jump hash: bucket in [0, n) per key.

    Masked-lane iteration with index compaction: every active lane advances
    its LCG and candidate bucket each pass; lanes retire once their candidate
    reaches n. Expected ~ln(n) passes (jmphash.mli:8).
    """
    if n <= 0:
        raise ValueError("n must be positive")
    if n >= (1 << 31):
        raise ValueError("n must be < 2**31")
    keys = np.asarray(keys).astype(U64, copy=True)
    j = np.zeros(len(keys), dtype=U64)
    un = U64(n)
    idx = np.arange(len(keys), dtype=np.intp)
    key = keys
    cur = j
    while len(idx):
        key = key * _LCG_MUL + U64(1)
        jp = ((cur + U64(1)) << _HASH_K_SHIFT) // ((key >> U64(33)) + U64(1))
        cont = jp < un
        # retire lanes whose candidate overshot; keep their previous j
        if not cont.all():
            keep = np.flatnonzero(cont)
            j[idx[keep]] = jp[keep]
            # j for retired lanes already holds the last accepted value
            idx = idx[keep]
            key = key[keep]
            cur = jp[keep]
        else:
            j[idx] = jp
            cur = jp
    return j.astype(np.int64)
