"""Golden vectors + parity for the 64-bit hash/bit kernels (FIXTURES.md §2.1)."""

import numpy as np
import pytest

from grenier_spark.core import bits

KEYS = [0, 1, 2, 7, 42, 1000003, 2**31, 2**63 - 1, 2**64 - 1]


def test_wang64_vector_matches_bigint_scalar():
    v = bits.wang64(np.array(KEYS, dtype=np.uint64))
    assert [int(x) for x in v] == [bits.wang64_scalar(k) for k in KEYS]


def test_wang64_golden():
    # frozen spec vectors: Thomas Wang 64-bit mix of small ints
    # (semantics of /root/reference/hll/hll.ml:159-172; -1 == 2**64-1)
    got = {k: bits.wang64_scalar(k) for k in [0, 1, 42, 2**64 - 1]}
    assert got[0] == 0x77CFA1EEF01BCA90
    assert got[1] == 0x5BCA7C69B794F8CE
    assert got[42] == bits.wang64_scalar(42)  # self-consistency anchor
    # mix must be injective-looking: no collisions over a dense range
    dense = bits.wang64(np.arange(100_000, dtype=np.uint64))
    assert len(np.unique(dense)) == 100_000


def test_wang64_random_parity():
    rng = np.random.default_rng(42)
    ks = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    v = bits.wang64(ks)
    assert [int(x) for x in v] == [bits.wang64_scalar(int(k)) for k in ks]


def test_ctz64():
    w = np.array([1, 2, 3, 8, 12, 2**63, 2**64 - 2], dtype=np.uint64)
    expect = [0, 1, 0, 3, 2, 63, 1]
    assert list(bits.ctz64(w)) == expect
    # exhaustive single-bit check
    onebit = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    assert list(bits.ctz64(onebit)) == list(range(64))


def test_splitmix64_parity():
    rng = np.random.default_rng(7)
    ks = rng.integers(0, 2**64, size=500, dtype=np.uint64)
    v = bits.splitmix64(ks)
    assert [int(x) for x in v] == [bits.splitmix64_scalar(int(k)) for k in ks]
    # published check value: splitmix64(0) with gamma step
    assert bits.splitmix64_scalar(0) == 0xE220A8397B1DCDAF
