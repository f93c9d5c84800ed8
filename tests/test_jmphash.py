"""Jump-hash parity + properties (FIXTURES.md §2.3, SURVEY.md §5.2.4)."""

import numpy as np
import pytest

from grenier_spark.core import bits
from grenier_spark.core.jmphash import jump_bucket, jump_bucket_scalar


def test_vector_matches_bigint_scalar():
    keys = bits.wang64(np.arange(2000, dtype=np.uint64))
    for n in [1, 2, 3, 8, 10, 100, 1000, 2**31 - 1]:
        vb = jump_bucket(keys, n)
        assert vb.min() >= 0 and vb.max() < n
        sb = [jump_bucket_scalar(int(k), n) for k in keys[:200]]
        assert list(vb[:200]) == sb, f"n={n}"


def test_n1_always_zero():
    keys = bits.wang64(np.arange(100, dtype=np.uint64))
    assert (jump_bucket(keys, 1) == 0).all()


def test_minimal_relocation():
    keys = bits.wang64(np.arange(50_000, dtype=np.uint64))
    for n, m in [(8, 10), (100, 101), (1000, 4000)]:
        bn = jump_bucket(keys, n)
        bm = jump_bucket(keys, m)
        moved = float(np.mean(bn != bm))
        expect = (m - n) / m
        assert abs(moved - expect) < 0.02, (n, m, moved, expect)
        # unmoved keys keep their exact bucket
        same = bn == bm
        assert np.array_equal(bn[same], bm[same])


def test_uniformity_chisquare():
    keys = bits.wang64(np.arange(100_000, dtype=np.uint64))
    n = 32
    counts = np.bincount(jump_bucket(keys, n), minlength=n)
    expected = len(keys) / n
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # 31 dof; 99.9th percentile ~ 61.1
    assert chi2 < 61.1, chi2


def test_invalid_n():
    with pytest.raises(ValueError):
        jump_bucket(np.zeros(1, dtype=np.uint64), 0)
    with pytest.raises(ValueError):
        jump_bucket_scalar(1, 0)
