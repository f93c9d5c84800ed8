"""KMV bottom-k sketch (core/kmv.py): brute-force parity of the kept
set, exact small regime, estimator error, set operations, merge
permutation-invariance, serde."""

import numpy as np
import pytest

from grenier_spark.core.bits import U64, wang64
from grenier_spark.core.kmv import KMV


def _brute_bottomk(keys, k):
    h = np.unique(wang64(np.asarray(keys, dtype=np.int64).view(U64)))
    return h[:k]


def test_kept_set_is_bottom_k_distinct():
    rng = np.random.Generator(np.random.PCG64(1))
    keys = rng.integers(-2**62, 2**62, size=5000)
    keys = np.concatenate([keys, keys[:1000]])  # duplicates
    s = KMV(64)
    s.update_batch(keys)
    assert np.array_equal(s.values, _brute_bottomk(keys, 64))


def test_exact_below_k():
    s = KMV(256)
    s.update_batch(np.arange(100))
    s.update_batch(np.arange(50))  # re-adding changes nothing
    assert s.estimate() == 100.0
    assert KMV(8).estimate() == 0.0


def test_estimator_error_multiseed():
    k = 256
    errs = []
    for seed in range(8):
        rng = np.random.Generator(np.random.PCG64(seed))
        n = 50_000
        s = KMV(k)
        keys = rng.integers(0, 2**62, size=n)
        n_true = len(np.unique(keys))
        for chunk in np.array_split(keys, 7):
            s.update_batch(chunk)
        errs.append(abs(s.estimate() - n_true) / n_true)
    # ~1/sqrt(k-2) = 0.063; allow 3x on the mean, 5x worst-case
    assert np.mean(errs) < 3 / np.sqrt(k - 2), errs
    assert max(errs) < 5 / np.sqrt(k - 2), errs


def test_merge_is_permutation_invariant_and_byte_stable():
    rng = np.random.Generator(np.random.PCG64(3))
    keys = rng.integers(0, 2**62, size=20_000)
    single = KMV(128)
    single.update_batch(keys)
    for perm_seed in range(3):
        prng = np.random.Generator(np.random.PCG64(perm_seed))
        parts = np.array_split(prng.permutation(keys), 9)
        order = prng.permutation(9)
        sketches = []
        for i in order:
            p = KMV(128)
            p.update_batch(parts[i])
            sketches.append(p)
        acc = sketches[0]
        for other in sketches[1:]:
            acc.merge(other)
        assert acc.to_bytes() == single.to_bytes()


def test_merge_k_mismatch_raises_and_k_validation():
    with pytest.raises(ValueError, match="cannot merge"):
        KMV(64).merge(KMV(128))
    with pytest.raises(ValueError, match="k must be >= 2"):
        KMV(1)


def test_serde_roundtrip_and_validation():
    s = KMV(64)
    s.update_batch(np.arange(1000))
    t = KMV.from_bytes(s.to_bytes())
    assert t.k == s.k and np.array_equal(t.values, s.values)
    assert t.estimate() == s.estimate()
    with pytest.raises(ValueError, match="not a KMV blob"):
        KMV.from_bytes(b"XXXX" + s.to_bytes()[4:])
    blob = bytearray(s.to_bytes())
    blob[4:8] = (3).to_bytes(4, "little")  # k=3 < n_kept
    with pytest.raises(ValueError, match="corrupt"):
        KMV.from_bytes(bytes(blob))
    # unsorted payload
    good = s.to_bytes()
    swapped = (good[:12] + good[20:28] + good[12:20] + good[28:])
    with pytest.raises(ValueError, match="not sorted"):
        KMV.from_bytes(swapped)


def test_jaccard_and_intersection_estimates():
    k = 512
    a, b = KMV(k), KMV(k)
    a.update_batch(np.arange(0, 30_000))        # |A| = 30k
    b.update_batch(np.arange(20_000, 50_000))   # |B| = 30k, inter 10k
    jacc, inter, matched = a.jaccard(b)
    assert abs(jacc - 0.2) < 0.07, jacc          # true 10k/50k = 0.2
    assert abs(inter - 10_000) / 10_000 < 0.35, inter
    assert matched > 0
    # disjoint and empty edge cases
    c = KMV(k)
    c.update_batch(np.arange(10**6, 10**6 + 100))
    jd, idd, md = a.jaccard(c)
    assert md <= 2 and idd == jd * pytest.approx(idd / jd if jd else 0) \
        if jd else idd == 0.0
    assert KMV(4).jaccard(KMV(8)) == (0.0, 0.0, 0)


def test_a_not_b_difference_estimates():
    k = 512
    a, b = KMV(k), KMV(k)
    a.update_batch(np.arange(0, 30_000))        # |A\B| = 20k
    b.update_batch(np.arange(20_000, 50_000))   # |B\A| = 20k, union 50k
    fa, da, na = a.a_not_b(b)
    fb, db, nb = b.a_not_b(a)
    assert abs(fa - 0.4) < 0.08 and abs(fb - 0.4) < 0.08
    assert abs(da - 20_000) / 20_000 < 0.3, da
    assert abs(db - 20_000) / 20_000 < 0.3, db
    # partition invariant over L: only_a + only_b + matched == |L| exactly
    _, _, matched = a.jaccard(b)
    assert na + nb + matched == min(len(np.union1d(a.values, b.values)), k)
    # self-difference is exactly empty; empty sketches return zeros
    assert a.a_not_b(a) == (0.0, 0.0, 0)
    assert KMV(4).a_not_b(KMV(8)) == (0.0, 0.0, 0)


def test_a_not_b_exact_in_small_regime():
    """Below k' distinct union hashes the difference is EXACT."""
    a, b = KMV(256), KMV(256)
    a.update_batch(np.arange(0, 60))
    b.update_batch(np.arange(40, 100))
    fa, da, na = a.a_not_b(b)
    assert na == 40 and fa == 40 / 100
    assert da == pytest.approx(40.0)


def test_jaccard_exact_in_small_regime():
    """Below k' distinct hashes in the union, jaccard() is EXACT —
    the kept sets are the full hash sets."""
    a, b = KMV(256), KMV(256)
    a.update_batch(np.arange(0, 60))
    b.update_batch(np.arange(40, 100))
    jacc, inter, matched = a.jaccard(b)
    assert matched == 20
    assert jacc == 20 / 100
    assert inter == pytest.approx(20.0)


def test_fold_equals_direct_build():
    """fold(k') keeps the k' smallest of the k smallest — bit-identical
    (bytes included) to a direct k' build; jaccard after fold matches
    two native k' sketches."""
    rng = np.random.default_rng(31)
    for _ in range(10):
        n = int(rng.integers(0, 5000))
        keys = rng.integers(0, 1 << 62, n, dtype=np.int64)
        k = int(rng.integers(8, 512))
        k2 = int(rng.integers(2, k + 1))
        a = KMV(k)
        a.update_batch(keys)
        direct = KMV(k2)
        direct.update_batch(keys)
        f = a.fold(k2)
        assert np.array_equal(f.values, direct.values) and f.k == k2
        assert f.to_bytes() == direct.to_bytes()
    a = KMV(64)
    with pytest.raises(ValueError, match="fold"):
        a.fold(65)
    with pytest.raises(ValueError, match="fold"):
        a.fold(1)
    # mixed-k fleets: fold then merge == one native coarse build
    k1, k2 = 128, 32
    s1 = rng.integers(0, 1 << 62, 2000, dtype=np.int64)
    s2 = rng.integers(0, 1 << 62, 1500, dtype=np.int64)
    a = KMV(k1)
    a.update_batch(s1)
    b = KMV(k2)
    b.update_batch(s2)
    u = KMV(k2)
    u.update_batch(np.concatenate([s1, s2]))
    merged = a.fold(k2).merge(b)
    assert np.array_equal(merged.values, u.values)
