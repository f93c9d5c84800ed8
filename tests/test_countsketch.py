"""Count sketch / AMS (core/countsketch.py): weighted-update identity,
estimator accuracy vs exact F2 / join size, merge byte-identity, serde."""

import numpy as np
import pytest

from grenier_spark.core.countsketch import CountSketch


def _zipf_stream(seed, n=30_000, vocab=2_000):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.zipf(1.3, size=n).clip(1, vocab).astype(np.uint64)


def test_weighted_update_equals_repeats():
    keys = np.array([3, 7, 3, 3, 9, 7], dtype=np.uint64)
    a = CountSketch(5, 64, seed=7)
    a.update_batch(keys)
    b = CountSketch(5, 64, seed=7)
    b.update_batch(np.array([3, 7, 9], dtype=np.uint64),
                   weights=np.array([3, 2, 1]))
    assert a.to_bytes() == b.to_bytes()
    assert a.total == 6


def test_point_estimates_heavy_keys():
    s = CountSketch(5, 1024, seed=7)
    stream = _zipf_stream(1)
    s.update_batch(stream)
    keys, freqs = np.unique(stream, return_counts=True)
    heavy = keys[freqs >= 500]
    est = s.point(heavy)
    exact = freqs[freqs >= 500]
    assert len(heavy) >= 3
    # unbiased median estimator: heavy keys within small additive noise
    assert np.all(np.abs(est - exact) <= 0.1 * exact + 50), (est, exact)


def test_f2_accuracy_multiseed():
    errs = []
    for seed in range(6):
        stream = _zipf_stream(seed)
        s = CountSketch(5, 2048, seed=11)
        s.update_batch(stream)
        _, freqs = np.unique(stream, return_counts=True)
        exact = int(np.sum(freqs.astype(object) ** 2))
        errs.append(abs(s.f2() - exact) / exact)
    assert np.mean(errs) < 0.05, errs
    assert max(errs) < 0.15, errs


def test_inner_product_estimates_join_size():
    rng = np.random.Generator(np.random.PCG64(5))
    a_keys = rng.integers(0, 300, size=20_000).astype(np.uint64)
    b_keys = rng.integers(150, 450, size=20_000).astype(np.uint64)
    a = CountSketch(5, 2048, seed=3)
    b = CountSketch(5, 2048, seed=3)
    a.update_batch(a_keys)
    b.update_batch(b_keys)
    ka, fa = np.unique(a_keys, return_counts=True)
    kb, fb = np.unique(b_keys, return_counts=True)
    fmap = dict(zip(kb.tolist(), fb.tolist()))
    exact = sum(int(f) * int(fmap.get(k, 0))
                for k, f in zip(ka.tolist(), fa.tolist()))
    est = a.inner(b)
    assert abs(est - exact) / exact < 0.1, (est, exact)


def test_merge_permutation_byte_identity():
    stream = _zipf_stream(9)
    single = CountSketch(5, 512, seed=7)
    single.update_batch(stream)
    rng = np.random.Generator(np.random.PCG64(0))
    parts = np.array_split(rng.permutation(stream), 8)
    acc = None
    for p in rng.permutation(8):
        c = CountSketch(5, 512, seed=7)
        c.update_batch(parts[p])
        acc = c if acc is None else acc.merge(c)
    assert acc.to_bytes() == single.to_bytes()


def test_param_mismatch_and_validation():
    with pytest.raises(ValueError, match="cannot merge"):
        CountSketch(5, 512, 7).merge(CountSketch(5, 256, 7))
    with pytest.raises(ValueError, match="inner product"):
        CountSketch(5, 512, 7).inner(CountSketch(5, 512, 8))
    with pytest.raises(ValueError, match="positive"):
        CountSketch(0, 512)
    with pytest.raises(ValueError, match="seed"):
        CountSketch(5, 512, seed=1 << 40)


def test_serde_roundtrip_and_corruption():
    s = CountSketch(3, 128, seed=5)
    s.update_batch(np.arange(1000, dtype=np.uint64))
    t = CountSketch.from_bytes(s.to_bytes())
    assert np.array_equal(t.counts, s.counts)
    assert (t.depth, t.width, t.seed, t.total) == (3, 128, 5, 1000)
    with pytest.raises(ValueError, match="not a CountSketch"):
        CountSketch.from_bytes(b"XXXX" + s.to_bytes()[4:])
    with pytest.raises(ValueError, match="corrupt"):
        CountSketch.from_bytes(s.to_bytes()[:-8])


def test_median_rows_is_lower_middle():
    assert CountSketch._median_rows([5, 1, 9]) == 5
    assert CountSketch._median_rows([4, 1, 9, 2]) == 2  # lower middle


def test_fold_depth_equals_direct_build():
    """fold(depth') is bit-identical to a direct depth' build (row salts
    are index-based); width folding is refused — the sign bit is
    (h // width) & 1, so a narrower width re-signs every update."""
    rng = np.random.default_rng(41)
    for _ in range(10):
        n = int(rng.integers(0, 3000))
        keys = rng.integers(0, 1 << 63, n, dtype=np.uint64)
        w = rng.integers(1, 7, n).astype(np.int64) if n % 2 else None
        d = int(rng.integers(1, 8))
        wd = int(rng.choice([64, 512, 1000]))
        seed = int(rng.integers(0, 50))
        cs = CountSketch(d, wd, seed)
        cs.update_batch(keys, w)
        d2 = int(rng.integers(1, d + 1))
        direct = CountSketch(d2, wd, seed)
        direct.update_batch(keys, w)
        f = cs.fold(d2)
        assert np.array_equal(f.counts, direct.counts)
        assert f.to_bytes() == direct.to_bytes()
    with pytest.raises(ValueError, match="fold"):
        CountSketch(4, 512, 7).fold(5)
    with pytest.raises(ValueError, match="fold"):
        CountSketch(4, 512, 7).fold(0)
