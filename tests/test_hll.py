"""HLL golden / parity / error-bound tests (SURVEY.md §5.2 items 1-3)."""

import math

import numpy as np
import pytest

from grenier_spark.core import bits, hll


def brute_force_registers(hashes, p):
    """Per-element reference for the register semantics (hll.ml:45-50, Q2)."""
    t = np.zeros((1 << p) + 1, dtype=np.uint8)
    t[0] = p
    m = 1 << p
    for x in (int(v) for v in hashes):
        j = (x & (m - 1)) + 1
        w = x >> p
        rho = 64 if w == 0 else (w & -w).bit_length()
        t[j] = max(t[j], rho)
    return t


def test_precision_rule_q1():
    # natural-log rule of hll.ml:28: error=0.05 -> p=7, error=0.001 -> p=14
    assert hll.precision_for_error(0.05) == 7
    assert hll.precision_for_error(0.001) == 14
    assert hll.estimate_memory(0.05) == 128
    t = hll.make(0.05)
    assert len(t) == 129 and t[0] == 7
    with pytest.raises(ValueError):
        hll.precision_for_error(0.0)


def test_register_parity_vs_brute_force():
    for p, n, seed in [(7, 2000, 1), (14, 5000, 42), (4, 500, 3)]:
        hashes = bits.wang64(np.arange(seed, seed + n, dtype=np.uint64))
        t = hll.make_p(p)
        hll.add_batch(t, hashes)
        assert np.array_equal(t, brute_force_registers(hashes, p))


def test_register_update_fast_path_parity():
    # batch >> register file triggers the reduceat path; must equal maximum.at
    p = 4
    hashes = bits.wang64(np.arange(50_000, dtype=np.uint64))
    t = hll.make_p(p)
    hll.add_batch(t, hashes)
    assert np.array_equal(t, brute_force_registers(hashes, p))


def test_rho_zero_clamp():
    # w == 0 -> rho = 64 (hll.ml:40-43); craft a hash with all-zero top bits
    p = 7
    t = hll.make_p(p)
    hll.add_batch(t, np.array([5], dtype=np.uint64))  # 5 >> 7 == 0
    assert t[5 + 1] == 64


def test_serde_roundtrip_and_validation():
    t = hll.make(0.05)
    hll.add_batch(t, bits.wang64(np.arange(1000, dtype=np.uint64)))
    s = hll.to_bytes(t)
    t2 = hll.from_bytes(s)
    assert np.array_equal(t, t2)
    assert hll.card(t2) == hll.card(t)  # mirrors hll/test.ml:9
    with pytest.raises(ValueError):
        hll.from_bytes(s[:-1])
    with pytest.raises(ValueError):
        hll.from_bytes(b"\x07" + b"\x00" * 5)


def test_merge_equals_union_and_q6():
    h = bits.wang64(np.arange(20_000, dtype=np.uint64))
    whole = hll.make_p(12)
    hll.add_batch(whole, h)
    a, b = hll.make_p(12), hll.make_p(12)
    hll.add_batch(a, h[:9_000])
    hll.add_batch(b, h[9_000:])
    hll.merge(a, b)
    assert np.array_equal(a, whole)
    with pytest.raises(ValueError):
        hll.merge(hll.make_p(12), hll.make_p(13))


def test_merge_many_matches_pairwise():
    h = bits.wang64(np.arange(9_000, dtype=np.uint64))
    parts = []
    for i in range(6):
        t = hll.make_p(10)
        hll.add_batch(t, h[i * 1500:(i + 1) * 1500])
        parts.append(t)
    folded = parts[0].copy()
    for q in parts[1:]:
        hll.merge(folded, q)
    assert np.array_equal(hll.merge_many(parts), folded)


def test_empty_and_saturated():
    t = hll.make_p(7)
    assert hll.card(t) == 0.0  # linear counting of all-null registers... ln(m/m)*m
    t[1:] = 63
    assert hll.card(t) > 0  # saturated sketch still estimates finitely


def test_error_bound_multiseed():
    """North-rule criterion: estimates within the published 1.04/sqrt(m)
    relative error for the configured m. The bound is a STANDARD DEVIATION
    (Flajolet et al. 2007 §4; the reference's own test only prints the
    single-trial error, hll/test.ml:10-12), so the assertion is statistical:
    RMS relative error over seeds <= 1.5x the bound (small-m estimators run
    slightly above the asymptotic constant), every trial <= 4 sigma.
    """
    seeds = [1, 42, 20260816, 7, 99, 5, 1234, 987, 31337, 2]
    for error, n in [(0.05, 100_000), (0.001, 100_000), (0.001, 500_000)]:
        p = hll.precision_for_error(error)
        bound = 1.04 / math.sqrt(1 << p)
        rels = []
        for seed in seeds:
            base = (seed * 0x9E3779B97F4A7C15) % (1 << 64)
            hashes = bits.wang64(np.uint64(base) + np.arange(n, dtype=np.uint64))
            t = hll.make(error)
            hll.add_batch(t, hashes)
            rel = abs(hll.card(t) - n) / n
            rels.append(rel)
            assert rel <= 4 * bound, (error, n, seed, rel, bound)
        rms = math.sqrt(sum(r * r for r in rels) / len(rels))
        assert rms <= 1.5 * bound, (error, n, rms, bound)


def test_estimator_ranges():
    # small range -> linear counting; exercised via tiny cardinalities
    t = hll.make_p(14)
    hll.add_batch(t, bits.wang64(np.arange(50, dtype=np.uint64)))
    est = hll.card(t)
    assert abs(est - 50) / 50 < 0.05  # linear counting is near-exact here
    # card_hll small-range branch agrees too
    assert abs(hll.card_hll(t) - 50) / 50 < 0.05


def test_alpha_and_threshold_tables():
    assert hll.get_alpha(4) == 0.673
    assert hll.get_alpha(7) == pytest.approx(0.7213 / (1 + 1.079 / 128))
    with pytest.raises(ValueError):
        hll.get_alpha(17)
    assert hll.get_threshold(4) == 10.0
    assert hll.get_threshold(18) == 350000.0
    assert len(hll.RAW_ESTIMATE) == 15 and len(hll.BIAS) == 15
    for r, b in zip(hll.RAW_ESTIMATE, hll.BIAS):
        assert len(r) == len(b)


def test_bias_nn_stable_ties():
    vec = np.array([1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    nn = hll.get_nearest_neighbors(2.0, vec)
    assert list(nn[:2]) == [1, 2]  # tie broken by ascending index (Q4)


def test_sparse_auto_encoding_roundtrip_and_size():
    """to_bytes_auto: low-fill states round-trip through the sparse format
    at a fraction of the dense size; high-fill states fall back to the
    dense public format byte-for-byte."""
    import numpy as np

    from grenier_spark.core import hll
    from grenier_spark.core.bits import wang64

    rng = np.random.default_rng(5)
    t = hll.make_p(14)
    hll.add_batch(t, wang64(rng.integers(0, 1 << 62, 50, dtype=np.uint64)))
    sparse = hll.to_bytes_auto(t)
    assert len(sparse) < 200 < len(hll.to_bytes(t)) == (1 << 14) + 1
    back = hll.from_bytes_any(sparse)
    assert (back == t).all()
    # dense fallback when fill is high
    hll.add_batch(t, wang64(rng.integers(0, 1 << 62, 200000,
                                         dtype=np.uint64)))
    dense = hll.to_bytes_auto(t)
    assert dense == hll.to_bytes(t)
    assert (hll.from_bytes_any(dense) == t).all()
    # corruption rejected
    import pytest as _pt
    with _pt.raises(ValueError):
        hll.from_bytes_any(sparse[:-2])
    with _pt.raises(ValueError):
        hll.from_bytes_any(b"")


def test_from_bytes_rejects_empty():
    import pytest as _pt

    from grenier_spark.core import hll

    with _pt.raises(ValueError):
        hll.from_bytes(b"")
    with _pt.raises(ValueError):
        hll.from_bytes(b"\x07")  # header only, no registers


def test_sparse_decode_rejects_corrupt_indices():
    """Out-of-range or duplicate sparse register indices must raise the
    ValueError contract, not IndexError or a last-wins wrong decode."""
    import struct

    def blob(p, idx, rho):
        out = bytearray([0x80 | p])
        out += struct.pack("<H", len(idx))
        for j in idx:
            out += struct.pack("<H", j)
        out += bytes(rho)
        return bytes(out)

    with pytest.raises(ValueError, match="invalid sparse"):
        hll.from_bytes_any(blob(8, [300], [4]))
    with pytest.raises(ValueError, match="invalid sparse"):
        hll.from_bytes_any(blob(8, [5, 5], [9, 3]))
    t = hll.from_bytes_any(blob(8, [3, 7], [2, 6]))  # canonical: fine
    assert t[1 + 3] == 2 and t[1 + 7] == 6


def test_fold_precision_equals_direct_build():
    """fold_precision(build_p(p), p') is BIT-IDENTICAL to building at p'
    directly — over random (p, p') pairs, sizes incl. 0, and the
    rho(0)=64 sentinel regime (hashes with x >> p == 0)."""
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(0, 4000))
        h = bits.wang64(rng.integers(0, 1 << 63, size=n, dtype=np.uint64))
        p = int(rng.integers(5, 16))
        p2 = int(rng.integers(4, p + 1))
        a = hll.make_p(p)
        hll.add_batch(a, h)
        direct = hll.make_p(p2)
        hll.add_batch(direct, h)
        assert np.array_equal(hll.fold_precision(a, p2), direct), (p, p2, n)
    # sentinel: raw values < 2**p give w == 0 -> rho = 64; the fold must
    # keep 64 in the u == 0 bucket and emit ctz(u)+1 elsewhere
    xs = np.array([5, 7, 300, (1 << 12) - 1], dtype=np.uint64)
    a = hll.make_p(12)
    hll.add_batch(a, xs)
    direct = hll.make_p(8)
    hll.add_batch(direct, xs)
    assert np.array_equal(hll.fold_precision(a, 8), direct)


def test_fold_precision_identity_and_validation():
    a = hll.make_p(9)
    hll.add_batch(a, bits.wang64(np.arange(100, dtype=np.uint64)))
    same = hll.fold_precision(a, 9)
    assert np.array_equal(same, a) and same is not a
    with pytest.raises(ValueError, match="fold_precision"):
        hll.fold_precision(a, 10)  # upsampling is impossible
    with pytest.raises(ValueError, match="fold_precision"):
        hll.fold_precision(a, 3)   # below P_MIN


def test_merge_fold_cross_precision_union():
    """merge_fold folds the finer side exactly, so the cross-precision
    merge equals a from-scratch union build at min(p_a, p_b) — in both
    argument orders; inputs stay untouched."""
    rng = np.random.default_rng(12)
    h1 = bits.wang64(rng.integers(0, 1 << 63, 1500, dtype=np.uint64))
    h2 = bits.wang64(rng.integers(0, 1 << 63, 900, dtype=np.uint64))
    a = hll.make_p(14)
    hll.add_batch(a, h1)
    b = hll.make_p(9)
    hll.add_batch(b, h2)
    a0, b0 = a.copy(), b.copy()
    union = hll.make_p(9)
    hll.add_batch(union, np.concatenate([h1, h2]))
    assert np.array_equal(hll.merge_fold(a, b), union)
    assert np.array_equal(hll.merge_fold(b, a), union)
    assert np.array_equal(a, a0) and np.array_equal(b, b0)
    # equal precisions: plain merge semantics
    assert np.array_equal(hll.merge_fold(b, union), union)
