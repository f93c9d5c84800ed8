"""Double-double arithmetic (SURVEY.md §2.3 D1) vs exact Fraction oracle.

The reference tests with epsilon-tolerance goldens and precision-cliff
cases (doubledouble/test_basic.ml:35-41, :124-141); here every operation is
checked against EXACT rational arithmetic: the double-double result must
carry ~106 bits, i.e. relative error <= 2^-104 (slack over the 2^-106
ideal for the div/sqrt Newton steps).
"""

import math
from fractions import Fraction

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grenier_spark.core import doubledouble as dd

REL = Fraction(1, 2 ** 104)

finite = st.floats(min_value=-1e150, max_value=1e150,
                   allow_nan=False, allow_infinity=False)
# Error-free transforms are exact only while no intermediate underflows to
# the subnormal range (Dekker's analysis; same restriction in the QD
# library) — products of two operands must stay well above 1e-308.
normal = (st.floats(min_value=1e-100, max_value=1e100,
                    allow_nan=False, allow_infinity=False)
          .flatmap(lambda m: st.sampled_from([m, -m])))
nonzero = normal


def exact(h, l):
    return Fraction(float(h)) + Fraction(float(l))


def assert_close(got, want: Fraction):
    if want == 0:
        assert got == 0
        return
    assert abs(got - want) <= abs(want) * REL, (float(got), float(want))


@given(finite, finite)
@settings(max_examples=200, deadline=None)
def test_two_sum_exact(a, b):
    s, e = dd.two_sum(a, b)
    assert Fraction(float(s)) + Fraction(float(e)) == \
        Fraction(a) + Fraction(b)


@given(normal, normal)
@settings(max_examples=200, deadline=None)
def test_two_prod_exact(a, b):
    p, e = dd.two_prod(a, b)
    if np.isfinite(p) and np.isfinite(e):
        assert Fraction(float(p)) + Fraction(float(e)) == \
            Fraction(a) * Fraction(b)


@given(normal, finite, normal, finite)
@settings(max_examples=200, deadline=None)
def test_add_mul_106_bits(a, al, b, bl):
    xh, xl = dd.dd(a, al * 1e-20)
    yh, yl = dd.dd(b, bl * 1e-20)
    sh, sl = dd.dd_add(xh, xl, yh, yl)
    assert_close(exact(sh, sl), exact(xh, xl) + exact(yh, yl))
    ph, pl = dd.dd_mul(xh, xl, yh, yl)
    if np.isfinite(ph):
        assert_close(exact(ph, pl), exact(xh, xl) * exact(yh, yl))


@given(nonzero, nonzero)
@settings(max_examples=200, deadline=None)
def test_div_106_bits(a, b):
    qh, ql = dd.dd_div(a, 0.0, b, 0.0)
    if np.isfinite(qh):
        assert_close(exact(qh, ql), Fraction(a) / Fraction(b))


@given(st.floats(min_value=1e-150, max_value=1e150,
                 allow_nan=False, allow_infinity=False))
@settings(max_examples=200, deadline=None)
def test_sqrt_106_bits(a):
    rh, rl = dd.dd_sqrt(a, 0.0)
    got2 = exact(rh, rl) ** 2
    assert_close(got2, Fraction(a))


def test_precision_cliff():
    """1 + 1e-20 survives in double-double but vanishes in float64
    (the reference's precision-cliff concern, test_basic.ml:124-141)."""
    h, l = dd.dd_add(1.0, 0.0, 1e-20, 0.0)
    assert float(h) == 1.0 and float(l) == 1e-20
    back_h, _ = dd.dd_sub(h, l, 1.0, 0.0)
    assert float(back_h) == 1e-20


def test_pow_int_vs_fraction():
    h, l = dd.dd_pow_int(np.float64(1.1), np.float64(0.0), 30)
    assert_close(exact(h, l), Fraction(1.1) ** 30)
    h, l = dd.dd_pow_int(np.float64(2.0), np.float64(0.0), -5)
    assert exact(h, l) == Fraction(1, 32)


def test_dd_sum_beats_naive_and_matches_fsum():
    """The canonical cancellation stress: N large/small interleaved terms.
    dd_sum must agree with math.fsum (exact) where naive float64 drifts."""
    import math

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.uniform(1e15, 1e16, 500),
                        rng.uniform(1e-8, 1e-7, 500),
                        -rng.uniform(1e15, 1e16, 500)])
    h, l = dd.dd_sum(v)
    want = math.fsum(v.tolist())
    assert h + l == pytest.approx(want, rel=1e-15, abs=1e-9)
    # and the (hi, lo) state merges associatively across a partition split
    h1, l1 = dd.dd_sum(v[:700])
    h2, l2 = dd.dd_sum(v[700:])
    mh, ml = dd.dd_add(h1, l1, h2, l2)
    assert float(mh) + float(ml) == pytest.approx(want, rel=1e-15, abs=1e-9)


def test_vectorized_broadcast():
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([1e-18, 2e-18, 3e-18])
    h, l = dd.dd_add(a, np.zeros(3), b, np.zeros(3))
    assert h.shape == (3,)
    assert (l == b).all()


def test_ddsum_aggregator_serde_merge():
    """DDSum: update/merge/serde round-trip; equals math.fsum within 1 ulp
    under an 8-way partition split."""
    import math

    from grenier_spark.core.doubledouble import DDSum

    rng = np.random.default_rng(9)
    v = rng.uniform(-1e9, 1e9, 40000)
    want = math.fsum(v.tolist())
    parts = np.array_split(v, 8)
    states = []
    for p in parts:
        s = DDSum()
        s.update_batch(p)
        states.append(DDSum.from_bytes(s.to_bytes()))  # serde mid-shuffle
    acc = states[0]
    for s in states[1:]:
        acc.merge(s)
    assert acc.value() == pytest.approx(want, rel=1e-15)
    assert len(acc.to_bytes()) == 16
    with pytest.raises(ValueError):
        DDSum.from_bytes(b"\x00" * 7)


def test_moments_known_answer_and_fsum_parity():
    from grenier_spark.core.doubledouble import Moments

    m = Moments()
    m.update_batch([1.0, 2.0, 3.0, 4.0])
    n, mean, var, skew, kurt = m.stats()
    assert (n, mean, var) == (4, 2.5, 1.25)
    assert skew == 0.0
    assert kurt == pytest.approx(2.5625 / (1.25 * 1.25) - 3.0)
    # power sums match fsum of the identical per-element power chain
    rng = np.random.Generator(np.random.PCG64(3))
    v = rng.normal(50.0, 20.0, size=20_000)
    m2 = Moments()
    m2.update_batch(v)
    p = v.copy()
    for got in m2.sums():
        assert got == math.fsum(p.tolist()), got
        p = p * v


def test_moments_merge_tree_and_serde():
    from grenier_spark.core.doubledouble import Moments

    rng = np.random.Generator(np.random.PCG64(7))
    v = rng.normal(0.0, 3.0, size=10_000)
    whole = Moments()
    whole.update_batch(v)
    parts = [Moments() for _ in range(4)]
    for i, chunk in enumerate(np.array_split(v, 4)):
        parts[i].update_batch(chunk)
    merged = parts[0]
    for q in parts[1:]:
        merged.merge(q)
    assert merged.n == whole.n == len(v)
    for a, b in zip(merged.sums(), whole.sums()):
        assert a == pytest.approx(b, rel=1e-15)
    # serde roundtrip is byte-stable; corrupt blobs fail loudly
    blob = merged.to_bytes()
    assert Moments.from_bytes(blob).to_bytes() == blob
    with pytest.raises(ValueError):
        Moments.from_bytes(blob[:-1])
    with pytest.raises(ValueError):
        Moments.from_bytes(b"XXX1" + blob[4:])


def test_moments_degenerate():
    from grenier_spark.core.doubledouble import Moments

    m = Moments()
    n, mean, var, skew, kurt = m.stats()
    assert n == 0 and math.isnan(mean)
    m.update_batch([7.0, 7.0, 7.0])
    n, mean, var, skew, kurt = m.stats()
    assert (n, mean, var) == (3, 7.0, 0.0)
    assert math.isnan(skew) and math.isnan(kurt)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e12, max_value=1e12,
                          allow_nan=False, width=64),
                min_size=1, max_size=300))
def test_moments_fsum_parity_hypothesis(vals):
    """Power sums equal math.fsum of the pinned per-element power chain to
    within 1 ulp OF THE RESULT whenever the sum is well-conditioned, and
    within the dd accumulation bound ~n^2*2^-104 * sum(|terms|) always.
    The second term is the honest double-double contract: dd carries ~106
    bits RELATIVE TO THE RUNNING MAGNITUDE, so under catastrophic
    cancellation (e.g. +/-1e12 whose cubes cancel exactly, leaving only a
    ~1e-47 residual cube) the residual sits ~196 bits below the
    intermediate sum and is unrecoverable by ANY fixed-precision
    accumulator — exact fsum keeps it, dd rounds it away (hypothesis
    found exactly this input, 2026-08-21). The round-6 gate surface is
    unaffected: on gate fixtures sum(|x^k|) stays <= ~1e30, putting the
    dd-vs-fsum gap at <= ~1e-15 absolute, far inside round-6."""
    from grenier_spark.core.doubledouble import Moments

    v = np.asarray(vals, dtype=np.float64)
    m = Moments()
    # split into uneven batches to exercise the dd merge path too
    m.update_batch(v[: len(v) // 3])
    m.update_batch(v[len(v) // 3:])
    p = v.copy()
    for got in m.sums():
        want = math.fsum(p.tolist())
        cancel_bound = (len(vals) ** 2 + 1) * 2.0 ** -104 \
            * math.fsum(np.abs(p).tolist())
        assert abs(got - want) <= max(math.ulp(want), cancel_bound), \
            (got, want, cancel_bound)
        p = p * v
