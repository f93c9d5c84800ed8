"""DDSketch unit + property tests (core/ddsketch.py; Masson et al.,
VLDB 2019): the alpha relative-error guarantee against exact rank
elements, byte-identical merges under arbitrary partitionings (the
order-insensitivity that separates it from KLL/t-digest), serde
round-trips, and bit-exact cross-engine bucket/estimator parity with the
DuckDB SQL twin (functions/sql_oracles.py dd_*_sql)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from grenier_spark.core.ddsketch import DDSketch

ALPHA = 0.01


def _exact_rank_element(values: np.ndarray, q: float) -> float:
    sv = np.sort(values)
    return float(sv[int(math.floor(q * (len(sv) - 1)))])


def test_quantile_guarantee_lognormal():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 2.0, 50_000)
    s = DDSketch(ALPHA)
    s.update_batch(vals)
    for q in [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]:
        x = _exact_rank_element(vals, q)
        est = s.quantile(q)
        assert abs(est - x) <= ALPHA * x * (1 + 1e-12), (q, est, x)


def test_zero_values_routed_to_zero_counter():
    s = DDSketch(0.05)
    s.update_batch(np.array([0.0, 0.0, 1.0, 2.0, 4.0]))
    assert s.zero_count == 2 and s.n == 5
    assert s.quantile(0.0) == 0.0
    assert s.quantile(0.2) == 0.0  # rank 0 < zero_count
    # rank 2 -> first positive bucket (value 1.0, within alpha)
    assert abs(s.quantile(0.5) - 1.0) <= 0.05 * 1.0 * (1 + 1e-12)


def test_negative_and_nonfinite_raise():
    s = DDSketch(ALPHA)
    with pytest.raises(ValueError):
        s.update_batch(np.array([1.0, -2.0]))
    with pytest.raises(ValueError):
        s.update_batch(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        s.update_batch(np.array([np.inf]))


def test_empty_quantile_raises():
    with pytest.raises(ValueError):
        DDSketch(ALPHA).quantile(0.5)


def test_mismatched_alpha_merge_raises():
    with pytest.raises(ValueError):
        DDSketch(0.01).merge(DDSketch(0.02))


def test_serde_roundtrip_and_validation():
    rng = np.random.default_rng(3)
    s = DDSketch(ALPHA)
    s.update_batch(rng.uniform(1e-6, 1e6, 10_000))
    s.update_batch(np.zeros(17))
    blob = s.to_bytes()
    t = DDSketch.from_bytes(blob)
    assert t.to_bytes() == blob
    assert t.n == s.n and t.zero_count == 17
    assert np.array_equal(t.idx, s.idx)
    assert np.array_equal(t.counts, s.counts)
    with pytest.raises(ValueError):
        DDSketch.from_bytes(b"XXXX" + blob[4:])


@settings(max_examples=10, deadline=None)
@given(n_parts=st.sampled_from([2, 7, 16]), seed=st.integers(0, 10_000))
def test_merge_byte_identity_any_partitioning(n_parts, seed):
    """Bucket-count addition is associative+commutative: splitting the
    stream into any partitioning, building partials and merging in any
    order yields the SAME BYTES as the single-stream build."""
    rng = np.random.default_rng(seed)
    vals = rng.lognormal(2.0, 1.5, 5_000)
    vals[rng.integers(0, len(vals), 50)] = 0.0
    whole = DDSketch(ALPHA)
    whole.update_batch(vals)
    parts = np.array_split(rng.permutation(vals), n_parts)
    partials = []
    for p in parts:
        d = DDSketch(ALPHA)
        d.update_batch(p)
        partials.append(d)
    order = rng.permutation(n_parts)
    acc = DDSketch.from_bytes(partials[order[0]].to_bytes())
    for i in order[1:]:
        acc.merge(DDSketch.from_bytes(partials[i].to_bytes()))
    assert acc.to_bytes() == whole.to_bytes()


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000),
       sigma=st.sampled_from([0.5, 1.0, 3.0]))
def test_guarantee_fuzz(seed, sigma):
    rng = np.random.default_rng(seed)
    vals = rng.lognormal(0.0, sigma, 2_000)
    s = DDSketch(ALPHA)
    s.update_batch(vals)
    for q in [0.1, 0.5, 0.9]:
        x = _exact_rank_element(vals, q)
        assert abs(s.quantile(q) - x) <= ALPHA * x * (1 + 1e-12)


def test_state_stays_small():
    """Bucket count is bounded by log_gamma(max/min), independent of n —
    the property that keeps shuffle rows KB-sized at 10^12 tokens."""
    rng = np.random.default_rng(1)
    s = DDSketch(ALPHA)
    for _ in range(10):
        s.update_batch(rng.uniform(1e-3, 1e9, 100_000))
    bound = math.log(1e9 / 1e-3) / math.log(s.gamma) + 2
    assert len(s.idx) <= bound
    assert len(s.to_bytes()) < 32_000


def test_cross_engine_bucket_and_estimator_parity():
    """Bit-exact DuckDB twin: bucket indices AND the full quantile
    estimate agree with the numpy kernel on a dense value grid (all
    2-decimal values in (0, 600], superset of the fixture grid) plus
    adversarial near-boundary points."""
    duckdb = pytest.importorskip("duckdb")
    from grenier_spark.functions.sql_oracles import (dd_bucket_expr,
                                                     dd_quantile_sql)

    vals = np.round(np.arange(1, 60_001) * 0.01, 10)
    s = DDSketch(ALPHA)
    np_idx = np.ceil(np.log(vals) / s._lg).astype(np.int64)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"v": vals}))
    sql_idx = con.execute(
        f"SELECT {dd_bucket_expr('v', ALPHA)} FROM t ORDER BY v"
    ).fetchnumpy()
    assert np.array_equal(np_idx, next(iter(sql_idx.values())).astype(np.int64))

    s.update_batch(vals)
    qs = [0.01, 0.5, 0.99]
    rows = con.execute(
        dd_quantile_sql("SELECT v FROM t", "v", ALPHA, qs) + " ORDER BY q"
    ).fetchall()
    for (q, est_sql, n), q_py in zip(rows, qs):
        assert n == len(vals)
        assert est_sql == s.quantile(q_py), (q, est_sql, s.quantile(q_py))


def test_cross_engine_bucket_parity_extreme_magnitudes():
    """Bucket-map parity across 24 decades (1e-12..1e12, log-uniform) plus
    adversarial knife-edge points: exact powers of gamma and their 1-ULP
    neighbours. Off the knife edge the engines agree exactly. ON the
    knife edge (a value within ~1 ULP of an exact gamma power — measure
    zero, and absent from the 2-decimal fixture grid the gates run on)
    numpy's SIMD ``np.log`` and DuckDB's libm ``ln`` may round the ratio
    to opposite sides of the integer, flipping the bucket by AT MOST one
    — and either bucket's estimate still satisfies the alpha bound, since
    a boundary value's error from the adjacent bucket midpoint is exactly
    alpha (2*gamma/(gamma+1) = 1+alpha). Assert both facts."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from grenier_spark.functions.sql_oracles import dd_bucket_expr

    s = DDSketch(ALPHA)
    rng = np.random.default_rng(42)
    smooth = 10.0 ** rng.uniform(-12, 12, 20_000)
    ks = np.arange(-1200, 1201, 7).astype(np.float64)
    gp = np.power(s.gamma, ks)
    edge = np.concatenate([gp, np.nextafter(gp, np.inf),
                           np.nextafter(gp, 0.0)])
    v = np.concatenate([smooth, edge])
    v = v[np.isfinite(v) & (v > 0)]
    n_smooth = len(smooth)
    np_idx = np.ceil(np.log(v) / s._lg).astype(np.int64)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": v}))
    got = con.execute(
        f"SELECT {dd_bucket_expr('v', ALPHA)} FROM t"
    ).fetchnumpy()
    sql_idx = next(iter(got.values())).astype(np.int64)
    # smooth points: exact agreement
    assert np.array_equal(np_idx[:n_smooth], sql_idx[:n_smooth])
    # knife-edge points: off by at most one bucket, and both candidate
    # estimates honor the alpha relative-error bound for the value itself
    d = sql_idx[n_smooth:] - np_idx[n_smooth:]
    assert np.all(np.abs(d) <= 1), np.abs(d).max()
    ve = v[n_smooth:]
    for b in (np_idx[n_smooth:], sql_idx[n_smooth:]):
        est = 2.0 * np.power(s.gamma, b.astype(np.float64)) / (s.gamma + 1)
        assert np.all(np.abs(est - ve) <= ALPHA * ve * (1 + 1e-9))


def test_int32_bucket_overflow_raises():
    """A pathological alpha whose bucket indices exceed the int32 wire
    range must fail loudly, never wrap to a wrong bucket."""
    s = DDSketch(1e-8)
    with pytest.raises(ValueError, match="int32"):
        s.update_batch(np.array([1e-300]))


def test_quantile_rejects_out_of_range_q():
    s = DDSketch(ALPHA)
    s.update_batch(np.array([1.0, 2.0, 3.0]))
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            s.quantile(bad)


# -- weighted updates -------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 7])
def test_weighted_equals_repeat_expansion(seed):
    """update_batch_weighted(v, w) transitions state identically to
    update_batch(np.repeat(v, w)) — byte-identical wire blobs — and
    zero-weight pairs are dropped without touching the state."""
    rng = np.random.default_rng(seed)
    vals = np.round(rng.lognormal(3.0, 1.5, 500), 3)
    vals[::17] = 0.0  # exercise the zero counter under weights
    w = rng.integers(0, 9, 500)  # includes zero weights
    a = DDSketch(0.01)
    a.update_batch_weighted(vals, w)
    b = DDSketch(0.01)
    b.update_batch(np.repeat(vals, w))
    assert a.to_bytes() == b.to_bytes()
    assert a.n == int(w.sum())


def test_weighted_merge_any_partitioning():
    """Weighted updates keep the order-insensitive merge contract: any
    split of the (value, weight) stream merges byte-identically."""
    rng = np.random.default_rng(11)
    vals = rng.lognormal(2.0, 1.0, 900)
    w = rng.integers(1, 20, 900)
    whole = DDSketch(0.02)
    whole.update_batch_weighted(vals, w)
    for cuts in ([300, 600], [1, 899], [450]):
        parts = np.split(np.arange(900), cuts)
        rng.shuffle(parts)
        acc = DDSketch(0.02)
        for p in parts:
            piece = DDSketch(0.02)
            piece.update_batch_weighted(vals[p], w[p])
            acc.merge(DDSketch.from_bytes(piece.to_bytes()))
        assert acc.to_bytes() == whole.to_bytes()


def test_weighted_quantile_guarantee():
    """The alpha relative-error guarantee holds at WEIGHTED ranks: the
    estimate is within alpha of the element at rank floor(q*(W-1)) of the
    weight-expanded stream."""
    rng = np.random.default_rng(3)
    vals = rng.lognormal(4.0, 2.0, 2000)
    w = rng.integers(1, 50, 2000)
    s = DDSketch(0.01)
    s.update_batch_weighted(vals, w)
    expanded = np.sort(np.repeat(vals, w))
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        want = expanded[int(math.floor(q * (len(expanded) - 1)))]
        got = s.quantile(q)
        assert abs(got - want) <= 0.01 * want + 1e-12


def test_weighted_rejects_bad_weights():
    s = DDSketch(0.01)
    with pytest.raises(ValueError, match="integers"):
        s.update_batch_weighted(np.array([1.0]), np.array([1.5]))
    with pytest.raises(ValueError, match=">= 0"):
        s.update_batch_weighted(np.array([1.0]),
                                np.array([-1], dtype=np.int64))
    with pytest.raises(ValueError, match="values vs"):
        s.update_batch_weighted(np.array([1.0, 2.0]),
                                np.array([1], dtype=np.int64))
    with pytest.raises(ValueError, match="finite"):
        s.update_batch_weighted(np.array([-1.0]),
                                np.array([1], dtype=np.int64))
    assert s.n == 0  # every rejected call left the state untouched


def test_weighted_total_overflow_raises_loudly():
    """Two ~2^62 weights landing in one bucket would silently wrap the
    int64 per-bucket accumulator; the guard raises instead — before any
    state is touched — and exactly at the int64 boundary."""
    big = np.int64(1) << 62
    s = DDSketch(0.01)
    with pytest.raises(ValueError, match="overflow"):
        s.update_batch_weighted(np.array([2.0, 2.0]),
                                np.array([big, big], dtype=np.int64))
    assert s.n == 0
    # the guard is exact, not approximate: max representable total fits
    imax = np.iinfo(np.int64).max
    s2 = DDSketch(0.01)
    s2.update_batch_weighted(np.array([2.0, 3.0]),
                             np.array([imax - 5, 5], dtype=np.int64))
    assert s2.n == imax
    with pytest.raises(ValueError, match="overflow"):
        s2.update_batch_weighted(np.array([4.0]),
                                 np.array([1], dtype=np.int64))
    assert s2.n == imax


def test_merge_total_overflow_raises_loudly():
    """Two partials that each passed the update-path guard can still
    overflow when COMBINED — and merge() is exactly the path the
    distributed two-level build takes. The guard must fire there too,
    before any state is touched."""
    big = (np.int64(1) << 62) + np.int64(1 << 61)  # 3 * 2^61 each
    a = DDSketch(0.01)
    a.update_batch_weighted(np.array([2.0]), np.array([big]))
    b = DDSketch(0.01)
    b.update_batch_weighted(np.array([3.0]), np.array([big]))
    n_a = a.n
    with pytest.raises(ValueError, match="overflow"):
        a.merge(b)
    assert a.n == n_a  # untouched by the refused merge
    # a merge that lands exactly at the boundary still works
    imax = np.iinfo(np.int64).max
    c = DDSketch(0.01)
    c.update_batch_weighted(np.array([2.0]), np.array([imax - 7],
                                                      dtype=np.int64))
    d = DDSketch(0.01)
    d.update_batch_weighted(np.array([3.0]), np.array([7], dtype=np.int64))
    assert c.merge(d).n == imax
