"""REQ relative-error quantile sketch (core/req.py; CKLTV PODS 2021):
multiplicative tail rank error, exact-weight conservation, top-item
exactness, determinism, serde, merge validity under permutations."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from grenier_spark.core.req import REQ


def _total_weight(s: REQ) -> int:
    return sum(len(c.buf) << h for h, c in enumerate(s.levels))


def _exact_rank(sorted_vals: np.ndarray, x: float) -> int:
    return int(np.searchsorted(sorted_vals, x, side="right"))


def test_exact_below_capacity():
    s = REQ(k=32)
    vals = np.arange(100, dtype=np.float64)
    s.update_batch(vals)
    # no compaction yet: every quantile is an exact element at the rank
    for q in [0.1, 0.5, 0.9, 0.99]:
        est = float(s.quantiles([q])[0])
        target = max(1, int(np.ceil(q * 100)))
        assert est == float(np.sort(vals)[target - 1]), q


def test_weight_conservation_always():
    rng = np.random.default_rng(5)
    s = REQ(k=16)
    for _ in range(30):
        s.update_batch(rng.lognormal(1.0, 2.0, 1000))
        assert _total_weight(s) == s.n


def test_tail_rank_guarantee_multiplicative():
    """HRA contract: rank error of the q-quantile estimate shrinks
    multiplicatively with the tail mass (n - rank) — at q=0.999 the
    estimate's exact rank must sit within a band FAR tighter than any
    uniform-eps sketch of this size could promise."""
    rng = np.random.default_rng(11)
    n = 200_000
    vals = rng.lognormal(3.0, 2.0, n)
    sv = np.sort(vals)
    s = REQ(k=32)
    for chunk in np.array_split(vals, 40):
        s.update_batch(chunk)
    assert s.n == n
    for q in [0.9, 0.99, 0.999, 0.9999]:
        est = float(s.quantiles([q])[0])
        r = _exact_rank(sv, est)
        target = q * n
        tail = n - target
        # eps = 0.25 multiplicative on the tail mass, +2 additive floor
        assert abs(r - target) <= 0.25 * tail + 2, (q, r, target)


def test_top_items_held_exactly():
    """The maximum (and near-maximum) items are never compacted away:
    q -> 1 returns the exact maximum."""
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 100_000)
    vals[7777] = 1e9  # planted max
    s = REQ(k=32)
    s.update_batch(vals)
    assert float(s.quantiles([1.0])[0]) == 1e9


def test_uniform_kll_comparison_at_tail():
    """On the same budget the tail rank error beats a uniform-eps read:
    REQ's p999 rank error stays under what eps*n uniform error allows."""
    rng = np.random.default_rng(8)
    n = 100_000
    vals = rng.uniform(0, 1, n)
    sv = np.sort(vals)
    s = REQ(k=32)
    s.update_batch(vals)
    est = float(s.quantiles([0.999])[0])
    r = _exact_rank(sv, est)
    # stored items across levels ~ O(k log^1.5 n) ~ few thousand; a
    # uniform sketch of equal size has eps*n ~ n/size rank error (~30+);
    # REQ must do better than 0.5% of the TAIL (0.001*n = 100 items)
    assert abs(r - 0.999 * n) <= 50


def test_determinism_given_order():
    rng = np.random.default_rng(21)
    vals = rng.lognormal(0, 1, 50_000)
    a, b = REQ(k=16, seed=7), REQ(k=16, seed=7)
    for chunk in np.array_split(vals, 13):
        a.update_batch(chunk)
        b.update_batch(chunk)
    assert a.to_bytes() == b.to_bytes()


def test_serde_roundtrip_and_validation():
    rng = np.random.default_rng(2)
    s = REQ(k=16)
    s.update_batch(rng.lognormal(0, 1, 30_000))
    blob = s.to_bytes()
    t = REQ.from_bytes(blob)
    assert t.to_bytes() == blob
    assert t.n == s.n and _total_weight(t) == t.n
    assert np.array_equal(t.quantiles([0.5, 0.99]), s.quantiles([0.5, 0.99]))
    with pytest.raises(ValueError):
        REQ.from_bytes(b"XXXX" + blob[4:])
    # weight/count mismatch must be rejected
    bad = bytearray(blob)
    bad[8:16] = (s.n + 1).to_bytes(8, "little")
    with pytest.raises(ValueError, match="weight"):
        REQ.from_bytes(bytes(bad))


def test_mismatched_k_merge_raises():
    with pytest.raises(ValueError):
        REQ(k=16).merge(REQ(k=32))


@settings(max_examples=8, deadline=None)
@given(n_parts=st.sampled_from([2, 5, 16]), seed=st.integers(0, 10_000))
def test_merge_keeps_guarantee_any_partitioning(n_parts, seed):
    """Split the stream arbitrarily, merge partials in permuted order:
    weight conservation is exact and the tail band still holds."""
    rng = np.random.default_rng(seed)
    n = 40_000
    vals = rng.lognormal(1.0, 1.5, n)
    sv = np.sort(vals)
    parts = np.array_split(rng.permutation(vals), n_parts)
    partials = []
    for p in parts:
        d = REQ(k=32)
        d.update_batch(p)
        partials.append(d)
    order = rng.permutation(n_parts)
    acc = REQ.from_bytes(partials[order[0]].to_bytes())
    for i in order[1:]:
        acc.merge(REQ.from_bytes(partials[i].to_bytes()))
    assert acc.n == n and _total_weight(acc) == n
    for q in [0.99, 0.999]:
        est = float(acc.quantiles([q])[0])
        r = _exact_rank(sv, est)
        assert abs(r - q * n) <= 0.3 * (n - q * n) + 2, (q, r)


def test_nan_filtered_empty_noop():
    s = REQ(k=16)
    s.update_batch(np.array([np.nan, np.nan]))
    assert s.n == 0
    assert np.isnan(s.quantiles([0.5])[0])
    s.update_batch(np.array([]))
    assert s.n == 0


def test_nonfinite_dropped_matches_ddsketch_contract():
    """+/-inf are DROPPED (not kept, not raised): an inf would poison
    exactly the tail quantiles REQ answers (q near 1 would return inf),
    and the finite-only input contract matches DDSketch — asserted here
    so the cross-kind contract can't silently drift again (ADVICE r3)."""
    s = REQ(k=16)
    vals = np.arange(1.0, 1001.0)
    s.update_batch(np.concatenate([vals, [np.inf, -np.inf, np.nan]]))
    assert s.n == len(vals)
    assert np.isfinite(s.quantiles([0.999, 1.0])).all()
    assert float(s.quantiles([1.0])[0]) == 1000.0
    t = REQ(k=16)
    t.update_batch(np.array([np.inf, -np.inf]))
    assert t.n == 0


def test_heavy_ties_and_constant_streams():
    """Degenerate distributions: all-equal values must return that value
    at every q; two-valued streams must return one of the two values with
    the rank band intact (ties never strand the estimator between
    values)."""
    s = REQ(k=16)
    s.update_batch(np.full(50_000, 7.25))
    for q in [0.0, 0.5, 0.99, 1.0]:
        assert float(s.quantiles([q])[0]) == 7.25
    t = REQ(k=16)
    rng = np.random.default_rng(9)
    vals = np.where(rng.random(80_000) < 0.9, 1.0, 2.0)
    t.update_batch(vals)
    n1 = int((vals == 1.0).sum())
    for q in [0.5, 0.99, 0.999]:
        est = float(t.quantiles([q])[0])
        assert est in (1.0, 2.0)
        # the returned value's rank interval must overlap the band
        lo, hi = (0, n1) if est == 1.0 else (n1, len(vals))
        band = 0.5 * (1 - q) * len(vals) + 4
        assert lo - band <= q * len(vals) <= hi + band, (q, est)
