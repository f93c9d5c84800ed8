"""Lossy counting + sticky sampling vs exact counts (SURVEY.md §2.2 C1-C8).

The reference's countish/ directory is unbuilt experimental code; we keep its
observable semantics (incl. the float-bucket delta and report-formula quirks,
see core/countish.py docstring) but assert the published Manku-Motwani
guarantees against exact counts, as SURVEY.md §2.2 prescribes.
"""

import collections

import numpy as np
import pytest

from grenier_spark.core.countish import LossyCounter, StickySampler

SUPPORT, EPS = 0.01, 0.001


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(42)
    return (50_257 * rng.random(30_000) ** 3).astype(np.int64)


def test_lossy_batch_equals_per_item(stream):
    a = LossyCounter(SUPPORT, EPS)
    b = LossyCounter(SUPPORT, EPS)
    a.observe_batch(stream[:5000])
    for x in stream[:5000]:
        b.observe(int(x))
    assert a.f == b.f and a.delta == b.delta and a.n == b.n


def test_lossy_guarantees(stream):
    lc = LossyCounter(SUPPORT, EPS)
    lc.observe_batch(stream)
    exact = collections.Counter(stream.tolist())
    n = len(stream)
    hh = dict(lc.heavy_hitters(SUPPORT))
    for k, c in exact.items():
        if c / n >= SUPPORT:
            assert k in hh, f"missed true heavy hitter {k} ({c / n:.4f})"
    for k in hh:
        assert exact[k] / n >= SUPPORT - EPS, f"false positive {k}"
    # state is bounded: at most ~ (1/eps) * log(eps * n) entries
    assert len(lc.f) <= (1 / EPS) * np.log(EPS * n) * 2


def test_lossy_merge_guarantees(stream):
    parts = np.array_split(stream, 4)
    sketches = []
    for p in parts:
        lc = LossyCounter(SUPPORT, EPS)
        lc.observe_batch(p)
        sketches.append(lc)
    acc = sketches[0]
    for s in sketches[1:]:
        acc.merge(s)
    assert acc.n == len(stream)
    exact = collections.Counter(stream.tolist())
    n = len(stream)
    hh = dict(acc.heavy_hitters(SUPPORT))
    for k, c in exact.items():
        if c / n >= SUPPORT:
            assert k in hh
    # merged error tolerance: eps per partition adds up; bound is 4x looser
    for k in hh:
        assert exact[k] / n >= SUPPORT - 4 * EPS
    with pytest.raises(ValueError):
        acc.merge(LossyCounter(0.02, EPS))


def test_lossy_reference_report_formula(stream):
    lc = LossyCounter(SUPPORT, EPS)
    lc.observe_batch(stream)
    out = lc.items_above_threshold(SUPPORT)
    # reference formula emits f/n + support (lossy.ml:38): values exceed support
    for _, freq in out:
        assert freq > SUPPORT


def test_sticky_deterministic_and_guarantee(stream):
    a = StickySampler(SUPPORT, EPS, 0.01, seed=42)
    b = StickySampler(SUPPORT, EPS, 0.01, seed=42)
    a.observe_batch(stream)
    b.observe_batch(stream)
    assert a.s == b.s and a.n == b.n and a.r == b.r
    exact = collections.Counter(stream.tolist())
    n = len(stream)
    reported = {k for k, _ in a.items_above_threshold(SUPPORT)}
    for k, c in exact.items():
        if c / n >= SUPPORT:
            assert k in reported


def test_sticky_batch_equals_per_item(stream):
    a = StickySampler(SUPPORT, EPS, 0.01, seed=7)
    b = StickySampler(SUPPORT, EPS, 0.01, seed=7)
    a.observe_batch(stream[:3000])
    for x in stream[:3000]:
        b.observe(int(x))
    assert a.s == b.s and a.n == b.n and a.r == b.r


def test_lossy_merge_absent_key_keeps_guarantee():
    """A key pruned from (or never seen by) one stream must absorb that
    stream's absent-key bound n/w on merge, or the merged (f+delta)/n upper
    bound can undercount true frequency and drop a real heavy hitter."""
    import numpy as np

    from grenier_spark.core.countish import LossyCounter

    a = LossyCounter(0.1, 0.01)        # w = 100
    a.observe_batch(np.arange(1000) % 500 + 10_000)   # key 7 absent from a
    b = LossyCounter(0.1, 0.01)
    b.observe_batch(np.full(50, 7))
    bound_a = a.n / a.bucket_width
    d_before = b.delta[7]
    a.merge(b)
    assert a.delta[7] == d_before + bound_a
    # upper bound now dominates the true combined count for key 7 even if
    # stream a had held up to n/w hidden occurrences
    assert a.f[7] + a.delta[7] >= 50 + 0  # f exact here; bound positive
    assert a.delta[7] > d_before


def test_lossy_nan_keys_do_not_skew_n():
    import numpy as np

    from grenier_spark.core.countish import LossyCounter

    lc = LossyCounter(0.1, 0.01)
    lc.observe_batch(np.array([1.0, np.nan, 1.0, np.nan]))
    assert lc.n == 2 and lc.f[1.0] == 2.0
