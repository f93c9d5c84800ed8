"""Merge-associativity permutation tests (SURVEY.md §5.2.3, FIXTURES.md §2.4).

HLL (max), count-min (+), Bloom (OR) and KMV (union-truncate) must
produce BIT-IDENTICAL final
states for any partitioning of a fixed multiset, any merge order and any
merge-tree shape. KLL / t-digest are order-sensitive at the bit level; their
quantile ANSWERS must stay within the published rank-error bound.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from grenier_spark.core import bits, hll
from grenier_spark.core.bloom import Bloom
from grenier_spark.core.countmin import CountMin
from grenier_spark.core.kll import KLL
from grenier_spark.core.tdigest import TDigest

ITEMS = bits.wang64(np.arange(40_000, dtype=np.uint64))
VALUES = np.asarray(ITEMS % np.uint64(10_000), dtype=np.float64)


def random_tree_merge(states, rng, merge_fn):
    states = list(states)
    while len(states) > 1:
        i = int(rng.integers(0, len(states) - 1))
        a = states.pop(i)
        b = states.pop(int(rng.integers(0, len(states))) if len(states) > 1 else 0)
        merge_fn(a, b)
        states.append(a)
    return states[0]


@settings(max_examples=8, deadline=None)
@given(n_parts=st.sampled_from([2, 8, 32]), seed=st.integers(0, 10_000))
def test_hll_bit_identical_under_permutation(n_parts, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ITEMS))
    sequential = hll.make_p(12)
    hll.add_batch(sequential, ITEMS)
    parts = np.array_split(ITEMS[perm], n_parts)
    states = []
    for p in parts:
        t = hll.make_p(12)
        hll.add_batch(t, p)
        states.append(t)
    merged = random_tree_merge(states, rng, lambda a, b: hll.merge(a, b))
    assert np.array_equal(merged, sequential)


@settings(max_examples=6, deadline=None)
@given(n_parts=st.sampled_from([2, 8, 16]), seed=st.integers(0, 10_000))
def test_countmin_bit_identical_under_permutation(n_parts, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ITEMS))
    sequential = CountMin(4, 512, seed=3)
    sequential.update_batch(ITEMS)
    states = []
    for p in np.array_split(ITEMS[perm], n_parts):
        c = CountMin(4, 512, seed=3)
        c.update_batch(p)
        states.append(c)
    merged = random_tree_merge(states, rng, lambda a, b: a.merge(b))
    assert np.array_equal(merged.counts, sequential.counts)
    assert merged.total == sequential.total


@settings(max_examples=6, deadline=None)
@given(n_parts=st.sampled_from([2, 8, 16]), seed=st.integers(0, 10_000))
def test_countsketch_bit_identical_under_permutation(n_parts, seed):
    from grenier_spark.core.countsketch import CountSketch

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ITEMS))
    sequential = CountSketch(5, 256, seed=3)
    sequential.update_batch(ITEMS)
    states = []
    for p in np.array_split(ITEMS[perm], n_parts):
        c = CountSketch(5, 256, seed=3)
        c.update_batch(p)
        states.append(c)
    merged = random_tree_merge(states, rng, lambda a, b: a.merge(b))
    assert merged.to_bytes() == sequential.to_bytes()


@settings(max_examples=6, deadline=None)
@given(n_parts=st.sampled_from([2, 8, 16]), seed=st.integers(0, 10_000))
def test_kmv_bit_identical_under_permutation(n_parts, seed):
    from grenier_spark.core.kmv import KMV

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ITEMS))
    sequential = KMV(128)
    sequential.update_batch(ITEMS)
    states = []
    for p in np.array_split(ITEMS[perm], n_parts):
        s = KMV(128)
        s.update_batch(p)
        states.append(s)
    merged = random_tree_merge(states, rng, lambda a, b: a.merge(b))
    assert merged.to_bytes() == sequential.to_bytes()


@settings(max_examples=8, deadline=None)
@given(n_parts=st.sampled_from([2, 8, 32]), seed=st.integers(0, 10_000))
def test_ddsketch_bit_identical_under_permutation(n_parts, seed):
    # bucket-count addition: byte-identical under any partitioning AND
    # any merge-tree shape (unlike kll/tdigest below)
    from grenier_spark.core.ddsketch import DDSketch

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(VALUES))
    sequential = DDSketch(0.01)
    sequential.update_batch(VALUES)
    states = []
    for p in np.array_split(VALUES[perm], n_parts):
        s = DDSketch(0.01)
        s.update_batch(p)
        states.append(s)
    merged = random_tree_merge(states, rng, lambda a, b: a.merge(b))
    assert merged.to_bytes() == sequential.to_bytes()


@settings(max_examples=6, deadline=None)
@given(n_parts=st.sampled_from([2, 8, 16]), seed=st.integers(0, 10_000))
def test_bloom_bit_identical_under_permutation(n_parts, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(ITEMS))
    sequential = Bloom(30_000, 5, seed=3)
    sequential.update_batch(ITEMS)
    states = []
    for p in np.array_split(ITEMS[perm], n_parts):
        b = Bloom(30_000, 5, seed=3)
        b.update_batch(p)
        states.append(b)
    merged = random_tree_merge(states, rng, lambda a, b: a.merge(b))
    assert np.array_equal(merged.bits, sequential.bits)


@settings(max_examples=4, deadline=None)
@given(n_parts=st.sampled_from([2, 8]), seed=st.integers(0, 10_000))
def test_quantile_sketches_estimate_level_associative(n_parts, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(VALUES))
    qs = [0.1, 0.5, 0.9]
    true = np.quantile(VALUES, qs)
    span = float(VALUES.max() - VALUES.min())

    kparts, tparts = [], []
    for i, p in enumerate(np.array_split(VALUES[perm], n_parts)):
        ks = KLL(200, seed=i)
        ks.update_batch(p)
        kparts.append(ks)
        ts = TDigest(200)
        ts.update_batch(p)
        tparts.append(ts)
    kll_m = random_tree_merge(kparts, rng, lambda a, b: a.merge(b))
    td_m = random_tree_merge(tparts, rng, lambda a, b: a.merge(b))
    for est, q in zip(kll_m.quantiles(qs), qs):
        rank = float(np.mean(VALUES <= est))
        assert abs(rank - q) < 0.04
    for est, q in zip(td_m.quantiles(qs), qs):
        rank = float(np.mean(VALUES <= est))
        assert abs(rank - q) < 0.02
