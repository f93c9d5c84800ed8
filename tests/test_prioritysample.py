"""PrioritySample core state (core/prioritysample.py): selection, merge
associativity/permutation invariance, the DLT estimator, serde."""

import math

import numpy as np
import pytest

from grenier_spark.core.prioritysample import PrioritySample


def _prios(rng, w):
    return w / rng.random(len(w))


def test_select_and_tau():
    s = PrioritySample(3)
    ids = np.arange(6, dtype=np.int64)
    w = np.int64([10, 20, 30, 40, 50, 60])
    prios = np.float64([1.0, 6.0, 2.0, 5.0, 4.0, 3.0])
    s.update_batch(ids, w, prios)
    # top-3 by priority: ids 1 (6.0), 3 (5.0), 4 (4.0); tau = 4th = 3.0
    assert [i for i, _, _ in s.items()] == [1, 3, 4]
    assert s.tau == 3.0
    assert [wh for _, _, wh in s.items()] == [20.0, 40.0, 50.0]


def test_small_population_is_exact():
    s = PrioritySample(10)
    s.update_batch(np.int64([5, 6]), np.int64([7, 9]),
                   np.float64([1.0, 2.0]))
    assert s.tau == 0.0
    assert s.estimate_total() == 16.0


def test_merge_equals_single_stream_any_partitioning():
    rng = np.random.default_rng(0)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 1000, n)
    prios = _prios(rng, w.astype(float))
    whole = PrioritySample(64)
    whole.update_batch(ids, w, prios)
    for n_parts, seed in ((2, 1), (7, 2), (40, 3)):
        parts = np.array_split(np.arange(n), n_parts)
        rng2 = np.random.default_rng(seed)
        rng2.shuffle(parts)
        acc = PrioritySample(64)
        for p in parts:
            piece = PrioritySample(64)
            piece.update_batch(ids[p], w[p], prios[p])
            acc.merge(PrioritySample.from_bytes(piece.to_bytes()))
        assert acc.to_bytes() == whole.to_bytes()


def test_merge_associativity():
    rng = np.random.default_rng(4)
    states = []
    for i in range(3):
        ids = np.arange(i * 100, i * 100 + 100, dtype=np.int64)
        w = rng.integers(1, 50, 100)
        s = PrioritySample(9)
        s.update_batch(ids, w, _prios(rng, w.astype(float)))
        states.append(s)

    def clone(s):
        return PrioritySample.from_bytes(s.to_bytes())

    left = clone(states[0]).merge(clone(states[1])).merge(clone(states[2]))
    right = clone(states[0]).merge(
        clone(states[1]).merge(clone(states[2])))
    assert left.to_bytes() == right.to_bytes()


def test_unbiased_subset_estimates():
    """Seed-averaged subset estimates converge to the truth (DLT Thm 1)."""
    rng = np.random.default_rng(8)
    n = 800
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 400, n)
    subset = ids % 3 == 0
    truth = float(w[subset].sum())
    ests = []
    for seed in range(120):
        r = np.random.default_rng(1000 + seed)
        s = PrioritySample(50)
        s.update_batch(ids, w, _prios(r, w.astype(float)))
        ests.append(math.fsum(wh for i, _, wh in s.items() if i % 3 == 0))
    rel = abs(np.mean(ests) - truth) / truth
    assert rel < 0.05, (np.mean(ests), truth)


def test_priority_tie_breaks_by_id():
    s = PrioritySample(1)
    s.update_batch(np.int64([9, 2, 5]), np.int64([3, 3, 3]),
                   np.float64([7.0, 7.0, 7.0]))
    assert [i for i, _, _ in s.items()] == [2]
    assert s.tau == 7.0  # the id-5 copy is the (k+1)-th


def test_argpartition_prune_keeps_boundary_ties():
    """The O(n) batch prune (argpartition -> candidates -> lexsort) must
    keep the id-asc rule at the boundary priority: with many items TIED
    exactly at the (k+1)-th priority, the kept ids are the smallest —
    identical to a full (priority desc, id asc) sort of the batch."""
    k = 3
    n = 500
    ids = np.arange(n, dtype=np.int64)[::-1].copy()  # descending ids
    w = np.full(n, 7, dtype=np.int64)
    prios = np.full(n, 5.0)          # everything tied at the boundary
    prios[::50] = 9.0                # 10 clear winners above the tie
    s = PrioritySample(k)
    s.update_batch(ids, w, prios)
    order = np.lexsort((ids, -prios))
    want = sorted(ids[order[:k]].tolist())
    assert sorted(i for i, _, _ in s.items()) == want
    assert s.tau == prios[order[k]]
    # and the prune is batch-size invariant: one big batch == many small
    s2 = PrioritySample(k)
    for lo in range(0, n, 17):
        s2.update_batch(ids[lo:lo + 17], w[lo:lo + 17], prios[lo:lo + 17])
    assert s2.to_bytes() == s.to_bytes()


def test_zero_weight_items_never_bias():
    s = PrioritySample(2)
    s.update_batch(np.int64([1, 2, 3, 4]), np.int64([0, 0, 5, 6]),
                   np.float64([0.0, 0.0, 2.0, 3.0]))
    assert {i for i, _, _ in s.items()} == {3, 4}
    assert s.tau == 0.0


def test_validation_and_serde_errors():
    s = PrioritySample(4)
    with pytest.raises(ValueError, match="integers"):
        s.update_batch(np.float64([1.0]), np.int64([1]), np.float64([1.0]))
    with pytest.raises(ValueError, match="integers"):
        s.update_batch(np.int64([1]), np.float64([1.5]), np.float64([1.0]))
    with pytest.raises(ValueError, match="length"):
        s.update_batch(np.int64([1, 2]), np.int64([1]), np.float64([1.0]))
    with pytest.raises(ValueError, match=">= 0"):
        s.update_batch(np.int64([1]), np.int64([-1]), np.float64([1.0]))
    with pytest.raises(ValueError, match="finite"):
        s.update_batch(np.int64([1]), np.int64([1]), np.float64([np.inf]))
    with pytest.raises(ValueError, match="k="):
        PrioritySample(3).merge(PrioritySample(4))
    with pytest.raises(ValueError, match="not a PrioritySample"):
        PrioritySample.from_bytes(b"XXXX" + b"\0" * 16)
    s.update_batch(np.int64([1, 2]), np.int64([3, 4]),
                   np.float64([1.0, 2.0]))
    blob = bytearray(s.to_bytes())
    blob[-1] ^= 0x7F  # corrupt the last priority ordering/finiteness
    with pytest.raises(ValueError, match="corrupt"):
        PrioritySample.from_bytes(bytes(blob))


def test_roundtrip():
    rng = np.random.default_rng(12)
    w = rng.integers(1, 100, 300)
    s = PrioritySample(16)
    s.update_batch(np.arange(300, dtype=np.int64), w,
                   _prios(rng, w.astype(float)))
    t = PrioritySample.from_bytes(s.to_bytes())
    assert t.to_bytes() == s.to_bytes()
    assert t.items() == s.items() and t.tau == s.tau


@pytest.mark.parametrize("k_new", [1, 7, 32, 64])
def test_fold_bit_identical_to_direct_build(k_new):
    """Exact-fold family contract: fold(k') of a k=64 state equals a
    direct k' build byte-for-byte, and folds compose with merges in any
    order (fold-then-merge == merge-then-fold)."""
    rng = np.random.default_rng(21)
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 500, n)
    prios = _prios(rng, w.astype(float))
    big = PrioritySample(64)
    big.update_batch(ids, w, prios)
    direct = PrioritySample(k_new)
    direct.update_batch(ids, w, prios)
    assert big.fold(k_new).to_bytes() == direct.to_bytes()

    halves = []
    for sl in (slice(0, n // 2), slice(n // 2, n)):
        h = PrioritySample(64)
        h.update_batch(ids[sl], w[sl], prios[sl])
        halves.append(h)
    merged_then_folded = PrioritySample.from_bytes(
        halves[0].to_bytes()).merge(halves[1]).fold(k_new)
    folded_then_merged = halves[0].fold(k_new).merge(halves[1].fold(k_new))
    assert merged_then_folded.to_bytes() == folded_then_merged.to_bytes()


def test_fold_validation():
    s = PrioritySample(8)
    with pytest.raises(ValueError, match="fold"):
        s.fold(9)
    with pytest.raises(ValueError, match="fold"):
        s.fold(0)
    assert s.fold(8).to_bytes() == s.to_bytes()  # identity fold
