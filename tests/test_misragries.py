"""Misra-Gries mergeable summary: deterministic guarantees under every
merge tree (Agarwal et al., PODS 2012 §3.1)."""

import numpy as np
import pytest

from grenier_spark.core.misragries import MisraGries


def _exact(stream):
    keys, counts = np.unique(np.asarray(stream, dtype=np.int64),
                             return_counts=True)
    return dict(zip(keys.tolist(), counts.tolist()))


def _check_guarantees(mg, stream):
    """The three deterministic MG invariants vs exact counts."""
    exact = _exact(stream)
    n = len(stream)
    stored = {k: lo for k, lo, _hi in mg.items()}
    # soundness + per-key bias window
    for k, lo, hi in mg.items():
        assert lo <= exact.get(k, 0) <= hi, (k, lo, hi, exact.get(k))
    # prune bound: decr*(k+1) <= n - stored mass <= n
    assert mg.decr * (mg.k + 1) <= n - sum(stored.values())
    # completeness: every key with c*(k+1) > n must be stored
    for k, c in exact.items():
        if c * (mg.k + 1) > n:
            assert k in stored, (k, c, n, mg.k)
    assert mg.n == n
    assert len(mg.keys) <= mg.k


def _zipf_stream(rng, n, n_keys=500, a=1.5):
    return rng.zipf(a, size=n).clip(max=n_keys).astype(np.int64)


def test_guarantees_single_stream():
    rng = np.random.default_rng(7)
    stream = _zipf_stream(rng, 20_000)
    mg = MisraGries(16)
    for s in range(0, len(stream), 997):  # ragged batches
        mg.update_batch(stream[s:s + 997])
    _check_guarantees(mg, stream)
    assert len(mg.keys)  # zipf head must survive


@pytest.mark.parametrize("n_parts", [2, 5, 16])
def test_guarantees_survive_any_merge_tree(n_parts):
    rng = np.random.default_rng(n_parts)
    stream = _zipf_stream(rng, 30_000)
    parts = np.array_split(stream, n_parts)
    sketches = []
    for p in parts:
        mg = MisraGries(24)
        mg.update_batch(p)
        sketches.append(mg)
    # sequential fold
    seq = MisraGries(24)
    for s in sketches:
        seq.merge(MisraGries.from_bytes(s.to_bytes()))
    _check_guarantees(seq, stream)
    # pairwise tree fold
    level = [MisraGries.from_bytes(s.to_bytes()) for s in sketches]
    while len(level) > 1:
        nxt = [level[i].merge(level[i + 1]) if i + 1 < len(level)
               else level[i] for i in range(0, len(level), 2)]
        level = nxt
    _check_guarantees(level[0], stream)


def test_weighted_update_matches_expanded():
    rng = np.random.default_rng(3)
    keys = rng.integers(-50, 50, size=200).astype(np.int64)
    uk, uc = np.unique(keys, return_counts=True)
    a = MisraGries(8)
    a.update_batch(keys)
    b = MisraGries(8)
    b.update_batch(uk, weights=uc.astype(np.int64))
    assert a.to_bytes() == b.to_bytes()


def test_exact_below_k():
    mg = MisraGries(64)
    stream = np.repeat(np.arange(10, dtype=np.int64), [5, 4, 3, 2, 1] * 2)
    mg.update_batch(stream)
    assert mg.decr == 0
    assert {k: lo for k, lo, _ in mg.items()} == _exact(stream)


def test_serde_roundtrip_and_validation():
    rng = np.random.default_rng(11)
    mg = MisraGries(12)
    mg.update_batch(_zipf_stream(rng, 5000))
    blob = mg.to_bytes()
    back = MisraGries.from_bytes(blob)
    assert back.to_bytes() == blob
    assert (back.k, back.n, back.decr) == (mg.k, mg.n, mg.decr)
    with pytest.raises(ValueError):
        MisraGries.from_bytes(b"XXXX" + blob[4:])
    with pytest.raises(ValueError):
        MisraGries.from_bytes(blob[:-8])  # truncated body
    with pytest.raises(ValueError):
        MisraGries(0)
    with pytest.raises(ValueError):
        MisraGries(3).merge(MisraGries(4))


def test_negative_and_huge_keys():
    """md5-low64 token ids span the full signed-int64 range."""
    keys = np.array([-(2**63), 2**63 - 1, -1, 0, -(2**63), 2**63 - 1],
                    dtype=np.int64)
    mg = MisraGries(4)
    mg.update_batch(keys)
    _check_guarantees(mg, keys)
    assert MisraGries.from_bytes(mg.to_bytes()).to_bytes() == mg.to_bytes()
