"""Mergeable MinHash signature kind (core/minhash.py): scalar-chain
parity, merge algebra, duplicate insensitivity, serde, and estimator
sanity. (Per-document MinHash+LSH dedup lives in test_dedup_similarity.)"""

import numpy as np
import pytest

from grenier_spark.core.bits import splitmix64_scalar, wang64_scalar
from grenier_spark.core.minhash import EMPTY64, MinHashSig


def _sig(keys, k=8, seed=7):
    s = MinHashSig(k, seed)
    s.update_batch(np.asarray(keys, dtype=np.int64))
    return s


def test_components_match_scalar_reference_chain():
    """sig[i] == min over distinct keys of
    wang64(key XOR splitmix64(seed + i + 1)) — the exact chain the DuckDB
    oracle replays (including a negative key via the two's-complement
    view)."""
    keys = [3, 17, 92, 3, 17, 2**40 + 5, -4]
    k, seed = 6, 11
    s = _sig(keys, k=k, seed=seed)
    m = (1 << 64) - 1
    for i in range(k):
        salt = splitmix64_scalar(seed + i + 1)
        want = min(wang64_scalar((key & m) ^ salt) for key in set(keys))
        assert int(s.values[i]) == want, i


def test_merge_is_componentwise_min_and_equals_single_stream():
    a_keys = np.arange(0, 500, dtype=np.int64)
    b_keys = np.arange(300, 900, dtype=np.int64)
    a, b = _sig(a_keys), _sig(b_keys)
    merged = MinHashSig.from_bytes(a.to_bytes()).merge(
        MinHashSig.from_bytes(b.to_bytes()))
    single = _sig(np.concatenate([a_keys, b_keys]))
    assert np.array_equal(merged.values, single.values)
    # idempotent and commutative
    again = MinHashSig.from_bytes(b.to_bytes()).merge(
        MinHashSig.from_bytes(a.to_bytes())).merge(single)
    assert np.array_equal(again.values, merged.values)


def test_duplicate_insensitive_and_batch_split_invariant():
    keys = np.array([5, 5, 5, 9, 9, 42], dtype=np.int64)
    assert _sig(keys).to_bytes() == _sig(np.unique(keys)).to_bytes()
    two = MinHashSig(8, 7)
    two.update_batch(keys[:2])
    two.update_batch(keys[2:])
    assert two.to_bytes() == _sig(keys).to_bytes()


def test_serde_roundtrip_empty_sentinel_and_validation():
    s = MinHashSig(4, 3)
    assert np.all(s.values == EMPTY64)
    rt = MinHashSig.from_bytes(s.to_bytes())
    assert rt.k == 4 and rt.seed == 3 and np.all(rt.values == EMPTY64)
    with pytest.raises(ValueError, match="not a MinHashSig"):
        MinHashSig.from_bytes(b"XXXX" + s.to_bytes()[4:])
    with pytest.raises(ValueError, match="corrupt"):
        MinHashSig.from_bytes(s.to_bytes()[:-8])
    with pytest.raises(ValueError, match="merge"):
        _sig([1], k=4).merge(_sig([1], k=8))
    with pytest.raises(ValueError, match="merge"):
        _sig([1], seed=1).merge(_sig([1], seed=2))
    with pytest.raises(ValueError, match="k must"):
        MinHashSig(0)
    with pytest.raises(ValueError, match="seed"):
        MinHashSig(4, 1 << 32)


def test_jaccard_estimator_tracks_exact_overlap():
    """With k=512 components, the n_eq/k estimate lands within 4 standard
    errors of the true Jaccard across several overlap levels (fixed data,
    deterministic — this can only flip if the hash family regresses)."""
    k = 512
    base = np.arange(0, 2000, dtype=np.int64)
    for extra in (0, 500, 2000, 6000):
        other = np.arange(extra, extra + 2000, dtype=np.int64)
        true_j = (len(np.intersect1d(base, other))
                  / len(np.union1d(base, other)))
        a, b = _sig(base, k=k), _sig(other, k=k)
        est = a.jaccard(b)
        se = max(np.sqrt(true_j * (1 - true_j) / k), 1.0 / k)
        assert abs(est - true_j) <= 4 * se, (extra, est, true_j)
    # identical sets -> every component equal
    assert _sig(base, k=k).jaccard(_sig(base, k=k)) == 1.0
