"""FrequentDirections core tests: the GLPW16 deterministic guarantees
(PSD order, spectral error <= delta, mass accounting) must hold for ANY
batch split and ANY merge tree, and the wire format must round-trip."""

import numpy as np
import pytest

from grenier_spark.core.freqdirs import FrequentDirections


def _exact_gram(X):
    return X.T @ X


def _check_guarantees(fd, X):
    A = _exact_gram(X)
    B = fd.gram()
    D = A - B
    evals = np.linalg.eigvalsh(D)
    tol = 1e-8 * max(fd.fnorm2, 1.0)
    # PSD order: B.T@B <= A.T@A
    assert evals.min() >= -tol, f"not PSD-dominated: min eig {evals.min()}"
    # spectral: ||A.T@A - B.T@B||_2 <= delta
    assert evals.max() <= fd.delta + tol, \
        f"spectral error {evals.max()} > delta {fd.delta}"
    # mass: ell * delta <= fnorm2 - ||B||_F^2
    assert fd.ell * fd.delta <= fd.fnorm2 - fd.stored_fnorm2() + tol
    # delta <= fnorm2 / ell  (implied by mass; check directly too)
    assert fd.delta <= fd.fnorm2 / fd.ell + tol
    # exact bookkeeping
    assert fd.n == len(X)
    assert abs(fd.fnorm2 - float((X * X).sum())) <= tol
    assert len(fd.B) <= 2 * fd.ell


@pytest.mark.parametrize("n,dim,ell,seed", [
    (500, 16, 4, 0),
    (200, 64, 8, 1),
    (1000, 8, 3, 2),
    (64, 5, 8, 3),      # dim < ell: lossless regime, delta == 0
    (1, 16, 4, 4),      # single row
])
def test_guarantees_single_stream(n, dim, ell, seed):
    rng = np.random.default_rng(seed)
    # low-rank + noise: the regime FD exists for
    k = max(1, min(dim, ell) // 2)
    X = (rng.normal(size=(n, k)) @ rng.normal(size=(k, dim))
         + 0.1 * rng.normal(size=(n, dim)))
    fd = FrequentDirections(ell, dim)
    fd.update_batch(X)
    _check_guarantees(fd, X)
    if dim <= ell:
        assert fd.delta == 0.0  # never evicts a direction


def test_batch_split_invariance_of_guarantees():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 12))
    for splits in ([300], [1] * 300, [7, 100, 193], [150, 150]):
        fd = FrequentDirections(4, 12)
        i = 0
        for s in splits:
            fd.update_batch(X[i:i + s])
            i += s
        _check_guarantees(fd, X)


def test_merge_guarantees_any_tree():
    rng = np.random.default_rng(11)
    X = rng.normal(size=(400, 10))
    parts = np.array_split(X, 8)

    def build(P):
        fd = FrequentDirections(5, 10)
        fd.update_batch(P)
        return fd

    # left-fold merge
    fds = [build(P) for P in parts]
    acc = fds[0]
    for f in fds[1:]:
        acc.merge(f)
    _check_guarantees(acc, X)

    # balanced binary tree
    fds = [build(P) for P in parts]
    while len(fds) > 1:
        fds = [fds[i].merge(fds[i + 1]) if i + 1 < len(fds) else fds[i]
               for i in range(0, len(fds), 2)]
    _check_guarantees(fds[0], X)

    # reversed order
    fds = [build(P) for P in reversed(parts)]
    acc = fds[0]
    for f in fds[1:]:
        acc.merge(f)
    _check_guarantees(acc, X)


def test_merge_empty_and_identity():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 6))
    fd = FrequentDirections(3, 6)
    fd.update_batch(X)
    empty = FrequentDirections(3, 6)
    before = fd.to_bytes()
    fd.merge(empty)
    assert fd.to_bytes() == before  # merging an empty sketch is a no-op
    empty2 = FrequentDirections(3, 6)
    empty2.merge(_rebuild(X, 3, 6))  # merge INTO an empty sketch
    _check_guarantees(empty2, X)


def _rebuild(X, ell, dim):
    fd = FrequentDirections(ell, dim)
    fd.update_batch(X)
    return fd


def test_wire_roundtrip():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(123, 9))
    fd = _rebuild(X, 4, 9)
    blob = fd.to_bytes()
    back = FrequentDirections.from_bytes(blob)
    assert (back.ell, back.dim, back.n) == (fd.ell, fd.dim, fd.n)
    assert back.delta == fd.delta and back.fnorm2 == fd.fnorm2
    assert np.array_equal(back.B, fd.B)
    assert back.to_bytes() == blob
    # roundtrip of an EMPTY sketch
    e = FrequentDirections(4, 9)
    assert FrequentDirections.from_bytes(e.to_bytes()).to_bytes() \
        == e.to_bytes()


def test_low_rank_input_exact_recovery():
    """Rank <= ell input: FD stores it losslessly (delta == 0, gram
    exact) — the property that makes it the right covariance summary for
    near-low-rank embedding matrices."""
    rng = np.random.default_rng(9)
    k, dim, ell = 3, 20, 6
    X = rng.normal(size=(500, k)) @ rng.normal(size=(k, dim))
    fd = _rebuild(X, ell, dim)
    # sigma_{ell+1} of a numerically-rank-3 buffer is ~1e-15, not an exact
    # zero — delta is float-noise-sized, not truly 0
    assert fd.delta <= 1e-18 * fd.fnorm2
    assert np.allclose(fd.gram(), X.T @ X, rtol=1e-9, atol=1e-6)


def test_errors():
    fd = FrequentDirections(4, 8)
    with pytest.raises(ValueError):
        fd.update_batch(np.zeros((3, 5)))       # wrong dim
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(4, 9))      # mismatched dim
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(5, 8))      # mismatched ell
    with pytest.raises(ValueError):
        FrequentDirections(0, 8)
    with pytest.raises(ValueError):
        FrequentDirections.from_bytes(b"XXXX" + b"\0" * 36)
    with pytest.raises(ValueError):
        FrequentDirections.from_bytes(b"\0" * 8)  # truncated header


def test_spectral_error_beats_trivial_bound():
    """delta <= fnorm2/ell is the worst case; on low-rank-plus-noise data
    the realized spectral error should be far below it (sanity that the
    shrink actually tracks the residual tail, not the full mass)."""
    rng = np.random.default_rng(13)
    X = (rng.normal(size=(2000, 2)) @ rng.normal(size=(2, 32))
         + 0.05 * rng.normal(size=(2000, 32)))
    fd = _rebuild(X, 8, 32)
    A = X.T @ X
    err = np.linalg.norm(A - fd.gram(), 2)
    assert err <= fd.delta + 1e-6
    assert fd.delta < 0.05 * fd.fnorm2 / fd.ell  # much better than worst case
