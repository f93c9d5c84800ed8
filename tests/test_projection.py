"""FD low-rank projection operator (operators/projection.py): numpy
parity given fixed sketch bytes, GLPW16 projection bounds at multiple
partitionings, and the lossless-regime equivalence to exact PCA."""

import numpy as np
import pandas as pd
import pytest

from grenier_spark.core.freqdirs import FrequentDirections
from grenier_spark.operators.projection import (fd_directions, fd_project,
                                                fd_projection_quality)


def _mk(spark, n=300, dim=12, n_labels=3, seed=17, rank=3):
    rng = np.random.default_rng(seed)
    X = (rng.normal(size=(n, rank)) @ rng.normal(size=(rank, dim))
         + 0.05 * rng.normal(size=(n, dim)))
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "label": (np.arange(n) % n_labels).astype(np.int64),
        "embedding": [row for row in X]})
    return spark.createDataFrame(pdf), X


def test_fd_directions_orthonormal_and_sorted():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 10))
    fd = FrequentDirections(4, 10)
    fd.update_batch(X)
    V, e = fd_directions(fd.to_bytes(), 3)
    assert V.shape == (3, 10)
    assert np.allclose(V @ V.T, np.eye(3), atol=1e-10)
    assert np.all(np.diff(e) <= 1e-12)  # descending energies
    # r beyond the stored directions truncates, never pads
    V8, _ = fd_directions(fd.to_bytes(), 80)
    assert V8.shape[0] <= 2 * 4
    Ve, ee = fd_directions(FrequentDirections(4, 10).to_bytes(), 3)
    assert Ve.shape == (0, 10) and len(ee) == 0


def test_project_matches_numpy_given_sketch(spark):
    """With the sketch bytes pinned, the distributed projection is exactly
    X @ V_r.T per group — byte-determinism of the pandas path."""
    df, X = _mk(spark)
    dim, r, ell = X.shape[1], 3, 5
    from grenier_spark.operators.sketch_build import (SketchSpec,
                                                      build_sketches)
    built = build_sketches(
        df, [SketchSpec.of("fd", "fd", "embedding", ell=ell, dim=dim)],
        group_cols=["label"]).collect()
    sk = {(row["label"],): bytes(row["sketch"]) for row in built}
    out = fd_project(df.repartition(7), r=r, ell=ell, dim=dim,
                     group_col="label", sketches=sk).toPandas()
    assert len(out) == len(X)
    out = out.sort_values("vec_id").reset_index(drop=True)
    for g, blob in sk.items():
        V, _ = fd_directions(blob, r)
        m = out["label"].to_numpy() == g[0]
        got = np.vstack(out.loc[m, "coords"].to_numpy())
        want = X[np.arange(len(X)) % 3 == g[0]] @ V.T
        assert np.allclose(got, want, rtol=0, atol=1e-12)
        n2 = out.loc[m, "norm2"].to_numpy()
        resid = out.loc[m, "resid"].to_numpy()
        assert np.all(resid >= -1e-9 * n2)
        assert np.allclose(n2 - resid, (want * want).sum(axis=1),
                           atol=1e-10)


def test_global_projection_lossless_twin_is_exact_pca(spark):
    """ell = dim: FD is lossless, so fd_project == exact PCA projection —
    the realized residual equals the optimal rank-r tail exactly."""
    df, X = _mk(spark, n=150, dim=8, n_labels=1)
    out = (fd_project(df, r=2, ell=8, dim=8).toPandas()
           .sort_values("vec_id"))
    _u, s, _vt = np.linalg.svd(X, full_matrices=False)
    tail = float((s[2:] ** 2).sum())
    assert abs(out["resid"].sum() - tail) <= 1e-8 * (X * X).sum()


@pytest.mark.parametrize("parts", [3, 13])
def test_projection_quality_bounds_hold(spark, parts):
    df, X = _mk(spark, dim=16)
    rep = fd_projection_quality(df.repartition(parts), r=3, ell=6, dim=16,
                                group_col="label").toPandas()
    assert len(rep) == 3
    assert rep["n_vecs"].sum() == len(X)
    assert (rep["r_dims"] == 3).all()
    for c in ("energy_ok", "resid_nonneg_ok", "interlace_ok",
              "oblivious_ok"):
        assert rep[c].all(), c


def test_projection_quality_param_validation(spark):
    df, _ = _mk(spark, n=30, dim=8)
    with pytest.raises(ValueError, match="0 < r < ell <= dim"):
        fd_projection_quality(df, r=6, ell=6, dim=8)
