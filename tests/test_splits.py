"""Deterministic splitting/sampling (operators/splits.py)."""

import numpy as np
import pandas as pd
import pytest

from grenier_spark.operators.splits import (assign_split, split_thresholds,
                                            stratified_sample)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)}))


def test_thresholds_shape():
    t = split_thresholds(WEIGHTS)
    assert [n for n, _ in t] == ["train", "val", "test"]
    assert t[-1][1] is None
    assert all(len(h) == 16 and h == h.lower() for _, h in t[:-1])
    assert t[0][1] < t[1][1]  # hex order == numeric order
    with pytest.raises(ValueError):
        split_thresholds({"only": 1.0})


def test_assign_split_exhaustive_and_deterministic(spark, ids):
    a = assign_split(ids, WEIGHTS, seed=7).toPandas()
    assert len(a) == 5000 and a.split.notna().all()
    b = assign_split(ids.repartition(13), WEIGHTS, seed=7).toPandas()
    assert dict(zip(a.doc_id, a.split)) == dict(zip(b.doc_id, b.split))
    # fractions hold to binomial deviation (5 sigma at n=5000)
    frac = a.split.value_counts(normalize=True)
    for name, w in WEIGHTS.items():
        sigma = (w * (1 - w) / 5000) ** 0.5
        assert abs(frac[name] - w) < 5 * sigma, (name, frac[name])


def test_assign_split_seed_rotates_membership(spark, ids):
    a = assign_split(ids, WEIGHTS, seed=7).toPandas()
    c = assign_split(ids, WEIGHTS, seed=8).toPandas()
    same = (a.sort_values("doc_id").split.to_numpy()
            == c.sort_values("doc_id").split.to_numpy()).mean()
    # P(same split under independent hashes) = sum w_i^2 = 0.66
    assert 0.55 < same < 0.77, same


def test_stratified_sample_fraction_and_subset_property(spark, ids):
    s10 = stratified_sample(ids, 0.10, seed=3).toPandas()
    s20 = stratified_sample(ids, 0.20, seed=3).toPandas()
    sigma10 = (0.1 * 0.9 / 5000) ** 0.5
    assert abs(len(s10) / 5000 - 0.10) < 5 * sigma10
    # threshold sampling is NESTED: raising the fraction only adds rows
    assert set(s10.doc_id) <= set(s20.doc_id)
    with pytest.raises(ValueError):
        stratified_sample(ids, 1.5)
