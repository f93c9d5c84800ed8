"""Cross-engine sanity (SURVEY.md §5.2.6): our estimators vs Spark's own
approximate functions on identical inputs.

Register layouts differ by design (grenier's trailing-zero rho vs
datasketches' leading-zero; SURVEY.md Q2), so comparisons are
ESTIMATE-level: each engine must land within its published bound of the
exact answer, and therefore within the combined bound of each other.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from grenier_spark.core import hll
from grenier_spark.core.bits import U64, wang64
from grenier_spark.core.kll import KLL
from grenier_spark.core.tdigest import TDigest

N = 60_000
P = 14


@pytest.fixture(scope="module")
def keys_df(spark):
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 62, N, dtype=np.int64)
    # ~38k distinct after this fold (repeats exercise dedup behavior)
    keys = np.concatenate([keys[: N // 2], keys[: N // 4], keys[N // 2:]])
    df = spark.createDataFrame([(int(k),) for k in keys], "k long").cache()
    exact = len(set(keys.tolist()))
    return df, keys, exact


def test_hll_vs_spark_approx_count_distinct(spark, keys_df):
    df, keys, exact = keys_df
    t = hll.make_p(P)
    hll.add_batch(t, wang64(keys.view(U64)))
    ours = hll.card(t)
    theirs = df.select(F.approx_count_distinct("k", 0.01)).first()[0]
    our_bound = 4 * 1.04 / math.sqrt(1 << P)
    assert abs(ours - exact) / exact <= our_bound
    assert abs(theirs - exact) / exact <= 4 * 0.01
    assert abs(ours - theirs) / exact <= our_bound + 4 * 0.01


def test_hll_vs_datasketches_hll_sketch(spark, keys_df):
    """Spark 4 ships datasketches-java: hll_sketch_agg/hll_sketch_estimate
    at lgConfigK=P must agree with our estimate within combined error."""
    df, keys, exact = keys_df
    t = hll.make_p(P)
    hll.add_batch(t, wang64(keys.view(U64)))
    ours = hll.card(t)
    theirs = df.select(F.hll_sketch_estimate(
        F.hll_sketch_agg("k", F.lit(P)))).first()[0]
    bound = 8 * 1.04 / math.sqrt(1 << P)
    assert abs(ours - theirs) / exact <= bound, (ours, theirs, exact)


def test_quantiles_vs_spark_percentile_approx(spark, keys_df):
    """KLL/t-digest medians vs percentile_approx vs exact: all three inside
    a +-1.5% RANK window around the true median."""
    df, keys, _ = keys_df
    vals = (keys % 100_000).astype(np.float64)
    sorted_vals = np.sort(vals)

    def rank_of(v):
        return np.searchsorted(sorted_vals, v) / len(sorted_vals)

    k = KLL(200, seed=1)
    k.update_batch(vals)
    td = TDigest(200)
    td.update_batch(vals)
    vdf = spark.createDataFrame([(float(v),) for v in vals], "v double")
    pa_ = vdf.select(F.percentile_approx("v", 0.5, 10_000)).first()[0]
    for est in (k.quantiles([0.5])[0], td.quantiles([0.5])[0], pa_):
        assert abs(rank_of(est) - 0.5) <= 0.015, est
