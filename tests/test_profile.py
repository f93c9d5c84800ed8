"""Dataset profiler + constraint checker: stat correctness vs pandas,
null/untyped-column handling, single-scan plan shape, HLL approx-distinct
path within the published bound, and verdict branches of every check."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.operators.profile import (Check, approx_distinct_profile,
                                             column_profile, completeness,
                                             in_range, in_set, min_rows,
                                             run_checks, uniqueness)


@pytest.fixture(scope="module")
def mixed_df(spark):
    pdf = pd.DataFrame({
        "i": [1, 2, 2, None, 5],
        "s": ["aa", None, "b", "b", "cccc"],
        "f": [0.5, 1.5, None, 2.5, 3.5],
    })
    df = spark.createDataFrame(pdf)
    return df.withColumn("i", F.col("i").cast("long")) \
             .withColumn("arr", F.array(F.lit(1)))


def _prof(df):
    p = column_profile(df).toPandas().set_index("column")
    return p


def test_profile_int_column(spark, mixed_df):
    p = _prof(mixed_df)
    r = p.loc["i"]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (5, 1, 3)
    assert (r.min_v, r.max_v, r.sum_v) == (1, 5, 10)
    assert r.mean_v == 2.5


def test_profile_string_column_uses_lengths(spark, mixed_df):
    r = _prof(mixed_df).loc["s"]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (5, 1, 3)
    assert (r.min_v, r.max_v, r.sum_v) == (1, 4, 8)
    assert r.mean_v == 2.0


def test_profile_unprofiled_type_gets_sentinels(spark, mixed_df):
    """Float and array columns: counts still real, value stats -1."""
    p = _prof(mixed_df)
    for c in ("f", "arr"):
        r = p.loc[c]
        assert (r.min_v, r.max_v, r.sum_v) == (-1, -1, -1)
        assert r.mean_v == -1.0
    assert p.loc["f"].n_nulls == 1 and p.loc["f"].n_distinct == 4
    assert p.loc["arr"].n_nulls == 0 and p.loc["arr"].n_distinct == 1


def test_profile_all_null_column(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1]})) \
        .withColumn("y", F.lit(None).cast("long"))
    r = _prof(df).loc["y"]
    assert (r.n_nulls, r.n_distinct) == (1, 0)
    assert (r.min_v, r.max_v, r.sum_v, r.mean_v) == (-1, -1, -1, -1.0)


def test_profile_single_scan(spark):
    """The whole profile must cost ONE scan of the input (one wide
    aggregate; distinct counts ride the Expand, not extra scans)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = column_profile(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_approx_distinct_within_bound(spark):
    n = 20_000
    pdf = pd.DataFrame({
        "k": np.arange(n, dtype="int64") % 3777,
        "s": [f"v{i % 911}" for i in range(n)],
    })
    out = approx_distinct_profile(spark.createDataFrame(pdf), p=12) \
        .toPandas().set_index("column")
    bound = 3 * 1.04 / math.sqrt(2 ** 12)
    assert abs(out.loc["k"].approx_distinct - 3777) <= 3777 * bound
    assert abs(out.loc["s"].approx_distinct - 911) <= 911 * bound
    assert (out.n_rows == n).all()


def test_checks_pass_and_fail_branches(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 2, 4],
        "t": ["a", "b", None, "d"],
        "v": [5, 50, 500, 5000],
        "lang": ["en", "en", "xx", "de"],
    })
    df = spark.createDataFrame(pdf)
    out = run_checks(df, [
        completeness("t"), completeness("id"),
        uniqueness("id"), uniqueness("v"),
        in_range("v", 0, 100), in_range("v", 0, 10**6),
        in_set("lang", ["en", "de"]), in_set("lang", ["en", "de", "xx"]),
        min_rows(4), min_rows(5),
    ]).toPandas().set_index("check")
    assert not out.loc["complete(t)"].passed
    assert out.loc["complete(t)"].metric == 1
    assert out.loc["complete(id)"].passed
    assert not out.loc["unique(id)"].passed
    assert out.loc["unique(id)"].metric == 1
    assert out.loc["unique(v)"].passed
    assert not out.loc["range(v,0,100)"].passed
    assert out.loc["range(v,0,100)"].metric == 2
    assert out.loc["range(v,0,1000000)"].passed
    assert not out.loc["in_set(lang,[de,en])"].passed
    assert out.loc["in_set(lang,[de,en])"].metric == 1
    assert out.loc["in_set(lang,[de,en,xx])"].passed
    assert out.loc["min_rows(4)"].passed
    assert not out.loc["min_rows(5)"].passed


def test_uniqueness_null_counts_as_duplicate_surplus(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1.0, None]})) \
        .withColumn("id", F.col("id").cast("long"))
    out = run_checks(df, [uniqueness("id")]).toPandas()
    assert out.metric.tolist() == [1] and not out.passed.all()


def test_checks_single_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = run_checks(docs, [completeness("text"), uniqueness("doc_id"),
                           in_range("n_chars", 1, 400), min_rows(10)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_key_skew_profile_matches_reference(spark):
    from grenier_spark.operators.profile import key_skew_profile

    rng = np.random.default_rng(5)
    keys = np.concatenate([
        np.zeros(400, dtype="int64"),          # hot key 0
        np.full(100, 7, dtype="int64"),        # warm key 7
        rng.integers(100, 160, 500),           # 60-key tail
    ])
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = (key_skew_profile(df, "k", top=5).toPandas()
           .sort_values("rank").reset_index(drop=True))
    vc = pd.Series(keys).value_counts()
    tot, nk, mx = len(keys), len(vc), vc.max()
    assert got.key.tolist()[:2] == ["0", "7"]
    assert got.n_rows.tolist()[:2] == [400, 100]
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]
    assert (got.skew_factor == round(mx / (tot / nk), 6)).all()
    assert got.share[0] == round(400 / tot, 6)
    # deterministic under repartitioning
    again = (key_skew_profile(df.repartition(13), "k", top=5).toPandas()
             .sort_values("rank").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)


def test_key_skew_profile_tie_break_is_string_order(spark):
    from grenier_spark.operators.profile import key_skew_profile

    df = spark.createDataFrame(
        pd.DataFrame({"k": [10, 2, 2, 10, 3, 3]}))  # all counts tie at 2
    got = key_skew_profile(df, "k", top=3).toPandas() \
        .sort_values("rank")
    # string order: "10" < "2" < "3"
    assert got.key.tolist() == ["10", "2", "3"]
    assert (got.skew_factor == 1.0).all()


# ---------------------------------------------------------------- histogram

def test_equidepth_histogram_uniform(spark):
    """Uniform 0..9999: boundaries near i/B * 10000, every bucket mass near
    n/B, masses conserve n exactly (outer edges pinned to rank 0 and 1)."""
    from grenier_spark.operators.profile import equidepth_histogram

    n, B = 10_000, 8
    rng = np.random.default_rng(11)
    vals = rng.permutation(n).astype(float)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    h = (equidepth_histogram(df, "v", B).toPandas()
         .sort_values("bucket").reset_index(drop=True))
    assert list(h.bucket) == list(range(1, B + 1))
    assert (h.n == n).all()
    eps = 2.0 / 200  # KLL k=200 rank guarantee
    assert np.isclose(h.est_count.sum(), n)
    assert (np.abs(h.est_count - n / B) <= 2 * eps * n + 4).all()
    # interior boundaries land within eps of their target rank
    for i in range(B - 1):
        target = (i + 1) / B * n
        assert abs(h.hi[i] - target) <= 2 * eps * n + 4
    # buckets tile the axis: hi[i] == lo[i+1]
    assert np.allclose(h.hi[: B - 1].to_numpy(), h.lo[1:].to_numpy())


def test_equidepth_histogram_grouped_and_nulls(spark):
    from grenier_spark.operators.profile import equidepth_histogram

    pdf = pd.DataFrame({
        "g": ["a"] * 1000 + ["b"] * 500,
        "v": list(np.arange(1000.0)) + list(np.arange(500.0) * 10)})
    pdf.loc[3, "v"] = None  # NULL drops
    df = spark.createDataFrame(pdf)
    h = equidepth_histogram(df, "v", 4, group_cols=["g"]).toPandas()
    na = h[h.g == "a"]
    assert set(na.bucket) == {1, 2, 3, 4} and (na.n == 999).all()
    nb = h[h.g == "b"]
    assert (nb.n == 500).all()
    assert np.isclose(nb.est_count.sum(), 500)


def test_equidepth_histogram_single_bucket_exact(spark):
    from grenier_spark.operators.profile import equidepth_histogram

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0, 5.0]}))
    h = equidepth_histogram(df, "v", 1).toPandas()
    assert len(h) == 1 and h.est_count[0] == 3.0 and h.n[0] == 3


def test_equidepth_histogram_bad_buckets_raises(spark):
    from grenier_spark.functions.estimates import kll_histogram_col

    with pytest.raises(ValueError, match="n_buckets"):
        kll_histogram_col("sketch", 0)
