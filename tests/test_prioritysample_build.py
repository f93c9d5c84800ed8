"""Window-free distributed priority sampling
(sketch_build.build_priority_sample): bit parity with the window operator,
partitioning invariance, and the no-Window plan contract."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.core.prioritysample import PrioritySample


@pytest.fixture(scope="module")
def pop(spark):
    n = 4000
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.array(list("abcd"))[np.arange(n) % 4],
        "w": rng.integers(1, 900, n).astype(np.int64)})
    return spark.createDataFrame(pdf)


def _sketch_rows(spark, pop, k, seed, n_parts=None):
    from grenier_spark.operators.sketch_build import build_priority_sample

    df = pop.repartition(n_parts) if n_parts else pop
    rows = build_priority_sample(df, k=k, weight_col="w",
                                 group_cols=["source"], id_col="doc_id",
                                 seed=seed).collect()
    return {r["source"]: PrioritySample.from_bytes(bytes(r["sketch"]))
            for r in rows}


def test_matches_window_operator_bitwise(spark, pop):
    """Same md5 chain -> the sketch path reproduces the window path's
    sample ids, tau, and every w_hat exactly."""
    from grenier_spark.operators.splits import priority_sample_estimate

    k, seed = 11, 3
    states = _sketch_rows(spark, pop, k, seed)
    win = priority_sample_estimate(pop, k=k, weight_col="w",
                                   group_col="source", seed=seed).toPandas()
    for src, g in win.groupby("source"):
        items = states[src].items()
        assert {i for i, _, _ in items} == set(g.doc_id)
        assert states[src].tau == float(g.tau.iloc[0])
        wh = dict(zip(g.doc_id, g.w_hat))
        assert all(abs(wh[i] - w_hat) == 0.0 for i, _, w_hat in items)


def test_partitioning_invariance_byte_exact(spark, pop):
    a = _sketch_rows(spark, pop, 9, 1)
    for n_parts in (1, 13):
        b = _sketch_rows(spark, pop, 9, 1, n_parts)
        assert {s: st.to_bytes() for s, st in a.items()} \
            == {s: st.to_bytes() for s, st in b.items()}


def test_null_rows_drop_and_are_counted(spark):
    from grenier_spark.operators.sketch_build import build_priority_sample

    recs = [(1, "a", 10), (2, "a", None), (None, "a", 5), (4, "a", 7)]
    df = spark.createDataFrame(recs, "doc_id long, source string, w long")
    r = build_priority_sample(df, k=8, weight_col="w",
                              group_cols=["source"]).collect()[0]
    st = PrioritySample.from_bytes(bytes(r["sketch"]))
    assert {i for i, _, _ in st.items()} == {1, 4}
    assert r["n_rows"] == 4 and r["n_values"] == 2


def test_no_window_in_plan(spark, pop):
    """The load-bearing scale property: the build plan contains no Window
    node — the degenerate one-big-group case folds across partitions."""
    from grenier_spark.operators.sketch_build import build_priority_sample

    plan = build_priority_sample(
        pop, k=5, weight_col="w", group_cols=["source"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_empty_and_ungrouped_builds(spark):
    from grenier_spark.operators.sketch_build import (build_dd_weighted,
                                                      build_priority_sample)

    empty = spark.createDataFrame([], "doc_id long, source string, w long")
    assert build_priority_sample(empty, k=4, weight_col="w",
                                 group_cols=["source"]).count() == 0
    assert build_dd_weighted(
        empty.select("source", F.col("w").cast("double").alias("v"),
                     F.col("doc_id").alias("wt")),
        "v", "wt", ["source"]).count() == 0

    # ungrouped (global) build: one row, state over everything
    pdf = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                        "w": np.int64(np.arange(100) % 9 + 1)})
    rows = build_priority_sample(spark.createDataFrame(pdf), k=6,
                                 weight_col="w",
                                 group_cols=[]).collect()
    assert len(rows) == 1
    st = PrioritySample.from_bytes(bytes(rows[0]["sketch"]))
    assert len(st.items()) == 6 and st.tau > 0
    assert rows[0]["n_values"] == 100


def test_null_group_forms_a_real_group(spark):
    """A NULL group value folds into ONE stable group across batches and
    partitions (build_sketches contract) — no NaN-key fragmentation, no
    Arrow flush crash."""
    from grenier_spark.operators.sketch_build import (build_dd_weighted,
                                                      build_priority_sample)

    recs = [(1, None, 10), (2, "a", 5), (3, None, 20), (4, "a", 7),
            (5, None, 30)]
    df = spark.createDataFrame(
        recs, "doc_id long, source string, w long").repartition(3)
    rows = build_priority_sample(df, k=8, weight_col="w",
                                 group_cols=["source"]).collect()
    by_src = {r["source"]: r for r in rows}
    assert set(by_src) == {None, "a"}
    st = PrioritySample.from_bytes(bytes(by_src[None]["sketch"]))
    assert {i for i, _, _ in st.items()} == {1, 3, 5}

    ddrows = build_dd_weighted(
        df.select("source", F.col("w").cast("double").alias("v"),
                  F.col("doc_id").alias("wt")),
        "v", "wt", ["source"]).collect()
    assert {r["source"] for r in ddrows} == {None, "a"}


def test_empty_merged_state_emits_no_row(spark):
    """A group whose pairs are all zero-weight (or all NULL) produces NO
    result row — matching the SQL twins, which have no group left to
    aggregate — instead of an empty sketch that crashes readers."""
    from grenier_spark.operators.sketch_build import (build_dd_weighted,
                                                      build_priority_sample)

    recs = [(1, "dead", 0), (2, "dead", 0), (3, "live", 9), (4, "dead", 0)]
    df = spark.createDataFrame(recs, "doc_id long, source string, w long")
    rows = build_priority_sample(df, k=4, weight_col="w",
                                 group_cols=["source"]).collect()
    assert {r["source"] for r in rows} == {"live"}

    ddrows = build_dd_weighted(
        df.select("source", F.lit(1.0).alias("v"),
                  F.col("w").alias("wt")),
        "v", "wt", ["source"]).collect()
    assert {r["source"] for r in ddrows} == {"live"}


def test_float_group_nan_folds_into_null_group(spark):
    """A float group column routes through the factorize path on EVERY
    batch, so NaN group values fold into the NULL group consistently —
    no NaN/None fragmentation between batches that do and don't carry an
    explicit NULL (shared-contract test for _batch_group_codes)."""
    from grenier_spark.operators.sketch_build import build_priority_sample

    recs = [(1, float("nan"), 10), (2, 1.5, 5), (3, None, 20),
            (4, 1.5, 7), (5, float("nan"), 30)]
    df = spark.createDataFrame(
        recs, "doc_id long, gkey double, w long").repartition(3)
    rows = build_priority_sample(df, k=8, weight_col="w",
                                 group_cols=["gkey"]).collect()
    by_g = {r["gkey"]: r for r in rows}
    # Spark itself folds NaN and NULL double group keys... they are
    # distinct at the source; OUR contract: one stable merged group for
    # the NaN/NULL class plus the real 1.5 group, never a third
    # fragmented key
    assert len(rows) == 2, rows
    st = PrioritySample.from_bytes(bytes(
        [r for g, r in by_g.items() if g is None or g != g][0]["sketch"]))
    assert {i for i, _, _ in st.items()} == {1, 3, 5}
