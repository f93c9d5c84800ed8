"""Trailing-window sketch rollup: byte-identity of the rolled union vs a
scratch build over the window's raw rows, gap semantics, and validation."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from grenier_spark.operators.rolling import (rolling_sketch_merge_ordered,
                                             rolling_sketch_union)
from grenier_spark.operators.sketch_build import SketchSpec, build_sketches


def _events(seed=5, n=4000, days=10, skip_day=None):
    rng = np.random.default_rng(seed)
    day = rng.integers(0, days, n).astype("int64")
    if skip_day is not None:
        day = np.where(day == skip_day, (skip_day + 1) % days, day)
    return pd.DataFrame({
        "day": day,
        "uid": rng.integers(0, 700, n).astype("int64")})


def _per_day(spark, pdf, kind="hll", **params):
    df = spark.createDataFrame(pdf).repartition(4)
    spec = SketchSpec.of("s", kind, "uid", **params)
    return build_sketches(df, [spec], group_cols=["day"]), df, spec


@pytest.mark.parametrize("kind,params", [("hll", {"p": 10}),
                                         ("cms", {"depth": 3, "width": 256,
                                                  "seed": 7}),
                                         ("kmv", {"k": 64}),
                                         ("dd", {"alpha": 0.02})])
def test_rolling_union_byte_identical_to_scratch_build(spark, kind, params):
    """For order-insensitive kinds the trailing union must be BYTE-IDENTICAL
    to building one sketch over the window's raw rows from scratch."""
    pdf = _events()
    per_day, df, spec = _per_day(spark, pdf, kind=kind, **params)
    rolled = {r["day"]: bytes(r["sketch"])
              for r in rolling_sketch_union(per_day, "day", 3, kind)
              .collect()}
    assert set(rolled) == set(range(10))
    for anchor in range(10):
        lo = anchor - 2
        scratch = (build_sketches(
            df.where((F.col("day") >= lo) & (F.col("day") <= anchor)),
            [spec]).select("sketch").first())
        assert rolled[anchor] == bytes(scratch.sketch), (kind, anchor)


def test_rolling_union_gap_narrows_window_and_counts_periods(spark):
    """A missing period contributes nothing: n_periods counts only the
    periods actually present, and the union equals the scratch build over
    the present days."""
    pdf = _events(skip_day=4)
    assert 4 not in set(pdf["day"])
    per_day, df, spec = _per_day(spark, pdf, p=10)
    out = {r["day"]: r for r in
           rolling_sketch_union(per_day, "day", 3, "hll").collect()}
    assert 4 not in out  # no anchor row for an absent period
    assert out[5]["n_periods"] == 2  # days {3,4,5} minus missing 4
    scratch = (build_sketches(
        df.where(F.col("day").isin(3, 5)), [spec])
        .select("sketch").first())
    assert bytes(out[5]["sketch"]) == bytes(scratch.sketch)


def test_rolling_union_window_one_is_identity_and_groups(spark):
    """window=1 returns each input blob unchanged; group columns scope the
    window per group."""
    pdf = _events(n=2000, days=5)
    pdf["src"] = np.where(pdf["uid"] % 2 == 0, "a", "b")
    df = spark.createDataFrame(pdf).repartition(3)
    spec = SketchSpec.of("s", "hll", "uid", p=10)
    per = build_sketches(df, [spec], group_cols=["src", "day"])
    rolled = rolling_sketch_union(per, "day", 1, "hll", group_cols=["src"])
    base = {(r["src"], r["day"]): bytes(r["sketch"]) for r in per.collect()}
    for r in rolled.collect():
        assert bytes(r["sketch"]) == base[(r["src"], r["day"])]
        assert r["n_periods"] == 1


def test_rolling_union_rejects_order_sensitive_and_bad_window(spark):
    pdf = _events(n=500, days=3)
    per_day, _, _ = _per_day(spark, pdf, p=10)
    with pytest.raises(ValueError, match="order-insensitive"):
        rolling_sketch_union(per_day, "day", 3, "kll")
    with pytest.raises(ValueError, match="window >= 1"):
        rolling_sketch_union(per_day, "day", 0, "hll")


def test_rolling_ordered_kll_rank_bound_and_determinism(spark):
    """The ordered trailing merge keeps KLL's published rank guarantee on
    every anchor window (two-sided condition vs the window's raw rows) and
    is byte-deterministic given the per-period blobs."""
    from grenier_spark.core.kll import KLL

    pdf = _events(seed=9, n=6000, days=10)
    per_day, df, _ = _per_day(spark, pdf, kind="kll", k=200)
    per_day = per_day.persist()
    try:
        rolls = [
            {r["day"]: (bytes(r["sketch"]), r["n_periods"]) for r in
             rolling_sketch_merge_ordered(per_day, "day", 3, "kll")
             .collect()}
            for _ in range(2)]
        assert rolls[0] == rolls[1]  # deterministic given per-day blobs
        qs = np.array([0.1, 0.5, 0.9])
        for anchor in range(10):
            vals = np.sort(pdf.loc[(pdf["day"] >= anchor - 2)
                                   & (pdf["day"] <= anchor), "uid"]
                           .to_numpy(dtype="float64"))
            blob, n_periods = rolls[0][anchor]
            assert n_periods == min(anchor + 1, 3)
            est = KLL.from_bytes(blob).quantiles(qs)
            n = len(vals)
            for q, e in zip(qs, est):
                cnt_lt = int(np.searchsorted(vals, e, side="left"))
                cnt_le = int(np.searchsorted(vals, e, side="right"))
                assert cnt_lt <= (q + 0.04) * n, (anchor, q)
                assert cnt_le >= (q - 0.04) * n, (anchor, q)
    finally:
        per_day.unpersist()


def test_rolling_ordered_rejects_order_insensitive_kind(spark):
    pdf = _events(n=500, days=3)
    per_day, _, _ = _per_day(spark, pdf, kind="kll", k=200)
    with pytest.raises(ValueError, match="order-sensitive"):
        rolling_sketch_merge_ordered(per_day, "day", 3, "hll")
    with pytest.raises(ValueError, match="window >= 1"):
        rolling_sketch_merge_ordered(per_day, "day", 0, "kll")
