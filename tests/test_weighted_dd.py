"""Weighted DDSketch: distributed build parity + weighted SQL estimator.

The weighted state is a plain bucket histogram with weighted counts, so
(a) the distributed build is BYTE-IDENTICAL to a single-stream numpy
weighted build under any partitioning (same class as the unweighted dd
gate in test_spark_pipeline.py), and (b) the weighted quantile estimator
is value-exactly reproducible in DuckDB SQL
(sql_oracles.dd_quantile_sql(weight_col=...)).
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from grenier_spark.core.ddsketch import DDSketch

ALPHA = 0.01


def _frame(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "source": rng.choice(["web", "books", "code"], n),
        "val": np.round(rng.lognormal(5.0, 1.2, n), 3),
        "w": rng.integers(0, 40, n).astype("int64"),
    })
    # zero values hit the zero counter; NULLs must drop jointly
    pdf.loc[::97, "val"] = 0.0
    pdf.loc[5::311, "val"] = None
    pdf.loc[7::313, "w"] = None
    return pdf


def _numpy_build(pdf):
    out = {}
    ok = pdf["val"].notna() & pdf["w"].notna()
    for src, g in pdf[ok].groupby("source"):
        s = DDSketch(ALPHA)
        s.update_batch_weighted(g["val"].to_numpy(dtype=float),
                                g["w"].to_numpy(dtype="int64"))
        out[src] = s
    return out


def _spark_df(spark, pdf):
    # NaN-poisoned pandas columns promote int64 -> float64; rebuild with an
    # explicit nullable LONG weight so the frame matches the production
    # schema (the builder rejects float weights loudly by contract)
    recs = [(r.source, None if pd.isna(r.val) else float(r.val),
             None if pd.isna(r.w) else int(r.w))
            for r in pdf.itertuples()]
    return spark.createDataFrame(recs, "source string, val double, w long")


@pytest.mark.parametrize("n_parts", [1, 7])
def test_distributed_weighted_build_byte_parity(spark, n_parts):
    from grenier_spark.operators.sketch_build import build_dd_weighted

    pdf = _frame()
    want = _numpy_build(pdf)
    df = _spark_df(spark, pdf).repartition(n_parts)
    rows = build_dd_weighted(df, "val", "w", ["source"],
                             alpha=ALPHA).collect()
    assert {r["source"] for r in rows} == set(want)
    for r in rows:
        assert bytes(r["sketch"]) == want[r["source"]].to_bytes()
        # n_values counts non-null pairs; n_rows counts all rows seen
        ok = pdf["val"].notna() & pdf["w"].notna()
        grp = pdf["source"] == r["source"]
        assert r["n_values"] == int((ok & grp).sum())
        assert r["n_rows"] == int(grp.sum())


def test_weighted_quantile_sql_value_exact():
    """The weighted DuckDB estimator replay equals the numpy sketch's own
    weighted quantiles bit-for-bit on every (group, q)."""
    from grenier_spark.functions.sql_oracles import dd_quantile_sql

    pdf = _frame(seed=9)
    ok = pdf["val"].notna() & pdf["w"].notna()
    want = _numpy_build(pdf)
    qs = [0.1, 0.5, 0.9, 0.99]
    con = duckdb.connect()
    con.register("t", pdf[ok])
    sql = dd_quantile_sql("SELECT source, val, w FROM t", "val", ALPHA,
                          qs, ["source"], weight_col="w")
    got = {(r[0], r[1]): (r[2], r[3]) for r in con.sql(sql).fetchall()}
    for src, s in want.items():
        for q in qs:
            est, n = got[(src, q)]
            assert n == s.n  # n is the TOTAL WEIGHT, not the row count
            assert est == s.quantile(q), (src, q)


def test_weighted_vs_expanded_quantiles_agree():
    """Weighted estimates match the unweighted estimator over the
    weight-expanded stream (same sketch state, same rank walk)."""
    rng = np.random.default_rng(2)
    vals = np.round(rng.lognormal(3.0, 1.0, 800), 3)
    w = rng.integers(1, 25, 800)
    ws = DDSketch(ALPHA)
    ws.update_batch_weighted(vals, w)
    un = DDSketch(ALPHA)
    un.update_batch(np.repeat(vals, w))
    for q in (0.05, 0.5, 0.95):
        assert ws.quantile(q) == un.quantile(q)


def test_unweighted_sql_unchanged_by_weight_refactor():
    """weight_col=None keeps the original unweighted estimator semantics
    (regression guard for the shared SQL builder)."""
    from grenier_spark.functions.sql_oracles import dd_quantile_sql

    rng = np.random.default_rng(4)
    vals = np.round(rng.lognormal(2.0, 1.3, 3000), 4)
    s = DDSketch(ALPHA)
    s.update_batch(vals)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    sql = dd_quantile_sql("SELECT v FROM t", "v", ALPHA, [0.25, 0.75])
    for q, est, n in con.sql(sql).fetchall():
        assert n == len(vals)
        assert est == s.quantile(q)
