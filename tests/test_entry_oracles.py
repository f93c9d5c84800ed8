"""Simulates the driver's correctness gate: every queries() entry with an
oracle must match DuckDB on row count, sorted-column names and values
(order-insensitive) at sf0.01; rows-only entries must return stable rows.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            # keep integers EXACT: float64 would tolerate errors up to
            # ~1e3 absolute on full-range int64 hash columns (doc_winnow_fps
            # min_fp/max_fp) under rtol comparison
            df[c] = pd.to_numeric(df[c]).astype("int64")
        else:
            # never round: pandas round(n) multiplies by 10^n and loses
            # precision on large magnitudes; compare floats via rtol instead
            df[c] = pd.to_numeric(df[c]).astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = normalize(q(spark, SF).toPandas())
    exp = normalize(duck.execute(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=False, rtol=1e-12, atol=0)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLE_KEYS))

EXPECTED_ROWS_ONLY: "list[str]" = []


def test_rows_only_set_is_pinned():
    """Every queries() entry is REQUIRED to carry an oracle unless it is on
    this justified list — forgetting an oracle for a new query must fail
    loudly, not silently downgrade it to the weak non-empty check."""
    assert ROWS_ONLY == EXPECTED_ROWS_ONLY


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    pdf = q(spark, SF).toPandas()
    assert len(pdf) > 0
    assert not pdf.isna().all(axis=None)
    # determinism: a second run must return the identical frame (the
    # stability contract the driver's rows-only check relies on)
    again = q(spark, SF).toPandas()
    cols = sorted(pdf.columns)
    pd.testing.assert_frame_equal(
        pdf[cols].sort_values(cols).reset_index(drop=True),
        again[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_rows_only_estimates_within_bounds(spark, duck):
    """The error-bound assertions the rows-only checks can't express."""
    got = entry_mod.q_hll_card_by_type(spark, SF).toPandas()
    exact = dict(duck.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall())
    bound = 3 * 1.04 / math.sqrt(1 << 12)
    for _, r in got.iterrows():
        assert abs(r.est_users - exact[r.event_type]) / exact[r.event_type] \
            <= bound

    # t-digest / KLL estimate VALUES through the full grouped two-level
    # build must land inside a +-4% rank window of exact — the gate queries
    # now emit rank-bound booleans (oracle-checked), so the raw-estimate
    # window is asserted here against the same builds the queries run
    from grenier_spark.functions import (kll_quantiles_col,
                                         tdigest_quantiles_col)
    from grenier_spark.operators.sketch_build import (SketchSpec,
                                                      build_sketches)

    ev = spark.read.parquet(f"{SF}/events.parquet")
    td = build_sketches(ev, [SketchSpec.of("t", "tdigest", "value",
                                           delta=200)],
                        group_cols=["event_type"])
    qd = td.select("event_type", tdigest_quantiles_col("sketch", [0.5])
                   .getItem(0).alias("q50")).toPandas()
    for _, r in qd.iterrows():
        lo, hi = duck.execute(
            "SELECT quantile_cont(value, 0.46), quantile_cont(value, 0.54) "
            "FROM events WHERE event_type = ?", [r.event_type]).fetchone()
        assert lo <= r.q50 <= hi

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kl = build_sketches(docs, [SketchSpec.of("k", "kll", "n_chars", k=200)],
                        group_cols=["source"])
    kq = kl.select("source", kll_quantiles_col("sketch", [0.1, 0.5, 0.9])
                   .alias("qs")).toPandas()
    for _, r in kq.iterrows():
        for i, q in enumerate([0.1, 0.5, 0.9]):
            lo, hi = duck.execute(
                "SELECT quantile_cont(n_chars, ?), quantile_cont(n_chars, ?)"
                " FROM documents WHERE source = ?",
                [max(q - 0.04, 0.0), min(q + 0.04, 1.0), r.source]).fetchone()
            assert lo <= r.qs[i] <= hi, (r.source, q)


def test_entry_runs(spark):
    out = entry_mod.entry(spark)
    pdf = out.toPandas()
    assert len(pdf) > 0 and pdf.source.is_unique
    assert set(pdf.columns) == {"source", "est_distinct_tokens", "n_docs",
                                "n_tokens", "p50_chars"}
    assert (pdf.n_docs > 0).all()
