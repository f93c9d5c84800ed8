"""Sequence packing (operators/packing.py) vs brute-force references."""

import numpy as np
import pandas as pd
import pytest

from grenier_spark.operators.packing import (pack_fixed_chunks,
                                             pack_greedy_contiguous)

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g in ("a", "b"):
        for i in range(60):
            rows.append((g, i, int(rng.integers(1, 70))))
    # adversarial shapes: exact fit, doc bigger than the budget, size-1
    rows += [("c", 0, 100), ("c", 1, 100), ("c", 2, 250), ("c", 3, 1),
             ("c", 4, 99), ("c", 5, 1), ("c", 6, 1)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "n_tok"]))


def _brute_greedy(pdf, budget):
    out = {}
    for g, grp in pdf.groupby("source"):
        fill, batch = 0, 0
        first = True
        for r in grp.sort_values("doc_id").itertuples():
            if first:
                fill, batch, first = r.n_tok, 0, False
            elif fill + r.n_tok <= budget:
                fill += r.n_tok
            else:
                batch, fill = batch + 1, r.n_tok
            out[(g, r.doc_id)] = (batch, fill)
    return out


def test_greedy_matches_brute_reference(spark, docs):
    got = pack_greedy_contiguous(docs, BUDGET).toPandas()
    want = _brute_greedy(docs.toPandas(), BUDGET)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert (r.batch_id, r.fill_after) == want[(r.source, r.doc_id)], \
            (r.source, r.doc_id)
    # no batch overflows except single-doc oversize batches
    agg = got.groupby(["source", "batch_id"]).agg(
        tot=("n_tok", "sum"), n=("n_tok", "size"))
    bad = agg[(agg.tot > BUDGET) & (agg.n > 1)]
    assert bad.empty, bad


def test_greedy_partitioning_invariant(spark, docs):
    a = pack_greedy_contiguous(docs, BUDGET).orderBy(
        "source", "doc_id").toPandas()
    b = pack_greedy_contiguous(docs.repartition(7), BUDGET).orderBy(
        "source", "doc_id").toPandas()
    assert a.batch_id.tolist() == b.batch_id.tolist()
    assert a.fill_after.tolist() == b.fill_after.tolist()


def test_fixed_chunks_stream_invariants(spark, docs):
    got = pack_fixed_chunks(docs, BUDGET).orderBy(
        "source", "doc_id").toPandas()
    for g, grp in got.groupby("source"):
        # offsets are the exclusive prefix sum of token counts
        assert grp.tok_start.tolist() == \
            (grp.n_tok.cumsum() - grp.n_tok).tolist()
    assert (got.batch_id == got.tok_start // BUDGET).all()
    assert (got.straddles == (got.end_batch_id > got.batch_id)).all()
    # every chunk except each group's last is exactly full: total stream
    # coverage means chunk k starts at k*BUDGET
    assert ((got.end_batch_id - got.batch_id) ==
            ((got.tok_start + got.n_tok - 1) // BUDGET
             - got.tok_start // BUDGET)).all()


def test_fixed_chunks_zero_token_doc(spark):
    """A zero-token doc at stream position 0 must stay in chunk 0 (not
    floor(-1/budget) = -1) and never count as straddling — on BOTH engines
    (DuckDB // truncates toward zero, Spark floor rounds down; the
    greatest() pin makes them agree)."""
    docs = spark.createDataFrame(
        [("z", 0, 0), ("z", 1, 250), ("z", 2, 0), ("z", 3, 1)],
        "source string, doc_id long, n_tok long")
    got = pack_fixed_chunks(docs, BUDGET).orderBy("doc_id").toPandas()
    assert got.batch_id.tolist() == [0, 0, 2, 2]
    assert got.end_batch_id.tolist() == [0, 2, 2, 2]
    assert got.straddles.tolist() == [False, True, False, False]


def test_greedy_large_group_is_linear(spark):
    """50k docs in ONE group must pack in seconds (the old Catalyst
    array-append fold was O(n^2) struct copies and effectively hung here)
    and respect the batch-capacity invariant."""
    import time

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"source": "g",
                        "doc_id": np.arange(50_000),
                        "n_tok": rng.integers(1, 70, 50_000)})
    docs = spark.createDataFrame(pdf)
    t0 = time.perf_counter()
    got = pack_greedy_contiguous(docs, BUDGET).toPandas()
    assert time.perf_counter() - t0 < 60
    assert len(got) == 50_000
    agg = got.groupby("batch_id").agg(tot=("n_tok", "sum"))
    assert (agg.tot <= BUDGET).all()  # no oversize docs in this fixture
    # batches are contiguous in doc order and maximal: the NEXT doc after
    # each batch would have overflowed
    by_doc = got.sort_values("doc_id")
    b = by_doc.batch_id.to_numpy()
    assert (np.diff(b) >= 0).all() and b[0] == 0 and (np.diff(b) <= 1).all()
    fill = by_doc.fill_after.to_numpy()
    n = by_doc.n_tok.to_numpy()
    starts = np.flatnonzero(np.diff(b, prepend=-1))[1:]  # skip batch 0
    assert (fill[starts - 1] + n[starts] > BUDGET).all()


# -- sliding context windows --------------------------------------------------

def _brute_windows(n, max_len, stride):
    if n <= 0:
        return []
    if n <= max_len:
        return [(0, 0, n)]
    n_win = -((n - max_len) // -stride) + 1  # ceil division
    out = []
    for j in range(n_win):
        s = min(j * stride, n - max_len)
        out.append((j, s, min(max_len, n - s)))
    return out


def test_sliding_windows_match_brute_force_and_duckdb(spark):
    """Every (n_tok, max_len, stride) shape agrees with the pure-python
    reference AND the DuckDB twin: full coverage (every token in >= 1
    window), exact overlap max_len - stride between interior neighbours,
    clamped final window, short/empty/negative docs."""
    import duckdb

    from grenier_spark.operators.packing import (sliding_windows,
                                                 sliding_windows_sql)

    rows = [(i, n) for i, n in enumerate(
        [0, -3, 1, 4, 5, 6, 9, 10, 11, 12, 13, 17, 100, 101, 103])]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    for max_len, stride in [(5, 5), (5, 3), (8, 1), (10, 10), (6, 2)]:
        got = (sliding_windows(df, max_len, stride).toPandas()
               .sort_values(["doc_id", "win_idx"]).reset_index(drop=True))
        exp = {i: _brute_windows(n, max_len, stride) for i, n in rows}
        got_d = {i: [tuple(map(int, r)) for r in
                     g[["win_idx", "win_start", "win_len"]].to_numpy()]
                 for i, g in got.groupby("doc_id")}
        assert got_d == {i: w for i, w in exp.items() if w}, (max_len,
                                                              stride)
        import pandas as pd

        con = duckdb.connect()
        con.register("docs", pd.DataFrame(rows,
                                          columns=["doc_id", "n_tok"]))
        duck = (con.execute(
            "SELECT * FROM (" + sliding_windows_sql(
                "SELECT doc_id, n_tok FROM docs", max_len, stride,
                cols="doc_id, n_tok")
            + ") ORDER BY doc_id, win_idx").df())
        assert (duck[["doc_id", "win_idx", "win_start", "win_len"]]
                .to_numpy().tolist()
                == got[["doc_id", "win_idx", "win_start", "win_len"]]
                .to_numpy().tolist()), (max_len, stride)
        # coverage + overlap invariants on the reference itself
        for i, n in rows:
            w = exp[i]
            if n <= 0:
                assert w == []
                continue
            covered = set()
            for _, s, ln in w:
                assert 0 <= s and s + ln <= n and 1 <= ln <= max_len
                covered.update(range(s, s + ln))
            assert covered == set(range(n))


def test_sliding_windows_validation(spark):
    import pytest as _pytest

    from grenier_spark.operators.packing import sliding_windows

    df = spark.createDataFrame([(0, 5)], "doc_id long, n_tok long")
    with _pytest.raises(ValueError):
        sliding_windows(df, 4, 5)  # stride > max_len -> gaps
    with _pytest.raises(ValueError):
        sliding_windows(df, 4, 0)


def test_sliding_windows_sql_hypothesis():
    """Hypothesis-randomized (n_tok, max_len, stride) against the pure
    reference — DuckDB-only (no Spark), so the parameter space gets broad
    coverage; the Spark side is pinned to the same SQL by the fixed-shape
    test above."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from grenier_spark.operators.packing import sliding_windows_sql

    @settings(max_examples=60, deadline=None)
    @given(st.integers(-2, 400), st.integers(1, 50), st.integers(1, 50))
    def check(n, max_len, stride):
        if stride > max_len:
            max_len, stride = stride, max_len  # keep the valid regime
        con = duckdb.connect()
        con.register("d", pd.DataFrame({"doc_id": [0], "n_tok": [n]}))
        got = [tuple(map(int, r)) for r in con.execute(
            "SELECT win_idx, win_start, win_len FROM ("
            + sliding_windows_sql("SELECT doc_id, n_tok FROM d",
                                  max_len, stride, cols="doc_id")
            + ") ORDER BY win_idx").fetchall()]
        assert got == _brute_windows(n, max_len, stride)

    check()
