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
