"""DSIR data selection (operators/selection.py): numpy twin of the
full scoring chain, edge cases (NULL/empty text, pow2 validation,
top-k tie rule), and the DuckDB oracle twin on a hand corpus."""

import math

import duckdb
import numpy as np
import pytest

from grenier_spark.operators.selection import (dsir_logweights, dsir_sql,
                                               dsir_select_topk)


def _md5_low64(word: str) -> int:
    import hashlib
    return int(hashlib.md5(word.encode()).hexdigest()[:16], 16)


def _numpy_dsir(raw_docs, target_docs, n_buckets, smoothing):
    """Independent reimplementation: per-doc sum of lambda over hashed
    unigram buckets."""
    def counts(docs):
        c = np.zeros(n_buckets, dtype=np.float64)
        for _id, text in docs:
            if text is None:
                continue
            for w in text.split(" "):
                if w:
                    c[_md5_low64(w) % n_buckets] += 1
        return c

    rc, tc = counts(raw_docs), counts(target_docs)
    lam = (np.log((tc + smoothing) / (tc.sum() + smoothing * n_buckets))
           - np.log((rc + smoothing) / (rc.sum() + smoothing * n_buckets)))
    out = {}
    for _id, text in raw_docs:
        if text is None:
            continue
        words = [w for w in text.split(" ") if w]
        if not words:
            continue
        s = sum(lam[_md5_low64(w) % n_buckets] for w in words)
        out[_id] = (len(words), round(s, 6))
    return out


RAW = [(1, "the cat sat on the mat"),
       (2, "quantum flux capacitor energy"),
       (3, "the the the the"),
       (4, ""),            # zero words -> no row
       (5, None),          # NULL text -> no row
       (6, "cat cat dog"),
       (7, "  spaced   out  words ")]
TARGET = [(10, "cat dog cat"), (11, "the mat")]


@pytest.fixture(scope="module")
def scored(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return dsir_logweights(raw, tgt, n_buckets=64, smoothing=1.0)


def test_matches_numpy_twin(scored):
    got = {r["doc_id"]: (r["n_words"], r["dsir_logw"])
           for r in scored.collect()}
    exp = _numpy_dsir(RAW, TARGET, 64, 1.0)
    assert set(got) == set(exp) == {1, 2, 3, 6, 7}
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert math.isclose(got[k][1], exp[k][1], rel_tol=0, abs_tol=1e-6)


def test_target_affinity_ordering(scored):
    """Docs made of target words score above off-target vocabulary
    (per-word mean — the sum scales with doc length)."""
    mean = {r["doc_id"]: r["dsir_logw"] / r["n_words"]
            for r in scored.collect()}
    assert mean[6] > mean[2]   # "cat cat dog" >> "quantum flux ..."
    # doc 3 is all "the" — overrepresented in raw vs target, lowest mean
    assert mean[3] == min(mean.values())


def test_topk_selection_and_ties(spark):
    scores = spark.createDataFrame(
        [(1, 3, 0.5), (2, 3, 0.5), (3, 3, 0.9), (4, 3, 0.1)],
        "doc_id long, n_words long, dsir_logw double")
    sel = {r["doc_id"]: r["selected"]
           for r in dsir_select_topk(scores, k=2).collect()}
    # tie at 0.5 broken by id asc -> doc 1 in, doc 2 out
    assert sel == {1: True, 2: False, 3: True, 4: False}


def test_pow2_validation(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_logweights(raw, raw, n_buckets=100)
    with pytest.raises(ValueError):
        dsir_sql("SELECT 1", "SELECT 1", n_buckets=3)
    with pytest.raises(ValueError):
        dsir_select_topk(raw, k=0)


def test_duckdb_twin(scored):
    con = duckdb.connect()
    con.execute("CREATE TABLE raw (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", RAW)
    con.execute("CREATE TABLE tgt (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tgt VALUES (?, ?)", TARGET)
    sql = dsir_sql("SELECT doc_id, text FROM raw",
                   "SELECT doc_id, text FROM tgt",
                   n_buckets=64, smoothing=1.0)
    exp = {int(r[0]): (int(r[1]), float(r[2]))
           for r in con.execute(sql).fetchall()}
    got = {r["doc_id"]: (r["n_words"], r["dsir_logw"])
           for r in scored.collect()}
    assert got == exp
