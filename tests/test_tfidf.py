"""TF-IDF keyword extraction (textstats.tfidf_top_terms): brute parity,
tie rule, smooth-idf arithmetic, edge cases."""

import numpy as np
import pandas as pd
import pytest

from grenier_spark.operators.textstats import tfidf_top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # group A: 'alpha' is A-specific (df=2), 'the' is corpus-wide
        (1, "A", "the alpha alpha beta the"),
        (2, "A", "the alpha gamma"),
        # group B: 'zeta' B-specific; 'beta' shared with A
        (3, "B", "the zeta zeta zeta beta"),
        (4, "B", "the zeta delta"),
        (5, "C", "the only common words here"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


def brute(rows, k):
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    tok = (pdf.assign(w=pdf.text.str.split(" "))
           .explode("w").query("w != ''"))
    n_docs = tok.doc_id.nunique()
    df = tok.groupby("w").doc_id.nunique()
    tf = tok.groupby(["source", "w"]).size()
    out = {}
    for (g, w), c in tf.items():
        score = round(c * (np.log((n_docs + 1) / (df[w] + 1)) + 1), 6)
        out.setdefault(g, []).append((-score, w, c, int(df[w]), score))
    res = {}
    for g, lst in out.items():
        lst.sort()
        res[g] = [(i + 1, w, c, d, s)
                  for i, (_, w, c, d, s) in enumerate(lst[:k])]
    return res


def test_matches_brute_force(spark, corpus):
    rows = [tuple(r) for r in corpus.collect()]
    want = brute(rows, k=3)
    got = {}
    for r in tfidf_top_terms(corpus, k=3).collect():
        got.setdefault(r.source, []).append(
            (r.rank, r.term, r.tf, r.df, r.score))
    got = {g: sorted(v) for g, v in got.items()}
    assert got == want


def test_group_specific_terms_win(spark, corpus):
    top1 = {r.source: r.term
            for r in tfidf_top_terms(corpus, k=1).collect()}
    assert top1["A"] == "alpha" and top1["B"] == "zeta"


def test_tie_breaks_by_term_ascending(spark):
    # two terms with identical tf and df in one group: rank by term asc
    df = spark.createDataFrame(
        [(1, "G", "mmm aaa"), (2, "X", "filler words")],
        "doc_id long, source string, text string")
    g = [(r.rank, r.term) for r in
         tfidf_top_terms(df, k=2).where("source = 'G'").collect()]
    assert sorted(g) == [(1, "aaa"), (2, "mmm")]


def test_partitioning_invariance(spark, corpus):
    a = (tfidf_top_terms(corpus, k=3).toPandas()
         .sort_values(["source", "rank"]).reset_index(drop=True))
    b = (tfidf_top_terms(corpus.repartition(7), k=3).toPandas()
         .sort_values(["source", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, source string, text string")
    assert tfidf_top_terms(df).count() == 0


def test_no_driver_collect(spark, corpus, monkeypatch):
    # scale guard: the idf table is computed executor-side (mapInPandas
    # over the distinct-df frame) — NO DataFrame.collect() anywhere in
    # the build, so nothing vocab-scale can transit the driver. count()
    # (a scalar) and localCheckpoint() remain allowed.
    from pyspark.sql import DataFrame

    def _banned(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("tfidf_top_terms must not collect() "
                             "a DataFrame to the driver")

    monkeypatch.setattr(DataFrame, "collect", _banned)
    out = tfidf_top_terms(corpus, k=2)
    monkeypatch.undo()
    assert out.count() > 0
