"""Suffix-granularity ExactSubstr dedup (Lee et al. 2022 §3, the
suffix-array semantics): brute-force parity, non-window-aligned exact
boundaries, extension-cap coverage exactness, within-doc repeats, and
partitioning invariance."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from grenier_spark.operators.dedup import (exact_substr_spans,
                                           suffix_match_lengths)

MIN_LEN = 8
CAP = 16


def _brute_spans(rows, min_len=MIN_LEN, cap=CAP):
    """Reference implementation: per position, the longest match (capped
    at ``cap``) against every other position in the corpus; positions
    with matchlen >= min_len contribute [pos, pos+matchlen-1]; maximal
    contiguous covered ranges come back as spans. 1-based positions."""
    docs = {i: t.split() for i, t in rows}
    sufs = []  # (doc, pos0, tuple of up to cap words)
    for d, w in docs.items():
        for p in range(0, len(w) - min_len + 1):
            sufs.append((d, p, tuple(w[p:p + cap])))
    ml = {}
    for i, (d, p, e) in enumerate(sufs):
        best = 0
        for j, (d2, p2, e2) in enumerate(sufs):
            if i == j:
                continue
            L = 0
            for a, b in zip(e, e2):
                if a != b:
                    break
                L += 1
            best = max(best, L)
        if best >= min_len:
            ml[(d, p + 1)] = best
    spans = {}
    for d in docs:
        ps = sorted(p for (dd, p) in ml if dd == d)
        cur = None
        out = []
        for p in ps:
            e = p + ml[(d, p)] - 1
            if cur is None or p > cur[1] + 1:
                if cur:
                    out.append(cur)
                cur = [p, e]
            else:
                cur[1] = max(cur[1], e)
        if cur:
            out.append(cur)
        if out:
            spans[d] = [(s, e, e - s + 1) for s, e in out]
    return spans


@pytest.fixture(scope="module")
def corpus_rows():
    rng = np.random.default_rng(23)
    words = ["the", "model", "trains", "tokens", "data", "sample",
             "batch", "shard", "merge", "sketch"]

    def body(i, n):
        # unique per-doc markers every other word: bodies never collide
        return [f"{rng.choice(words)}" if j % 2 else f"u{i}x{j}"
                for j in range(n)]

    dup11 = [f"d{j}" for j in range(MIN_LEN + 3)]  # length min_len+3
    dup40 = [f"L{j}" for j in range(40)]           # length >> CAP
    rows = []
    for i in range(12):
        rows.append((i, " ".join(body(i, 30))))
    # planted 11-word dup at NON-ALIGNED offsets (word 6 / word 4)
    rows.append((100, " ".join(body(100, 5) + dup11 + body(1100, 7))))
    rows.append((101, " ".join(body(101, 3) + dup11 + body(1101, 9))))
    # long dup exceeding the extension cap, at doc start and mid-doc
    rows.append((102, " ".join(dup40 + body(102, 6))))
    rows.append((103, " ".join(body(103, 9) + dup40 + body(1103, 4))))
    # within-doc self repeat (two occurrences of one 9-word run)
    rep9 = [f"r{j}" for j in range(9)]
    rows.append((104, " ".join(rep9 + body(104, 6) + rep9)))
    # doc shorter than min_len: no suffix rows at all
    rows.append((105, "tiny doc here"))
    return rows


@pytest.fixture(scope="module")
def corpus(spark, corpus_rows):
    return spark.createDataFrame(
        pd.DataFrame(corpus_rows, columns=["doc_id", "text"]))


def test_spans_match_bruteforce(spark, corpus, corpus_rows):
    got = exact_substr_spans(corpus, min_len=MIN_LEN,
                             ext_cap=CAP).toPandas()
    have = {d: sorted(zip(g.span_start, g.span_end, g.span_len))
            for d, g in got.groupby("doc_id")}
    want = _brute_spans(corpus_rows)
    assert {k: sorted(v) for k, v in want.items()} == {
        int(k): [tuple(int(x) for x in t) for t in v]
        for k, v in have.items()}


def test_planted_dup_found_at_exact_boundaries(spark, corpus):
    """The VERDICT criterion: a duplicate of length min_len+3 at an
    arbitrary (non-window-aligned) offset comes back as ONE span with
    EXACT word boundaries — no k-window quantization."""
    got = exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
    g = {r.doc_id: (r.span_start, r.span_end, r.span_len)
         for r in got.where(F.col("doc_id").isin(100, 101)).collect()}
    assert g[100] == (6, 16, MIN_LEN + 3)
    assert g[101] == (4, 14, MIN_LEN + 3)


def test_long_dup_exact_despite_extension_cap(spark, corpus):
    """A 40-word duplicate with ext_cap=16: per-position matchlen
    saturates at the cap, but the interval union still recovers the
    EXACT 40-word boundaries (the chaining argument in the docstring)."""
    got = exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
    g = {r.doc_id: (r.span_start, r.span_end, r.span_len)
         for r in got.where(F.col("doc_id").isin(102, 103)).collect()}
    assert g[102] == (1, 40, 40)
    assert g[103] == (10, 49, 40)
    ml = suffix_match_lengths(corpus, min_len=MIN_LEN, ext_cap=CAP)
    assert (ml.where("doc_id = 102")
            .agg(F.max("matchlen")).first()[0] == CAP)


def test_within_doc_repeat_is_duplication(spark, corpus):
    got = exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
    g = sorted((r.span_start, r.span_end) for r in
               got.where("doc_id = 104").collect())
    assert g == [(1, 9), (16, 24)]


def test_clean_and_short_docs_absent(spark, corpus):
    got = exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
    ids = set(r.doc_id for r in got.select("doc_id").collect())
    assert ids == {100, 101, 102, 103, 104}


def test_partitioning_invariance(spark, corpus):
    a = (exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
         .toPandas().sort_values(["doc_id", "span_start"])
         .reset_index(drop=True))
    b = (exact_substr_spans(corpus.repartition(7), min_len=MIN_LEN,
                            ext_cap=CAP)
         .toPandas().sort_values(["doc_id", "span_start"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_tiny_batches_exercise_carry_logic(spark, corpus):
    """Force 4-row Arrow batches so the mapInPandas carry-across-batches
    path (pending row + scalar LCP) runs many times; result must be
    byte-identical to the default batch size."""
    a = (exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
         .toPandas().sort_values(["doc_id", "span_start"])
         .reset_index(drop=True))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        b = (exact_substr_spans(corpus, min_len=MIN_LEN, ext_cap=CAP)
             .toPandas().sort_values(["doc_id", "span_start"])
             .reset_index(drop=True))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pd.testing.assert_frame_equal(a, b)


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="min_len"):
        suffix_match_lengths(corpus, min_len=1)
    with pytest.raises(ValueError, match="ext_cap"):
        suffix_match_lengths(corpus, min_len=8, ext_cap=4)
