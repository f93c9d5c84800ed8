"""Unit semantics for textstats.unigram_lm_scores (the CCNet-style
unigram-LM quality filter). Cross-engine parity is locked by the
doc_lm_scores oracle gate; these tests pin the MODEL itself: exact
log-prob arithmetic, the OOV floor, vocabulary truncation, degenerate
corpora, and the filter-ordering property the score exists for."""

import math

import pytest

from grenier_spark.operators.textstats import unigram_lm_scores


def _scores(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = unigram_lm_scores(df, **kw).toPandas()
    return {int(r.doc_id): (int(r.n_words), float(r.mean_logp))
            for r in out.itertuples()}


def test_known_answer_exact(spark):
    # corpus tokens: a a b | a c  ->  N=5, c_a=3, c_b=c_c=1
    got = _scores(spark, [(0, "a a b"), (1, "a c")])
    la, l1 = math.log(3 / 5), math.log(1 / 5)
    assert got[0] == (3, round((2 * la + l1) / 3, 6))
    assert got[1] == (2, round((la + l1) / 2, 6))


def test_oov_floor_applies_outside_top_k(spark):
    # vocab_k=1 keeps only 'a' (count 3); b and c fall to ln(1/N)
    got = _scores(spark, [(0, "a a b"), (1, "a c")], vocab_k=1)
    la, floor = math.log(3 / 5), math.log(1 / 5)
    assert got[0] == (3, round((2 * la + floor) / 3, 6))
    assert got[1] == (2, round((la + floor) / 2, 6))
    # here the floor equals the true singleton prob, so scores coincide
    # with the untruncated model — assert the k=1 path really truncated
    # by making the floor DIFFER: duplicate c so c_c=2 > the floor's 1
    got2 = _scores(spark, [(0, "a a b"), (1, "a c c")], vocab_k=1)
    la2, floor2 = math.log(3 / 6), math.log(1 / 6)
    assert got2[1] == (3, round((la2 + 2 * floor2) / 3, 6))


def test_common_vocab_scores_above_rare(spark):
    rows = ([(i, "the quick brown fox jumps") for i in range(8)]
            + [(100, "the quick brown fox jumps"),
               (101, "zxqj vvkw pplo qqrt mmnb")])  # all-singleton doc
    got = _scores(spark, rows)
    assert got[100][1] > got[101][1]


def test_degenerate_corpora(spark):
    # zero-word and NULL docs are dropped; all-degenerate corpus -> empty
    got = _scores(spark, [(0, "a b"), (1, ""), (2, "   "), (3, None)])
    assert set(got) == {0}
    empty = unigram_lm_scores(
        spark.createDataFrame([(1, ""), (2, None)],
                              "doc_id long, text string"))
    pdf = empty.toPandas()
    assert len(pdf) == 0
    assert list(pdf.columns) == ["doc_id", "n_words", "mean_logp"]


def test_vocab_k_must_bound_broadcast(spark):
    with pytest.raises(ValueError):
        unigram_lm_scores(
            spark.createDataFrame([(0, "a")], "doc_id long, text string"),
            vocab_k=0)


def _bi(spark, rows, **kw):
    from grenier_spark.operators.textstats import bigram_lm_scores

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lm_scores(df, **kw).toPandas()
    return {int(r.doc_id): (int(r.n_words), float(r.mean_logp))
            for r in out.itertuples()}


def test_bigram_known_answer_exact(spark):
    # corpus: 'a b a b' | 'a c' -> c(a)=3 c(b)=2 c(c)=1 N=6;
    # bigrams: (a b)x2 (b a)x1 (a c)x1
    got = _bi(spark, [(0, "a b a b"), (1, "a c")])
    la = math.log(3 / 6)
    d0 = (la + math.log(2 / 3) + math.log(1 / 2) + math.log(2 / 3)) / 4
    d1 = (la + math.log(1 / 3)) / 2
    assert got == {0: (4, round(d0, 6)), 1: (2, round(d1, 6))}


def test_bigram_backoff_and_truncation(spark):
    # bigram_k=1 keeps only (a b); every other position backs off to
    # ln(0.4) + unigram (or the OOV floor when vocab_k truncates too)
    got = _bi(spark, [(0, "a b a b"), (1, "a c")], bigram_k=1)
    la, lb, lc = math.log(3 / 6), math.log(2 / 6), math.log(1 / 6)
    back = math.log(0.4)
    d0 = (la + math.log(2 / 3) + (back + la) + math.log(2 / 3)) / 4
    d1 = (la + (back + lc)) / 2
    assert got == {0: (4, round(d0, 6)), 1: (2, round(d1, 6))}
    # vocab_k=1 additionally floors b and c to ln(1/N)
    got2 = _bi(spark, [(0, "a b a b"), (1, "a c")],
               bigram_k=1, vocab_k=1)
    d1f = (la + (back + math.log(1 / 6))) / 2  # c floored (== singleton)
    assert got2[1] == (2, round(d1f, 6))


def test_bigram_degenerate_and_validation(spark):
    got = _bi(spark, [(0, "solo"), (1, ""), (2, None)])
    assert got == {0: (1, round(math.log(1.0), 6))}  # p_uni(solo)=1
    empty = _bi(spark, [(1, ""), (2, None)])
    assert empty == {}
    with pytest.raises(ValueError):
        _bi(spark, [(0, "a")], alpha=0.0)
    with pytest.raises(ValueError):
        _bi(spark, [(0, "a")], bigram_k=0)


def _pmi(spark, rows, **kw):
    from grenier_spark.operators.textstats import pmi_collocations

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, **kw).toPandas()
    return {(r.w1, r.w2): (int(r.c_xy), int(r.c_w1), int(r.c_w2),
                           float(r.pmi))
            for r in out.itertuples()}


def test_pmi_known_answer_exact(spark):
    # unigrams a:3 b:3 c:2 (N_uni=8); bigrams (a,b):3 (b,a):1 (b,c):1
    # (N_bi=5); single-word doc contributes no bigrams
    rows = [(0, "a b a b"), (1, "a b c"), (2, "c")]
    got = _pmi(spark, rows, min_count=1, top_k=10)

    def pmi(cxy, c1, c2):
        return round(math.log(((((cxy * 8.0) * 8.0) / 5.0) / c1) / c2), 6)

    assert got == {("a", "b"): (3, 3, 3, pmi(3, 3, 3)),
                   ("b", "a"): (1, 3, 3, pmi(1, 3, 3)),
                   ("b", "c"): (1, 3, 2, pmi(1, 3, 2))}
    # min_count prunes the singletons; top_k caps at the highest ratio
    assert set(_pmi(spark, rows, min_count=2)) == {("a", "b")}
    top1 = _pmi(spark, rows, min_count=1, top_k=1)
    assert set(top1) == {("a", "b")}  # highest likelihood ratio wins


def test_pmi_degenerate_and_validation(spark):
    # no doc with >= 2 words -> no bigrams -> empty
    assert _pmi(spark, [(0, "solo"), (1, ""), (2, None)]) == {}
    with pytest.raises(ValueError):
        _pmi(spark, [(0, "a b")], min_count=0)
    with pytest.raises(ValueError):
        _pmi(spark, [(0, "a b")], top_k=0)


def _entropy(spark, rows, **kw):
    from grenier_spark.operators.textstats import token_entropy_stats

    df = spark.createDataFrame(rows, "source string, text string")
    out = token_entropy_stats(df, **kw).toPandas()
    return {r.source: (int(r.n_tokens), int(r.n_distinct), int(r.n_hapax),
                       float(r.entropy))
            for r in out.itertuples()}


def test_token_entropy_known_answer(spark):
    # source a: tokens (a a b) -> N=3, c_a=2, c_b=1
    # H = ln 3 - (2 ln 2 + 1 ln 1)/3
    got = _entropy(spark, [("s", "a a"), ("s", "b")])
    h = math.log(3) - (2 * math.log(2)) / 3
    assert got == {"s": (3, 2, 1, round(h, 6))}


def test_token_entropy_degenerate(spark):
    # single repeated word: entropy exactly 0 (ln N - (N ln N)/N)
    got = _entropy(spark, [("s", "x x x x")])
    assert got == {"s": (4, 1, 0, 0.0)}
    # empty / NULL text contribute no tokens; all-empty group drops
    got2 = _entropy(spark, [("s", "a b"), ("t", ""), ("u", None)])
    assert set(got2) == {"s"}
    assert got2["s"] == (2, 2, 2, round(math.log(2), 6))


def test_token_kl_known_answer(spark):
    from grenier_spark.operators.textstats import token_kl_matrix

    df = spark.createDataFrame([("s", "a a"), ("s", "b"), ("t", "b c")],
                               "source string, text string")
    out = token_kl_matrix(df).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.group_a, r.group_b) == ("s", "t")
    # V=3, alpha=0.5: p_s over (a,b,c) = (2.5, 1.5, 0.5)/4.5,
    # p_t = (0.5, 1.5, 1.5)/3.5
    ps = [2.5 / 4.5, 1.5 / 4.5, 0.5 / 4.5]
    pt = [0.5 / 3.5, 1.5 / 3.5, 1.5 / 3.5]
    kl_st = sum(p * math.log(p / q) for p, q in zip(ps, pt))
    kl_ts = sum(q * math.log(q / p) for p, q in zip(ps, pt))
    jsd = sum(0.5 * p * math.log(p / (0.5 * (p + q)))
              + 0.5 * q * math.log(q / (0.5 * (p + q)))
              for p, q in zip(ps, pt))
    assert r.kl_ab == pytest.approx(round(kl_st, 6), abs=2e-6)
    assert r.kl_ba == pytest.approx(round(kl_ts, 6), abs=2e-6)
    assert r.jsd == pytest.approx(round(jsd, 6), abs=2e-6)
    assert 0 < r.jsd < math.log(2)
    # identical distributions: zero divergence on every output
    df2 = spark.createDataFrame([("x", "a b c"), ("y", "a b c")],
                                "source string, text string")
    out2 = token_kl_matrix(df2).toPandas().iloc[0]
    assert out2.kl_ab == 0.0 and out2.kl_ba == 0.0 and out2.jsd == 0.0
    with pytest.raises(ValueError):
        token_kl_matrix(df, alpha=0.0)
