"""The full training-data pipeline, composed end to end:

quality filter -> PII redaction -> benchmark decontamination -> exact
dedup -> source mixture -> global shuffle -> sharded manifest-verified
write -> read-back -> sequence packing.

Each stage is individually oracle- or property-gated elsewhere; this test
proves they COMPOSE — schemas line up, determinism survives the chain, and
corpus-level invariants (no duplicate bytes, weights realized, tokens
conserved, one global order) hold at the end. The same chain is the
100 TB shape: filter/dedup shuffle once on content hash, mixture and
shuffle-order are scan-stage, the writer pays the one repartition."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from grenier_spark.operators.dedup import dedup_keep_first, exact_dup_members
from grenier_spark.operators.ordering import (read_training_shards,
                                              shuffle_order,
                                              write_training_shards)
from grenier_spark.operators.packing import pack_fixed_chunks
from grenier_spark.operators.splits import mixture_resample
from grenier_spark.operators.textstats import quality_score, word_count


@pytest.fixture(scope="module")
def corpus(spark):
    """600 docs / 3 sources; 30 planted cross-source exact dups; 90 junk
    docs that must fail the quality gate."""
    rng = np.random.default_rng(11)
    rows = []
    words = ["the", "model", "trains", "tokens", "data", "sample", "batch",
             "shard", "merge", "sketch"]
    for i in range(600):
        src = ["web", "code", "books"][i % 3]
        if i < 90:
            # junk: short AND non-alpha -> quality <= 1/3 for any length
            text = "7" * int(rng.integers(1, 30))
        elif i < 120:
            text = " ".join(words) * 8  # planted dup bytes (30 copies)
        elif 300 <= i < 305:
            # the "leaked benchmark" docs: disjoint vocabulary so their
            # 4-gram shingles cannot collide with the word-soup docs and
            # the decontamination stage drops EXACTLY these five
            ev = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
            text = " ".join(rng.choice(ev, size=40)) + f" mark {i}"
        else:
            text = " ".join(rng.choice(words, size=60)) * 2
            if 200 <= i < 210:  # planted PII for the redaction stage
                text += f" mail user{i}@example.com"
        rows.append((i, src, text))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


def test_pipeline_composes_with_corpus_invariants(spark, corpus, tmp_path):
    from grenier_spark.operators.decontam import contamination_report
    from grenier_spark.operators.redact import PII_PATTERNS, redact_text

    # 1. quality gate
    filtered = corpus.where(quality_score("text") >= 0.5)
    # 1a. PII redaction (scan-stage regex chain): planted emails vanish
    anonymized = filtered.withColumn("text", redact_text("text"))
    email_pat = PII_PATTERNS[0][1]
    assert (filtered.where(F.col("text").rlike(email_pat)).count() == 10
            and anonymized.where(F.col("text").rlike(email_pat)).count()
            == 0)
    # 1b. benchmark decontamination: docs 300-304 double as the "eval
    # set" — any training doc sharing a 4-gram with them is dropped
    # (here: exactly themselves; the word-soup texts don't collide)
    eval_set = corpus.where(F.col("doc_id").between(300, 304))
    dirty = contamination_report(anonymized, eval_set, n=4)
    kept = anonymized.join(dirty.select("doc_id"), "doc_id", "left_anti")
    assert (kept.where(F.col("doc_id").between(300, 304)).count() == 0
            and anonymized.count() - kept.count() == 5)
    # 2. exact dedup in ONE content-hash shuffle (keep-first window);
    # asserted equivalent to the diagnose-then-anti-join composition
    deduped = dedup_keep_first(kept)
    losers = (exact_dup_members(kept).where("NOT is_keep")
              .select("doc_id"))
    via_join = kept.join(losers, "doc_id", "left_anti")
    assert (sorted(r.doc_id for r in deduped.select("doc_id").collect())
            == sorted(r.doc_id for r in via_join.select("doc_id").collect()))
    # 3. epoch mixture: code x2, web halved, books as-is
    mixed = mixture_resample(deduped, {"code": 2.0, "web": 0.5}, seed=4)
    # 4. global deterministic shuffle + 5. sharded write with manifest
    ordered = shuffle_order(mixed.withColumn("n_tok", word_count("text")),
                            4, rep_col="rep", seed=8)
    path = str(tmp_path / "corpus")
    manifest = write_training_shards(ordered, path, 4, token_col="n_tok")
    back = read_training_shards(spark, path)  # verify=True recounts
    pdf = back.toPandas()

    # -- corpus invariants ------------------------------------------------
    # junk is gone, and the 30 planted byte-identical docs collapsed to 1
    base = pdf[pdf.rep == 0]
    assert base.text.nunique() == len(base)  # no duplicate bytes survive
    assert not base.doc_id.isin(range(90)).any()  # junk filtered
    # dedup left exactly one of the 30 planted copies (pre-mixture); the
    # survivor is a 'web' doc, so the 0.5 mixture may legitimately drop it
    dedup_ids = [r.doc_id for r in deduped.select("doc_id").collect()]
    assert sum(90 <= i < 120 for i in dedup_ids) == 1
    assert base.doc_id.between(90, 119).sum() <= 1
    # mixture realized: every surviving code doc has exactly 2 full copies
    per_rep = pdf[pdf.source == "code"].groupby("doc_id").rep.max()
    assert (per_rep >= 1).all()
    n_code_base = base[base.source == "code"].doc_id.nunique()
    assert len(pdf[pdf.source == "code"]) >= 2 * n_code_base
    # web is downsampled: kept fraction within binomial range of 0.5
    n_web_in = deduped.where("source = 'web'").count()
    n_web_out = len(pdf[pdf.source == "web"])
    sigma = (n_web_in * 0.25) ** 0.5
    assert abs(n_web_out - 0.5 * n_web_in) < 5 * sigma
    # tokens conserved: manifest total == recompute from rows
    assert (sum(s["n_tokens"] for s in manifest["shards"])
            == int(pdf.n_tok.sum()))
    # one global order: shard ranges partition the order_key space
    ms = manifest["shards"]
    assert all(a["max_key"] < b["min_key"] for a, b in zip(ms, ms[1:]))

    # 6. packing the read-back stream into 256-token batches per shard
    packed = pack_fixed_chunks(back, 256, group_col="shard",
                               order_col="order_key").toPandas()
    for _, g in packed.groupby("shard"):
        total = g.n_tok.sum()
        assert g.end_batch_id.max() == (total - 1) // 256  # no empty batches
        # chunk offsets are a single consistent stream per shard
        g = g.sort_values("tok_start")
        assert (g.tok_start + g.n_tok).iloc[-1] == total


def test_pipeline_is_rerun_deterministic(spark, corpus, tmp_path):
    """The exact bytes a trainer reads must not depend on partitioning or
    on which run wrote them: two independent executions of the whole chain
    produce identical shard contents."""
    def run(path, df):
        kept = df.where(quality_score("text") >= 0.5)
        deduped = dedup_keep_first(kept)
        mixed = mixture_resample(deduped, {"code": 2.0, "web": 0.5}, seed=4)
        ordered = shuffle_order(
            mixed.withColumn("n_tok", word_count("text")),
            4, rep_col="rep", seed=8)
        write_training_shards(ordered, path, 4)
        return (read_training_shards(spark, path).toPandas()
                .sort_values(["shard", "order_key"]).reset_index(drop=True))

    a = run(str(tmp_path / "a"), corpus)
    b = run(str(tmp_path / "b"), corpus.repartition(13))
    pd.testing.assert_frame_equal(
        a[["doc_id", "rep", "shard", "order_key"]],
        b[["doc_id", "rep", "shard", "order_key"]])


def test_fuzzy_vs_exact_decontamination_precision(spark):
    """Why the pipeline carries BOTH decontamination modes: exact n-gram
    overlap flags any doc sharing a single 4-gram with the eval set (high
    recall, over-drops boilerplate), while fuzzy MinHash flags only true
    near-duplicates with per-(train, eval) pair attribution."""
    from grenier_spark.operators.decontam import (contamination_report,
                                                  fuzzy_contamination)

    ev_text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    train = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # 1: benign doc quoting ONE eval 4-gram inside unrelated text
            "the model trains alpha beta gamma delta on batches of data "
            "with sample shard merge sketch tokens and more tokens here",
            # 2: paraphrased leak — eval doc with the last two words dropped
            ev_text.rsplit(" ", 2)[0],
            # 3: unrelated
            "the model trains tokens data sample batch shard merge sketch "
            "over and over again without any greek letters at all today",
        ]}))
    eval_set = spark.createDataFrame(
        pd.DataFrame({"eval_id": [100], "text": [ev_text]}))

    exact = contamination_report(
        train, eval_set.withColumnRenamed("eval_id", "doc_id"),
        n=4).toPandas()
    assert set(exact.doc_id) == {1, 2}  # boilerplate doc 1 over-dropped

    fuzzy = fuzzy_contamination(train, eval_set, tau=0.7).toPandas()
    assert set(zip(fuzzy.doc_id, fuzzy.eval_id)) == {(2, 100)}
    assert (fuzzy.jaccard >= 0.7).all()


def test_substring_removal_and_lm_filter_compose(spark):
    """The round-3 quality stack composes: substring-span removal
    (canonical-first) -> LM scoring over the CLEANED corpus -> drop the
    rare-vocab tail. Invariants: the shared banner survives in exactly one
    doc, untouched docs keep their exact bytes, and every garbled doc
    lands in the dropped tail."""
    from grenier_spark.operators.dedup import (duplicated_span_stats,
                                               remove_dup_spans)
    from grenier_spark.operators.textstats import unigram_lm_scores

    rng = np.random.default_rng(5)
    words = ["the", "model", "trains", "tokens", "data", "sample", "batch",
             "shard", "merge", "sketch"]
    banner = "subscribe to our newsletter for updates every single day"

    def body(i, n=15):
        # alternate common words with per-doc unique markers so every
        # 4-word window holds >= 2 unique tokens: bodies can never
        # duplicate ACROSS docs, only the planted banner can
        return " ".join(f"{rng.choice(words)} u{i}x{j}" for j in range(n))

    rows = []
    for i in range(40):                  # normal docs
        rows.append((i, body(i)))
    for i in range(40, 50):              # shared banner + unique body
        rows.append((i, banner + " " + body(i)))
    for i in range(50, 55):              # garbled: every word unique
        rows.append((i, " ".join(f"zx{i}q{j}" for j in range(30))))
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))

    # stage A: span removal; k=4 < banner length so the banner is spanned
    removed = remove_dup_spans(corpus, k=4)
    cleaned = (corpus.join(removed.select("doc_id", "cleaned"),
                           "doc_id", "left")
               .select("doc_id",
                       F.coalesce("cleaned", "text").alias("text")))
    n_banner = (cleaned
                .where(F.col("text").contains(banner)).count())
    assert n_banner == 1  # canonical doc 40 keeps it, 41-49 lose it
    surv = cleaned.join(corpus.withColumnRenamed("text", "orig"), "doc_id")
    untouched = surv.where(~F.col("doc_id").between(40, 49))
    assert untouched.where("text <> orig").count() == 0  # exact bytes
    # re-running the detector on the cleaned corpus finds no duplicated
    # banner window anymore (each window occurs once corpus-wide)
    re_stats = duplicated_span_stats(cleaned, k=4).toPandas()
    assert not re_stats.doc_id.between(41, 49).any()

    # stage B: LM score the cleaned corpus, drop the tail third
    scores = unigram_lm_scores(cleaned, vocab_k=64)
    cut = scores.agg(F.percentile("mean_logp", F.lit(1 / 3))).first()[0]
    kept = scores.where(F.col("mean_logp") >= cut)
    dropped = set(r.doc_id for r in
                  scores.where(F.col("mean_logp") < cut)
                  .select("doc_id").collect())
    assert set(range(50, 55)) <= dropped  # all garbled docs gone
    assert kept.count() + len(dropped) == 55


def test_bloom_gated_decontamination_is_exact(spark):
    """contamination_report_prefiltered == contamination_report row for
    row, including under a deliberately undersized high-fpr filter
    (expected_shingles=2, fpr=0.5): Bloom false positives only inflate
    the candidate set, and the exact verify join kills every one."""
    from grenier_spark.operators.decontam import (
        contamination_report, contamination_report_prefiltered)

    rng = np.random.default_rng(9)
    words = ["the", "model", "trains", "tokens", "data", "sample",
             "batch", "shard"]
    ev_rows = [(1000 + j, " ".join(f"ev{j}w{i}" for i in range(12)))
               for j in range(5)]
    tr_rows = [(i, " ".join(rng.choice(words, size=20)) + f" u{i}")
               for i in range(60)]
    # plant: doc 7 quotes eval doc 1002's middle 6 words (3 shared 4-grams)
    quoted = " ".join(f"ev2w{i}" for i in range(3, 9))
    tr_rows[7] = (7, tr_rows[7][1] + " " + quoted)
    train = spark.createDataFrame(tr_rows, "doc_id long, text string")
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")

    # duplicate-id input: the report must SUM totals across a doc's rows
    # exactly like the plain operator (one quoting row + one clean row
    # under the same id halves hit_frac, it must not inflate it)
    train = train.unionByName(spark.createDataFrame(
        [(7, "a clean second row for doc seven with harmless words only")],
        "doc_id long, text string"))
    plain = (contamination_report(train, ev, n=4).toPandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert 7 in set(plain.doc_id) and len(plain) >= 1
    assert (plain.loc[plain.doc_id == 7, "hit_frac"] < 0.5).all()
    for kwargs in ({}, {"expected_shingles": 2, "fpr": 0.5}):
        pre = (contamination_report_prefiltered(train, ev, n=4, **kwargs)
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(pre, plain[pre.columns],
                                      check_dtype=False)


def test_selection_and_tokenizer_compose(spark):
    """The round-3 curation stack composes: DSIR selects docs matching a
    curated target distribution, then BPE learns its vocabulary from the
    SELECTED corpus only. Invariants: no noise doc survives selection,
    the learned merges compress the selected corpus (fewer BPE tokens
    than characters), and the whole chain is partitioning-invariant."""
    from grenier_spark.operators.bpe import bpe_learn, bpe_token_counts
    from grenier_spark.operators.selection import (dsir_logweights,
                                                   dsir_select_topk)

    rng = np.random.default_rng(17)
    words = ["the", "model", "trains", "tokens", "data", "sample",
             "batch", "shard", "merge", "sketch"]
    # Noise must be COMMON in raw yet ABSENT from target: DSIR's smoothed
    # ratio ln(p_t/q_r) punishes exactly that shape. (Per-doc-unique
    # gibberish would instead be so rare in raw that the smoothing floor
    # makes the ratio positive — a property of the estimator, not a bug.)
    noise = [f"qzx{j}" for j in range(10)]
    rows = []
    for i in range(40):                  # in-domain docs
        rows.append((i, " ".join(rng.choice(words, size=30))))
    for i in range(40, 60):             # noise: shared gibberish vocab
        rows.append((i, " ".join(rng.choice(noise, size=30))))
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))
    target = corpus.where("doc_id < 5")  # curated sample of the domain

    scores = dsir_logweights(corpus, target, n_buckets=128)
    sel = dsir_select_topk(scores, k=30)
    kept_ids = set(r.doc_id for r in
                   sel.where("selected").select("doc_id").collect())
    assert len(kept_ids) == 30
    assert all(i < 40 for i in kept_ids), kept_ids  # zero noise docs

    kept_docs = corpus.join(
        sel.where("selected").select("doc_id"), "doc_id")
    merges, seg = bpe_learn(kept_docs, n_merges=15)
    assert len(merges) == 15
    # vocabulary comes from the selected domain only: no gibberish marker
    assert not any("q" in m["left"] + m["right"] for m in merges)

    toks = bpe_token_counts(kept_docs, seg)
    stats = (toks.join(kept_docs, "doc_id")
             .select("n_words", "n_bpe_tokens",
                     F.length(F.regexp_replace("text", " ", ""))
                     .alias("n_chars")).toPandas())
    # compression: strictly fewer tokens than chars+end-markers, and at
    # least one token per word
    assert (stats.n_bpe_tokens < stats.n_chars + stats.n_words).all()
    assert (stats.n_bpe_tokens >= stats.n_words).all()

    again, _ = bpe_learn(kept_docs.repartition(7), n_merges=15)
    assert again == merges
