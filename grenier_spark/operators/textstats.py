"""Text-analysis Column expressions for training-data pipelines.

All JVM-side (whole-stage codegen; no Python in the hot path) and
deterministic, so every one of them is DuckDB-oracle-checkable. Used by the
__spark_entry__ queries; kept as reusable Columns here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def word_count(text: "Column | str") -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.filter(F.split(c, " "), lambda w: w != "")).cast("long")


def alpha_word_ratio(text: "Column | str") -> Column:
    """Fraction of whitespace tokens that are purely ascii-alphabetic."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(c, " "), lambda w: w != "")
    alpha = F.size(F.filter(words, lambda w: w.rlike("^[A-Za-z]+$")))
    return (alpha / F.greatest(F.size(words), F.lit(1))).cast("double")


def stopword_ratio(text: "Column | str") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(F.lower(c), " "), lambda w: w != "")
    stops = F.size(F.filter(words, lambda w: w.isin(list(STOPWORDS))))
    return (stops / F.greatest(F.size(words), F.lit(1))).cast("double")


def mean_word_len(text: "Column | str") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(c, " "), lambda w: w != "")
    total = F.aggregate(words, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w))
    return (total / F.greatest(F.size(words), F.lit(1))).cast("double")


def quality_score(text: "Column | str") -> Column:
    """Composite [0, 1] heuristic: length band + alpha ratio + mean word
    length band. Deterministic arithmetic only (oracle-friendly)."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    len_band = F.when((n >= 200) & (n <= 5000), F.lit(1.0)) \
        .when(n >= 50, F.lit(0.5)).otherwise(F.lit(0.0))
    mwl = mean_word_len(c)
    mwl_band = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)) \
        .otherwise(F.lit(0.0))
    return F.round((len_band + alpha_word_ratio(c) + mwl_band) / 3.0, 6)


def doc_fingerprint(text: "Column | str") -> Column:
    """Exact content fingerprint (md5 hex) — the hash-groupBy dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def repetition_stats(df, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-document repetition quality signals (the Gopher/MassiveText
    filter family, Rae et al. 2021 §A1.1, adapted to flat word streams):

    * ``distinct_word_ratio`` — |distinct words| / |words| (low = repetitive)
    * ``top_word_frac``      — occurrences of the most frequent word / |words|
    * ``top_bigram_frac``    — occurrences of the most frequent word 2-gram
      / |2-grams| (boilerplate/spam detector)

    Shape: words and bigrams are JVM array ops fused into the scan; the
    frequency modes go through ONE explode + two-level groupBy whose keys
    are (doc_id, gram) — doc-local keys, so partial aggregation absorbs
    the fan-out map-side and the shuffle carries at most |distinct grams
    per doc| rows per doc. That beats the O(n_words * n_distinct)
    per-row higher-order-function alternative for the huge-doc tail
    (100k-token docs), which is exactly where repetition filters matter.
    Docs with zero words are dropped (both engines drop them in the
    explode/unnest, keeping the oracle aligned).
    """
    wcol = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = (df.select(id_col, wcol.alias("_w"))
            .where(F.size("_w") >= 1))
    big = F.zip_with(F.slice("_w", 1, F.size("_w") - 1),
                     F.slice("_w", 2, F.size("_w") - 1),
                     lambda a, b: F.concat(a, F.lit(" "), b))
    uni = (base.select(id_col, F.explode("_w").alias("g"))
           .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
           .groupBy(id_col)
           .agg(F.sum("c").alias("n_words"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("c").alias("top_cnt")))
    bi = (base.select(id_col, F.explode(big).alias("g"))
          .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
          .groupBy(id_col)
          .agg(F.sum("c").alias("n_bigrams"),
               F.max("c").alias("top_big_cnt")))
    return (uni.join(bi, id_col, "left")
            .select(id_col,
                    F.col("n_words").cast("long").alias("n_words"),
                    F.round(F.col("n_distinct") / F.col("n_words"), 6)
                    .alias("distinct_word_ratio"),
                    F.round(F.col("top_cnt") / F.col("n_words"), 6)
                    .alias("top_word_frac"),
                    F.round(F.coalesce(F.col("top_big_cnt"), F.lit(0))
                            / F.greatest(
                                F.coalesce(F.col("n_bigrams"), F.lit(0)),
                                F.lit(1)), 6)
                    .alias("top_bigram_frac")))


def repetition_stats_sql(table_sql: str, text_col: str = "text",
                         id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`repetition_stats` — same filtered word split,
    same BIGINT counts and double divisions (int/int is float division on
    both engines, correctly rounded -> bit-identical), same
    left-join/greatest guard for 1-word docs."""
    return f"""
WITH w AS (SELECT {id_col},
                  list_filter(string_split({text_col}, ' '), x -> x <> '')
                    AS words
           FROM ({table_sql}) WHERE len(list_filter(
               string_split({text_col}, ' '), x -> x <> '')) >= 1),
uni AS (SELECT {id_col}, SUM(c)::BIGINT AS n_words,
               COUNT(*)::BIGINT AS n_distinct, MAX(c)::BIGINT AS top_cnt
        FROM (SELECT {id_col}, g, COUNT(*)::BIGINT AS c
              FROM (SELECT {id_col}, unnest(words) AS g FROM w)
              GROUP BY 1, 2)
        GROUP BY 1),
pos AS (SELECT {id_col}, words,
               unnest(range(greatest(len(words) - 1, 0)))::BIGINT AS i
        FROM w),
bi AS (SELECT {id_col}, SUM(c)::BIGINT AS n_bigrams,
              MAX(c)::BIGINT AS top_big_cnt
       FROM (SELECT {id_col}, g, COUNT(*)::BIGINT AS c
             FROM (SELECT {id_col}, words[i + 1] || ' ' || words[i + 2] AS g
                   FROM pos)
             GROUP BY 1, 2)
       GROUP BY 1)
SELECT {id_col}, n_words,
       round(n_distinct / n_words, 6) AS distinct_word_ratio,
       round(top_cnt / n_words, 6) AS top_word_frac,
       round(COALESCE(top_big_cnt, 0) / greatest(COALESCE(n_bigrams, 0), 1), 6)
         AS top_bigram_frac
FROM uni LEFT JOIN bi USING ({id_col})"""


# GPT2-style simplification: letter runs | digit runs | single other glyph.
# Chosen so Java regex (Spark), RE2 (DuckDB) and Python `re` tokenize
# identically — verified in tests.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def regex_token_count(text: "Column | str",
                      pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-ish token count: how a subword tokenizer would segment, minus
    the merge table — the standard cheap proxy for LLM token budgets."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))) \
        .cast("long")


def winnow_fingerprints(text: "Column | str", k: int = 8,
                        window: int = 5) -> Column:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken 2003):
    md5-low64 hash of every k-char gram, minimum per sliding window of
    ``window`` hashes, distinct + sorted -> array<long>.

    The rolling-hash fingerprint family for plagiarism/near-dup detection;
    entirely JVM expressions, and every stage (substring grams, signed
    64-bit minima, window slices) has an exact DuckDB twin, so queries over
    it are value-gated. Docs shorter than ``k`` (or with fewer than
    ``window`` grams) yield an empty array.
    """
    from ..functions.hashing import md5_low64_col

    c = F.col(text) if isinstance(text, str) else text
    n_grams = F.length(c) - k + 1
    grams = F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams),
                    lambda i: md5_low64_col(c.substr(i, F.lit(k))))
    ).otherwise(F.array().cast("array<long>"))
    n_wins = F.size(grams) - window + 1
    wins = F.when(
        n_wins >= 1,
        F.transform(F.sequence(F.lit(1), n_wins),
                    lambda j: F.array_min(F.slice(grams, j, window)))
    ).otherwise(F.array().cast("array<long>"))
    return F.array_sort(F.array_distinct(wins))


def token_freq_spectrum(df, tokens_col: str = "tokens",
                        group_col: "str | None" = None):
    """Frequency-of-frequencies spectrum (the Zipf/vocab-sizing view): for
    each log2 bin b, how many DISTINCT tokens occur in [2^b, 2^(b+1))
    total occurrences, and how much corpus mass they carry.

    The question "what vocab size covers 99.9% of occurrences" (BPE sizing,
    rare-token filtering) needs exact counts per frequency class — the one
    corpus statistic the sketch suite deliberately doesn't approximate
    (CMS answers point queries, not the count-of-counts histogram).

    Shape: explode -> two-level groupBy. The first groupBy (token counts)
    is the canonical word-count shuffle: partial aggregation reduces the
    map side to one row per distinct token per partition, so the exchange
    carries vocab-scale rows (tens of M), not token-scale (10^12); the
    second groupBy reduces to <=64 bins. This is the ONE analysis query
    in the suite where a vocab-scale shuffle is inherent — everything
    upstream of it stays in the scan stage.

    Returns (group?, freq_bin, n_distinct_tokens, n_occurrences).
    """
    gcols = [group_col] if group_col else []
    tok = df.select(*gcols, F.explode(tokens_col).alias("t"))
    counts = (tok.groupBy(*gcols, "t")
              .agg(F.count(F.lit(1)).alias("c")))
    # freq_bin = floor(log2(c)) computed INTEGER-exactly as bit_length-1
    # (conv to base 2, count digits): no libm log2 whose rounding at exact
    # powers of two could differ between the JVM and DuckDB.
    binned = counts.withColumn(
        "freq_bin",
        (F.length(F.conv(F.col("c").cast("string"), 10, 2)) - 1)
        .cast("long"))
    return (binned.groupBy(*gcols, "freq_bin")
            .agg(F.count(F.lit(1)).alias("n_distinct_tokens"),
                 F.sum("c").cast("long").alias("n_occurrences")))


def unigram_lm_scores(df, text_col: str = "text", id_col: str = "doc_id",
                      vocab_k: int = 50_000):
    """CCNet-family LM quality filter (Wenzek et al. 2020 §3.3), with the
    KenLM 5-gram model replaced by the corpus's OWN unigram distribution —
    the deterministic, dependency-free proxy: per doc,
    ``mean_logp = mean over words of ln(p(w))`` where ``p(w) = c_w / N``
    over the whole corpus; words outside the top-``vocab_k`` vocabulary
    take the floor ``ln(1 / N)`` (add-one-style OOV mass). Low
    ``mean_logp`` = rare/garbled vocabulary; high = common-word text.
    Filtering on quantiles of this score is the standard perplexity-bucket
    corpus split.

    Shape at 100 TB: build time pays ONE corpus scan feeding ONE
    vocab-scale count shuffle (map-side combined — identical to
    :func:`token_freq_spectrum`, the inherent word-count exchange; the
    counts frame is persisted so the top-K job and the N-total aggregate
    share that scan), then a bounded TakeOrdered top-K (per-partition
    top-K, K rows through the driver — numpy computes the log-probs so no
    JVM ``ln`` enters the oracle contract), broadcast back as a K-row join
    to the exploded words, and a doc-local mean whose partial aggregation
    absorbs the token fan-out map-side (the shuffle carries ~n_docs rows,
    not n_tokens). The returned scoring plan re-reads the corpus once
    more — inherent, since the output is per-doc. Ranking ties at the K boundary break on md5 hex of the
    word — ASCII, so Spark (UTF-16) and DuckDB (UTF-8 binary) order them
    identically even when the words themselves are astral-plane unicode.

    Returns (id, n_words, mean_logp round-6); zero-word docs are dropped
    (no explode rows) on both engines, NULL text likewise.
    """
    import numpy as np

    if vocab_k < 1:
        # k=0 would silently degrade every word to the OOV floor
        raise ValueError("vocab_k must be >= 1")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    tok = df.select(id_col, F.explode(words).alias("w"))
    # persist the vocab-scale counts so the top-K job and the N-total
    # aggregate share ONE corpus scan (vocab rows are MB-scale; a second
    # token-explode scan of the corpus is not) — released immediately
    # after both driver results land
    counts = (tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
              .persist())
    try:
        top = (counts.orderBy(F.desc("c"), F.md5("w").asc())
               .limit(vocab_k).toPandas())
        row = counts.agg(F.sum("c")).first()[0]
        n_total = int(row) if row is not None else 0
    finally:
        counts.unpersist()
    spark = df.sparkSession
    if n_total == 0:
        # zero-word corpus: ln(1/N) is undefined and the oracle emits no
        # rows either — return the empty frame with the contract schema
        id_t = df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{id_col} {id_t}, n_words long, mean_logp double")
    # numpy ln == DuckDB ln (same libm): the literals Spark joins against
    # are bit-identical to what the oracle recomputes in SQL
    top["lp"] = np.log(top["c"].to_numpy(dtype=np.float64) / float(n_total))
    oov_lp = float(np.log(1.0 / float(n_total)))
    vocab = F.broadcast(spark.createDataFrame(top[["w", "lp"]],
                                              "w string, lp double"))
    return (tok.join(vocab, "w", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.round(F.avg(F.coalesce(F.col("lp"), F.lit(oov_lp))), 6)
                 .alias("mean_logp")))


def unigram_lm_scores_sql(table_sql: str, text_col: str = "text",
                          id_col: str = "doc_id",
                          vocab_k: int = 50_000) -> str:
    """DuckDB twin of :func:`unigram_lm_scores`: same filtered word split,
    same (count DESC, md5 hex ASC) top-K vocabulary, same ``ln(c/N)`` /
    ``ln(1/N)`` doubles (DuckDB's libm == numpy's), same round-6 mean."""
    return f"""
WITH tok AS (
  SELECT {id_col} AS id,
         unnest(list_filter(string_split({text_col}, ' '), x -> x <> ''))
           AS w
  FROM ({table_sql})),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM tok),
vocab AS (
  SELECT w, COUNT(*)::BIGINT AS c FROM tok GROUP BY 1
  ORDER BY c DESC, md5(w) ASC LIMIT {vocab_k}),
logp AS (
  SELECT w, ln(c::DOUBLE / (SELECT n FROM tot)::DOUBLE) AS lp FROM vocab)
SELECT t.id AS {id_col}, COUNT(*)::BIGINT AS n_words,
       round(AVG(COALESCE(l.lp,
                          ln(1.0 / (SELECT n FROM tot)::DOUBLE))), 6)
         AS mean_logp
FROM tok t LEFT JOIN logp l USING (w)
GROUP BY 1"""


def token_freq_spectrum_sql(token_rows_sql: str,
                            group_col: "str | None" = None) -> str:
    """DuckDB twin of :func:`token_freq_spectrum`. ``token_rows_sql``
    emits one row per token occurrence, columns (group?, t) — t may be
    any equality-comparable token id (e.g. the md5-low64 hex slice).
    freq_bin uses the same integer-exact bit-length formula as the Spark
    side (``length(bin(c)) - 1`` == floor(log2(c)) for c >= 1) — no libm
    log2 in either engine."""
    g = f"{group_col}, " if group_col else ""
    return f"""
SELECT {g}(length(bin(c)) - 1)::BIGINT AS freq_bin,
       COUNT(*)::BIGINT AS n_distinct_tokens,
       SUM(c)::BIGINT AS n_occurrences
FROM (SELECT {g}t, COUNT(*)::BIGINT AS c
      FROM ({token_rows_sql})
      GROUP BY {g}t)
GROUP BY {g}freq_bin"""


def bigram_lm_scores(df, text_col: str = "text", id_col: str = "doc_id",
                     vocab_k: int = 50_000, bigram_k: int = 50_000,
                     alpha: float = 0.4):
    """Bigram LM with stupid backoff (Brants et al. 2007 §4) — one step
    from :func:`unigram_lm_scores` toward the n-gram KenLM of CCNet: per
    doc, ``mean_logp`` over positions where position 1 scores
    ``ln p_uni(w_1)`` and position i >= 2 scores ``ln(c(w_{i-1} w_i) /
    c(w_{i-1}))`` when the bigram is in the top-``bigram_k`` table, else
    backs off to ``ln(alpha) + ln p_uni(w_i)``. Unigram probabilities use
    the top-``vocab_k`` table with the ``ln(1/N)`` OOV floor; bigram
    denominators are the FULL corpus counts of the bigram's first word
    (not top-K-truncated), so conditional probabilities are exact for
    every tabled bigram.

    Same cross-engine contract as the unigram scorer: both count shuffles
    are vocab-scale map-side-combined exchanges, both tables are bounded
    TakeOrdered top-Ks with md5-hex tie-breaks, every ``ln`` is computed
    in numpy on the driver (== DuckDB's libm) and broadcast as literal
    doubles, scoring is a two-broadcast-join + doc-local mean (round 6).
    Returns (id, n_words, mean_logp); zero-word/NULL docs drop.
    """
    import numpy as np

    if vocab_k < 1 or bigram_k < 1:
        raise ValueError("vocab_k and bigram_k must be >= 1")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    base = df.select(id_col, words.alias("_w")).where(F.size("_w") >= 1)
    n = F.size("_w")
    # position rows: (id, prev, cur); prev NULL at position 1
    pairs = F.zip_with(
        F.concat(F.array(F.lit(None).cast("string")),
                 F.slice("_w", 1, n - 1)),
        F.col("_w"),
        lambda p, c: F.struct(p.alias("prev"), c.alias("cur")))
    tok = (base.select(id_col, F.explode(pairs).alias("_pc"))
           .select(id_col, F.col("_pc.prev").alias("prev"),
                   F.col("_pc.cur").alias("cur")))
    counts = (tok.groupBy(F.col("cur").alias("w"))
              .agg(F.count(F.lit(1)).alias("c")).persist())
    # bigram counts feed ONLY the top-K pull — no persist (unlike counts,
    # which three consumers share: top-K, N-total, c1 denominators)
    bcounts = (tok.where(F.col("prev").isNotNull())
               .select(F.concat_ws(" ", "prev", "cur").alias("g"))
               .groupBy("g").agg(F.count(F.lit(1)).alias("c2")))
    spark = df.sparkSession
    try:
        top = (counts.orderBy(F.desc("c"), F.md5("w").asc())
               .limit(vocab_k).toPandas())
        row = counts.agg(F.sum("c")).first()[0]
        n_total = int(row) if row is not None else 0
        if n_total == 0:
            id_t = df.schema[id_col].dataType.simpleString()
            return spark.createDataFrame(
                [], f"{id_col} {id_t}, n_words long, mean_logp double")
        btop = (bcounts.orderBy(F.desc("c2"), F.md5("g").asc())
                .limit(bigram_k).toPandas())
        # exact denominators: FULL unigram counts of the tabled bigrams'
        # first words (semi-join keeps the driver pull K-bounded)
        if len(btop):
            btop["w1"] = btop.g.str.split(" ", n=1).str[0]
            firsts = spark.createDataFrame(
                btop[["w1"]].drop_duplicates().rename(columns={"w1": "w"}),
                "w string")
            c1 = (counts.join(F.broadcast(firsts), "w", "semi")
                  .toPandas().set_index("w").c)
            btop["lp2"] = np.log(
                btop.c2.to_numpy(dtype=np.float64)
                / c1.reindex(btop.w1).to_numpy(dtype=np.float64))
    finally:
        counts.unpersist()
    top["lp"] = np.log(top["c"].to_numpy(dtype=np.float64) / float(n_total))
    oov_lp = float(np.log(1.0 / float(n_total)))
    ln_alpha = float(np.log(alpha))
    uni = F.broadcast(spark.createDataFrame(top[["w", "lp"]],
                                            "w string, lp double"))
    bi = F.broadcast(spark.createDataFrame(
        btop[["g", "lp2"]] if len(btop) else btop.assign(g=None, lp2=None)
        [["g", "lp2"]], "g string, lp2 double"))
    scored = (tok
              .withColumn("g", F.when(F.col("prev").isNotNull(),
                                      F.concat_ws(" ", "prev", "cur")))
              .join(bi, "g", "left")
              .join(uni, F.col("cur") == F.col("w"), "left"))
    uni_lp = F.coalesce(F.col("lp"), F.lit(oov_lp))
    logp = (F.when(F.col("prev").isNull(), uni_lp)
            .when(F.col("lp2").isNotNull(), F.col("lp2"))
            .otherwise(F.lit(ln_alpha) + uni_lp))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.round(F.avg(logp), 6).alias("mean_logp")))


def bigram_lm_scores_sql(table_sql: str, text_col: str = "text",
                         id_col: str = "doc_id", vocab_k: int = 50_000,
                         bigram_k: int = 50_000,
                         alpha: float = 0.4) -> str:
    """DuckDB twin of :func:`bigram_lm_scores`: same position pairs, same
    two (count DESC, md5 ASC) top-K tables, same full-count denominators,
    same ln / backoff-constant doubles, same round-6 mean."""
    return f"""
WITH w AS (
  SELECT {id_col} AS id,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS words
  FROM ({table_sql}) WHERE len(list_filter(
      string_split({text_col}, ' '), x -> x <> '')) >= 1),
tok AS (
  SELECT id, CASE WHEN pos > 1 THEN words[pos - 1] END AS prev,
         words[pos] AS cur
  FROM (SELECT id, words, unnest(range(1, len(words) + 1)) AS pos FROM w)),
cnt AS (SELECT cur AS w, COUNT(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (SELECT SUM(c)::BIGINT AS n FROM cnt),
uni AS (
  SELECT w, ln(c::DOUBLE / (SELECT n FROM tot)::DOUBLE) AS lp
  FROM (SELECT w, c FROM cnt ORDER BY c DESC, md5(w) ASC
        LIMIT {vocab_k})),
big AS (
  SELECT g, c2 FROM (
    SELECT prev || ' ' || cur AS g, COUNT(*)::BIGINT AS c2
    FROM tok WHERE prev IS NOT NULL GROUP BY 1)
  ORDER BY c2 DESC, md5(g) ASC LIMIT {bigram_k}),
bilp AS (
  SELECT g, ln(c2::DOUBLE / c.c::DOUBLE) AS lp2
  FROM big JOIN cnt c ON string_split(g, ' ')[1] = c.w)
SELECT t.id AS {id_col}, COUNT(*)::BIGINT AS n_words,
       round(AVG(CASE
         WHEN t.prev IS NULL THEN COALESCE(u.lp,
             ln(1.0 / (SELECT n FROM tot)::DOUBLE))
         WHEN b.lp2 IS NOT NULL THEN b.lp2
         ELSE ln({alpha!r}::DOUBLE) + COALESCE(u.lp,
             ln(1.0 / (SELECT n FROM tot)::DOUBLE))
       END), 6) AS mean_logp
FROM tok t
LEFT JOIN bilp b ON t.prev IS NOT NULL AND t.prev || ' ' || t.cur = b.g
LEFT JOIN uni u ON t.cur = u.w
GROUP BY 1"""


def pmi_collocations(df, text_col: str = "text", min_count: int = 2,
                     top_k: int = 100):
    """Collocation / phrase mining by pointwise mutual information
    (Church & Hanks 1990): over adjacent word pairs,
    ``pmi(x, y) = ln( p(x,y) / (p(x) p(y)) )`` with ``p(x,y) = c_xy/N_bi``
    from the corpus bigram counts and unigram marginals ``c_x/N_uni`` —
    the standard signal for multi-word expressions ("new york") when
    building tokenizer pre-merges or phrase-aware dedup keys.

    Shape at 100 TB: one corpus scan per count family (unigram + bigram
    explodes) feeds the two inherent vocab-/bigram-scale count exchanges
    (map-side combined); AQE exchange reuse then shares each count shuffle
    across its consumers (marginal joins + totals — ReusedExchange in the
    final adaptive plan), so the corpus is never re-exploded per consumer.
    Candidates are bigrams with ``c_xy >= min_count``
    joined to their two unigram marginals (word-keyed shuffle joins), the
    totals ride in as a broadcast 1-row crossJoin (fully lazy — no driver
    round-trip, no persist), and the global top-``top_k`` is a
    TakeOrdered, never a full sort. Ranking uses the RAW likelihood ratio
    ``((((c_xy * N_uni) * N_uni) / N_bi) / c_x) / c_y`` — a fixed
    left-associated float64 chain that is bit-identical in DuckDB, and
    monotone in pmi, so no ``ln`` affects the cut; ties break on md5 hex.
    The ``ln`` itself runs as one vectorized numpy pass over the candidate
    rows (numpy-libm == DuckDB-libm, the suite's LM-scorer contract).

    Returns (w1, w2, c_xy, c_w1, c_w2, pmi round-6).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if min_count < 1 or top_k < 1:
        raise ValueError("min_count and top_k must be >= 1")
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    wdf = df.select(words.alias("_w"))
    n = F.size("_w")
    pairs = F.when(n >= 2, F.zip_with(
        F.slice("_w", 1, n - 1), F.slice("_w", 2, n - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    uni = (wdf.select(F.explode("_w").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    bi = (wdf.select(F.explode(pairs).alias("_p"))
          .select("_p.w1", "_p.w2")
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy")))
    totals = (uni.agg(F.sum("c").alias("n_uni"))
              .crossJoin(bi.agg(F.sum("c_xy").alias("n_bi"))))
    cand = (bi.where(F.col("c_xy") >= min_count)
            .join(uni.select(F.col("w").alias("w1"),
                             F.col("c").alias("c_w1")), "w1")
            .join(uni.select(F.col("w").alias("w2"),
                             F.col("c").alias("c_w2")), "w2")
            .crossJoin(F.broadcast(totals)))
    ratio = (F.col("c_xy").cast("double")
             * F.col("n_uni").cast("double")
             * F.col("n_uni").cast("double")
             / F.col("n_bi").cast("double")
             / F.col("c_w1").cast("double")
             / F.col("c_w2").cast("double"))
    # no type hints: this module's `from __future__ import annotations`
    # would stringify them and break pandas_udf's eval-type inference
    @pandas_udf("double")
    def _ln(x):
        return pd.Series(np.log(x.to_numpy(dtype=np.float64)))

    # ln runs vectorized over the candidate rows BELOW the sort so the
    # limit sits directly on Sort with a plain Project above — Spark then
    # plans TakeOrderedAndProject (per-partition top-k, k rows to the
    # driver) instead of an all-candidates SinglePartition exchange
    # (plan-gated in test_plan_quality.py). The cut itself is still on the
    # raw ratio, so the ln never affects which rows win.
    scored = (cand.withColumn("_ratio", ratio)
              .withColumn("pmi", F.round(_ln(ratio), 6)))
    return (scored
            .orderBy(F.desc("_ratio"), F.md5("w1").asc(), F.md5("w2").asc())
            .limit(top_k)
            .select("w1", "w2", "c_xy", "c_w1", "c_w2", "pmi"))


def token_entropy_stats(df, text_col: str = "text",
                        group_col: str = "source"):
    """Vocabulary statistics of the word distribution per group: token
    count, distinct count, hapax count (frequency-1 types — the Zipf tail
    mass) and Shannon entropy ``H = ln N − (Σ c·ln c)/N`` in nats — the
    standard corpus-diversity / vocabulary-health signals a mixture
    pipeline monitors per source.

    Shape at 100 TB: ONE corpus scan feeds the inherent vocab-scale count
    exchange (map-side combined — same as :func:`token_freq_spectrum`);
    ``ln`` runs once per DISTINCT token as a vectorized numpy pass
    (numpy-libm == DuckDB-libm, the suite's LM contract), and the
    Σ c·ln c reduction rides the ddsum mergeable state so the oracle's
    ``fsum`` reproduces it to the ulp regardless of partitioning (the
    exact_value_sums pairing). Entropy is round-6; the count columns are
    exact BIGINTs.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.aggregates import ddsum_agg_col
    from ..functions.estimates import ddsum_col

    # no type hints (module-level `from __future__ import annotations`)
    @pandas_udf("double")
    def _clnc(c):
        x = c.to_numpy(dtype=np.float64)
        return pd.Series(x * np.log(x))

    @pandas_udf("double")
    def _ln(x):
        return pd.Series(np.log(x.to_numpy(dtype=np.float64)))

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    tok = df.select(group_col, F.explode(words).alias("w"))
    counts = (tok.groupBy(group_col, "w")
              .agg(F.count(F.lit(1)).alias("c")))
    per = counts.select(group_col, "c", _clnc(F.col("c")).alias("clnc"))
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one groupBy, so the exact counters and the ddsum
    # reduction are two group-scale aggs joined back on the key (the
    # vocab-scale counts exchange below them is shared via AQE reuse)
    exacts = (per.groupBy(group_col)
              .agg(F.sum("c").alias("n_tokens"),
                   F.count(F.lit(1)).alias("n_distinct"),
                   F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                   .cast("long").alias("n_hapax")))
    dd = (per.groupBy(group_col)
          .agg(ddsum_agg_col("clnc").alias("_dd")))
    agg = exacts.join(dd, group_col)
    entropy = (_ln(F.col("n_tokens").cast("double"))
               - ddsum_col("_dd") / F.col("n_tokens").cast("double"))
    return (agg.select(group_col, "n_tokens", "n_distinct", "n_hapax",
                       F.round(entropy, 6).alias("entropy")))


def token_entropy_stats_sql(table_sql: str, text_col: str = "text",
                            group_col: str = "source") -> str:
    """DuckDB twin of :func:`token_entropy_stats`: same filtered split,
    same per-distinct-token ``c·ln c`` doubles, ``fsum`` for the ddsum
    reduction, same ``ln N − S/N`` chain, round-6."""
    return f"""
WITH cnt AS (
  SELECT {group_col} AS g, w, COUNT(*)::BIGINT AS c FROM (
    SELECT {group_col},
           unnest(list_filter(string_split({text_col}, ' '), x -> x <> ''))
             AS w
    FROM ({table_sql}))
  GROUP BY 1, 2)
SELECT g AS {group_col}, SUM(c)::BIGINT AS n_tokens,
       COUNT(*)::BIGINT AS n_distinct,
       SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
       round(ln(SUM(c)::DOUBLE)
             - fsum(c::DOUBLE * ln(c::DOUBLE)) / SUM(c)::DOUBLE, 6)
         AS entropy
FROM cnt GROUP BY 1"""


def token_kl_matrix(df, text_col: str = "text", group_col: str = "source",
                    alpha: float = 0.5):
    """Pairwise KL divergence between the groups' token distributions —
    the mixture-diagnostics companion to :func:`token_entropy_stats`
    (which source is drifting, which pair is redundant): for every group
    pair (a < b), ``KL(a||b) = Σ_V p_a ln(p_a/p_b)`` and the reverse, with
    add-``alpha`` smoothing over the GLOBAL vocabulary ``V`` so both
    distributions have full support:
    ``p_g(w) = (c_gw + alpha) / (N_g + alpha·|V|)``.

    Shape: one vocab-scale count exchange (map-side combined), then a
    dense (vocab x groups) frame joins itself on the word — |V|·S²/2
    pair-word rows, fine for the handful of sources a corpus mixes (at
    very large S restrict to selected pairs). Totals and |V| ride in as
    lazy broadcast 1-row crossJoins. Both directed sums ride ddsum states
    (== the oracle's fsum to the ulp); ``ln`` is one vectorized numpy
    pass over the pair-word rows (numpy-libm == DuckDB-libm). Returns
    (group_a, group_b, kl_ab, kl_ba, jsd) round-6, pairs a < b — ``jsd``
    is the Jensen-Shannon divergence ``0.5·KL(a||m) + 0.5·KL(b||m)`` with
    ``m = 0.5·(p_a + p_b)``: symmetric, bounded by ln 2, the form a
    mixture pipeline thresholds on.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.aggregates import ddsum_agg_col
    from ..functions.estimates import ddsum_col

    if not 0.0 < alpha:
        raise ValueError("alpha must be > 0 (zero breaks full support)")

    @pandas_udf("double")
    def _ln(x):
        return pd.Series(np.log(x.to_numpy(dtype=np.float64)))

    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    tok = df.select(F.col(group_col).alias("g"), F.explode(words).alias("w"))
    counts = tok.groupBy("g", "w").agg(F.count(F.lit(1)).alias("c"))
    totals = tok.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    vsize = counts.select("w").distinct().agg(
        F.count(F.lit(1)).alias("v"))
    dense = (counts.select("w").distinct()
             .crossJoin(totals)  # (w, g, n) for every group x word
             .join(counts, ["g", "w"], "left")
             .select("g", "w", "n",
                     F.coalesce("c", F.lit(0)).alias("c"))
             .crossJoin(F.broadcast(vsize)))
    p = ((F.col("c").cast("double") + F.lit(float(alpha)))
         / (F.col("n").cast("double")
            + F.lit(float(alpha)) * F.col("v").cast("double")))
    side = dense.select("g", "w", p.alias("p"))
    a = side.select(F.col("g").alias("ga"), "w", F.col("p").alias("pa"))
    b = side.select(F.col("g").alias("gb"), "w", F.col("p").alias("pb"))
    mid = F.lit(0.5) * (F.col("pa") + F.col("pb"))
    pairs = (a.join(b, "w").where(F.col("ga") < F.col("gb"))
             .withColumn("t_ab", F.col("pa") * _ln(F.col("pa")
                                                   / F.col("pb")))
             .withColumn("t_ba", F.col("pb") * _ln(F.col("pb")
                                                   / F.col("pa")))
             .withColumn("t_am", F.col("pa") * _ln(F.col("pa") / mid))
             .withColumn("t_bm", F.col("pb") * _ln(F.col("pb") / mid)))
    agg = (pairs.groupBy("ga", "gb")
           .agg(ddsum_agg_col("t_ab").alias("_da"),
                ddsum_agg_col("t_ba").alias("_db"),
                ddsum_agg_col("t_am").alias("_dam"),
                ddsum_agg_col("t_bm").alias("_dbm")))
    jsd = (F.lit(0.5) * ddsum_col("_dam")
           + F.lit(0.5) * ddsum_col("_dbm"))
    return (agg.select(F.col("ga").alias("group_a"),
                       F.col("gb").alias("group_b"),
                       F.round(ddsum_col("_da"), 6).alias("kl_ab"),
                       F.round(ddsum_col("_db"), 6).alias("kl_ba"),
                       F.round(jsd, 6).alias("jsd")))


def token_kl_matrix_sql(table_sql: str, text_col: str = "text",
                        group_col: str = "source",
                        alpha: float = 0.5) -> str:
    """DuckDB twin of :func:`token_kl_matrix`: same smoothing chain over
    the same dense vocab x groups frame, fsum for the ddsum reductions,
    same ln, round-6."""
    return f"""
WITH tok AS (
  SELECT {group_col} AS g,
         unnest(list_filter(string_split({text_col}, ' '), x -> x <> ''))
           AS w
  FROM ({table_sql})),
cnt AS (SELECT g, w, COUNT(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT g, COUNT(*)::BIGINT AS n FROM tok GROUP BY 1),
vs AS (SELECT COUNT(DISTINCT w)::BIGINT AS v FROM cnt),
dense AS (
  SELECT t.g, vv.w, t.n, COALESCE(c.c, 0)::BIGINT AS c, (SELECT v FROM vs) AS v
  FROM (SELECT DISTINCT w FROM cnt) vv
  CROSS JOIN tot t
  LEFT JOIN cnt c ON c.g = t.g AND c.w = vv.w),
side AS (
  SELECT g, w,
         (c::DOUBLE + {alpha!r}::DOUBLE)
           / (n::DOUBLE + {alpha!r}::DOUBLE * v::DOUBLE) AS p
  FROM dense),
pairs AS (
  SELECT a.g AS ga, b.g AS gb,
         a.p * ln(a.p / b.p) AS t_ab,
         b.p * ln(b.p / a.p) AS t_ba,
         a.p * ln(a.p / (0.5::DOUBLE * (a.p + b.p))) AS t_am,
         b.p * ln(b.p / (0.5::DOUBLE * (a.p + b.p))) AS t_bm
  FROM side a JOIN side b ON a.w = b.w AND a.g < b.g)
SELECT ga AS group_a, gb AS group_b,
       round(fsum(t_ab), 6) AS kl_ab,
       round(fsum(t_ba), 6) AS kl_ba,
       round(0.5::DOUBLE * fsum(t_am) + 0.5::DOUBLE * fsum(t_bm), 6) AS jsd
FROM pairs GROUP BY 1, 2"""


def pmi_collocations_sql(table_sql: str, text_col: str = "text",
                         min_count: int = 2, top_k: int = 100) -> str:
    """DuckDB twin of :func:`pmi_collocations`: same filtered word split,
    same adjacent pairs, same left-associated ratio chain (identical
    float64 bits, so the top-k cut agrees), same md5-hex tie-breaks, same
    ``ln`` (DuckDB libm == numpy) rounded to 6."""
    return f"""
WITH w AS (
  SELECT list_filter(string_split({text_col}, ' '), x -> x <> '') AS ws
  FROM ({table_sql})),
uni AS (
  SELECT w, COUNT(*)::BIGINT AS c
  FROM (SELECT unnest(ws) AS w FROM w) GROUP BY 1),
bi AS (
  SELECT w1, w2, COUNT(*)::BIGINT AS c_xy FROM (
    SELECT ws[pos] AS w1, ws[pos + 1] AS w2
    FROM (SELECT ws, unnest(range(1, len(ws))) AS pos
          FROM w WHERE len(ws) >= 2))
  GROUP BY 1, 2),
tot AS (
  SELECT (SELECT SUM(c) FROM uni)::BIGINT AS n_uni,
         (SELECT SUM(c_xy) FROM bi)::BIGINT AS n_bi),
cand AS (
  SELECT b.w1, b.w2, b.c_xy, u1.c AS c_w1, u2.c AS c_w2,
         ((((b.c_xy::DOUBLE * t.n_uni::DOUBLE) * t.n_uni::DOUBLE)
           / t.n_bi::DOUBLE) / u1.c::DOUBLE) / u2.c::DOUBLE AS ratio
  FROM bi b
  JOIN uni u1 ON b.w1 = u1.w
  JOIN uni u2 ON b.w2 = u2.w
  CROSS JOIN tot t
  WHERE b.c_xy >= {min_count})
SELECT w1, w2, c_xy, c_w1, c_w2, round(ln(ratio), 6) AS pmi
FROM (SELECT * FROM cand
      ORDER BY ratio DESC, md5(w1) ASC, md5(w2) ASC LIMIT {top_k})"""


def tfidf_top_terms(df, text_col: str = "text", id_col: str = "doc_id",
                    group_col: str = "source", k: int = 5):
    """Top-``k`` characteristic terms per group by smoothed TF-IDF — the
    keyword-extraction staple of corpus curation (what does this source
    talk about that the corpus at large does not):

        score(g, w) = tf(g, w) * (ln((N + 1) / (df(w) + 1)) + 1)

    with ``tf`` = occurrences of ``w`` in group ``g``, ``df`` = distinct
    docs corpus-wide containing ``w``, ``N`` = distinct docs (the
    sklearn-style smooth idf: never zero, no div-by-zero on corpus-wide
    terms).

    Exactness/scale shape: the word explode feeds TWO map-side-combined
    aggregates sharing one persisted token frame — (group, term) tf rows
    and per-term df rows — both vocab-scale exchanges (the corpus
    word-count class, same as :func:`token_freq_spectrum`). idf values
    are computed NUMPY-SIDE (the established lm-scores discipline:
    numpy's libm == DuckDB's, asserted by the lm gates) INLINE in a
    ``mapInPandas`` stage over the joined (tf, df) rows — a narrow
    per-row function of ``df``, so there is no idf lookup table at all:
    no driver transit, no broadcast, no extra exchange, at any vocab
    size. The final multiply+round stays Spark-side (``F.round``), the
    same HALF_UP arithmetic the DuckDB twin's ``round()`` matches, so
    both engines rank identical round-6 doubles.
    Ranking is the salt-split bounded min-K (similarity._bounded_topk) —
    NO per-group window, so a group whose vocabulary is half the corpus
    ranks across n_salts reducers, not one task. Ties (equal rounded
    score) break by term ascending; term ordering assumes ASCII-ish
    terms (Spark UTF-16 vs DuckDB UTF-8 collation diverges beyond the
    BMP — the remove_dup_spans caveat).

    Returns (group, rank, term, tf, df, score) rows, rank 1..k."""
    import numpy as np
    import pandas as pd

    from .similarity import _bounded_topk

    spark = df.sparkSession
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    tok = (df.where(F.col(text_col).isNotNull())
           .select(F.col(group_col).alias("g"), F.col(id_col).alias("_id"),
                   F.explode(words).alias("w"))
           .persist())
    tf = tok.groupBy("g", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("w").agg(F.countDistinct("_id").alias("df"))
    n_docs = tok.select("_id").distinct().count()
    if n_docs == 0:  # empty/whitespace-only corpus: typed empty out
        tok.unpersist()
        return spark.createDataFrame(
            [], f"{group_col} string, rank long, term string, tf long, "
                f"df long, score double")

    def _idf_rows(batches):
        # numpy ln per row, executor-side in Arrow batches — idf is a
        # pure function of df, so no lookup table exists anywhere
        # (worst-case distinct-df cardinality is O(min(|vocab|,
        # n_docs)) — at 10^9 docs a broadcast table would be millions
        # of rows through the driver JVM)
        for pdf in batches:
            d = pdf["df"].to_numpy(np.int64)
            out = pdf.copy()
            out["idf"] = (np.log((n_docs + 1.0)
                                 / (d.astype(np.float64) + 1.0)) + 1.0)
            yield out

    from pyspark.sql.types import DoubleType, StructField, StructType

    joined = tf.join(dfreq, "w").select("g", "w", "tf", "df")
    # fresh StructType: .add() would mutate the DataFrame's cached schema
    idf_schema = StructType(joined.schema.fields
                            + [StructField("idf", DoubleType())])
    scored = (joined
              .mapInPandas(_idf_rows, idf_schema)
              .select("g", "w", "tf", "df",
                      F.round(F.col("tf") * F.col("idf"), 6)
                      .alias("score"))
              .withColumn("_neg", -F.col("score")))
    top = _bounded_topk(scored.select("g", "w", "_neg"),
                        "g", "w", "_neg", k)
    out = (top.join(scored.select("g", "w", "tf", "df", "score"),
                    ["g", "w"])
           .select(F.col("g").alias(group_col),
                   F.col("rank").cast("long").alias("rank"),
                   F.col("w").alias("term"),
                   F.col("tf").cast("long").alias("tf"),
                   F.col("df").cast("long").alias("df"), "score"))
    # <= groups*k rows: materialize eagerly (localCheckpoint truncates the
    # plan) so the token-frame cache releases here, not on session GC
    out = out.localCheckpoint()
    tok.unpersist()
    return out


def tfidf_top_terms_sql(table_sql: str, text_col: str = "text",
                        id_col: str = "doc_id", group_col: str = "source",
                        k: int = 5) -> str:
    """DuckDB twin of :func:`tfidf_top_terms`: same explode/filter, same
    smooth idf (DuckDB ln == numpy, the lm-gate-asserted parity), same
    round-6 score and the (score DESC, term ASC) rank rule the salt-split
    min-K realizes."""
    return f"""
WITH tok AS (
  SELECT {group_col} AS g, {id_col} AS id, unnest(
           list_filter(string_split({text_col}, ' '), x -> x <> '')) AS w
  FROM ({table_sql}) WHERE {text_col} IS NOT NULL),
tf AS (SELECT g, w, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT w, COUNT(DISTINCT id)::BIGINT AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(DISTINCT id)::BIGINT AS n_docs FROM tok),
scored AS (
  SELECT g, w, tf, df,
         round(tf::DOUBLE * (ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE)
                             + 1.0), 6) AS score
  FROM tf JOIN dfq USING (w) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY g
                               ORDER BY score DESC, w ASC) AS rank
  FROM scored)
SELECT g AS {group_col}, rank::BIGINT AS rank, w AS term, tf, df, score
FROM ranked WHERE rank <= {k}"""
