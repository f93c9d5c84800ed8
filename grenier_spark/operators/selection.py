"""Targeted data selection for LLM training corpora.

DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): score every RAW document by how much more likely its hashed
unigram features are under a small TARGET corpus (the domain you want
more of: wiki-quality text, a curated sample) than under the raw corpus
itself, then keep the highest-weighted documents. The per-document log
importance weight is

    log w(x) = sum over words of  lambda[b(word)]
    lambda[b] = ln p_target[b] - ln q_raw[b]

over ``n_buckets`` hashed feature buckets with add-``smoothing``
estimates p[b] = (c[b] + a) / (N + a*B). The paper's hashed n-gram
generative model, with the bigram half dropped (the unigram half is the
dominant term and keeps the oracle exactly recomputable; the bigram
extension is the same chain over ``textstats.bigram_lm_scores``-style
word pairs).

Cross-engine contract (same discipline as ``textstats.unigram_lm_scores``):
bucket ids ride the md5-low64 chain masked to a power-of-two ``B`` (two's
complement AND == unsigned mod, DuckDB twin ``md5_low64 % B``); bucket
counts are exact integers on both engines; the B lambda literals are
computed by numpy ``ln`` on the driver (numpy libm == DuckDB libm — no
JVM ``ln`` anywhere); per-doc sums are round-6 doubles.

Scale shape at 100 TB: the target corpus is small by construction (one
bounded scan -> B-row count vector); the raw corpus pays one count scan
(vocab-scale exchange is B rows after map-side combine — B, not vocab!)
and one scoring scan whose doc-level aggregation absorbs the token
fan-out map-side; lambda is a B-row broadcast. Selection is a
distributed TakeOrdered (per-partition top-k), never a global sort. The
resampling variant (Gumbel-top-k == weighted sampling without
replacement on w = exp(log w)) composes with ``splits.priority_sample``
at the caller's choice; the deterministic top-k here is the paper's
"top-k" ablation and the oracle-checkable surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_low64_col
from ..functions.sql_oracles import md5_low64_expr


def _require_pow2(n_buckets: int) -> None:
    # two's-complement AND (Spark, signed) == unsigned mod (DuckDB) ONLY
    # when B divides 2^64 — i.e. B is a power of two
    if n_buckets < 2 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(f"n_buckets must be a power of two >= 2, "
                         f"got {n_buckets}")


def _word_buckets(df: DataFrame, text_col: str, n_buckets: int,
                  id_cols: "list[str]") -> DataFrame:
    """One row per word occurrence: (*id_cols, b) with b = md5-low64 of
    the word masked to ``n_buckets`` (empty tokens dropped, NULL text
    yields no rows — both matching the DuckDB twin)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    return (df.select(*id_cols, F.explode(words).alias("_w"))
            .select(*id_cols,
                    md5_low64_col("_w").bitwiseAND(n_buckets - 1)
                    .cast("int").alias("b")))


def _bucket_log_probs(tok: DataFrame, n_buckets: int,
                      smoothing: float) -> np.ndarray:
    """ln p[b] over all B buckets from a (b,)-rows frame: exact integer
    counts collected (B rows, bounded), add-``smoothing`` in float64."""
    counts = tok.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    c = np.zeros(n_buckets, dtype=np.float64)
    for row in counts:
        c[row["b"]] = row["c"]
    n = c.sum()
    return np.log((c + smoothing) / (n + smoothing * n_buckets))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    n_buckets: int = 256, text_col: str = "text",
                    id_col: str = "doc_id",
                    smoothing: float = 1.0) -> DataFrame:
    """Per-document DSIR log importance weights of ``raw`` toward
    ``target``: (``id_col``, n_words, dsir_logw round-6). Zero-word and
    NULL-text docs produce no row (no feature evidence — same drop as
    ``unigram_lm_scores``). DuckDB twin: :func:`dsir_sql`."""
    _require_pow2(n_buckets)
    lam = (_bucket_log_probs(
               _word_buckets(target, text_col, n_buckets, []),
               n_buckets, smoothing)
           - _bucket_log_probs(
               _word_buckets(raw, text_col, n_buckets, []),
               n_buckets, smoothing))
    spark = raw.sparkSession
    lam_df = F.broadcast(spark.createDataFrame(
        [(int(b), float(lam[b])) for b in range(n_buckets)],
        "b int, lam double"))
    tok = _word_buckets(raw, text_col, n_buckets, [id_col])
    return (tok.join(lam_df, "b")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.round(F.sum("lam"), 6).alias("dsir_logw")))


def dsir_select_topk(scores: DataFrame, k: int,
                     id_col: str = "doc_id") -> DataFrame:
    """Adds ``selected``: True for the ``k`` highest ``dsir_logw`` docs
    (round-6 value desc, ties by id asc — deterministic cross-engine).
    Distributed TakeOrdered (orderBy.limit -> per-partition top-k), then
    a k-row broadcast membership join — no global sort, no window over
    the full corpus."""
    if k < 1:
        raise ValueError("k must be >= 1")
    top = (scores.orderBy(F.desc("dsir_logw"), F.asc(id_col)).limit(k)
           .select(F.col(id_col), F.lit(True).alias("selected")))
    return (scores.join(F.broadcast(top), id_col, "left")
            .withColumn("selected",
                        F.coalesce("selected", F.lit(False))))


def dsir_sql(raw_sql: str, target_sql: str, n_buckets: int = 256,
             text_col: str = "text", id_col: str = "doc_id",
             smoothing: float = 1.0, k: "int | None" = None) -> str:
    """DuckDB twin of :func:`dsir_logweights` (+ :func:`dsir_select_topk`
    when ``k`` is given): identical md5-low64 % B buckets, identical
    add-smoothing rationals fed to ``ln`` (DuckDB libm == the numpy libm
    that produced Spark's lambda literals), round-6 per-doc sums, same
    (logw desc, id asc) top-k rule."""
    _require_pow2(n_buckets)
    a = f"{float(smoothing)!r}::DOUBLE"
    b_expr = f"({md5_low64_expr('w')} % {n_buckets})::INT"

    def tok(src_sql: str, with_id: bool) -> str:
        idp = f"{id_col} AS id, " if with_id else ""
        return (f"SELECT {idp}{b_expr} AS b FROM (SELECT *, unnest("
                f"list_filter(string_split({text_col}, ' '), "
                f"x -> x <> '')) AS w FROM ({src_sql}))")

    sel = ""
    rank = ""
    if k is not None:
        rank = (f", row_number() OVER (ORDER BY round(SUM(lam.lam), 6) "
                f"DESC, rb.id ASC) AS _rk")
        sel = f", (_rk <= {k}) AS selected"
    return f"""
WITH rb AS ({tok(raw_sql, True)}),
tb AS ({tok(target_sql, False)}),
buckets AS (SELECT unnest(range({n_buckets}))::INT AS b),
rc AS (SELECT b, COUNT(*)::BIGINT AS c FROM rb GROUP BY b),
tc AS (SELECT b, COUNT(*)::BIGINT AS c FROM tb GROUP BY b),
rn AS (SELECT COALESCE(SUM(c), 0)::DOUBLE AS n FROM rc),
tn AS (SELECT COALESCE(SUM(c), 0)::DOUBLE AS n FROM tc),
lam AS (
  SELECT buckets.b,
         ln((COALESCE(tc.c, 0)::DOUBLE + {a}) /
            ((SELECT n FROM tn) + {a} * {n_buckets}::DOUBLE))
       - ln((COALESCE(rc.c, 0)::DOUBLE + {a}) /
            ((SELECT n FROM rn) + {a} * {n_buckets}::DOUBLE)) AS lam
  FROM buckets LEFT JOIN rc ON buckets.b = rc.b
               LEFT JOIN tc ON buckets.b = tc.b),
scored AS (
  SELECT rb.id AS {id_col}, COUNT(*)::BIGINT AS n_words,
         round(SUM(lam.lam), 6) AS dsir_logw{rank}
  FROM rb JOIN lam ON rb.b = lam.b
  GROUP BY rb.id)
SELECT {id_col}, n_words, dsir_logw{sel} FROM scored"""
