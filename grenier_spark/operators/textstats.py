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
