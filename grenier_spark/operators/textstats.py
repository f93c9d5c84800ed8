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
