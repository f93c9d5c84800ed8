"""Corpus version diff: what changed between two versions of a corpus.

The dataset-ops query a training pipeline runs on every refresh: how many
documents were ADDED, REMOVED, and kept (by CONTENT — an edited document
counts as one remove + one add), how the token volume moved, and how much
NEW vocabulary the refresh introduced (a theta-sketch `A \\ B` estimate —
core/kmv.py ``a_not_b`` — because the exact distinct-diff needs a
vocabulary-scale shuffle the dashboard query shouldn't pay).

Scale shape: content hashes are computed in the SCAN stage (md5 of the
text column — the same hash the exact-dedup family uses), the diff
aggregates hash-grouped KB rows per (group, hash), and the vocabulary
estimate rides the standard two-level KMV build — raw text never
shuffles. Multiset semantics: per (group, content-hash) with old count o
and new count n, added = sum(max(n-o, 0)), removed = sum(max(o-n, 0)),
common = sum(min(o, n)), so duplicate documents inside one version are
counted faithfully rather than collapsed.

Reference analog: grenier has no version diff; this composes the suite's
exact-dedup content hashing with the KMV theta algebra (SURVEY.md §2.3
X6). The whole output is value-exact in SQL (the KMV difference estimate
included — sql_oracles.kmv_diff_sql), so the gate carries a full oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corpus_doc_diff"]


def corpus_doc_diff(old_docs: DataFrame, new_docs: DataFrame,
                    group_cols: Sequence[str] = ("source",),
                    text_col: str = "text") -> DataFrame:
    """Per-group content-level document diff between two corpus versions.

    Returns one row per group:
    ``group_cols + [n_docs_added, n_docs_removed, n_docs_common,
    wc_old, wc_new]`` — doc counts by md5-content multiset diff, word
    counts by whitespace split (``string_split`` semantics, empty tokens
    included, matching the DuckDB twin exactly)."""
    g = list(group_cols)

    def hashed(df, cnt_name):
        return (df.groupBy(*g, F.md5(text_col).alias("_h"))
                .agg(F.count(F.lit(1)).alias(cnt_name)))

    j = (hashed(old_docs, "_oc")
         .join(hashed(new_docs, "_nc"), g + ["_h"], "full")
         .fillna(0, subset=["_oc", "_nc"]))
    diff = j.groupBy(*g).agg(
        F.sum(F.greatest(F.col("_nc") - F.col("_oc"), F.lit(0)))
        .cast("long").alias("n_docs_added"),
        F.sum(F.greatest(F.col("_oc") - F.col("_nc"), F.lit(0)))
        .cast("long").alias("n_docs_removed"),
        F.sum(F.least(F.col("_oc"), F.col("_nc")))
        .cast("long").alias("n_docs_common"))

    def wc(df, name):
        return (df.groupBy(*g)
                .agg(F.sum(F.size(F.split(text_col, " ")))
                     .cast("long").alias(name)))

    # outer joins: a group present in only ONE version (fully added or
    # fully removed source) must still get a report row — its word count
    # on the absent side is 0, not a dropped row
    return (diff.join(wc(old_docs, "wc_old"), g, "left")
            .join(wc(new_docs, "wc_new"), g, "left")
            .fillna(0, subset=["wc_old", "wc_new"]))
