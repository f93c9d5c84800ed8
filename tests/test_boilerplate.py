"""Boilerplate segment detection/removal (operators/boilerplate.py)."""

import pytest
from pyspark.sql import functions as F

from grenier_spark.operators import boilerplate as B

BANNER = "one two three four five six seven eight"  # exactly 8 words


def test_segment_rows_ragged_tail(spark):
    """11 words at width 8 -> segments of 8 and 3 words; empty text is one
    '' segment; NULL text drops at the explode."""
    df = spark.createDataFrame(
        [(1, "g", "a b c d e f g h i j k"), (2, "g", ""), (3, "g", None)],
        "doc_id long, source string, text string")
    got = (B.segment_rows(df, width=8).orderBy("id", "seg_idx")
           .collect())
    assert [(r.id, r.seg_idx, r.seg) for r in got] == [
        (1, 0, "a b c d e f g h"), (1, 1, "i j k"), (2, 0, "")]


def test_doc_frequency_not_occurrence_count(spark):
    """One doc repeating its own chorus 5x must NOT promote it; the same
    segment across 3 distinct docs must."""
    chorus = BANNER
    df = spark.createDataFrame(
        [(1, "g", " ".join([chorus] * 5)),
         (2, "g", chorus + " unrelated tail words here"),
         (3, "g", chorus + " other tail"),
         (4, "g", "totally different content words")],
        "doc_id long, source string, text string")
    rep = B.boilerplate_segments(df, width=8, min_df=3).collect()
    assert [(r.seg, r.df) for r in rep] == [(chorus, 3)]
    # min_df=4 excludes it (df counts DOCS: 3, not instances: 7)
    assert B.boilerplate_segments(df, width=8, min_df=4).count() == 0


def test_remove_boilerplate_reassembly(spark):
    """Cleaned text preserves original segment order; a 100%-boilerplate
    doc comes back as '' (one row per input doc, none dropped); groups are
    independent (same segment in another group survives)."""
    df = spark.createDataFrame(
        [(1, "g", BANNER + " keep me here ok"),
         (2, "g", "keep this " + " ".join(["pad"] * 6) + " " + BANNER),
         (3, "g", BANNER),
         (4, "h", BANNER + " solo in group h")],
        "doc_id long, source string, text string")
    boiler = B.boilerplate_segments(df, width=8, min_df=3)
    assert [(r.grp, r.seg) for r in boiler.collect()] == [("g", BANNER)]
    clean = {r.id: (r.n_segs, r.n_boiler, r.clean_text)
             for r in B.remove_boilerplate(df, boiler, width=8).collect()}
    assert clean[1] == (2, 1, "keep me here ok")
    assert clean[2] == (2, 1, "keep this pad pad pad pad pad pad")
    assert clean[3] == (1, 1, "")
    # group h never crossed min_df -> doc 4 untouched
    assert clean[4] == (2, 0, BANNER + " solo in group h")


def test_boilerplate_join_is_broadcast(spark):
    """The removal join must probe a broadcast boilerplate set — a
    sort-merge exchange of the segment stream is the 100-TB anti-pattern."""
    df = spark.createDataFrame(
        [(i, "g", BANNER + f" body {i} words") for i in range(6)],
        "doc_id long, source string, text string")
    boiler = B.boilerplate_segments(df, width=8, min_df=3)
    plan = (B.remove_boilerplate(df, boiler, width=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_null_group_boilerplate_is_removed(spark):
    """A NULL group (missing source/domain — common in web corpora) is a
    real group to the detector's groupBy, so removal must strip its
    boilerplate too: a plain equi-join would report it but never match."""
    df = spark.createDataFrame(
        [(i, None, BANNER + f" tail {i} of doc") for i in range(3)]
        + [(9, "g", "no banner here at all friend")],
        "doc_id long, source string, text string")
    boiler = B.boilerplate_segments(df, width=8, min_df=3)
    rep = boiler.collect()
    assert len(rep) == 1 and rep[0].grp is None and rep[0].df == 3
    clean = {r.id: (r.n_boiler, r.clean_text)
             for r in B.remove_boilerplate(df, boiler, width=8).collect()}
    for i in range(3):
        assert clean[i][0] == 1 and BANNER not in clean[i][1]
    assert clean[9] == (0, "no banner here at all friend")


def test_null_text_emits_no_segments_in_any_ansi_mode(spark):
    """With ansi=false, size(NULL) = -1 makes sequence(0, -2) infer a
    negative step and emit phantom '' segments for NULL text — the guard
    must drop NULL-text docs identically in both modes (they'd otherwise
    inflate df('') and diverge from the DuckDB oracle)."""
    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", "two words")],
        "doc_id long, source string, text string")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for mode in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            rows = B.segment_rows(df, width=8).collect()
            assert [(r.id, r.seg_idx, r.seg) for r in rows] == \
                [(2, 0, "two words")], mode
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
