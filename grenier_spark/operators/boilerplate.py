"""Corpus-frequency boilerplate detection and removal (CCNet-style).

Web corpora carry repeated furniture — cookie banners, navigation strips,
subscribe prompts — that exact- and near-dup passes do not touch because it
is embedded inside otherwise-distinct documents. The standard pipeline move
(CCNet, Wenzek et al. 2020; RefinedWeb, Penedo et al. 2023 both dedup at
paragraph granularity) is: segment every document, count each segment's
document frequency within its group (source/domain), and strip segments
whose frequency crosses a threshold.

Documents here are single-line word streams, so the segment unit is a
fixed-width window of ``width`` whitespace words (non-overlapping, last
segment ragged) instead of a newline-delimited paragraph — the same
machinery applies verbatim to lines when the corpus has them.

Scale shape (the 100 TB contract):
* segmentation is a narrow scan-stage projection (split + slice, all JVM);
* the ONLY shuffle keyed on segment text is the doc-frequency groupBy —
  token-scale/width rows in, map-side partial aggregation on, KB..MB-scale
  boilerplate set out (a segment must repeat across >= min_df docs to
  survive, so the result is bounded by n_segment_instances / min_df);
* removal re-joins that small set back against the segment stream — declare
  it broadcastable (we do) and the join is a scan-stage hash probe, never a
  sort-merge exchange of the corpus;
* text is reassembled per doc from its own segments (collect bounded by the
  doc's own length — the same per-doc bound every doc-local op here has).

Deterministic end to end: segmentation arithmetic is integer-exact, the
frequency threshold is an integer compare, and reassembly orders by segment
index — both engines rebuild byte-identical cleaned text (gated by md5 in
the ``boilerplate_clean_docs`` oracle query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_col(text: "F.Column | str", width: int = 8) -> F.Column:
    """Array of non-overlapping ``width``-word segments of ``text``.

    Integer-exact: segment i covers words [i*width+1, (i+1)*width] (1-based,
    ``slice`` clamps the ragged tail). Empty text yields one '' segment;
    NULL text yields NULL (rows drop at the explode — the NULL-keep
    contract the dedup paths follow). DuckDB twin:
    ``list_slice(string_split(text,' '), i*width+1, (i+1)*width)`` over
    ``unnest(range((len(w)+width-1)//width))``.
    """
    c = F.col(text) if isinstance(text, str) else text
    w = F.split(c, " ")
    n_seg = F.floor((F.size(w) + (width - 1)) / width).cast("int")
    # explicit NULL guard instead of relying on NULL propagation: with
    # spark.sql.ansi.enabled=false, size(NULL) = -1 -> sequence(0, -2)
    # infers a NEGATIVE step and emits phantom '' segments for NULL text,
    # which would inflate df('') and diverge from the DuckDB oracle
    return F.when(c.isNotNull(), F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * width + 1, width))))


def segment_rows(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", group_col: str = "source",
                 width: int = 8) -> DataFrame:
    """One row per (doc, segment index): (id, group, seg_idx, seg)."""
    return df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp"),
        F.posexplode(segment_col(F.col(text_col), width))
        .alias("seg_idx", "seg"))


def boilerplate_segments(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", group_col: str = "source",
                         width: int = 8, min_df: int = 5) -> DataFrame:
    """Segments appearing in >= ``min_df`` DISTINCT docs of the same group.

    Returns (grp, seg, df) — the boilerplate set. Document frequency (not
    occurrence count) so a single doc repeating its own chorus never
    promotes it to boilerplate; cross-doc repetition does.
    """
    segs = segment_rows(df, text_col, id_col, group_col, width)
    return (segs.groupBy("grp", "seg")
            .agg(F.countDistinct("id").alias("df"))
            .where(F.col("df") >= min_df))


def remove_boilerplate(df: DataFrame, boiler: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       group_col: str = "source",
                       width: int = 8) -> DataFrame:
    """Strip boilerplate segments; returns per-doc
    (id, grp, n_segs, n_boiler, clean_text).

    ``boiler`` is the (grp, seg, ...) set from :func:`boilerplate_segments`
    — pass a PERSISTED frame in a real run (it is derived from the same
    scan; unpersisted, Spark replays the segmentation once per consumer).
    The join side is broadcast: the boilerplate set is bounded by
    n_segment_instances / min_df, KB..MB at any corpus size that chose a
    sane min_df. Every non-NULL-text input doc yields exactly one output
    row (NULL-text docs drop at the segment explode — the same NULL-drop
    contract as the dedup paths); a doc that is 100% boilerplate comes
    back with clean_text = '' (caller decides whether to drop empties —
    that is a quality-filter policy, not dedup).
    """
    segs = segment_rows(df, text_col, id_col, group_col, width)
    b = F.broadcast(boiler.select(F.col("grp").alias("_bgrp"),
                                  F.col("seg").alias("_bseg"),
                                  F.lit(True).alias("_is_boiler")))
    # null-SAFE group match: a NULL group (missing source/domain) is a
    # real group to boilerplate_segments' groupBy, so removal must match
    # it too — a plain equi-join would report its boilerplate but never
    # strip it (DuckDB twin: grp IS NOT DISTINCT FROM _bgrp)
    marked = (segs.join(b, F.col("grp").eqNullSafe(F.col("_bgrp"))
                        & (F.col("seg") == F.col("_bseg")), "left")
              .drop("_bgrp", "_bseg"))
    keep = F.when(F.col("_is_boiler").isNull(),
                  F.struct("seg_idx", "seg"))
    return (marked.groupBy("id", "grp")
            .agg(F.count(F.lit(1)).alias("n_segs"),
                 F.count("_is_boiler").alias("n_boiler"),
                 # collect_list skips the NULLs the `keep` CASE emits for
                 # boilerplate rows; array_sort on (seg_idx, seg) structs
                 # orders by seg_idx (unique per doc) -> original order
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(keep)),
                                 lambda s: s["seg"]),
                     " ").alias("clean_text")))


def segment_rows_sql(table_sql: str, text_col: str = "text",
                     id_col: str = "doc_id", group_col: str = "source",
                     width: int = 8) -> str:
    """DuckDB twin of :func:`segment_rows` (same 1-based clamped slices)."""
    return f"""
ws AS (SELECT {id_col} AS id, {group_col} AS grp,
              string_split({text_col}, ' ') AS w
       FROM ({table_sql})),
idx AS (SELECT id, grp, w,
               unnest(range((len(w) + {width - 1}) // {width})) AS i
        FROM ws),
segs AS (SELECT id, grp, i AS seg_idx,
                array_to_string(
                    list_slice(w, i * {width} + 1, (i + 1) * {width}),
                    ' ') AS seg
         FROM idx)"""
