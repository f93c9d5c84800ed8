"""Streaming exact deduplication: first-occurrence-wins on content hash.

The streaming complement of ``operators.dedup.exact_dup_members``: a
document stream (crawl ingest) where every byte-identical re-crawl must be
dropped at ingest time rather than in a later batch pass.

Two regimes, both pure engine machinery (the state store does the work —
no custom stateful UDF needed, so the operator inherits exactly-once and
checkpoint/restart semantics from Structured Streaming itself):

* **watermarked** (the 100 TB path): ``withWatermark(ts, delay)`` +
  ``dropDuplicatesWithinWatermark([content_hash])``. A re-crawl arriving
  within ``delay`` of the original's event time is dropped; state for a
  hash is PURGED once the watermark passes it, so state size is bounded by
  the duplicate-arrival horizon (docs per ``delay`` window), not by stream
  length. A re-occurrence after purge re-emits — the standard
  bounded-state trade (an offline :func:`..operators.dedup.exact_dup_members`
  pass over the sink catches the long tail).
* **global** (calibration / bounded streams): ``dropDuplicates`` keyed on
  the hash — exact forever, state grows with distinct hashes (16-byte key
  + row marker per distinct doc; fine at test scale, document before using
  on an unbounded crawl).

State is keyed on md5(text) only — 16 bytes per distinct doc regardless of
document size, and the shuffle that routes rows to state partitions moves
(hash, id, ts) projections, never token-scale payloads, when the caller
selects output columns downstream of the dedup (Catalyst prunes through
dropDuplicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 ts_col: "str | None" = None,
                 delay: str = "10 minutes") -> DataFrame:
    """First document per md5 content hash passes; later identical bytes
    are dropped. ``ts_col`` selects the watermarked bounded-state regime
    (see module docstring); ``None`` the exact global one."""
    out = stream_df.withColumn("content_hash", F.md5(F.col(text_col)))
    if ts_col is None:
        return out.dropDuplicates(["content_hash"])
    return (out.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(["content_hash"]))
