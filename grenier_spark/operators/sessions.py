"""Sessionization: split per-user event streams on inactivity gaps.

A core training-data / clickstream operator the reference lacks (grenier has
no relational layer); expressed entirely with window functions so Catalyst
plans it as one sort-based window per user partition — a single shuffle on
the user key, no Python. Gaps compare as day-time INTERVALs (``ts - lag(ts)``), which is
exact and timezone-free for both TIMESTAMP and TIMESTAMP_NTZ columns and
matches DuckDB ``epoch_us`` differences microsecond-for-microsecond.

At 100 TB: the shuffle partitions by ``user_col`` (naturally high
cardinality -> even spread); a skewed power user inflates one partition's
sort only — mitigate with AQE skew-join handling or pre-bucketing the event
table by user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", tiebreak_col: str = "event_id",
               gap_us: int = 21_600_000_000) -> DataFrame:
    """Append a per-user ``session_id`` (1-based): a new session starts at
    the first event and whenever the gap since the previous event exceeds
    ``gap_us`` microseconds (default 6 h)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    t = F.col(ts_col)
    prev = F.lag(t).over(w)
    gap = F.expr(f"INTERVAL {gap_us} MICROSECOND")
    new_s = F.when(prev.isNull() | ((t - prev) > gap), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(new_s).over(run))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", tiebreak_col: str = "event_id",
                  gap_us: int = 21_600_000_000) -> DataFrame:
    """Per-user session summary: (user, n_sessions, n_events,
    max_session_events)."""
    s = sessionize(events, user_col, ts_col, tiebreak_col, gap_us)
    per_sess = (s.groupBy(user_col, "session_id")
                .agg(F.count(F.lit(1)).alias("sess_events")))
    return (per_sess.groupBy(user_col)
            .agg(F.max("session_id").alias("n_sessions"),
                 F.sum("sess_events").alias("n_events"),
                 F.max("sess_events").alias("max_session_events")))
