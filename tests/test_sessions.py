"""Sessionization operator: hand-built gap structure -> exact session ids."""

import datetime as dt

from grenier_spark.operators.sessions import session_stats, sessionize

H = dt.timedelta(hours=1)
T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_gap_boundaries(spark):
    """Gap strictly greater than the threshold starts a new session; an
    exactly-6h gap does NOT."""
    rows = [
        (1, 1, T0), (2, 1, T0 + 6 * H),           # exactly 6h -> same session
        (3, 1, T0 + 12 * H + dt.timedelta(microseconds=1)),  # >6h -> new
        (4, 2, T0),                                # other user independent
    ]
    got = {r.event_id: r.session_id
           for r in sessionize(_events(spark, rows)).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats(spark):
    rows = [(1, 1, T0), (2, 1, T0 + 1 * H), (3, 1, T0 + 20 * H),
            (4, 1, T0 + 21 * H), (5, 1, T0 + 22 * H), (6, 2, T0)]
    got = {r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
           for r in session_stats(_events(spark, rows)).collect()}
    assert got == {1: (2, 5, 3), 2: (1, 1, 1)}


def test_sessionize_tiebreak_on_equal_ts(spark):
    """Equal timestamps order by event_id deterministically."""
    rows = [(2, 1, T0), (1, 1, T0), (3, 1, T0 + 7 * H)]
    got = {r.event_id: r.session_id
           for r in sessionize(_events(spark, rows)).collect()}
    assert got == {1: 1, 2: 1, 3: 2}
