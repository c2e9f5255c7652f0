"""Sessionization (operators/events.py): hand-computed islands, the
exact-gap boundary convention, tie handling, and the agreement between
the per-event labeler (window lag) and the built-in session_window
aggregate path."""

from datetime import datetime

from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.events import session_stats, sessionize


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def test_sessionize_islands_and_boundary(spark):
    gap = 60  # seconds
    rows = [
        # user 1: 3 events tight, an EXACTLY-60s gap (merges — the
        # session_window padding bound is closed, verified against the
        # built-in), then a 61s gap (splits)
        (1, 1, _ts(0, 0)), (2, 1, _ts(0, 30)), (3, 1, _ts(0, 59)),
        (4, 1, _ts(1, 59)),
        (5, 1, _ts(3, 0)),
        # user 2: tie timestamps stay one session
        (6, 2, _ts(0, 0)), (7, 2, _ts(0, 0)), (8, 2, _ts(0, 30)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    lab = {
        r.event_id: r.session_seq
        for r in sessionize(df, gap_seconds=gap, order_cols=["event_id"]).collect()
    }
    assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 1, 7: 1, 8: 1}

    st = session_stats(df, gap_seconds=gap).collect()
    got = {(r.user_id, r.session_start, r.session_end): r.n_events for r in st}
    assert got == {
        (1, _ts(0, 0), _ts(1, 59)): 4,
        (1, _ts(3, 0), _ts(3, 0)): 1,
        (2, _ts(0, 0), _ts(0, 30)): 3,
    }


def test_sessionize_hot_user_guard(spark):
    """The labeler's per-user window sorts one user's events in ONE
    task, so a deliberately hot user must trip the loud guard (and the
    error must name the user and the escape hatches)."""
    import pytest

    rows = [(i, 1 if i < 20 else 2, _ts(0, i % 60)) for i in range(25)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    with pytest.raises(ValueError, match="max_user_events.*1=20.*session_stats"):
        sessionize(df, gap_seconds=60, max_user_events=10)
    # explicit opt-out proceeds
    assert sessionize(df, gap_seconds=60, max_user_events=None).count() == 25
    # under the threshold: no trip
    assert sessionize(df, gap_seconds=60, max_user_events=20).count() == 25


def test_sessionize_agrees_with_session_window(spark):
    """On the real events table, per-user session COUNTS from the
    labeler equal the session_window aggregate's row counts, and the
    per-session event totals reconcile."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    gap = 3600
    lab = sessionize(ev, gap_seconds=gap, order_cols=["event_id"])
    a = (
        lab.groupBy("user_id")
        .agg(F.max("session_seq").alias("n_sessions"), F.count("*").alias("n_events"))
    )
    b = (
        session_stats(ev, gap_seconds=gap)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
    )
    diff = a.join(b, "user_id", "full").filter(
        (a["n_sessions"] != b["n_sessions"]) | (a["n_events"] != b["n_events"])
    )
    assert a.count() == b.count()
    assert diff.count() == 0
