"""Event analytics: sessionization / rollups / JSON extraction against
hand-computed fixtures."""

from datetime import datetime

from pyspark.sql import functions as F

from pregel_rs_spark.operators.events import (
    extract_props_key,
    hourly_type_counts,
    session_stats,
    sessionize,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _fixture(spark):
    rows = [
        # user 1: events at 00:00, 00:10, 00:50 → sessions {1,2} (gap 40min)
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, '{"k": 1}'),
        (2, datetime(2024, 1, 1, 0, 10, 0), 1, "click", 2.0, '{"k": 2}'),
        (3, datetime(2024, 1, 1, 0, 50, 0), 1, "view", 3.0, '{"k": 3}'),
        # user 2: single event
        (4, datetime(2024, 1, 1, 2, 0, 0), 2, "error", 5.0, '{"k": 4}'),
        # user 1 again, exactly 30min after last (boundary is STRICTLY >)
        (5, datetime(2024, 1, 1, 1, 20, 0), 1, "view", 4.0, "{}"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_sessionize_gaps(spark):
    got = {
        r.event_id: r.session_seq
        for r in sessionize(_fixture(spark), gap_minutes=30).collect()
    }
    # 00:00 → s1; 00:10 (gap 10m) → s1; 00:50 (gap 40m) → s2;
    # 01:20 (gap exactly 30m, not >) → s2; user2 single → s1
    assert got == {1: 1, 2: 1, 3: 2, 5: 2, 4: 1}


def test_session_stats(spark):
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_s, r.total_value)
        for r in session_stats(_fixture(spark), gap_minutes=30).collect()
    }
    assert got[(1, 1)] == (2, 600.0, 3.0)
    assert got[(1, 2)] == (2, 1800.0, 7.0)
    assert got[(2, 1)] == (1, 0.0, 5.0)


def test_hourly_type_counts(spark):
    got = {
        (r.hour_ts, r.event_type): r.n
        for r in hourly_type_counts(_fixture(spark)).collect()
    }
    h0 = int(datetime(2024, 1, 1, 0, 0).timestamp())  # local=UTC in session
    assert sum(got.values()) == 5
    assert got[(1704067200, "view")] == 2  # 2024-01-01T00 UTC


def test_props_extract(spark):
    got = {r.event_id: r.k for r in extract_props_key(_fixture(spark)).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: None}


def test_daily_retention_exact(spark):
    """daily_retention: retained(d) counts users active on d and d-1;
    first day is honestly 0; NULL user/ts drop."""
    from datetime import datetime

    from pregel_rs_spark.operators.events import daily_retention

    def e(i, u, day, hour=3):
        return (i, datetime(2024, 1, day, hour), u, "t", 1.0, None)

    events = spark.createDataFrame(
        [e(1, 10, 1), e(2, 11, 1), e(3, 10, 2), e(4, 12, 2),
         e(5, 10, 3), e(6, 12, 3), e(7, 11, 3),
         (8, None, 10, "t", 1.0, None),
         (9, datetime(2024, 1, 3, 4), None, "t", 1.0, None)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.day - 19723: (r.actives, r.retained, r.retention_rate)
           for r in daily_retention(events).collect()}
    # 2024-01-01 is epoch day 19723
    assert out[0] == (2, 0, 0.0)          # day 1: users 10,11
    assert out[1] == (2, 1, 0.5)          # day 2: 10,12; retained {10}
    assert out[2] == (3, 2, round(2/3, 6))  # day 3: 10,12,11; retained {10,12}
