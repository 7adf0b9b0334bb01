"""e8 interval-join boundary semantics on a synthetic events table.

The oracle gate (test_correctness) proves the bucketed rewrite equals
the inequality join on corpus data; here the edge cases are pinned
explicitly: events exactly at session endpoints (inclusive), an event
exactly on a bucket boundary (the double-division floor trap), the
same-user exclusion, and retention of zero-overlap sessions.
"""

from __future__ import annotations

import datetime as dt

from bc_proj3_spark.plans.events import e8_session_overlap


def _ts(h, m, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def test_e8_boundaries(spark, tmp_path):
    rows = [
        # user 1: one session spanning the 10:00 hour-bucket boundary
        (1, _ts(9, 50), 1, "view", 1.0, "{}"),
        (2, _ts(10, 10), 1, "view", 1.0, "{}"),
        # user 2: session [10:00, 10:10]; first event EXACTLY on the
        # bucket boundary, both events exactly on user 1's endpoints
        (3, _ts(10, 0), 2, "view", 1.0, "{}"),
        (4, _ts(10, 10), 2, "view", 1.0, "{}"),
        # user 3: isolated far-away event -> zero-overlap session
        (5, _ts(12, 0), 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    df.write.parquet(f"{tmp_path}/events.parquet")

    out = e8_session_overlap(spark, str(tmp_path))
    got = {
        (r["user_id"], r["session_seq"]): r["concurrent_events"]
        for r in out.collect()
    }
    assert got == {
        # u1 [09:50, 10:10] sees both u2 events (10:00, 10:10 inclusive)
        (1, 1): 2,
        # u2 [10:00, 10:10] sees only u1's 10:10 (09:50 is outside)
        (2, 1): 1,
        # u3 overlaps nothing but its session row must survive
        (3, 1): 0,
    }
