"""As-of join edge semantics: equal timestamps, no-prior-row nulls,
duplicate right rows resolved by tiebreak."""

from __future__ import annotations

from datetime import datetime

from aspep_etl_spark.operators.asof import as_of_join


def test_as_of_join_semantics(spark):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01T10:00:00")),  # equal ts → matches r2
            (2, "u1", ts("2024-01-01T09:00:00")),  # before any right → nulls
            (3, "u1", ts("2024-01-01T12:00:00")),  # after both → r2 (latest)
            (4, "u2", ts("2024-01-01T10:00:00")),  # other key, one match
            (5, "u3", ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01T09:30:00"), 10.0, 100),
            ("u1", ts("2024-01-01T10:00:00"), 20.0, 101),  # dup ts ↓ loses
            ("u1", ts("2024-01-01T10:00:00"), 99.0, 99),
            ("u2", ts("2024-01-01T08:00:00"), 30.0, 102),
        ],
        ["user_id", "ts", "value", "event_id"],
    )
    out = as_of_join(
        left, right, key="user_id", ts="ts",
        payload={"value": "prev_value"}, right_tiebreak="event_id",
    )
    got = {r["event_id"]: r["prev_value"] for r in out.collect()}
    assert got[1] == 20.0   # equal ts matches; tiebreak picks event_id 101
    assert got[2] is None   # nothing at or before 09:00
    assert got[3] == 20.0   # latest right at 10:00
    assert got[4] == 30.0
    assert got[5] is None   # key absent from right
    assert len(got) == 5    # left rows all preserved exactly once


def test_asof_null_payload_from_matched_row(spark):
    """A NULL payload on the most recent right row must surface as NULL
    alongside that row's ts — all output fields from ONE right row (DuckDB
    ASOF JOIN semantics), never value-from-older + ts-from-newer."""
    from aspep_etl_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 100), (1, 200)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 50, 7.0), (1, 150, None)], ["k", "ts", "v"]
    )
    out = {
        r["ts"]: (r["prev_v"], r["prev_ts"])
        for r in as_of_join(
            left, right, "k", "ts", {"v": "prev_v", "ts": "prev_ts"}
        ).collect()
    }
    assert out[100] == (7.0, 50)
    assert out[200] == (None, 150)  # null v carried WITH its own ts


def test_as_of_join_forward_direction(spark):
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01T10:00:00")),  # equal ts → matches 10:00 row
            (2, "u1", ts("2024-01-01T11:00:00")),  # after all rights → nulls
            (3, "u1", ts("2024-01-01T09:00:00")),  # next right is 09:30
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01T09:30:00"), 10.0, 100),
            ("u1", ts("2024-01-01T10:00:00"), 20.0, 101),
        ],
        ["user_id", "ts", "value", "event_id"],
    )
    out = as_of_join(
        left, right, key="user_id", ts="ts",
        payload={"value": "next_value"}, right_tiebreak="event_id",
        direction="forward",
    )
    got = {r["event_id"]: r["next_value"] for r in out.collect()}
    assert got[1] == 20.0   # inclusive equal ts
    assert got[2] is None   # nothing at or after 11:00
    assert got[3] == 10.0   # earliest following right


def test_asof_null_timestamps_match_nothing(spark):
    """SQL as-of semantics under NULL: `right.ts <= left.ts` is UNKNOWN
    when either ts is null — a null-ts right row must never be a phantom
    'earliest' match, and a null-ts left row gets null payload, in BOTH
    directions."""
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01T10:00:00")),  # no real predecessor
            (2, "u1", None),                        # null-ts left row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", None, 9.0, 50),                       # null-ts right row
            ("u1", ts("2024-01-01T11:00:00"), 7.0, 51),  # after left #1
        ],
        "user_id string, ts timestamp, value double, event_id long",
    )
    back = {
        r["event_id"]: r["prev_value"]
        for r in as_of_join(
            left, right, key="user_id", ts="ts",
            payload={"value": "prev_value"}, right_tiebreak="event_id",
        ).collect()
    }
    # backward: #1 has no right row at/before 10:00 (the null-ts row is NOT
    # a match); #2 has null ts → null
    assert back == {1: None, 2: None}

    fwd = {
        r["event_id"]: r["next_value"]
        for r in as_of_join(
            left, right, key="user_id", ts="ts",
            payload={"value": "next_value"}, right_tiebreak="event_id",
            direction="forward",
        ).collect()
    }
    # forward: #1 matches the 11:00 row; #2 (null ts) must stay null, not
    # pick up the earliest right row
    assert fwd == {1: 7.0, 2: None}
