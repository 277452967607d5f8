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
