"""[EXT] Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 — the engine's
custom-stateful-operator surface; the reference has no streaming at all).

The state function carries (session_counter, last_session_end) per user
across micro-batches.  Output contract: sessions are emitted at each
batch end as rows keyed by (user_id, session_id); a session spanning a
micro-batch boundary is emitted as MULTIPLE partial rows sharing its
session_id (the state's last_end decides continuation vs new session, the
counter only increments on new sessions).  Downstream consumers aggregate
by (user_id, session_id) — sum(n_events), min(session_start),
sum(total_value) — which reproduces the batch ``sessionize`` answer
exactly; pinned by tests for both the single-batch (availableNow, one
file) and the two-micro-batch (maxFilesPerTrigger=1) cases.
"""

from __future__ import annotations


import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.StringType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_counter", T.LongType()),
        T.StructField("last_end_epoch", T.LongType()),
    ]
)


def _ts_str(t) -> str:
    """Match Spark's timestamp→string cast: trailing fractional zeros
    trimmed (pandas str() keeps all six microsecond digits)."""
    s = str(t)
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


def _session_fn(gap_seconds: int):
    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        counter, last_end = state.get if state.exists else (0, None)
        events = pd.concat(list(pdf_iter), ignore_index=True)
        events = events.sort_values(["ts", "event_id"])
        # normalize to ns first: pandas may hand back datetime64[us]
        ts_s = events["ts"].astype("datetime64[ns]").astype("int64") // 10**9

        out = []
        cur = None  # (start_ts_str, n, total)
        for t, tstr, v in zip(ts_s, events["ts"], events["value"]):
            if last_end is None or t - last_end > gap_seconds:
                if cur is not None:
                    out.append(cur)
                counter += 1
                cur = {
                    "user_id": user_id,
                    "session_id": counter,
                    "n_events": 0,
                    "session_start": _ts_str(tstr),
                    "total_value": 0.0,
                }
            if cur is None:  # continuation of the previous batch's session
                cur = {
                    "user_id": user_id,
                    "session_id": counter,
                    "n_events": 0,
                    "session_start": _ts_str(tstr),
                    "total_value": 0.0,
                }
            cur["n_events"] += 1
            cur["total_value"] = round(cur["total_value"] + v, 2)
            last_end = t
        if cur is not None:
            out.append(cur)  # bounded-run semantics: end of input closes it
        state.update((int(counter), int(last_end) if last_end is not None else None))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return fn


def run_streaming_sessionize(
    spark: SparkSession, events_path: str, gap_seconds: int = 1800
) -> DataFrame:
    """Stateful sessionization over a bounded stream (availableNow)."""
    from .events import events_stream, run_to_memory

    sessions = events_stream(spark, events_path).groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(sessions, "events_sessionize_stream", "append")
