"""Generation-branch coverage for the events.ts parquet wrinkle.

The driver's ``events.parquet`` has shipped ``ts`` as two different
physical types across testdata generations:

- INT64 TIMESTAMP(NANOS) — Spark 4 refuses it outright unless
  ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case it reads
  as LongType and the loader rebuilds via integer division;
- TIMESTAMP(MICROS) with ``isAdjustedToUTC=false`` — reads as
  TIMESTAMP_NTZ, which watermarks and several time functions refuse.

Current testdata is the second generation, so without a synthetic
fixture the nanos branch would be dead code under the suite (ADVICE r3).
This test writes one parquet per generation and asserts both
``load_table`` and ``events_stream`` yield a plain TIMESTAMP (LTZ)
column with identical instants.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

# Instants chosen away from any DST boundary games; tz-naive wall-clock
# values interpreted as UTC by both writers.
_INSTANTS = [
    datetime.datetime(2024, 3, 1, 12, 0, 0),
    datetime.datetime(2024, 3, 1, 12, 30, 15, 250000),
    datetime.datetime(2024, 7, 4, 23, 59, 59, 999999),
]


def _write_generation(path: str, unit: str) -> None:
    ts = pa.array(_INSTANTS, type=pa.timestamp(unit))
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts,
            "value": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
        }
    )
    # version=2.6 preserves nanosecond logical type (TIMESTAMP(NANOS));
    # older versions silently down-cast ns to us and would not exercise
    # the nanosAsLong branch at all.
    pq.write_table(table, path, version="2.6")


@pytest.fixture(scope="module", params=["ns", "us"], ids=["nanos", "ntz-micros"])
def generation_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events-gen-{request.param}")
    _write_generation(str(d / "events.parquet"), request.param)
    return str(d)


def test_load_table_normalizes_generation(spark, generation_dir):
    from aspep_etl_spark.sources.registry import load_table

    df = load_table(spark, generation_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert got == _INSTANTS


def test_events_stream_normalizes_generation(spark, generation_dir):
    from aspep_etl_spark.streaming.events import events_stream, run_to_memory

    stream = events_stream(spark, f"{generation_dir}/events.parquet")
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    out = run_to_memory(
        stream.select("event_id", "ts"), "ts_generation_probe", "append"
    )
    got = [r["ts"] for r in out.orderBy("event_id").collect()]
    assert got == _INSTANTS
