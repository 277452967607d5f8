"""Multi-format IO: round-trip fidelity per format, schema discipline,
and a cross-engine read of our CSV/JSON output by DuckDB (the
interchange-format promise is that OTHER engines read the bytes)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from aspep_etl_spark.sources.formats import read_table, write_table
from aspep_etl_spark.sources.registry import load_table


def _fixture(spark):
    """Typed fixture with the traps: timestamps, nulls, empty string,
    doubles, a leading-zero string id that inference would mangle."""
    df = spark.createDataFrame(
        [
            (1, "00042", "2024-03-01 10:00:00.123456", 1.5, "x"),
            (2, "00007", "2024-03-01 11:30:00.000001", None, ""),
            (3, None, None, -0.25, None),
        ],
        "id long, code string, ts string, val double, note string",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _as_set(df):
    return {
        (r["id"], r["code"], str(r["ts"]), r["val"], r["note"])
        for r in df.collect()
    }


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_round_trip_exact(spark, tmp_path, fmt):
    df = _fixture(spark)
    p = str(tmp_path / fmt)
    write_table(df, p, fmt)
    back = read_table(spark, p, fmt, schema=df.schema)
    assert _as_set(back) == _as_set(df)
    assert back.schema == df.schema


def test_round_trip_csv_null_vs_empty(spark, tmp_path):
    """CSV must round-trip with null and empty string DISTINCT (the pinned
    nullValue/emptyValue dialect) and leading-zero codes intact."""
    df = _fixture(spark)
    p = str(tmp_path / "csv")
    write_table(df, p, "csv")
    back = read_table(spark, p, "csv", schema=df.schema)
    assert _as_set(back) == _as_set(df)
    got = {r["id"]: r["note"] for r in back.collect()}
    assert got[2] == "" and got[3] is None
    assert {r["code"] for r in back.collect()} == {"00042", "00007", None}


def test_text_formats_require_schema(spark, tmp_path):
    df = _fixture(spark)
    for fmt in ("csv", "json"):
        p = str(tmp_path / f"req_{fmt}")
        write_table(df, p, fmt)
        with pytest.raises(ValueError, match="explicit schema"):
            read_table(spark, p, fmt)


def test_partition_by_is_columnar_only(spark, tmp_path):
    df = _fixture(spark)
    with pytest.raises(ValueError, match="lake-layout"):
        write_table(df, str(tmp_path / "x"), "csv", partition_by=["id"])
    p = str(tmp_path / "part_orc")
    write_table(df, p, "orc", partition_by=["id"])
    import os

    assert any(d.startswith("id=") for d in os.listdir(p))
    back = read_table(spark, p, "orc")
    assert {r["id"] for r in back.collect()} == {1, 2, 3}


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_duckdb_reads_our_interchange_output(spark, tmp_path, fmt, sf_dir):
    """Cross-engine: DuckDB must read the files we write and agree on
    count + sum — interchange means other engines, not just us."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    p = str(tmp_path / f"xchg_{fmt}")
    write_table(events.coalesce(2), p, fmt)
    glob = f"{p}/*.json" if fmt == "json" else f"{p}/*.csv"
    if fmt == "csv":
        rel = duckdb.sql(
            f"SELECT count(*) AS n, round(sum(value),2) AS s FROM "
            f"read_csv('{glob}', header=true, nullstr='\\N')"
        )
    else:
        rel = duckdb.sql(
            f"SELECT count(*) AS n, round(sum(value),2) AS s FROM read_json('{glob}')"
        )
    n, s = rel.fetchone()
    exp = events.agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
    ).collect()[0]
    assert (n, float(s)) == (exp["n"], exp["s"])
