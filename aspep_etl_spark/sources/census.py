"""Census-regions dimension source (SURVEY.md §2.1 S7) and JSON artifact
re-scan (S10).

The reference loads a public CSV into a driver dict at resource-init time
(process_aspep/resources.py:12-16).  Here it becomes a small DataFrame fed
to the broadcast dim join (J1) — the CSV can come from a local path or any
Hadoop-visible URI.  There is deliberately no `US` row: the lookup-miss →
null path is load-bearing (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import census_dim_schema

# Column names in the public census-regions CSV.
_CSV_COLS = {"State Code": "state_code", "State": "state", "Region": "region", "Division": "division"}


def load_census_dim_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the census regions CSV (header row, comma-separated) into the
    canonical dimension schema."""
    raw = spark.read.option("header", True).csv(path)
    out = raw.select(
        *[F.col(src).alias(dst) for src, dst in _CSV_COLS.items() if src in raw.columns]
    )
    missing = set(census_dim_schema().fieldNames()) - set(out.columns)
    if missing:
        raise ValueError(f"census CSV missing columns: {sorted(missing)}")
    return out.select(*census_dim_schema().fieldNames())


def census_dim_from_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Build the dimension from in-memory rows (state_code, state, region,
    division) — used by tests and offline runs."""
    return spark.createDataFrame(rows, census_dim_schema())


def read_json_artifact(spark: SparkSession, path: str) -> DataFrame:
    """Re-scan a published JSON-array artifact (S10, reference
    asset_checks.py:8-11): one pretty-printed array per file needs
    multiLine mode."""
    return spark.read.option("multiLine", True).json(path)
