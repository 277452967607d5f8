"""Generic multi-format table IO (parquet / ORC / CSV / JSON Lines).

The reference touches exactly two interchange formats (Excel in,
JSON-array out — ``process_aspep/assets.py``); an engine a team actually
migrates onto also has to exchange tables with warehouses and vendors in
the lake's lingua francas.  This module is deliberately thin over
``spark.read``/``DataFrameWriter`` — the value is the enforced
discipline, not the plumbing:

- **Text formats require an explicit schema on read.**  Schema inference
  on CSV/JSON is an extra full scan of the data and silently guesses
  types per run — at 100 TB that is both a doubled read and a
  correctness hazard (a column of ``00123`` ids inferred int on Monday
  and string on Tuesday).  ``read_table`` refuses text formats without a
  schema instead of quietly inferring.
- **Round-trip fidelity is format-dependent and stated**: parquet/ORC
  preserve types and nulls exactly; CSV collapses empty string and null
  (``nullValue``/``emptyValue`` pinned here so the round trip is at least
  deterministic) and serializes timestamps as ISO-8601 with microseconds;
  JSON Lines preserves nulls but not int-vs-long width.
- Columnar formats pass ``partition_by`` through to directory
  partitioning (the scan-pruning layout); text formats are for
  interchange, not lake layout, and get no partitioning knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

COLUMNAR_FORMATS = ("parquet", "orc")
TEXT_FORMATS = ("csv", "json")  # json = JSON Lines (one object per line)
FORMATS = COLUMNAR_FORMATS + TEXT_FORMATS

#: Pinned CSV dialect so round trips are deterministic: header row,
#: ISO-8601 microsecond timestamps, ``\\N`` for SQL NULL, and empty
#: strings written QUOTED (``""``) — an unquoted empty field reads back
#: as null in Spark, so quoting is what keeps null and ``""`` distinct
#: (the classic CSV trap).
_CSV_COMMON = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "nullValue": "\\N",
}
_CSV_WRITE_OPTS = {**_CSV_COMMON, "emptyValue": '""'}
_CSV_READ_OPTS = dict(_CSV_COMMON)

_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``.  ``partition_by`` is columnar
    only (directory layout for scan pruning); text formats reject it."""
    if fmt not in FORMATS:
        raise ValueError(f"write_table: unknown format {fmt!r}; one of {FORMATS}")
    if partition_by and fmt not in COLUMNAR_FORMATS:
        raise ValueError(
            f"write_table: partition_by is a lake-layout feature; {fmt!r} is an "
            "interchange format — write parquet/orc instead"
        )
    w = df.write.mode(mode)
    if fmt == "csv":
        for k, v in _CSV_WRITE_OPTS.items():
            w = w.option(k, v)
    elif fmt == "json":
        for k, v in _JSON_OPTS.items():
            w = w.option(k, v)
    if compression is not None:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read a table written by ``write_table``.

    Text formats REQUIRE ``schema`` (StructType or DDL string) — see the
    module docstring; columnar formats carry their own and use ``schema``
    only as an (enforced) projection contract."""
    if fmt not in FORMATS:
        raise ValueError(f"read_table: unknown format {fmt!r}; one of {FORMATS}")
    if fmt in TEXT_FORMATS and schema is None:
        raise ValueError(
            f"read_table: {fmt!r} needs an explicit schema — inference is an "
            "extra full scan and guesses types per run; pass the DDL string"
        )
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        for k, v in _CSV_READ_OPTS.items():
            r = r.option(k, v)
    elif fmt == "json":
        for k, v in _JSON_OPTS.items():
            r = r.option(k, v)
    return r.format(fmt).load(path)
