"""Sinks: year-partitioned canonical store + JSON-array publisher."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from aspep_etl_spark.sinks import gzip_publish, write_canonical_store, write_json_array


def test_canonical_store_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, 2003, "a"), (2, 2004, "b"), (3, 2004, "c")], ["id", "year", "v"]
    )
    write_canonical_store(df, path)
    assert sorted(p for p in os.listdir(path) if p.startswith("year=")) == [
        "year=2003",
        "year=2004",
    ]
    back = spark.read.parquet(path).filter(F.col("year") == 2004)
    assert back.count() == 2


def test_json_array_publisher(spark, tmp_path):
    path = str(tmp_path / "out" / "artifact.json")
    df = spark.createDataFrame(
        [("WI", 2017, 42327514.0), ("MO", 2024, float("nan"))],
        ["state_code", "year", "total_pay"],
    )
    write_json_array(df, path)
    with open(path) as f:
        data = json.load(f)
    assert data[0] == {"state_code": "WI", "year": 2017, "total_pay": 42327514.0}
    assert data[1]["total_pay"] is None  # NaN → null, strict JSON

    gz = gzip_publish(path)
    with gzip.open(gz) as f:
        assert json.load(f) == data


def test_json_array_row_cap_guard(spark, tmp_path):
    """The sanctioned driver-side collect refuses pipeline-scale input."""
    import pytest

    from aspep_etl_spark.sinks import write_json_array

    df = spark.range(50)
    with pytest.raises(ValueError, match="more than 10 rows"):
        write_json_array(df, str(tmp_path / "big.json"), max_rows=10)
    # under the cap still writes
    out = write_json_array(df.limit(3), str(tmp_path / "ok.json"), max_rows=10)
    import json

    assert len(json.load(open(out))) == 3


def test_publish_dir_walks_gzips_and_returns_urls(tmp_path):
    """Reference s3_upload surface: walk, gzip text, per-file quarantine,
    public URL list — uploader injected (no boto3/network in container)."""
    import gzip as gz
    import json

    from aspep_etl_spark.sinks import publish_dir

    (tmp_path / "sub").mkdir()
    (tmp_path / "combined.json").write_text(json.dumps([{"a": 1}]))
    (tmp_path / "sub" / "stats.csv").write_text("a,b\n1,2\n")
    (tmp_path / "raw.parquet").write_bytes(b"\x00binary")

    calls = []

    def uploader(path, bucket, key, extra):
        if key.endswith("stats.csv"):
            raise OSError("simulated transfer failure")
        calls.append((path, bucket, key, tuple(sorted(extra.items()))))

    res = publish_dir(str(tmp_path), "my-bucket", prefix="aspep/v1", uploader=uploader)
    by_file = {r["file"]: r["url"] for r in res}
    assert by_file["combined.json"] == "https://my-bucket.s3.amazonaws.com/aspep/v1/combined.json"
    assert by_file["stats.csv"] is None  # quarantined, walk continued
    assert by_file["raw.parquet"] == "https://my-bucket.s3.amazonaws.com/aspep/v1/raw.parquet"

    sent = {k: (p, dict(e)) for p, b, k, e in calls}
    gz_path, extra = sent["aspep/v1/combined.json"]
    assert gz_path.endswith(".json.gz")  # text → gzipped upload
    assert extra["ContentEncoding"] == "gzip" and extra["ACL"] == "public-read"
    with gz.open(gz_path) as f:
        assert json.load(f) == [{"a": 1}]
    _, bin_extra = sent["aspep/v1/raw.parquet"]
    assert "ContentEncoding" not in bin_extra  # binary uploaded as-is
