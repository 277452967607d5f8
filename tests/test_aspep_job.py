"""Full ASPEP job composition: sources → store → plans → artifacts, plus
S7 CSV dim source and S10 JSON artifact re-scan."""

from __future__ import annotations

import json

from aspep_etl_spark.plans.aspep_job import JobPaths, run_aspep_job
from aspep_etl_spark.sources.census import (
    census_dim_from_rows,
    load_census_dim_csv,
    read_json_artifact,
)

from .test_ingest import census_dim, legacy_grid_2003, tidy_frame_2024


def test_csv_dim_source(spark, tmp_path):
    csv = tmp_path / "regions.csv"
    csv.write_text(
        "State,State Code,Region,Division\n"
        "Alabama,AL,South,East South Central\n"
        "Wisconsin,WI,Midwest,East North Central\n"
    )
    dim = load_census_dim_csv(spark, str(csv))
    rows = {r["state_code"]: r for r in dim.collect()}
    assert rows["AL"]["division"] == "East South Central"
    assert dim.columns == ["state_code", "state", "region", "division"]


def test_full_job_offline(spark, tmp_path):
    paths = JobPaths(str(tmp_path))
    result = run_aspep_job(
        spark,
        paths,
        census_dim=census_dim(spark),
        grids_by_year={2003: legacy_grid_2003(), 2024: tidy_frame_2024()},
    )
    assert result["bad_files"] == []

    # S10: re-scan the published pretty-printed JSON arrays with Spark
    combined = read_json_artifact(spark, result["artifacts"]["combined_data"])
    # 4 legacy + 3 tidy data rows + 1 retained last-header pseudo-row
    # (reference iloc[end:] slice quirk, sources/excel.py)
    assert combined.count() == 8
    ext = read_json_artifact(spark, result["artifacts"]["extended_stats"])
    mo = ext.filter(
        (ext.state_code == "MO") & (ext.gov_function == "corrections") & (ext.year == 2024)
    ).collect()[0]
    assert round(mo["pay_per_fte"], 2) == round(38885335 / 9600, 2)
    # cohort-stat pseudo rows present with scope label
    assert ext.filter(ext.state_code == "US-median").count() > 0

    # byte-parity of the published artifact with the reference serializer:
    # round-tripping the file through pandas to_json(orient="records",
    # indent=4) — the exact call the reference makes (assets.py:325) —
    # must reproduce our bytes identically (key order, ':' spacing, float
    # shape, null form)
    import pandas as pd

    raw = open(result["artifacts"]["derived_stats"]).read()
    assert pd.DataFrame(json.loads(raw)).to_json(orient="records", indent=4) == raw

    # golden-check style point lookup straight from the artifact file
    with open(result["artifacts"]["derived_stats"]) as f:
        rows = json.load(f)
    wi = [
        r for r in rows
        if r["state_code"] == "WI" and r["gov_function"] == "judicial and legal"
    ]
    assert wi and wi[0]["ft_pay"] == 7300000.0
