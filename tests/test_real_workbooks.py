"""Golden parity against REAL census workbooks: the reference repo caches
2020-2023 .xlsx files; the engine ingests them (stdlib OOXML fallback) and
must reproduce the reference's own golden-check values
(process_aspep/asset_checks.py:14-31) at the same rel_tol=1e-3."""

from __future__ import annotations

import math
import os

import pytest

from aspep_etl_spark.sources.excel import ingest_grids, parse_workbook_bytes

RAW_DIR = "/root/reference/data/raw"
YEARS = [2020, 2021, 2022, 2023]

# combine_years goldens falling in the cached .xlsx era (asset_checks.py:16-20)
GOLDENS = [
    ("WI", "education - higher education instructional", 2021, "total_pay", 88_769_896),
    ("AR", "judicial and legal", 2022, "ft_pay", 8_001_374),
    ("CA", "hospitals", 2022, "pt_employment", 10_250),
    ("GA", "public welfare", 2020, "pt_pay", 17_900),
    ("IN", "police protection total", 2020, "ft_eq_employment", 1_820),
]


@pytest.fixture(scope="module")
def real_fact(spark):
    if not os.path.isdir(RAW_DIR):
        pytest.skip("reference raw workbooks absent")
    grids = {}
    for year in YEARS:
        path = f"{RAW_DIR}/aspep_{year}.xlsx"
        with open(path, "rb") as f:
            grids[year] = parse_workbook_bytes(f.read(), path, year)
    fact, bad = ingest_grids(spark, grids)
    assert bad == []
    return fact


def test_real_workbooks_shape(real_fact):
    assert real_fact.count() > 7000  # ~1.9k rows × 4 years
    years = {r["year"] for r in real_fact.select("year").distinct().collect()}
    assert years == set(YEARS)


def test_reference_golden_values_on_real_data(real_fact):
    for code, fn, year, col, expected in GOLDENS:
        rows = real_fact.filter(
            (real_fact.state_code == code)
            & (real_fact.gov_function == fn)
            & (real_fact.year == year)
        ).select(col).collect()
        assert len(rows) == 1, (code, fn, year)
        actual = rows[0][0]
        assert actual is not None and math.isclose(actual, expected, rel_tol=1e-3), (
            code, fn, year, col, actual, expected,
        )
