"""Many-file stress for the ``binaryFile`` + ``mapInPandas`` ingest path.

The executor-side Excel path was proven on the 21 real census workbooks;
this pins the shape it actually exists for — hundreds of small files in
one scan — plus its failure isolation: corrupt and non-conforming files
quarantine silently per-file (reference behavior: bad inputs never abort
the run) while every valid workbook lands.  A generous wall-clock
ceiling guards against the per-file-overhead regressions that only this
many-file shape exposes (e.g. accidentally re-opening a SparkSession or
re-compiling the adapter per file).
"""

import os
import time

import pytest

from .xlsx_fixture import xlsx_bytes

N_GOOD = 470
N_CORRUPT = 20
N_NO_YEAR = 10

_HEADER = [
    "Geographic Area Name",
    "Meaning of Aggregate Description",
    "Full-Time Employment",
    "Full-Time Payroll",
    "Part-Time Employment",
    "Part-Time Payroll",
    "Part-Time Hours",
    "Full-Time Equivalent Employment",
    "Total Full-Time and Part-Time Employment",
    "Total Full-Time and Part-Time Payroll",
]

_FUNCTIONS = ["Corrections", "Hospitals", "Police Protection"]


def _workbook(i: int) -> bytes:
    rows = [_HEADER]
    for j, state in enumerate(["Missouri", "Iowa", "United States"]):
        base = 100 * i + j
        rows.append(
            [state, _FUNCTIONS[(i + j) % 3]]
            + [str(base + k) for k in range(8)]
        )
    return xlsx_bytes(rows)


@pytest.fixture(scope="module")
def workbook_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("many-workbooks")
    for i in range(N_GOOD):
        (d / f"site{i:03d}_2024.xlsx").write_bytes(_workbook(i))
    for i in range(N_CORRUPT):
        # half truncated zip containers, half junk bytes — both must
        # quarantine inside the executor task, not fail it
        blob = _workbook(i)[: 100 + i] if i % 2 == 0 else os.urandom(256)
        (d / f"corrupt{i:02d}_2024.xlsx").write_bytes(blob)
    for i in range(N_NO_YEAR):
        (d / f"noyear{i:02d}.xlsx").write_bytes(_workbook(i))
    return str(d)


def test_many_file_ingest_counts_and_quarantine(spark, workbook_dir):
    from aspep_etl_spark.sources.excel import ingest_binary_workbooks

    t0 = time.time()
    fact = ingest_binary_workbooks(spark, workbook_dir)
    rows = fact.collect()
    elapsed = time.time() - t0

    # every valid workbook contributes its 3 rows; corrupt and
    # year-less files contribute exactly nothing
    assert len(rows) == 3 * N_GOOD

    by_key = {}
    for r in rows:
        by_key.setdefault((r["state_code"], r["gov_function"]), 0)
        by_key[(r["state_code"], r["gov_function"])] += 1
    assert set(k[0] for k in by_key) == {"MO", "IA", "US"}
    assert {r["year"] for r in rows} == {2024}
    # recode ran in-executor: canonical function names, not workbook labels
    assert set(k[1] for k in by_key) <= {"corrections", "hospitals", "police protection"}

    # value spot-check: file i=0, state Missouri, first numeric column
    mo0 = [r for r in rows if r["state_code"] == "MO" and r["ft_employment"] == 0.0]
    assert len(mo0) == 1 and mo0[0]["ft_pay"] == 1.0

    # throughput guard: 500 small files through one binaryFile scan on
    # local test cores — minutes means per-file overhead regressed
    assert elapsed < 120, f"many-file ingest took {elapsed:.1f}s"


def test_many_file_ingest_is_one_scan(spark, workbook_dir):
    """The plan stays a single distributed scan + mapInPandas — no
    driver-side per-file loop (that shape would also pass the counts)."""
    from aspep_etl_spark.sources.excel import ingest_binary_workbooks

    plan = ingest_binary_workbooks(spark, workbook_dir)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert plan.count("Scan binaryFile") == 1
