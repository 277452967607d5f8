"""Property-based ingest-adapter tests: random legacy grids (any year's
header window, any historical column spelling, junk rows, empty columns)
must canonicalize to exact values.  Pure driver-side — no Spark session."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from aspep_etl_spark import maps
from aspep_etl_spark.sources.excel import legacy_grid_to_frame

# canonical measure → historical header spellings (reverse of the rename
# map, as multi-row fragments the collapse must reassemble)
VARIANTS = {
    "ft_employment": [["Full-Time", "Employees"], ["Full-time", "Employment"]],
    "ft_pay": [["Full-Time", "Pay", "(whole dollars)"], ["Full-Time", "Payroll"]],
    "pt_employment": [["Part-Time", "Employees"], ["Part-time", "Employment"]],
    "pt_pay": [["Part-Time", "Pay"], ["Part-Time", "Payroll", "(whole dollars)"]],
    "pt_hour": [["Part-Time", "Hours"]],
    "ft_eq_employment": [["Full-Time", "Equivalent", "Employment"]],
    "total_pay": [["Total", "March", "Payroll"], ["Total", "Payroll"]],
}


@st.composite
def legacy_grids(draw):
    year = draw(st.sampled_from(sorted(maps.HEADER_WINDOWS)))
    start, end = maps.HEADER_WINDOWS[year]
    n_header_rows = end - start + 1
    measures = draw(
        st.lists(st.sampled_from(sorted(VARIANTS)), min_size=2, max_size=6, unique=True)
    )
    chosen = {m: draw(st.sampled_from(VARIANTS[m])) for m in measures}

    width = 2 + len(measures) + 1  # +1 trailing empty column (drop path)
    grid: list[list] = []
    for i in range(start):
        grid.append([f"JUNK TITLE {i}"] + [None] * (width - 1))
    # distribute each variant's fragments across the header-window rows
    header_rows = [[None] * width for _ in range(n_header_rows)]
    header_rows[-1][0] = "State Name"
    header_rows[-1][1] = "Function"
    for j, m in enumerate(measures):
        frags = chosen[m]
        for k, frag in enumerate(frags):
            # bottom-align the fragments within the header window
            r = max(0, n_header_rows - len(frags) + k)
            target = header_rows[r]
            col = 2 + j
            target[col] = frag if target[col] is None else f"{target[col]} {frag}"
    grid.extend(header_rows)

    n_data = draw(st.integers(1, 5))
    values = []
    for i in range(n_data):
        row_vals = [draw(st.integers(0, 10**9)) for _ in measures]
        values.append(row_vals)
        grid.append(
            [f"State{i}", f"function {i}"] + [float(v) for v in row_vals] + [None]
        )
    return year, measures, values, grid


@settings(max_examples=60, deadline=None)
@given(legacy_grids())
def test_legacy_adapter_recovers_exact_values(case):
    year, measures, values, grid = case
    pdf = legacy_grid_to_frame(grid, year)
    assert list(pdf.columns[:2]) == ["state", "gov_function"]
    # row 0 is the retained last header row (reference iloc[end:] quirk);
    # true data rows follow it
    assert pdf.iloc[0]["state"] == "State Name"
    assert len(pdf) == 1 + len(values)
    for j, m in enumerate(measures):
        assert m in pdf.columns, (year, m, list(pdf.columns))
        for i, row_vals in enumerate(values):
            got = float(pdf.iloc[i + 1][m])
            assert math.isclose(got, row_vals[j]), (m, i)
    # trailing empty column dropped
    assert len(pdf.columns) == 2 + len(measures)
