"""Deterministic synthetic ASPEP fixtures (FIXTURES.md §1-§2).

Generates a canonical combined fact table with the dirt the reference's
semantics depend on: gap years (positional-lag parity), exact zeros
(division-guard parity), random NaNs (rank null parity), a US rollup row,
and the pt_hour/pt_hours era split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

STATES = {
    "AL": ("alabama", "South", "East South Central"),
    "CA": ("california", "West", "Pacific"),
    "IA": ("iowa", "Midwest", "West North Central"),
    "MO": ("missouri", "Midwest", "West North Central"),
    "NE": ("nebraska", "Midwest", "West North Central"),
    "NY": ("new york", "Northeast", "Middle Atlantic"),
    "TX": ("texas", "South", "West South Central"),
    "WI": ("wisconsin", "Midwest", "East North Central"),
}
FUNCTIONS = ["corrections", "hospitals", "highways", "public welfare", "libraries"]
YEARS = list(range(2015, 2025))


def make_combined_fact(seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    idx = 0
    for code, (name, region, division) in list(STATES.items()) + [("US", (None, None, None))]:
        is_us = code == "US"
        for fn in FUNCTIONS:
            for year in YEARS:
                # ~4% gap years for non-US rows → exercises positional lag
                if not is_us and rng.random() < 0.04:
                    continue
                scale = 50.0 if is_us else 1.0
                ft_emp = float(np.round(rng.lognormal(7.5, 0.6) * scale))
                if rng.random() < 0.02:
                    ft_emp = 0.0
                ft_pay = float(np.round(ft_emp * rng.normal(6500, 1500)))
                pt_emp = float(np.round(ft_emp * rng.uniform(0.1, 0.5)))
                pt_pay = float(np.round(pt_emp * rng.normal(2000, 400)))
                pt_hour = float(np.round(pt_emp * rng.uniform(40, 90)))
                ft_eq = float(np.round(ft_emp + 0.3 * pt_emp))
                if rng.random() < 0.01:
                    ft_eq = 0.0
                row = {
                    "index": idx,
                    "state": None if is_us else name,
                    "state_code": code,
                    "region": region,
                    "division": division,
                    "state_scope": "national" if is_us else "state",
                    "gov_function": fn,
                    "year": year,
                    "ft_employment": ft_emp,
                    "ft_pay": ft_pay,
                    "pt_employment": pt_emp,
                    "pt_pay": pt_pay,
                    "pt_hour": pt_hour if year <= 2023 else np.nan,
                    "pt_hours": pt_hour if year == 2024 else np.nan,
                    "ft_eq_employment": ft_eq,
                    "ft_pt_employment": ft_emp + pt_emp,
                    "total_pay": ft_pay + pt_pay,
                }
                # ~2% random NaN dirt per measure
                for m in ("ft_pay", "pt_pay", "total_pay", "ft_eq_employment"):
                    if rng.random() < 0.02:
                        row[m] = np.nan
                rows.append(row)
                idx += 1
    return pd.DataFrame(rows)
