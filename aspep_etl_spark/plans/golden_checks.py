"""Runtime golden checks — the engine-side equivalent of the reference's
asset checks (``process_aspep/asset_checks.py:14-31``): sixteen known
cell values spanning the combined fact, derived ratios, and positional
1-/5-yr deltas, evaluated at the reference's ``math.isclose`` tolerance
(rel_tol=1e-3, ``asset_checks.py:60``).

The reference attaches these as per-asset runtime checks that gate a
pipeline run; here ``run_golden_checks`` is the same gate as ONE audit
DataFrame — a broadcast join of the expected cells against each asset
frame, pass/fail computed in-plan (no per-check driver lookups), the same
shape as the generic ``dq_audit`` quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (state_code, gov_function, year, column, expected) per asset —
#: verbatim the reference's CHECKS table (asset_checks.py:14-31)
GOLDEN_CHECKS: dict[str, list[tuple]] = {
    "combine_years": [
        ("WI", "corrections", 2017, "total_pay", 42_327_514.0),
        ("WI", "education - higher education instructional", 2021, "total_pay", 88_769_896.0),
        ("AR", "judicial and legal", 2022, "ft_pay", 8_001_374.0),
        ("CA", "hospitals", 2022, "pt_employment", 10_250.0),
        ("GA", "public welfare", 2020, "pt_pay", 17_900.0),
        ("IN", "police protection total", 2020, "ft_eq_employment", 1_820.0),
        ("US", "total - all government employment functions", 2019, "ft_pt_employment", 5_497_394.0),
        ("HI", "financial administration", 2018, "ft_employment", 692.0),
        ("AZ", "electric power", 2024, "ft_employment", 4.0),
        ("WA", "corrections", 2024, "ft_pay", 71_593_739.0),
    ],
    "derive_stats": [
        ("MO", "corrections", 2024, "pay_per_fte", round(38_884_335 / 9_591, 2)),
        ("CA", "hospitals", 2020, "pay_per_ft", round(473_139_785 / 48_767, 2)),
    ],
    "derive_extended_stats": [
        ("IA", "hospitals", 2024, "ft_eq_employment_5yr_abs", float(10_004 - 9_172)),
        ("IA", "hospitals", 2024, "ft_eq_employment_1yr_abs", float(10_004 - 9_386)),
        ("NE", "public welfare", 2022, "ft_employment_5yr_abs", float(2_167 - 2_426)),
        ("DE", "natural resources", 2008, "ft_employment_5yr_abs", float(485 - 420)),
    ],
}


def run_golden_checks(
    spark: SparkSession,
    frames: dict[str, DataFrame],
    rel_tol: float = 1e-3,
) -> DataFrame:
    """Evaluate every golden check against its asset frame.

    ``frames`` maps asset name (``combine_years`` / ``derive_stats`` /
    ``derive_extended_stats``) to the corresponding DataFrame; assets not
    provided are skipped.  Returns one audit row per check:
    (asset, state_code, gov_function, year, column, expected, actual,
    passed) — ``passed`` uses ``math.isclose`` semantics
    (|a−b| ≤ rel_tol·max(|a|,|b|)); a missing or duplicated cell fails.
    """
    out = None
    for asset, checks in GOLDEN_CHECKS.items():
        df = frames.get(asset)
        if df is None:
            continue
        exp = spark.createDataFrame(
            checks, ["state_code", "gov_function", "year", "column", "expected"]
        )
        joined = df.join(
            F.broadcast(exp), ["state_code", "gov_function", "year"]
        )
        actual = None
        for col in sorted({c[3] for c in checks}):
            branch = F.when(F.col("column") == col, F.col(col).cast("double"))
            actual = branch if actual is None else actual.when(
                F.col("column") == col, F.col(col).cast("double")
            )
        scored = joined.select(
            F.lit(asset).alias("asset"),
            "state_code",
            "gov_function",
            "year",
            "column",
            F.col("expected").cast("double").alias("expected"),
            actual.alias("actual"),
        )
        # one row per check key required: duplicates or misses = failure
        agg = scored.groupBy(
            "asset", "state_code", "gov_function", "year", "column", "expected"
        ).agg(F.count("*").alias("__n"), F.first("actual").alias("actual"))
        checked = exp.select(
            F.lit(asset).alias("asset"), "state_code", "gov_function", "year",
            "column", F.col("expected").cast("double").alias("expected"),
        ).join(
            agg, ["asset", "state_code", "gov_function", "year", "column", "expected"],
            "left",
        ).select(
            "asset", "state_code", "gov_function", "year", "column",
            "expected", "actual",
            F.coalesce(
                (F.col("__n") == 1)
                & F.col("actual").isNotNull()
                & (
                    F.abs(F.col("actual") - F.col("expected"))
                    <= F.lit(rel_tol)
                    * F.greatest(F.abs(F.col("actual")), F.abs(F.col("expected")))
                ),
                F.lit(False),  # missing cell (no join match) fails, not nulls
            ).alias("passed"),
        )
        out = checked if out is None else out.unionByName(checked)
    if out is None:
        raise ValueError("run_golden_checks: no known asset frames provided")
    return out
