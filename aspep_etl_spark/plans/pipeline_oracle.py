"""DuckDB replay of the full ``aspep_extended_pipeline`` chain.

The 130-column SQL is generated, not hand-written: one loop per derived
family mirrors exactly how the Spark side fans out (9 metrics x {1yr,5yr}
x {pct,abs} deltas, 9 cohort ranks, 72 directional ranks — reference
assets.py:407-474).  What makes the hash-exact comparison possible is the
fact build's integer quantization (see ``aspep_extended_pipeline``'s
docstring): sums are exact BIGINTs, so both engines derive every stat from
IDENTICAL binary64 values and no rounding macro is needed anywhere.

Cross-engine semantics pinned here (all verified empirically, see
tests/test_pipeline_oracle.py):

- legacy-pandas ``pct_change``: numerator AND lagged denominator are
  forward-filled, zero base yields ±inf (0→0 yields NaN → NULL after the
  kernel's Arrow conversion).  The SQL writes the ±inf literals explicitly
  instead of relying on DuckDB's division-by-zero behavior.
- pandas ``rank(method="min")`` with NaN unranked = SQL RANK() over a
  null-masked key with NULLS LAST (the ``_masked_rank`` trick,
  operators/windows.py:330).
- DuckDB compares NaN as greater-than-everything, so every directional
  mask would mis-admit NaN — but the oracle never *stores* NaN (it emits
  NULL where pandas produced NaN), which sidesteps the trap entirely;
  ±inf (not NaN) flows into the pos/neg ranks exactly like the kernel's.
- The final significance filter (P8) scans ``year`` too (reference
  assets.py:480 quirk), so every row passes — the oracle reproduces the
  chain by not filtering.
"""

from __future__ import annotations

#: (metric, numerator, denominator) for the derive_stats ratio columns.
_RATIOS = (
    ("pay_per_fte", "total_pay", "ft_eq_employment"),
    ("pay_per_pt_hour", "pt_pay", "pt_hour"),
    ("pay_per_ft", "ft_pay", "ft_employment"),
)

_MEASURES = (
    "total_pay",
    "ft_eq_employment",
    "pt_pay",
    "pt_hour",
    "ft_pay",
    "ft_employment",
)

_METRICS = _MEASURES + tuple(r[0] for r in _RATIOS)

_LAGS = ((1, "1yr"), (4, "5yr"))


def aspep_pipeline_oracle_sql() -> str:
    metrics = ", ".join(_METRICS)
    ratio_exprs = ",\n         ".join(
        f"CASE WHEN {den} <> 0 THEN {num} / {den} END AS {name}"
        for name, num, den in _RATIOS
    )
    med_exprs = ", ".join(f"median({c}) AS {c}" for c in _METRICS)
    # mean_ordered twin: left fold over the value-sorted list, seed
    # 0.0::DOUBLE (never a bare decimal literal — the DECIMAL-unification
    # trap, PERF.md), same op order as Spark's F.aggregate left fold
    mean_exprs = ",\n         ".join(
        f"CASE WHEN count({c}) > 0 THEN list_reduce("
        f"list_prepend(0.0::DOUBLE, list({c} ORDER BY {c})"
        f" FILTER ({c} IS NOT NULL)), (a, b) -> a + b) / count({c})"
        f" END AS {c}"
        for c in _METRICS
    )

    # ffilled value + raw lags, all over ONE cohort window
    ff_exprs = ",\n         ".join(
        [f"last_value({c} IGNORE NULLS) OVER wd AS __f_{c}" for c in _METRICS]
        + [
            f"lag({c}, {k}) OVER wd AS __p{k}_{c}"
            for c in _METRICS
            for k, _ in _LAGS
        ]
    )
    # lag of the ffilled series (pandas: ffill THEN group-shift)
    fp_exprs = ",\n         ".join(
        f"lag(__f_{c}, {k}) OVER wl AS __fp{k}_{c}"
        for c in _METRICS
        for k, _ in _LAGS
    )
    delta_exprs = []
    delta_names = []
    for c in _METRICS:
        for k, lbl in _LAGS:
            delta_exprs.append(
                f"CASE WHEN __f_{c} IS NULL OR __fp{k}_{c} IS NULL THEN NULL\n"
                f"              WHEN __fp{k}_{c} = 0 THEN"
                f" (CASE WHEN __f_{c} > 0 THEN 'infinity'::DOUBLE"
                f" WHEN __f_{c} < 0 THEN '-infinity'::DOUBLE END)\n"
                f"              ELSE __f_{c} / __fp{k}_{c} - 1 END AS {c}_{lbl}_pct"
            )
            delta_exprs.append(f"{c} - __p{k}_{c} AS {c}_{lbl}_abs")
            delta_names += [f"{c}_{lbl}_pct", f"{c}_{lbl}_abs"]

    rank_exprs = [
        f"CASE WHEN {c} IS NOT NULL THEN CAST(rank() OVER (PARTITION BY year,"
        f" gov_function ORDER BY (CASE WHEN {c} IS NOT NULL THEN {c} END)"
        f" DESC NULLS LAST) AS DOUBLE) END AS {c}_rank"
        for c in _METRICS
    ]
    for dc in delta_names:
        rank_exprs.append(
            f"CASE WHEN {dc} > 0 THEN CAST(rank() OVER (PARTITION BY year,"
            f" gov_function ORDER BY (CASE WHEN {dc} > 0 THEN {dc} END)"
            f" DESC NULLS LAST) AS DOUBLE) END AS {dc}_pos_rank"
        )
        rank_exprs.append(
            f"CASE WHEN {dc} < 0 THEN CAST(rank() OVER (PARTITION BY year,"
            f" gov_function ORDER BY (CASE WHEN {dc} < 0 THEN {dc} END)"
            f" ASC NULLS LAST) AS DOUBLE) END AS {dc}_neg_rank"
        )

    deltas_joined = ",\n         ".join(delta_exprs)
    ranks_joined = ",\n       ".join(rank_exprs)

    return f"""
WITH fact AS MATERIALIZED (
  SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS state_code,
         l_returnflag || '-' || l_linestatus AS gov_function,
         CAST(year(l_shipdate) AS INT) AS year,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS total_pay,
         sum(l_quantity) AS ft_eq_employment,
         CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) AS pt_pay,
         sum(l_quantity * 8) AS pt_hour,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) AS ft_pay,
         CAST(count(*) AS DOUBLE) AS ft_employment
  FROM lineitem GROUP BY 1, 2, 3
), s0 AS MATERIALIZED (
  SELECT *,
         {ratio_exprs}
  FROM fact
), med AS (
  SELECT year, gov_function, {med_exprs}
  FROM s0 WHERE state_code <> 'US' GROUP BY year, gov_function
), mn AS (
  SELECT year, gov_function, {mean_exprs}
  FROM s0 WHERE state_code <> 'US' GROUP BY year, gov_function
), u AS MATERIALIZED (
  SELECT state_code, gov_function, year, CAST(NULL AS VARCHAR) AS state_scope, {metrics} FROM s0
  UNION ALL
  SELECT 'US-median', gov_function, year, 'stats', {metrics} FROM med
  UNION ALL
  SELECT 'US-mean', gov_function, year, 'stats', {metrics} FROM mn
), ff AS MATERIALIZED (
  SELECT *,
         {ff_exprs}
  FROM u
  WINDOW wd AS (PARTITION BY state_code, gov_function ORDER BY year
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), dl AS MATERIALIZED (
  SELECT *,
         {fp_exprs}
  FROM ff
  WINDOW wl AS (PARTITION BY state_code, gov_function ORDER BY year)
), d AS MATERIALIZED (
  SELECT state_code, gov_function, year, state_scope, {metrics},
         {deltas_joined}
  FROM dl
)
SELECT *,
       {ranks_joined}
FROM d
"""


ASPEP_PIPELINE_SQL = aspep_pipeline_oracle_sql()
