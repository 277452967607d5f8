"""Window operators (SURVEY.md §2.5, W1-W4) with pandas-parity semantics.

The reference computes these with a driver-side groupby loop
(assets.py:440-447) — one pandas frame per (state, gov_function) cohort.
Here each family of derived columns is a set of window expressions over ONE
DataFrame: Spark shuffles once per distinct (partitionBy, orderBy) pair and
evaluates every column in that family in a single pass, so the ~100-column
fan-out costs two shuffles total (deltas on cohort keys, ranks on year/fn
keys) regardless of data size.

Semantics pinned by SURVEY.md §7.1:

- Lags are **positional** within the sorted cohort (pandas ``shift``), not
  year-arithmetic: a gap year makes "1yr" compare to the previous *available*
  row.  ``F.lag(c, k)`` over an ordered window is exactly that.
- "5yr" is lag **4** (reference assets.py:444,446).
- pandas ``rank(method="min", ascending=False)`` = SQL RANK() DESC for ties,
  but pandas leaves NaN **unranked and uncounted**.  We reproduce that by
  ranking inside a sub-partition that quarantines nulls (no join-back, no
  second shuffle).
- Directional ranks rank only the matching-sign rows (reference
  ``df.where(...)`` blanks non-matching rows out of the groupby,
  assets.py:463-474).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def yoy_deltas(
    df: DataFrame,
    cohort_keys: list[str],
    order_keys: list[str],
    metric_cols: list[str],
    lags: tuple[int, ...] = (1, 4),
    lag_labels: dict[int, str] | None = None,
) -> DataFrame:
    """Positional lag deltas (W1/W2): for every metric and every lag k emit
    ``{col}_{label}_pct`` = cur/lag(k) - 1  (null when the lagged value is 0
    or absent) and ``{col}_{label}_abs`` = cur - lag(k).

    One window spec → one shuffle+sort evaluates all len(metrics)×len(lags)×2
    columns.
    """
    lag_labels = lag_labels or {1: "1yr", 4: "5yr"}
    w = Window.partitionBy(*cohort_keys).orderBy(*order_keys)
    cols = {}
    for c in metric_cols:
        for k in lags:
            lbl = lag_labels[k]
            prev = F.lag(F.col(c), k).over(w)
            cols[f"{c}_{lbl}_pct"] = F.when(prev != 0, F.col(c) / prev - 1)
            cols[f"{c}_{lbl}_abs"] = F.col(c) - prev
    return df.withColumns(cols)


def _masked_rank(col, w_keys: list[str], ascending: bool, mask):
    """RANK() among rows satisfying ``mask``, null elsewhere.

    Non-matching rows have their sort key masked to null; with
    nulls-sorted-last ordering they cannot perturb the ranks of matching
    rows, and the outer ``when`` nulls their own rank — pandas parity
    without a filter+join-back.
    """
    key = F.when(mask, col)
    order = F.asc_nulls_last(key) if ascending else F.desc_nulls_last(key)
    return F.when(mask, F.rank().over(Window.partitionBy(*w_keys).orderBy(order)))


def cohort_ranks(
    df: DataFrame,
    cohort_keys: list[str],
    metric_cols: list[str],
    suffix: str = "_rank",
) -> DataFrame:
    """Descending min-ties rank per cohort (W3); nulls unranked and excluded
    from the count (pandas ``rank(method="min", ascending=False)`` parity,
    reference assets.py:460-461)."""
    cols = {
        f"{c}{suffix}": _masked_rank(
            F.col(c), cohort_keys, ascending=False, mask=F.col(c).isNotNull()
        ).cast("double")
        for c in metric_cols
    }
    return df.withColumns(cols)


def signed_delta_ranks(
    df: DataFrame,
    cohort_keys: list[str],
    delta_cols: list[str],
) -> DataFrame:
    """Directional ranks (W4): positives ranked descending (``_pos_rank``),
    negatives ascending (``_neg_rank``); rows of the other sign (or null)
    get a null rank (reference assets.py:463-474)."""
    cols = {}
    for c in delta_cols:
        cols[f"{c}_pos_rank"] = _masked_rank(
            F.col(c), cohort_keys, ascending=False, mask=F.col(c) > 0
        ).cast("double")
        cols[f"{c}_neg_rank"] = _masked_rank(
            F.col(c), cohort_keys, ascending=True, mask=F.col(c) < 0
        ).cast("double")
    return df.withColumns(cols)
