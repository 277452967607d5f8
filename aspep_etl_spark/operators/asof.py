"""[EXT] As-of (point-in-time) join — an operator Spark's DataFrame API
lacks natively (SURVEY.md §2.3 ∅ row; engine-only surface).

Semantics: for every left row, attach the single most recent right row for
the same key with ``right.ts <= left.ts`` (nulls when no prior right row).

Implementation is the union-sort-carry composition — the shape that scales:
tag both sides, union by name, ONE shuffle+sort per key on (ts, side), and
carry the right side's payload forward with ``last(ignorenulls=True)`` over
an unbounded-preceding running window.  No range self-join, no per-row
probing; cost is one sort-within-partition regardless of key skew in the
right side.  Equal timestamps match (right sorts before left at the same
ts); duplicate right rows on (key, ts) are resolved deterministically by
the tiebreak column before the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .setops import union_by_name


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: dict[str, str],
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join.

    ``payload`` maps right-side column → output alias (the right's ``ts``
    may be included, e.g. ``{"value": "prev_value", "ts": "prev_ts"}``).
    ``right_tiebreak``: column deciding among right rows sharing (key, ts)
    — highest wins (required for determinism if duplicates exist).
    ``direction``: "backward" matches the most recent right row with
    ``right.ts <= left.ts``; "forward" the earliest with
    ``right.ts >= left.ts`` (same plan, sort reversed).

    All payload columns come from the SAME matched right row: each right
    row is carried as one non-null struct and a single
    ``last(ignorenulls=True)`` selects the most recent one, so a NULL
    payload value on that row surfaces as NULL (DuckDB ASOF JOIN
    semantics) — never mixed with fields of an older row.
    """
    # SQL as-of semantics under NULL: `right.ts <= left.ts` is UNKNOWN when
    # either side is null, so a null-ts right row matches nothing (drop it
    # before the union — under asc nulls-first it would otherwise become a
    # phantom "earliest" match) and a null-ts left row matches nothing
    # (its payload is forced null after the carry).
    r = right.filter(F.col(ts).isNotNull())
    if right_tiebreak is not None:
        w_dedup = Window.partitionBy(key, ts).orderBy(F.desc(right_tiebreak))
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # one struct per right row — non-null as a whole even when individual
    # payload fields are null, so last(ignorenulls) picks whole rows
    r_tagged = r.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in payload.items()]
        ).alias("__carry"),
    )
    l_tagged = left.withColumn("__side", F.lit(1))
    unioned = union_by_name([l_tagged, r_tagged])

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # right rows sort before left rows at equal ts → inclusive as-of
    # semantics; forward is the same carry over the reversed sort
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = Window.partitionBy(key).orderBy(
        ts_order, F.col("__side").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = unioned.withColumn(
        "__match",
        F.when(
            F.col(ts).isNotNull(),
            F.last(F.col("__carry"), ignorenulls=True).over(w),
        ),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .withColumns({dst: F.col("__match")[dst] for dst in payload.values()})
        .drop("__side", "__carry", "__match")
    )
