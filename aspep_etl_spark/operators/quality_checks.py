"""[EXT] Declarative data-quality rules — the dbt-test / Deequ-style gate
a production pipeline runs before publishing a table.

Each rule compiles to ONE conditional aggregate over a single table scan
(`run_checks` unions per-table rule sets, so a 10-rule suite on a 100 TB
fact table costs one pass, not ten).  Referential rules add one anti-join
per foreign key.  Output is the audit row per rule:
(table, rule, n_violations, pass) — feed it to a circuit-breaker that
blocks the publish step on any failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null:{col}", F.col(col).isNull()


def unique_key(*cols: str) -> tuple[str, "F.Column"]:
    # sentinel handled specially by run_checks (needs an aggregate, not a
    # row predicate)
    return f"unique:{','.join(cols)}", None  # type: ignore[return-value]


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return f"accepted_values:{col}", ~F.col(col).isin(values)


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    return f"range:{col}", ~F.col(col).between(lo, hi) | F.col(col).isNull()


def run_checks(
    df: DataFrame,
    table: str,
    rules: list[tuple[str, Column | None]],
    keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Evaluate row-predicate rules in ONE scan (conditional sums), plus
    one grouped pass per ``unique:`` rule.  Returns
    (table, rule, n_violations, pass)."""
    spark = df.sparkSession
    row_rules = [(name, pred) for name, pred in rules if pred is not None]
    uniq_rules = [name for name, pred in rules if pred is None]

    out = None
    if row_rules:
        # coalesce: SUM over zero rows is NULL — an empty table (routine
        # for an empty partition at scale) must report 0 violations and
        # pass=true, not a NULL that neither passes nor fails the gate
        agg = df.agg(
            *[
                F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0)).alias(name)
                for name, pred in row_rules
            ]
        )
        stacked = " , ".join(f"'{n}', `{n}`" for n, _ in row_rules)
        out = agg.selectExpr(
            f"stack({len(row_rules)}, {stacked}) AS (rule, n_violations)"
        )
    for name in uniq_rules:
        cols = name.split(":", 1)[1].split(",")
        dup = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n_violations"))
            .select(F.lit(name).alias("rule"), "n_violations")
        )
        out = dup if out is None else out.unionByName(dup)
    if out is None:
        return spark.createDataFrame([], "table string, rule string, n_violations long, pass boolean")
    return out.select(
        F.lit(table).alias("table"),
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("pass"),
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    table: str,
) -> DataFrame:
    """Orphan count: child rows whose ``fk`` has no matching parent ``pk``
    — one anti-join (broadcast for dim parents, shuffle otherwise)."""
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti")
    return orphans.agg(F.count("*").alias("n_violations")).select(
        F.lit(table).alias("table"),
        F.lit(f"fk:{fk}->{pk}").alias("rule"),
        F.col("n_violations").cast("long"),
        (F.col("n_violations") == 0).alias("pass"),
    )
