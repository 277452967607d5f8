"""Shared DuckDB-oracle helpers.

``SPARK_ROUND4_MACRO`` — the cross-engine HALF_UP round: Spark's
``round(double, 4)`` rounds the SHORTEST decimal representation that
round-trips (BigDecimal(Double.toString) semantics), while DuckDB
rounds in scaled double math; they diverge when the value sits at a
.5·10⁻⁴ boundary of its shortest repr (~1 in 3k values, see PERF.md).
The macro reproduces Spark's semantics in DuckDB: find the first %.Ng
printf that round-trips, parse it as DECIMAL(38,24), round HALF_UP.
Prepend to any oracle whose round-4 output column has enough rows for
the boundary to bite; keep plain ``round`` for handful-of-rows outputs.
"""

SPARK_ROUND4_MACRO = (
    "CREATE OR REPLACE MACRO spark_round4(x) AS list_transform([x::DOUBLE], rx ->\n"
    "  round(CAST((CASE "
    + " ".join(
        f"WHEN CAST(printf('%.{n}g', rx) AS DOUBLE) = rx THEN printf('%.{n}g', rx)"
        for n in range(1, 17)
    )
    + " ELSE printf('%.17g', rx) END) AS DECIMAL(38,24)), 4)::DOUBLE)[1];\n"
)
