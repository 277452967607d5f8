"""Strong rank audit applied to the BENCHED sketch-median plan.

``a1_grouped_median_sketch`` is the headline bench slot (one mergeable
streaming hash-agg, the actual 100 TB plan), but its DuckDB oracle only
checks an in-[min,max] flag — a much weaker invariant than the
rank-count audit that ``a1_grouped_median_approx`` carries (r9 ADVICE
nit).  The audit logic itself lives in
``operators.stats.sketch_median_rank_audit`` and runs inside EVERY
``tools/check_correctness.py`` sweep (r10 verdict ask #5 — the sweep
output carries a ``sketch_audit`` field that fails loudly on violation);
this test pins the same helper in the CI suite and keeps its semantics
honest on the tiny fixture: each group's percentile element must be a
genuine data element whose occupied rank interval intersects the
slackened window n*(0.5 ± 1%).
"""

from __future__ import annotations

from aspep_etl_spark.operators.stats import sketch_median_rank_audit


def test_sketch_median_rank_window(spark, sf_dir):
    res = sketch_median_rank_audit(spark, sf_dir)
    assert res["ok"], res["violations"]
    assert res["groups_checked"] >= 4, "audit skipped every group — fixture too small"
