#!/usr/bin/env python
"""Assemble BENCH_local_sf1.json — the sf0.1 → sf1 dress-rehearsal
scaling curve (r4 verdict ask #6) — from three bench JSON lines:

    tier @ sf0.1, tier @ sf1 (tools/bench_tier.py), headline @ sf1
    (bench.py), passed as file args or read from a combined log.

Emits per-query sf1/sf0.1 ratios for the scale tier; rows scale 10×, so
a map-shaped or bucketed query should land well under 10× wall-clock on
an idle-core-saturated host, and anything far above 10× flags
superlinear candidate growth.
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_bench2.txt"
    blobs = [
        json.loads(m)
        for m in re.findall(r"^\{.*\}$", open(src).read(), flags=re.M)
    ]
    tier01 = next(
        b for b in blobs if b["metric"] == "scale_tier_total" and b["sf"] == 0.1
    )
    tier1 = next(
        b for b in blobs if b["metric"] == "scale_tier_total" and b["sf"] == 1
    )
    head1 = next(b for b in blobs if b["metric"] != "scale_tier_total")
    ratios = {
        q: round(tier1["queries"][q] / tier01["queries"][q], 2)
        for q in tier1["queries"]
        if q in tier01["queries"] and tier01["queries"][q] > 0
    }
    # Output-normalized scaling (r7 verdict ask #2): for pair-emitting
    # queries the OUTPUT legitimately grows ~k² under a k-tiled corpus
    # (every name has k copies ⇒ each original match becomes k² pairs),
    # so raw wall ratio penalizes output growth.  work_per_output_ratio
    # = (t_sf1/rows_sf1) / (t_sf0.1/rows_sf0.1): ~flat (or falling)
    # means compute is output-proportional; only a query superlinear in
    # BOTH wall and work-per-row is a real scaling defect.
    rows01 = tier01.get("rows_out", {})
    rows1 = tier1.get("rows_out", {})
    rows_out_ratio = {
        q: round(rows1[q] / rows01[q], 2)
        for q in rows1
        if rows01.get(q)
    }
    # a query emitting 0 rows at sf1 keeps its rows_out_ratio (0.0) but is
    # excluded from the per-row normalization — sec/row is undefined there
    work_per_output_ratio = {
        q: round(
            (tier1["queries"][q] / rows1[q])
            / (tier01["queries"][q] / rows01[q]),
            2,
        )
        for q in rows_out_ratio
        if q in ratios and rows1.get(q)
    }
    out = {
        "sf1_headline": head1,
        "tier_sf0_1": tier01,
        "tier_sf1": tier1,
        "tier_ratio_sf1_over_sf0_1": ratios,
        "rows_out_ratio_sf1_over_sf0_1": rows_out_ratio,
        "work_per_output_ratio_sf1_over_sf0_1": work_per_output_ratio,
        "rows_ratio": 10.0,
        "note": (
            "ratio well under 10 = idle-core headroom absorbs the growth; "
            "~10 = compute-bound linear; far over 10 = superlinear "
            "candidate growth (see PERF.md sf1 findings). For queries "
            "whose rows_out_ratio exceeds the data ratio (pair emitters "
            "under tiling), judge work_per_output_ratio instead: ~1 = "
            "output-proportional compute."
        ),
    }
    with open("BENCH_local_sf1.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "BENCH_local_sf1.json", "ratios": ratios}))


if __name__ == "__main__":
    main()
