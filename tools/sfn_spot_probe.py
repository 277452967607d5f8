#!/usr/bin/env python
"""sf1 → sf10 spot-probe of the worst sf1 tier ratios (r8 verdict ask #3).

The r8 artifact explains the residual 4–6× sf0.1→sf1 ratios of a handful
of tier queries as "amortization over the scheduling floor" — a claim
this probe converts into evidence: if the cause is a fixed floor in the
small-SF denominator, the sf1→sf10 wall ratio must flatten toward ~10×
(linear in rows); superlinear growth (>15×) would falsify it and flag a
real candidate-generation defect.

Methodology matches bench.py: per SF, one untimed plan-identical warmup
pass (noop write), then timed passes with the per-query MINIMUM reported
(2 passes minimum, auto-extended to 4 while the time-weighted second-best
spread exceeds 5%), loadavg recorded.  Writes BENCH_local_sf10.json.

Usage: python tools/sfn_spot_probe.py [query ...]
  SPARK_GRAFT_SF1_DIR  (default .localdata/sf1)
  SPARK_GRAFT_SF10_DIR (default .localdata/sf10, tools/make_sfn.py 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".localdata", "sf1"))
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".localdata", "sf10"))

# the five worst sf0.1→sf1 tier ratios of the r8 artifact, plus the r9
# worst list (verdict ask #2): the pair-emitting embedding near-dup and
# the capped CV twin, judged on work per emitted row via rows_out
DEFAULT_QUERIES = [
    "docs_nb_crossval",
    "classifier_conformal",
    "dedup_simhash",
    "docs_dsir_weights",
    "docs_ngram_novelty",
    "dedup_embedding_cosine",
    "docs_nb_crossval_capped",
]


def loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


def main() -> None:
    from aspep_etl_spark.cache import free_cached_blocks
    from aspep_etl_spark.plans.contract import SPARK_QUERIES
    from aspep_etl_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(
        app_name="sfn-spot-probe",
        extra_conf={
            # same split sizing as the committed sf1 artifact runs
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"
            ),
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    load_before = loadavg()
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf1", SF1), ("sf10", SF10)):
        obs: dict[str, list[float]] = {q: [] for q in names}
        # ADAPTIVE untimed warmup (the r10 JIT finding, PERF.md): repeat
        # until two consecutive warmup runs agree within 12% (cap 3) so
        # the timed passes start JIT-settled instead of partway down the
        # compile-decay curve.
        for q in names:
            prev = None
            for _ in range(3):
                t0 = time.time()
                SPARK_QUERIES[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                free_cached_blocks(spark)
                if prev is not None and abs(dt - prev) <= 0.12 * prev:
                    break
                prev = dt
        for p in range(4):
            for q in names:
                t0 = time.time()
                SPARK_QUERIES[q](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                obs[q].append(round(time.time() - t0, 3))
                free_cached_blocks(spark)
                print(f"PASS{p} {sf_label} {q}: {obs[q][-1]}s", flush=True)
            if p >= 1:
                best = sum(sorted(o)[0] for o in obs.values())
                second = sum(sorted(o)[1] for o in obs.values())
                if best > 0 and (second - best) <= 0.05 * best:
                    break
        # rows_out: untimed counted run per query — pair emitters must be
        # judged on WORK PER EMITTED ROW, not raw wall ratio (r9 ask #2)
        rows_out = {}
        for q in names:
            rows_out[q] = SPARK_QUERIES[q](spark, sf_dir).count()
            free_cached_blocks(spark)
        results[sf_label] = {
            "queries": {q: min(o) for q, o in obs.items()},
            "rows_out": rows_out,
            "spread_pct": {
                q: round(100.0 * (sorted(o)[1] - sorted(o)[0]) / sorted(o)[0], 1)
                for q, o in obs.items()
                if len(o) >= 2 and sorted(o)[0] > 0
            },
            "passes": max(len(o) for o in obs.values()),
        }
    spark.stop()
    t1, t10 = results["sf1"]["queries"], results["sf10"]["queries"]
    r1, r10 = results["sf1"]["rows_out"], results["sf10"]["rows_out"]
    wall_ratio = {q: round(t10[q] / t1[q], 2) for q in names if t1.get(q)}
    rows_out_ratio = {
        q: round(r10[q] / r1[q], 2) for q in names if r1.get(q)
    }
    out = {
        "probe": "sf1->sf10 spot-probe of the worst sf1 tier ratios (r8+r9 lists)",
        "rows_ratio": 10.0,
        "sf1": results["sf1"],
        "sf10": results["sf10"],
        "ratio_sf10_over_sf1": wall_ratio,
        "rows_out_ratio": rows_out_ratio,
        # wall growth per unit of output growth: ~1 = output-proportional
        # (pair emitters earning their wall), <1 = sublinear in output
        "work_per_output_ratio": {
            q: round(wall_ratio[q] / rows_out_ratio[q], 2)
            for q in wall_ratio
            if rows_out_ratio.get(q)
        },
        "loadavg_before": load_before,
        "loadavg_after": loadavg(),
        "note": (
            "~10x = compute-bound linear in rows; well under 10x = the "
            "small-SF number carried a fixed scheduling/setup floor "
            "(the amortization explanation holds); >15x = superlinear — "
            "a real scaling defect needing the linkage treatment — UNLESS "
            "rows_out grows comparably (work_per_output_ratio ~<= 1), "
            "which exonerates a pair emitter."
        ),
    }
    path = os.path.join(REPO, "BENCH_local_sf10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path, "ratios": out["ratio_sf10_over_sf1"]}))


if __name__ == "__main__":
    main()
