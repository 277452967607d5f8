#!/usr/bin/env python
"""Self-audit: the per-round copy/padding/leak checks, runnable locally.

Writes AUDIT.md with:
- max difflib similarity of every repo source file against every
  reference source file (quick_ratio prefilter, real ratio on
  candidates) — the copy detector's view;
- a stub scan (NotImplementedError / bare `pass` / `...` bodies);
- a grep for strings that would indicate non-public provenance;
- a regression-shape scan (r8 verdict ask #7) that mechanically re-checks
  the classes of defect past ADVICE rounds fixed by hand:
  (a) non-broadcast ``crossJoin`` sites outside the documented allowlist
  (the brute-force dedup oracle baseline and the query-batch-bounded
  negative samplers are the only sanctioned ones);
  (b) ``.persist()`` in ``operators/`` files with no in-file release
  evidence (``unpersist``/``localCheckpoint``/``free_cached_blocks`` —
  iterative operators must free inline; ``plans/`` contract queries rely
  on the caller's ``free_cached_blocks`` sweep by convention and are
  exempt);
  (c) truncated-hash IDs (``hexdigest()[:8]``-style 32-bit slices used as
  identifiers — the r7 asset-id collision shape);
  (d) ``Exchange SinglePartition`` / ``CartesianProduct`` nodes in the
  committed PLANS.md (both must stay at zero).

Usage: python tools/self_audit.py
"""

from __future__ import annotations

import difflib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

FOREIGN_PATTERNS = [
    r"(?i)proprietary",
    r"(?i)confidential",
    r"s3://(?!bucket|example|my-)",  # real-looking bucket URIs
    r"(?i)internal[-_ ]only",
]


def repo_sources() -> list[str]:
    out = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs if d not in {".git", "__pycache__", ".claude"}]
        for f in files:
            if f.endswith(".py") and f != "self_audit.py":  # skip self-matches
                out.append(os.path.join(root, f))
    return sorted(out)


def reference_sources() -> list[str]:
    out = []
    for root, _, files in os.walk(REFERENCE):
        for f in files:
            if f.endswith((".py", ".go", ".rs", ".cc", ".cpp", ".java", ".sql")):
                out.append(os.path.join(root, f))
    return sorted(out)


def max_similarity(path: str, refs: list[tuple[str, str]]) -> tuple[float, str]:
    a = open(path, errors="ignore").read()
    best, best_ref = 0.0, ""
    for ref_path, b in refs:
        sm = difflib.SequenceMatcher(None, a, b)
        if sm.quick_ratio() <= best:
            continue
        r = sm.ratio()
        if r > best:
            best, best_ref = r, ref_path
    return best, best_ref


def stub_scan(paths: list[str]) -> list[str]:
    hits = []
    for p in paths:
        src = open(p, errors="ignore").read()
        n_nie = len(re.findall(r"NotImplementedError", src))
        if n_nie:
            hits.append(f"{os.path.relpath(p, REPO)}: {n_nie} NotImplementedError")
        n_pass = len(re.findall(r"^\s*pass\s*$", src, re.M))
        if n_pass:
            hits.append(f"{os.path.relpath(p, REPO)}: {n_pass} bare `pass`")
    return hits


def foreign_scan(paths: list[str]) -> list[str]:
    hits = []
    for p in paths:
        src = open(p, errors="ignore").read()
        for pat in FOREIGN_PATTERNS:
            for m in re.finditer(pat, src):
                line = src.count("\n", 0, m.start()) + 1
                hits.append(f"{os.path.relpath(p, REPO)}:{line}: /{pat}/")
    return hits


# Documented non-broadcast crossJoin sites (file basename, context regex).
# The regex is matched against a ±200-char window AROUND each occurrence —
# never against the whole file — so one sanctioned site cannot blanket-exempt
# a future unbroadcast crossJoin added elsewhere in the same file.
CROSSJOIN_ALLOWLIST = [
    # brute-force oracle baseline (documented in dedup.py)
    ("dedup.py", r"a\.crossJoin\(b\)"),
    # query-batch-bounded negative samplers: broadcast(queries) is on the
    # LEFT of the crossJoin, so the tail-window broadcast check misses it
    ("llm_extra.py", r"crossJoin\(\s*emb\.select\(F\.col\(\"vec_id\"\)\.alias\(\"cand_id\"\)\)"),
]


def regression_shape_scan(paths: list[str]) -> list[str]:
    hits: list[str] = []
    for p in paths:
        rel = os.path.relpath(p, REPO)
        if rel.startswith("tests" + os.sep) or rel.startswith("tools" + os.sep):
            continue
        src = open(p, errors="ignore").read()
        base = os.path.basename(p)
        # (a) non-broadcast crossJoin outside the allowlist
        for m in re.finditer(r"\.crossJoin\(", src):
            tail = src[m.start() : m.start() + 120]
            if "broadcast" in tail:
                continue
            window = src[max(0, m.start() - 200) : m.start() + 200]
            if any(
                base == ab and re.search(apat, window)
                for ab, apat in CROSSJOIN_ALLOWLIST
            ):
                continue
            line = src.count("\n", 0, m.start()) + 1
            hits.append(f"{rel}:{line}: non-broadcast crossJoin outside allowlist")
        # (b) operators/ persist with no in-file release evidence
        if (os.sep + "operators" + os.sep) in p and ".persist()" in src:
            if not re.search(r"unpersist|localCheckpoint|free_cached_blocks", src):
                hits.append(f"{rel}: .persist() with no in-file release evidence")
        # (c) truncated 32-bit hash slices used as IDENTIFIERS (python-side).
        # A slice immediately reduced with `%` is a parity/bucket draw
        # (bounded collision domain by design, e.g. the JL ±1 matrix);
        # the defect shape is the un-modded slice carried as an identity.
        for m in re.finditer(r"hexdigest\(\)\[:8\]", src):
            if "%" in src[m.end() : m.end() + 40]:
                continue
            line = src.count("\n", 0, m.start()) + 1
            hits.append(f"{rel}:{line}: 32-bit hexdigest slice (collision-prone id)")
    plans_md = os.path.join(REPO, "PLANS.md")
    if os.path.exists(plans_md):
        txt = open(plans_md, errors="ignore").read()
        for bad in ("Exchange SinglePartition", "CartesianProduct"):
            n = txt.count(bad)
            if n:
                hits.append(f"PLANS.md: {n}x {bad}")
    return hits


def oracle_runtime_audit(flag_sec: float = 8.0) -> tuple[list[str], list[str]]:
    """Re-time the cached slowest DuckDB oracles at sf0.1 (r9 verdict ask
    #5): the CLAUDE.md audit line is "every ORACLE_SQL < 8 s at sf0.1 in
    plain DuckDB" — the mechanical tripwire for DuckDB 1.0's plain-CTE
    inlining trap (a CTE read k times re-evaluates its upstream k×,
    multiplicative through levels).  Timing all 243 every audit is ~2
    min, so this re-times the cached top-15 from the last full sweep
    (tools/oracle_slow_list.json, regenerate with
    ``audit_oracle_times.py --write-cache``); a NEW oracle can only
    become slowest by being edited, which is when the full sweep should
    rerun.  Returns (report_lines, flagged_lines)."""
    import json
    import time

    cache_path = os.path.join(REPO, "tools", "oracle_slow_list.json")
    if not os.path.exists(cache_path):
        return (
            ["- no cache: run `python tools/audit_oracle_times.py --write-cache`"],
            ["oracle_slow_list.json missing"],
        )
    cache = json.load(open(cache_path))
    names = [e["name"] for e in cache["slowest"]]
    try:
        import duckdb

        import sys

        sys.path.insert(0, REPO)
        import __spark_entry__ as contract

        oracles = contract.oracle_sql()
        con = duckdb.connect()
        con.execute("PRAGMA threads=16")
        sf = cache.get("sf", "/root/testdata/sf0.1")
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            p = f"{sf}/{t}.parquet"
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        timed = []
        for name in names:
            sql = oracles.get(name)
            if sql is None:
                timed.append((0.0, name, "MISSING from oracle_sql()"))
                continue
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                timed.append((time.time() - t0, name, None))
            except Exception as exc:  # noqa: BLE001
                timed.append((time.time() - t0, name, str(exc)[:120]))
    except Exception as exc:  # noqa: BLE001
        return ([f"- audit failed: {exc}"], [f"oracle audit error: {exc}"])
    timed.sort(reverse=True)
    lines = [
        f"Cached top-{len(names)} oracles re-timed at sf0.1 "
        f"(flag > {flag_sec:.0f} s; cache from a {cache.get('n_timed_full_sweep', '?')}"
        "-oracle full sweep):",
        "",
        "| sec | oracle | cached sec |",
        "|---|---|---|",
    ]
    cached_by_name = {e["name"]: e["sec_at_cache_time"] for e in cache["slowest"]}
    for dt, name, err in timed[:5]:
        lines.append(f"| {dt:.2f} | {name} | {cached_by_name.get(name, '?')} |")
    flagged = [
        f"{name}: {dt:.2f}s{' ' + err if err else ''}"
        for dt, name, err in timed
        if dt > flag_sec or err
    ]
    return lines, flagged


def main() -> None:
    repo = repo_sources()
    refs = [(p, open(p, errors="ignore").read()) for p in reference_sources()]
    sims = []
    for p in repo:
        r, ref = max_similarity(p, refs)
        sims.append((r, os.path.relpath(p, REPO), os.path.relpath(ref, REFERENCE) if ref else "-"))
    sims.sort(reverse=True)

    lines = [
        "# AUDIT — copy / padding / provenance self-checks",
        "",
        "Generated by `python tools/self_audit.py`.",
        "",
        "## Top file similarities vs the reference (difflib ratio)",
        "",
        "| ratio | repo file | closest reference file |",
        "|---|---|---|",
    ]
    for r, p, ref in sims[:15]:
        lines.append(f"| {r:.3f} | {p} | {ref} |")
    lines += [
        "",
        f"Files scanned: {len(repo)} repo vs {len(refs)} reference; "
        f"max ratio {sims[0][0]:.3f} ({sims[0][1]}).",
        "",
        "## Stub scan",
        "",
    ]
    stubs = stub_scan(repo)
    lines += [f"- {s}" for s in stubs] or ["- none"]
    lines += ["", "## Provenance string scan", ""]
    foreign = foreign_scan(repo)
    lines += [f"- {s}" for s in foreign] or ["- none"]
    lines += ["", "## Regression-shape scan (fixed-ADVICE patterns)", ""]
    shapes = regression_shape_scan(repo)
    lines += [f"- {s}" for s in shapes] or ["- none"]
    lines += ["", "## Oracle runtime audit (DuckDB, sf0.1)", ""]
    oracle_lines, oracle_flagged = oracle_runtime_audit()
    lines += oracle_lines
    lines += ["", "Flagged (> 8 s or error):", ""]
    lines += [f"- {s}" for s in oracle_flagged] or ["- none"]
    lines.append("")
    out = os.path.join(REPO, "AUDIT.md")
    open(out, "w").write("\n".join(lines))
    print(
        f"wrote {out}: max_sim={sims[0][0]:.3f} stubs={len(stubs)} "
        f"foreign={len(foreign)} shapes={len(shapes)} "
        f"oracle_flagged={len(oracle_flagged)}"
    )


if __name__ == "__main__":
    main()
