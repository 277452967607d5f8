"""Value/structure tests for the round-6 batch-5 operators
(plans/analytics_r9.py): independent pandas/hashlib recomputations of
the item-item CF neighbors, the blocklist match counts, the Welch
t statistics, and the range-partition bucket counts; structural
invariants for the conformal gate; plan pins live in
test_physical_plans.py."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from aspep_etl_spark.plans.analytics_r9 import (
    _CF_MINSUP,
    _CF_TOPK,
    _RP_BUCKETS,
    _RP_SAMPLE_MOD,
    classifier_conformal,
    docs_blocklist_phrases,
    events_welch_ttest,
    items_cooccurrence_topk,
    layout_range_partition,
)


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def lineitem_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def docs_pd(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_items_cooccurrence_matches_python(spark, sf_dir, lineitem_pd):
    """Full pure-pandas recomputation of supports, pair counts, cosine,
    and the (cos desc, sup_ab desc, neighbor asc) top-k."""
    baskets = lineitem_pd[["l_orderkey", "l_partkey"]].drop_duplicates()
    sup = baskets.groupby("l_partkey").size().to_dict()
    from collections import Counter

    pc: Counter = Counter()
    for _, grp in baskets.groupby("l_orderkey"):
        items = sorted(grp["l_partkey"])
        if len(items) > 64:
            continue
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                pc[(items[i], items[j])] += 1
    rows = []
    for (x, y), c in pc.items():
        if c < _CF_MINSUP:
            continue
        rows.append((x, y, c, c / math.sqrt(sup[x] * sup[y])))
        rows.append((y, x, c, c / math.sqrt(sup[x] * sup[y])))
    exp = {}
    byitem: dict = {}
    for item, nb, c, cos in rows:
        byitem.setdefault(item, []).append((-cos, -c, nb))
    for item, cand in byitem.items():
        for rnk, (negcos, negc, nb) in enumerate(sorted(cand)[:_CF_TOPK], 1):
            exp[(item, nb)] = (-negc, round(-negcos, 4), rnk)
    got = {
        (r["item"], r["neighbor"]): (r["sup_ab"], r["cosine"], r["rnk"])
        for r in items_cooccurrence_topk(spark, sf_dir).collect()
    }
    assert got == exp


def test_blocklist_matches_python(spark, sf_dir, docs_pd):
    """Blocklist derivation (top-20 en bigrams by doc frequency, ties on
    the bigram string) and per-doc hit counts recomputed with re."""
    tok = {
        r.doc_id: re.findall("[a-z0-9]+", r.text.lower())
        for r in docs_pd.itertuples()
    }
    lang = dict(zip(docs_pd["doc_id"], docs_pd["lang"]))
    bigrams = {
        d: [f"{w[i]} {w[i + 1]}" for i in range(len(w) - 1)]
        for d, w in tok.items()
    }
    from collections import Counter

    df: Counter = Counter()
    for d, bgs in bigrams.items():
        if lang[d] == "en":
            df.update(set(bgs))
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    bl = {bg for bg, _ in top}
    exp = {}
    for d, bgs in bigrams.items():
        hits = [b for b in bgs if b in bl]
        if hits:
            exp[d] = (lang[d], len(hits), len(set(hits)))
    got = {
        r["doc_id"]: (r["lang"], r["n_hits"], r["n_phrases"])
        for r in docs_blocklist_phrases(spark, sf_dir).collect()
    }
    assert got == exp


def test_welch_matches_python(spark, sf_dir):
    """t statistic and Welch–Satterthwaite df recomputed from
    cent-quantized integer moments (sanity: scipy-free closed form)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["v"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    mom = {}
    for t, grp in ev.groupby("event_type"):
        n = len(grp)
        s1 = int(grp["v"].sum())
        s2 = int((grp["v"] * grp["v"]).sum())
        mom[t] = (n, s1, s2)
    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["t_stat"], r["welch_df"])
        for r in events_welch_ttest(spark, sf_dir).collect()
    }
    assert len(got) == 10
    for (ta, tb), (na, nb, tstat, wdf) in got.items():
        (n1, s1a, s2a), (n2, s1b, s2b) = mom[ta], mom[tb]
        assert (na, nb) == (n1, n2)
        va = (s2a - s1a * s1a / n1) / (n1 - 1)
        vb = (s2b - s1b * s1b / n2) / (n2 - 1)
        se2 = va / n1 + vb / n2
        t = (s1a / n1 - s1b / n2) / math.sqrt(se2)
        df = se2 * se2 / (
            (va / n1) ** 2 / (n1 - 1) + (vb / n2) ** 2 / (n2 - 1)
        )
        assert tstat == pytest.approx(t, abs=2e-4)
        assert wdf == pytest.approx(df, abs=2e-4)


def test_range_partition_matches_python(spark, sf_dir):
    """Boundary election (md5 1/128 sample, ntile maxima) and bucket
    assignment recomputed in pandas; buckets must tile the key space."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    keys = sorted(
        k
        for k in orders["o_orderkey"]
        if _md5i(str(k)) % _RP_SAMPLE_MOD == 0
    )
    n = len(keys)
    # ntile: first n % B tiles get one extra row
    base, extra = divmod(n, _RP_BUCKETS)
    bounds, pos = [], 0
    for tile in range(1, _RP_BUCKETS):
        pos += base + (1 if tile <= extra else 0)
        bounds.append(keys[pos - 1])
    cnt: dict = {}
    for k in orders["o_orderkey"]:
        bucket = sum(1 for x in bounds if k > x) + 1
        cnt[bucket] = cnt.get(bucket, 0) + 1
    rows = layout_range_partition(spark, sf_dir).collect()
    got = {r["bucket"]: r["n_rows"] for r in rows}
    assert got == cnt
    assert sum(got.values()) == len(orders)
    # contiguous, non-overlapping key ranges
    srt = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(srt, srt[1:]):
        assert a["max_key"] < b["min_key"]
    for r in rows:
        assert r["balance"] == pytest.approx(
            r["n_rows"] * _RP_BUCKETS / len(orders), abs=1e-4
        )


def test_conformal_structure(spark, sf_dir, docs_pd):
    """Split accounting, the ⌈0.9(n_cal+1)⌉ rank, and range invariants;
    the value-exactness gate is the DuckDB oracle."""
    row = classifier_conformal(spark, sf_dir).collect()[0]
    n_scorable = sum(
        1
        for r in docs_pd.itertuples()
        if re.findall("[a-z0-9]+", r.text.lower())
    )
    n_cal_exp = sum(
        1
        for r in docs_pd.itertuples()
        if re.findall("[a-z0-9]+", r.text.lower())
        and _md5i(f"conf|{r.doc_id}") % 5 == 0
    )
    assert row["n_cal"] == n_cal_exp
    assert row["n_cal"] + row["n_eval"] == n_scorable
    assert row["k"] == math.ceil(0.9 * (row["n_cal"] + 1))
    assert 0 <= row["thr6"] <= 1000000
    assert 0.0 <= row["coverage"] <= 1.0
    assert 0.0 <= row["avg_set_size"] <= 2.0  # binary task: set ⊆ {0,1}
    # every covered true label is in the prediction set, so mean set size
    # can never be below empirical coverage
    assert row["avg_set_size"] >= row["coverage"]


def test_cuped_matches_python(spark, sf_dir):
    """Exact pandas recomputation of the pooled theta, per-variant raw
    and adjusted means, and rho2 from integer cent moments."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    pre = ev["ts"] < pd.Timestamp("2024-01-15")  # epoch + 14 days
    cents = (ev["value"] * 100).apply(math.floor).astype("int64")
    ev = pd.DataFrame(
        {
            "u": ev["user_id"],
            "x": cents.where(pre, 0),
            "y": cents.where(~pre, 0),
        }
    )
    ug = ev.groupby("u").agg(x=("x", "sum"), y=("y", "sum")).reset_index()
    ug["variant"] = ug["u"].map(lambda u: _md5i(f"ab|{u}") % 2)
    n = len(ug)
    sx, sy = int(ug.x.sum()), int(ug.y.sum())
    sxy = int((ug.x * ug.y).sum())
    sxx = int((ug.x * ug.x).sum())
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    xbar_all = sx / n
    from aspep_etl_spark.plans.analytics_r9 import events_cuped_adjustment

    got = {
        r["variant"]: r for r in events_cuped_adjustment(spark, sf_dir).collect()
    }
    assert set(got) == {0, 1}
    for v, grp in ug.groupby("variant"):
        r = got[v]
        assert r["n_users"] == len(grp)
        xbar_v, ybar_v = grp.x.sum() / len(grp), grp.y.sum() / len(grp)
        assert r["mean_pre"] == pytest.approx(xbar_v / 100, abs=1e-3)
        assert r["mean_post"] == pytest.approx(ybar_v / 100, abs=1e-3)
        assert r["theta"] == pytest.approx(theta, abs=1e-3)
        assert r["mean_adjusted"] == pytest.approx(
            (ybar_v - theta * (xbar_v - xbar_all)) / 100, abs=1e-3
        )


def test_eb_shrinkage_matches_python(spark, sf_dir):
    """MoM alpha/beta and shrunk rates recomputed from integer p6."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    g = ev.groupby("user_id")["event_type"]
    n = g.apply(lambda s: int(s.isin(["click", "view"]).sum()))
    k = g.apply(lambda s: int((s == "purchase").sum()))
    df = pd.DataFrame({"n": n, "k": k}).query("n >= 10")
    p6 = (df.k * 1000000) // df.n
    nu, sp, spp = len(df), int(p6.sum()), int((p6 * p6).sum())
    m1 = sp / nu / 1e6
    var = (spp - sp * sp / nu) / (nu - 1) / 1e12
    common = m1 * (1 - m1) / var - 1
    alpha, beta = m1 * common, (1 - m1) * common
    from aspep_etl_spark.plans.analytics_r9 import user_rate_shrinkage

    rows = user_rate_shrinkage(spark, sf_dir).collect()
    top = df.sort_values(["n"], ascending=False)
    top = top.reset_index().sort_values(["n", "user_id"], ascending=[False, True])
    exp_users = list(top["user_id"].head(20))
    assert [r["user_id"] for r in sorted(rows, key=lambda r: (-r["n"], r["user_id"]))] == exp_users
    for r in rows:
        assert r["alpha"] == pytest.approx(alpha, abs=1e-3)
        assert r["beta"] == pytest.approx(beta, abs=1e-3)
        assert r["shrunk_rate"] == pytest.approx(
            (r["k"] + alpha) / (r["n"] + alpha + beta), abs=1e-3
        )
        # shrinkage pulls toward the prior mean, never past it
        prior_mean = alpha / (alpha + beta)
        lo, hi = sorted((r["raw_rate"], prior_mean))
        assert lo - 1e-3 <= r["shrunk_rate"] <= hi + 1e-3


def test_nb_crossval_matches_python(spark, sf_dir, docs_pd):
    """Full pure-Python K-fold CV recomputation: per-fold
    leave-fold-out counts, Laplace smoothing, position-ordered log10
    sums, argmax with class-asc tie-break, per-fold accuracy."""
    from collections import Counter, defaultdict

    K = 5
    docs = [
        (r.doc_id, r.lang, re.findall("[a-z0-9]+", r.text.lower()))
        for r in docs_pd.itertuples()
    ]
    fold = {d: _md5i(f"cv|{d}") % K for d, _, _ in docs}
    cw_g: Counter = Counter()
    cw_f: Counter = Counter()
    wg: Counter = Counter()
    wf: Counter = Counter()
    n_c: Counter = Counter()
    n_cf: Counter = Counter()
    n_f: Counter = Counter()
    for d, lang, toks in docs:
        f = fold[d]
        n_c[lang] += 1
        n_cf[(lang, f)] += 1
        n_f[f] += 1
        for w in toks:
            cw_g[(lang, w)] += 1
            cw_f[(lang, w, f)] += 1
            wg[w] += 1
            wf[(w, f)] += 1
    n_all = len(docs)
    langs = sorted(n_c)
    vf = {
        f: sum(1 for w in wg if wg[w] > wf.get((w, f), 0)) for f in range(K)
    }
    tot_g = Counter()
    tot_f = Counter()
    for (c, w), v in cw_g.items():
        tot_g[c] += v
    for (c, w, f), v in cw_f.items():
        tot_f[(c, f)] += v
    hits: dict = defaultdict(lambda: [0, 0])
    for d, lang, toks in docs:
        if not toks:
            continue
        f = fold[d]
        best = None
        for c in langs:
            lp = math.log10(
                (n_c[c] - n_cf.get((c, f), 0)) / (n_all - n_f[f])
            )
            s = 0.0
            denom = tot_g[c] - tot_f.get((c, f), 0) + vf[f]
            for w in toks:
                cnt = cw_g.get((c, w), 0) - cw_f.get((c, w, f), 0)
                s += math.log10((cnt + 1) / denom)
            score = lp + s
            if best is None or score > best[0] or (
                score == best[0] and c < best[1]
            ):
                best = (score, c)
        hits[f][0] += 1
        hits[f][1] += int(best[1] == lang)
    from aspep_etl_spark.plans.analytics_r9 import docs_nb_crossval

    got = {
        r["fold"]: (r["n_docs"], r["n_correct"], r["accuracy"])
        for r in docs_nb_crossval(spark, sf_dir).collect()
    }
    assert set(got) == set(range(K))
    for f in range(K):
        nd, nc = hits[f]
        assert got[f][0] == nd
        assert got[f][1] == nc
        assert got[f][2] == pytest.approx(nc / nd, abs=1e-4)


def test_k_anonymity_matches_python(spark, sf_dir):
    """Exact pandas recomputation of the QI class-size histogram,
    k-violation counts, and minimum l-diversity."""
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cust["band"] = (cust["c_acctbal"] / 1000.0).apply(math.floor).astype("int64")
    cust["sens"] = (cust["c_acctbal"] < 0).astype("int64")
    cls = (
        cust.groupby(["c_nationkey", "c_mktsegment", "band"])
        .agg(sz=("sens", "size"), l=("sens", "nunique"))
        .reset_index()
    )
    exp = {}
    for sz, grp in cls.groupby("sz"):
        exp[sz] = (
            len(grp),
            int(sz * len(grp)),
            int(sz * len(grp)) if sz < 5 else 0,
            int(grp["l"].min()),
        )
    from aspep_etl_spark.plans.analytics_r9 import customer_k_anonymity

    got = {
        r["cls_size"]: (
            r["n_classes"],
            r["n_rows"],
            r["rows_violating_k"],
            r["min_l_diversity"],
        )
        for r in customer_k_anonymity(spark, sf_dir).collect()
    }
    assert got == exp


def test_reconciliation_matches_python(spark, sf_dir, lineitem_pd):
    """Bucket signatures and mismatch flags recomputed with hashlib;
    the fault injection must corrupt exactly the hash-selected rows."""
    rows = []
    faults = 0
    for r in lineitem_pd.itertuples():
        pc = math.floor(r.l_extendedprice * 100)
        if _md5i(f"{r.l_orderkey}~{r.l_linenumber}") % 9973 == 0:
            pc2 = pc + 1
            faults += 1
        else:
            pc2 = pc
        rows.append((r.l_orderkey, r.l_linenumber, r.l_partkey, pc, pc2))
    from collections import defaultdict

    sig = defaultdict(lambda: [0, 0, 0, 0])
    for ok, ln, pk, pc, pc2 in rows:
        ha = _md5i(f"{ok}|{ln}|{pk}|{pc}")
        hb = _md5i(f"{ok}|{ln}|{pk}|{pc2}")
        sa, sb = sig[ha % 64], sig[hb % 64]
        sa[0] += 1
        sa[1] += ha
        sb[2] += 1
        sb[3] += hb
    from aspep_etl_spark.plans.analytics_r9 import lineitem_reconciliation

    got = {r["bucket"]: r for r in lineitem_reconciliation(spark, sf_dir).collect()}
    assert set(got) == set(sig)
    n_mismatch = 0
    for b, (sr, ss, dr, ds) in sig.items():
        r = got[b]
        assert (r["src_rows"], r["src_sum"], r["dst_rows"], r["dst_sum"]) == (
            sr,
            ss,
            dr,
            ds,
        )
        assert r["is_match"] == int(sr == dr and ss == ds)
        n_mismatch += 1 - r["is_match"]
    # every corrupted row perturbs its bucket's sum; collisions that
    # cancel across ≤ a handful of faults are measure-zero
    if faults:
        assert n_mismatch >= 1
