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


def test_nb_crossval_capped_matches_python_and_handles_oov(spark, tmp_path):
    """Pure-Python recompute of the CAPPED contract on a constructed
    corpus that exercises the all-OOV branch: vocabulary is words with
    document frequency ≥ max(2, ceil(n/1000)) = 2, so the two docs
    built entirely from singleton words carry no model evidence and
    must be classified by the fold prior alone."""
    from collections import Counter

    K = 5
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        # shared, frequent words (df >> 2) plus a per-doc singleton
        common = ("alpha beta " if lang == "aa" else "gamma delta ") * 3
        rows.append((i, lang, common + f"singleton{i}"))
    # two all-OOV docs: every word unique to the doc
    rows.append((100, "aa", "zzonlyhere1 zzonlyhere2"))
    rows.append((101, "bb", "qqonlyhere1 qqonlyhere2"))
    pd.DataFrame(rows, columns=["doc_id", "lang", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )

    docs = [(d, l, re.findall("[a-z0-9]+", t.lower())) for d, l, t in rows]
    fold = {d: _md5i(f"cv|{d}") % K for d, _, _ in docs}
    n_all = len(docs)
    min_df = max(2, -(-n_all // 1000))
    df_w: Counter = Counter()
    for _, _, toks in docs:
        for w in set(toks):
            df_w[w] += 1
    vocab = {w for w, c in df_w.items() if c >= min_df}
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
            if w in vocab:
                cw_g[(lang, w)] += 1
                cw_f[(lang, w, f)] += 1
                wg[w] += 1
                wf[(w, f)] += 1
    langs = sorted(n_c)
    vf = {f: sum(1 for w in wg if wg[w] > wf.get((w, f), 0)) for f in range(K)}
    tot_g: Counter = Counter()
    tot_f: Counter = Counter()
    for (c, _w), v in cw_g.items():
        tot_g[c] += v
    for (c, _w, f), v in cw_f.items():
        tot_f[(c, f)] += v
    exp = {f: [0, 0] for f in range(K)}
    oov_docs = []
    for d, lang, toks in docs:
        f = fold[d]
        invocab = sorted(Counter(w for w in toks if w in vocab).items())
        if not invocab:
            oov_docs.append(d)
        best = None
        for c in langs:
            lp = math.log10((n_c[c] - n_cf.get((c, f), 0)) / (n_all - n_f[f]))
            denom = tot_g[c] - tot_f.get((c, f), 0) + vf[f]
            s = 0.0
            for w, n in invocab:  # w-ascending, count-weighted
                cnt = cw_g.get((c, w), 0) - cw_f.get((c, w, f), 0)
                s += n * math.log10((cnt + 1) / denom)
            score = lp + s
            if best is None or score > best[0] or (score == best[0] and c < best[1]):
                best = (score, c)
        exp[f][0] += 1
        exp[f][1] += int(best[1] == lang)
    assert len(oov_docs) == 2  # the constructed branch is actually exercised

    from aspep_etl_spark.plans.analytics_r9 import docs_nb_crossval_capped

    got = {
        r["fold"]: (r["n_docs"], r["n_correct"], r["accuracy"])
        for r in docs_nb_crossval_capped(spark, str(tmp_path)).collect()
    }
    assert set(got) == {f for f in range(K) if exp[f][0] > 0}
    for f in got:
        nd, nc = exp[f]
        assert got[f][0] == nd and got[f][1] == nc
        assert got[f][2] == pytest.approx(nc / nd, abs=1e-4)


def test_nb_crossval_capped_plan_has_no_window_and_broadcasts_model(spark, sf_dir):
    """The class-vectorized scoring plan must carry the K-class fan-out
    inside arrays: no Window node anywhere, the model lookup a
    BroadcastHashJoin, and no SortMergeJoin at doc grain."""
    from aspep_etl_spark.plans.analytics_r9 import docs_nb_crossval_capped

    plan = docs_nb_crossval_capped(spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


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


def test_jl_audit_matches_numpy(spark, sf_dir):
    """Projection, squared-distance ratios, and the band histogram
    recomputed with numpy float64 in the same fold order."""
    import numpy as np

    from aspep_etl_spark.plans.analytics_r9 import (
        _jl_matrix,
        embedding_jl_audit,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    R = np.array(_jl_matrix(), dtype=np.float64)
    # same index-ordered left fold: numpy dot over 64 floats agrees with
    # the sequential fold only up to ulps — recompute sequentially
    def proj(x):
        return np.array(
            [sum(x[i] * R[j, i] for i in range(64)) / 4.0 for j in range(16)]
        )

    ids = emb["vec_id"].to_numpy()
    P = {i: proj(X[n]) for n, i in enumerate(ids)}
    Xd = {i: X[n] for n, i in enumerate(ids)}
    bands: dict = {}
    for i in ids:
        if i + 1 not in P:
            continue
        num = sum((P[i][j] - P[i + 1][j]) ** 2 for j in range(16))
        den = sum((Xd[i][j] - Xd[i + 1][j]) ** 2 for j in range(64))
        ratio = num / den
        b = math.floor(ratio * 10)
        lo, hi, c = bands.get(b, (ratio, ratio, 0))
        bands[b] = (min(lo, ratio), max(hi, ratio), c + 1)
    got = {
        r["ratio_band"]: (r["n_pairs"], r["min_ratio"], r["max_ratio"])
        for r in embedding_jl_audit(spark, sf_dir).collect()
    }
    assert set(got) == set(bands)
    for b, (lo, hi, c) in bands.items():
        assert got[b][0] == c
        assert got[b][1] == pytest.approx(round(lo, 4), abs=1e-4)
        assert got[b][2] == pytest.approx(round(hi, 4), abs=1e-4)
    # JL with k=16 should keep most pairs within ~2x distortion
    total = sum(c for _, _, c in bands.values())
    near = sum(c for b, (_, _, c) in bands.items() if 2 <= b <= 19)
    assert near / total > 0.9


def test_ucb1_replay_matches_python(spark, sf_dir):
    """Day-by-day UCB1 replay recomputed in pure Python."""
    from collections import defaultdict

    from aspep_etl_spark.plans.analytics_r9 import events_ucb1_replay

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    cells = (
        ev.groupby(["day", "event_type"])
        .agg(n=("cents", "size"), r=("cents", "sum"))
        .reset_index()
    )
    days = sorted(cells["day"].unique())
    arms = sorted(cells["event_type"].unique())
    byc = {
        (r.day, r.event_type): (int(r.n), int(r.r)) for r in cells.itertuples()
    }
    cum = defaultdict(lambda: [0, 0])
    exp = {}
    for d in days:
        ntot = sum(cum[a][0] for a in arms)
        best = None
        for a in arms:
            n, r = cum[a]
            if n == 0:
                key = (0, 0.0, a)
                score = None
            else:
                score = r / (100.0 * n) + math.sqrt(2.0 * math.log(ntot) / n)
                key = (1, -score, a)
            if best is None or key < best[0]:
                best = (key, a, score)
        nd, rd = byc.get((d, best[1]), (0, 0))
        exp[d] = (
            best[1],
            None if best[2] is None else round(best[2], 4),
            None if nd == 0 else round(rd / (100.0 * nd), 4),
        )
        for a in arms:
            n, r = byc.get((d, a), (0, 0))
            cum[a][0] += n
            cum[a][1] += r
    got = {
        r["day"]: (r["chosen_arm"], r["ucb_score"], r["realized_mean"])
        for r in events_ucb1_replay(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0]
        for i in (1, 2):
            if exp[d][i] is None:
                assert got[d][i] is None
            else:
                assert got[d][i] == pytest.approx(exp[d][i], abs=2e-4)


def test_ips_offpolicy_matches_python(spark, sf_dir):
    """IPS / clipped / SNIPS recomputed from per-day cells."""
    from aspep_etl_spark.plans.analytics_r9 import events_ips_offpolicy

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    rows = []
    for d, grp in ev.groupby("day"):
        nd = len(grp)
        m = grp[grp["event_type"] == "purchase"]
        nm, sm = len(m), int(m["cents"].sum())
        if nm:
            rows.append((d, nd, nm, sm))
    rows.sort()
    n_total = sum(r[1] for r in rows)
    ips = sum(sm * (nd / nm) for _, nd, nm, sm in rows) / (100.0 * n_total)
    num_c = sum(
        sm * min(nd / nm, 3.0) for _, nd, nm, sm in rows
    )
    den_c = sum(nm * min(nd / nm, 3.0) for _, nd, nm, sm in rows)
    r = events_ips_offpolicy(spark, sf_dir).collect()[0]
    assert r["n_days"] == len(rows)
    assert r["n_total"] == n_total
    assert r["n_matched"] == sum(x[2] for x in rows)
    assert r["ips_value"] == pytest.approx(ips, abs=2e-4)
    assert r["ips_clipped"] == pytest.approx(num_c / (100.0 * n_total), abs=2e-4)
    assert r["snips_clipped"] == pytest.approx(num_c / (100.0 * den_c), abs=2e-4)


def _encode_png_filtered(rows, ftype):
    """Re-encode a pixel grid with one of the five PNG filter types —
    independent encoder used to exercise every defilter branch."""
    import struct
    import zlib

    from aspep_etl_spark.functions.media import _png_chunk

    w, h = len(rows[0]), len(rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    out = bytearray()
    prev = bytes(w)
    for r in rows:
        out.append(ftype)
        if ftype == 0:
            out += r
        elif ftype == 1:
            out += bytes((r[x] - (r[x - 1] if x else 0)) & 0xFF for x in range(w))
        elif ftype == 2:
            out += bytes((r[x] - prev[x]) & 0xFF for x in range(w))
        elif ftype == 3:
            out += bytes(
                (r[x] - (((r[x - 1] if x else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(w)
            )
        elif ftype == 4:
            buf = []
            for x in range(w):
                a = r[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                buf.append((r[x] - pr) & 0xFF)
            out += bytes(buf)
        prev = r
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filter_types(ftype):
    """decode_png_gray inverts every standard scanline filter."""
    from aspep_etl_spark.functions.media import decode_png_gray

    rows = [
        bytes([(7 * x * x + 13 * y + (x * y) % 31) % 256 for x in range(19)])
        for y in range(13)
    ]
    assert decode_png_gray(_encode_png_filtered(rows, ftype)) == rows


def test_png_decode_rejects_non_grayscale_profile():
    from aspep_etl_spark.functions.media import decode_png_gray, make_jpeg

    assert decode_png_gray(make_jpeg(8, 8)) is None
    assert decode_png_gray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20) is None


def test_ahash_known_value():
    """Hand-checkable aHash: top half dark, bottom half bright — bits
    are exactly the bottom 4 row-bands."""
    from aspep_etl_spark.functions.media import ahash64

    rows = [bytes([10] * 16) for _ in range(8)] + [
        bytes([200] * 16) for _ in range(8)
    ]
    hi, lo = ahash64(rows)
    assert hi == 0
    assert lo == 0xFFFFFFFF


def test_phash_dedup_matches_formula(spark, sf_dir, docs_pd):
    """The Spark path (real zlib decode + defilter + ahash) must equal
    the closed-form derivation from the synthesis recipe."""
    from aspep_etl_spark.plans.analytics_r9 import media_phash_dedup

    fam: dict = {}
    for r in docs_pd.itertuples():
        if r.doc_id % 3 != 0:
            continue
        fill, h = r.doc_id % 256, 16 + len(r.text) % 48
        s = sum((fill + y) % 256 for y in range(h))
        bits = []
        for rr in range(8):
            y0, y1 = rr * h // 8, (rr + 1) * h // 8
            rs = sum((fill + y) % 256 for y in range(y0, y1))
            bits.append(1 if rs * h > s * (y1 - y0) else 0)
        hi = sum(bits[rr] * (255 << (24 - 8 * rr)) for rr in range(4))
        lo = sum(bits[rr] * (255 << (24 - 8 * (rr - 4))) for rr in range(4, 8))
        lst = fam.setdefault((hi, lo), [])
        lst.append(r.doc_id)
    exp = {
        k: (len(v), min(v), max(v)) for k, v in fam.items()
    }
    got = {
        (r["phash_hi"], r["phash_lo"]): (r["n_assets"], r["min_id"], r["max_id"])
        for r in media_phash_dedup(spark, sf_dir).collect()
    }
    assert got == exp


def test_forecast_backtest_matches_python(spark, sf_dir):
    """Seasonal-naive MAE/MASE recomputed from the daily cent grid."""
    from collections import defaultdict

    from aspep_etl_spark.plans.analytics_r9 import events_forecast_backtest

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(math.floor).astype("int64")
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    )
    exp = {}
    for t, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        y = grp["cents"].tolist()
        days = grp["day"].tolist()
        tr = te = str_ = ste = 0
        for i in range(7, len(y)):
            e = abs(y[i] - y[i - 7])
            if str(days[i]) >= "2024-01-24":
                te += 1
                ste += e
            else:
                tr += 1
                str_ += e
        exp[t] = (
            tr,
            te,
            round(ste / te / 100.0, 4),
            round(str_ / tr / 100.0, 4),
            round((ste / te) / (str_ / tr), 4),
        )
    got = {
        r["series"]: (
            r["n_train"],
            r["n_test"],
            r["mae_test"],
            r["mae_insample"],
            r["mase"],
        )
        for r in events_forecast_backtest(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for t in exp:
        assert got[t][:2] == exp[t][:2]
        for i in (2, 3, 4):
            assert got[t][i] == pytest.approx(exp[t][i], abs=2e-4)


def test_linkage_clusters_are_transitive_closures(spark, sf_dir):
    """Every entity's record count decomposes into its two feeds; a
    cluster never contains two records it has no match path between —
    verified by recomputing components with a union-find over the match
    pairs."""
    from aspep_etl_spark.plans.analytics_r8 import customer_record_linkage
    from aspep_etl_spark.plans.analytics_r9 import linkage_entity_clusters

    pairs = [
        (2 * r["a_key"], 2 * r["b_key"] + 1)
        for r in customer_record_linkage(spark, sf_dir).collect()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import defaultdict

    clusters = defaultdict(list)
    for node in parent:
        clusters[find(node)].append(node)
    exp = {
        min(v): (
            len(v),
            sum(1 for n in v if n % 2 == 0),
            sum(1 for n in v if n % 2 == 1),
            min(n // 2 for n in v),
            max(n // 2 for n in v),
        )
        for v in clusters.values()
    }
    got = {
        r["entity"]: (
            r["n_records"],
            r["n_feed_a"],
            r["n_feed_b"],
            r["min_custkey"],
            r["max_custkey"],
        )
        for r in linkage_entity_clusters(spark, sf_dir).collect()
    }
    assert got == exp


def test_hash_partition_audit_matches_python(spark, sf_dir):
    from collections import Counter

    from aspep_etl_spark.plans.analytics_r9 import layout_hash_partition

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c: Counter = Counter(
        _md5i(f"hp|{k}") % 64 for k in orders["o_orderkey"]
    )
    n = sum(c.values())
    sum_sq = sum(v * v for v in c.values())
    chi2 = 64.0 * sum_sq / n - n
    r = layout_hash_partition(spark, sf_dir).collect()[0]
    assert r["n_buckets_used"] == len(c)
    assert r["n_rows"] == n
    assert (r["min_rows"], r["max_rows"]) == (min(c.values()), max(c.values()))
    assert r["max_balance"] == pytest.approx(max(c.values()) * 64 / n, abs=1e-4)
    assert r["chi2"] == pytest.approx(chi2, abs=2e-4)


def test_components_incremental_equals_full_recompute(spark, sf_dir):
    """The contracted-graph merge must reproduce exactly the labels a
    full union-find over ALL edges assigns (min-label composition)."""
    from aspep_etl_spark.operators.dedup import jaccard_pairs
    from aspep_etl_spark.plans.analytics_r9 import components_incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.05).collect()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import defaultdict

    comp = defaultdict(list)
    for node in parent:
        comp[find(node)].append(node)
    exp = {}
    for members in comp.values():
        old = sum(1 for n in members if _md5i(f"ccd|{n}") % 10 != 0)
        exp[min(members)] = (len(members), old, len(members) - old)
    got = {
        r["component"]: (r["n_members"], r["n_old"], r["n_new"])
        for r in components_incremental(spark, sf_dir).collect()
    }
    assert got == exp


def test_streaming_mv_equals_batch_recompute(spark, sf_dir):
    """The store reached through three real micro-batch merges must
    equal the one-shot batch rollup."""
    from aspep_etl_spark.plans.analytics_r9 import streaming_mv_maintenance
    from aspep_etl_spark.streaming.mv import mv_delta_agg

    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["cents_sum"])
        for r in streaming_mv_maintenance(spark, sf_dir).collect()
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(raw.schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    exp = {
        (str(r["day"]), r["event_type"]): (r["n_events"], r["cents_sum"])
        for r in mv_delta_agg(raw).collect()
    }
    assert got == exp


def test_streaming_mv_tiny_input_fewer_rows_than_splits(spark, tmp_path):
    """n_rows < n_splits must degrade gracefully to n_rows micro-batches
    (r10 ADVICE low): round-robin from multiple upstream partitions can
    collide rows onto one target, so the shard stage now coalesces to a
    single partition first — the sequential round-robin guarantee makes
    the pinned shard count exact instead of a spurious assert failure."""
    import datetime

    from pyspark.sql import Row

    from aspep_etl_spark.streaming.mv import mv_delta_agg, run_streaming_mv_maintenance

    rows = [
        Row(
            ts=datetime.datetime(2024, 1, 1 + i),
            event_type="a" if i % 2 else "b",
            value=1.0 + i,
            event_id=i,
        )
        for i in range(3)
    ]
    src = str(tmp_path / "tiny_events.parquet")
    # several input partitions so the multi-upstream collision case is real
    spark.createDataFrame(rows).repartition(4).write.parquet(src)
    got = {
        (str(r["day"]), r["event_type"]): (r["n_events"], r["cents_sum"])
        for r in run_streaming_mv_maintenance(spark, src, n_splits=30).collect()
    }
    exp = {
        (str(r["day"]), r["event_type"]): (r["n_events"], r["cents_sum"])
        for r in mv_delta_agg(spark.read.parquet(src)).collect()
    }
    assert got == exp and len(got) == 3


def test_mv_merge_is_split_invariant(spark):
    """Associative-commutative merge: any 2-way split of the delta
    reaches the same store (the property that makes batch arrival order
    irrelevant and the flat GROUP BY a valid oracle)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aspep_etl_spark.streaming.mv import mv_delta_agg, mv_merge

    rows = [
        Row(ts=None, event_type=t, value=v, event_id=i)
        for i, (t, v) in enumerate(
            [("a", 1.0), ("a", 2.5), ("b", 3.0), ("a", 0.5), ("b", 1.25)]
        )
    ]
    import datetime

    rows = [
        Row(
            ts=datetime.datetime(2024, 1, 1 + (r.event_id % 2)),
            event_type=r.event_type,
            value=r.value,
            event_id=r.event_id,
        )
        for r in rows
    ]
    df = spark.createDataFrame(rows)
    full = {
        (str(r["day"]), r["event_type"]): (r["n_events"], r["cents_sum"])
        for r in mv_delta_agg(df).collect()
    }
    for pivot in (1, 2, 3):
        a = mv_delta_agg(df.filter(F.col("event_id") < pivot))
        b = mv_delta_agg(df.filter(F.col("event_id") >= pivot))
        merged = {
            (str(r["day"]), r["event_type"]): (r["n_events"], r["cents_sum"])
            for r in mv_merge(a, b).collect()
        }
        assert merged == full


def test_referential_integrity_matches_python(spark, sf_dir, lineitem_pd):
    from aspep_etl_spark.plans.analytics_r9 import referential_integrity_audit

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    exp = {
        "lineitem.l_orderkey->orders": (
            len(lineitem_pd),
            int((~lineitem_pd["l_orderkey"].isin(orders["o_orderkey"])).sum()),
        ),
        "lineitem.l_partkey->part": (
            len(lineitem_pd),
            int((~lineitem_pd["l_partkey"].isin(part["p_partkey"])).sum()),
        ),
        "lineitem.l_suppkey->supplier": (
            len(lineitem_pd),
            int((~lineitem_pd["l_suppkey"].isin(supp["s_suppkey"])).sum()),
        ),
        "orders.o_custkey->customer": (
            len(orders),
            int((~orders["o_custkey"].isin(cust["c_custkey"])).sum()),
        ),
    }
    got = {
        r["fk_edge"]: (r["n_rows"], r["n_orphans"])
        for r in referential_integrity_audit(spark, sf_dir).collect()
    }
    assert got == exp


def test_psi_matches_python(spark, sf_dir):
    from aspep_etl_spark.plans.analytics_r9 import events_value_psi

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    base_mask = ev["ts"] < pd.Timestamp("2024-01-15")
    cents = (ev["value"] * 100).apply(math.floor).astype("int64")
    base = sorted(cents[base_mask])
    n = len(base)
    from collections import Counter

    cc = Counter(base)
    edges, cum = [], 0
    vals = sorted(cc)
    for i in range(1, 10):
        cum2, edge = 0, None
        for v in vals:
            cum2 += cc[v]
            if cum2 * 10 >= i * n:
                edge = v
                break
        edges.append(edge)
    def bin_of(c):
        return sum(1 for e in edges if c > e) + 1
    nb: Counter = Counter(bin_of(c) for c in cents[base_mask])
    nc: Counter = Counter(bin_of(c) for c in cents[~base_mask])
    bins = sorted(set(nb) | set(nc))
    tb = sum(nb.get(b, 0) + 1 for b in bins)
    tc = sum(nc.get(b, 0) + 1 for b in bins)
    psi = 0.0
    for b in bins:
        p, q = (nb.get(b, 0) + 1) / tb, (nc.get(b, 0) + 1) / tc
        psi += (p - q) * math.log(p / q)
    r = events_value_psi(spark, sf_dir).collect()[0]
    assert r["n_bins"] == len(bins)
    assert r["psi"] == pytest.approx(psi, abs=1e-5)
