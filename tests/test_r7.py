"""Value-level tests for the round-6 batch-3 operators
(plans/analytics_r7.py) — the oracle gate proves cross-engine equality;
these pin the SEMANTICS against independent brute-force recomputation
(hashlib md5, numpy cosines, pandas rank math) and structural
invariants."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from aspep_etl_spark.plans import analytics_r7 as r7


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------------------
# docs_dsir_weights
# --------------------------------------------------------------------------


def test_dsir_matches_brute_force(spark, sf_dir):
    """Recompute every doc's DSIR score with hashlib + pure Python floats
    (same left-to-right token order) and compare to 6dp."""
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok_re = re.compile(r"[a-z0-9]+")
    B = r7._DSIR_BUCKETS
    doc_toks = {
        r.doc_id: tok_re.findall(r.text.lower()) for r in docs.itertuples()
    }
    buckets = {
        d: [_md5i("dsir|" + w) % B for w in ws] for d, ws in doc_toks.items()
    }
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    langs = dict(zip(docs.doc_id, docs.lang))
    for d, bs in buckets.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if langs[d] == r7._DSIR_TARGET_LANG:
                ct[b] = ct.get(b, 0) + 1
    r_tot, t_tot = sum(cr.values()), sum(ct.values())
    term = {
        b: math.log10(
            ((ct.get(b, 0) + 1) * (r_tot + B)) / ((cr[b] + 1) * (t_tot + B))
        )
        for b in cr
    }
    expect = {
        d: round(sum(term[b] for b in bs), 6)
        for d, bs in buckets.items()
        if bs
    }
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in r7.docs_dsir_weights(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=2e-6), d


def test_dsir_target_scores_higher(spark, sf_dir):
    """Per-token average importance must rank the target language above
    the rest — the whole point of importance weighting."""
    rows = r7.docs_dsir_weights(spark, sf_dir).collect()
    per_tok = {
        lang: [r["dsir_score"] / r["n_tokens"] for r in rows if r["lang"] == lang]
        for lang in {r["lang"] for r in rows}
    }
    en = sum(per_tok["en"]) / len(per_tok["en"])
    for lang, vals in per_tok.items():
        if lang != "en":
            assert en > sum(vals) / len(vals), lang


# --------------------------------------------------------------------------
# dedup_semantic
# --------------------------------------------------------------------------


def test_semantic_dedup_drop_rule(spark, sf_dir):
    """Brute-force check of the survivorship rule: a vector is dropped
    IFF a smaller-id vector in the same cluster has rounded cosine ≥ t."""
    out = r7.dedup_semantic(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    cluster = dict(zip(out.vec_id, out.cluster))
    kept = dict(zip(out.vec_id, out.kept))
    assert set(mat) == set(cluster)

    by_cluster: dict[int, list[int]] = {}
    for vid, c in cluster.items():
        by_cluster.setdefault(c, []).append(vid)
    for c, ids in by_cluster.items():
        ids.sort()
        for i, vb in enumerate(ids):
            has_neighbor = False
            for va in ids[:i]:
                x, y = mat[va], mat[vb]
                na, nb = np.linalg.norm(x), np.linalg.norm(y)
                if na > 0 and nb > 0:
                    # ordered left fold like the JVM/DuckDB recipe
                    dot = 0.0
                    for xi, yi in zip(x, y):
                        dot += float(xi) * float(yi)
                    if round(dot / (na * nb), 4) >= r7._SEM_THRESHOLD:
                        has_neighbor = True
                        break
            assert kept[vb] == (not has_neighbor), vb


def test_semantic_dedup_has_real_drops(spark, sf_dir):
    out = r7.dedup_semantic(spark, sf_dir).toPandas()
    assert (~out.kept).sum() > 0
    assert out.kept.sum() > 0


# --------------------------------------------------------------------------
# events_bootstrap_ci
# --------------------------------------------------------------------------


def test_poisson_weights_replay(spark, sf_dir):
    """Replay the hash → uniform → Poisson(1) inverse-CDF chain for a
    handful of (event_id, rep) draws and check the threshold constants
    are the Poisson(1) CDF."""
    # the hard-coded thresholds ARE floor(CDF * 1e6)
    cum, p = 0.0, math.exp(-1)
    for k, thr in enumerate(r7._POIS_THR):
        cum += p
        assert thr == math.floor(cum * 1_000_000)
        p /= k + 1

    # expected weight of a specific draw
    def weight(event_id: int, rep: int) -> int:
        u = _md5i(f"boot|{event_id}|{rep}") % 1_000_000
        return sum(u >= t for t in r7._POIS_THR)

    ws = [weight(e, r) for e in range(100) for r in range(r7._BOOT_B)]
    assert 0.9 < sum(ws) / len(ws) < 1.1  # E[w] = 1
    assert max(ws) <= 9


def test_bootstrap_ci_brackets_point(spark, sf_dir):
    out = r7.events_bootstrap_ci(spark, sf_dir).collect()
    assert len(out) == 5
    for r in out:
        assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"], r["event_type"]
        assert r["ci_hi"] - r["ci_lo"] < r["point_mean"]  # sane width


# --------------------------------------------------------------------------
# events_mannwhitney
# --------------------------------------------------------------------------


def test_mannwhitney_matches_rank_formula(spark, sf_dir):
    """Independent recompute via average ranks (the textbook route):
    U1 = R1 − n1(n1+1)/2 must equal the grid-cumsum result, and
    U1 + U2 = n1·n2."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    iv = np.floor(ev.value * 100).astype(np.int64)
    a = iv[ev.event_type == r7._MW_A].to_numpy()
    b = iv[ev.event_type == r7._MW_B].to_numpy()
    pooled = pd.Series(np.concatenate([a, b]))
    ranks = pooled.rank(method="average").to_numpy()
    r1 = ranks[: len(a)].sum()
    u1 = r1 - len(a) * (len(a) + 1) / 2

    row = r7.events_mannwhitney(spark, sf_dir).collect()[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["u1"] == pytest.approx(u1, abs=1e-9)
    assert row["u1"] + row["u2"] == pytest.approx(len(a) * len(b), abs=1e-9)
    assert row["rank_biserial"] == pytest.approx(
        2 * u1 / (len(a) * len(b)) - 1, abs=1e-12
    )


# --------------------------------------------------------------------------
# graph_modularity
# --------------------------------------------------------------------------


def test_modularity_brute_force(spark, sf_dir):
    """Recompute Q from the edge list + communities with numpy and match
    per-community contributions; Σ q is in (−1, 1]."""
    from aspep_etl_spark.operators.labelprop import label_propagation
    from aspep_etl_spark.operators.triangles import cooccurrence_knn_edges
    from aspep_etl_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges_df = cooccurrence_knn_edges(
        li, "l_partkey", "l_suppkey", k=3, max_group_size=256
    )
    edges = [(r["u"], r["v"]) for r in edges_df.collect()]
    comm = {
        r["node"]: r["community"]
        for r in label_propagation(edges_df, iters=4).collect()
    }
    m = len(edges)
    deg: dict[int, int] = {}
    internal: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        if comm[u] == comm[v]:
            internal[comm[u]] = internal.get(comm[u], 0) + 1
    dsum: dict[int, int] = {}
    for n, c in comm.items():
        dsum[c] = dsum.get(c, 0) + deg[n]

    out = {r["community"]: r for r in r7.graph_modularity(spark, sf_dir).collect()}
    assert set(out) == set(dsum)
    total = 0.0
    for c, r in out.items():
        expect = (4 * m * internal.get(c, 0) - dsum[c] ** 2) / (4 * m * m)
        assert r["q_contrib"] == pytest.approx(expect, abs=1e-12)
        assert r["internal_edges"] == internal.get(c, 0)
        assert r["degree_sum"] == dsum[c]
        total += r["q_contrib"]
    assert -1.0 < total <= 1.0


# --------------------------------------------------------------------------
# streaming_stream_join
# --------------------------------------------------------------------------


def test_stream_join_equals_batch_twin(spark, sf_dir):
    """availableNow over one file = the batch inner join, row for row;
    every emitted delay respects the [0, 30 min] range bound."""
    from aspep_etl_spark.sources.registry import load_table
    from aspep_etl_spark.streaming.joins import (
        click_purchase_join_batch,
        run_streaming_click_purchase_join,
    )

    streamed = run_streaming_click_purchase_join(
        spark, f"{sf_dir}/events.parquet"
    ).toPandas()
    batch = click_purchase_join_batch(
        load_table(spark, sf_dir, "events")
    ).toPandas()
    key = ["user_id", "click_id", "purchase_id", "delay_s"]
    s = streamed[key].sort_values(key).reset_index(drop=True)
    b = batch[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, b)
    assert (s.delay_s >= 0).all() and (s.delay_s <= 1800).all()
    assert len(s) > 0
