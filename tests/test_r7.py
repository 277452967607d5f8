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

from .xxh64_twin import xxh64_bytes


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
        # r9: DSIR bucket re-keyed to pmod(xxhash64('dsir|'+w), B)
        d: [xxh64_bytes(("dsir|" + w).encode(), 42) % B for w in ws]
        for d, ws in doc_toks.items()
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


# --------------------------------------------------------------------------
# classifier_brier_score
# --------------------------------------------------------------------------


def test_brier_score_bounds_and_recompute(spark, sf_dir):
    """Brier ∈ [0, 1]; recompute from the classifier's own (prob, label)
    pairs with the identical integer scaling."""
    from aspep_etl_spark.operators.classifier import score_documents
    from aspep_etl_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "label",
        (F.substring("source", 4, 10).cast("int") % 2 == 0).cast("long"),
    )
    pairs = (
        score_documents(docs, "text", "doc_id", dim=4096, keep=("label",))
        .select("prob", "label")
        .collect()
    )
    import math as _m

    se2 = sum(
        (_m.floor(r["prob"] * 1e6) - r["label"] * 1_000_000) ** 2 for r in pairs
    )
    expect = se2 / (len(pairs) * 1e12)

    row = r7.classifier_brier_score(spark, sf_dir).collect()[0]
    assert 0.0 <= row["brier"] <= 1.0
    assert row["n_docs"] == len(pairs)
    assert row["brier"] == pytest.approx(expect, abs=1e-12)


# --------------------------------------------------------------------------
# graph_louvain_step
# --------------------------------------------------------------------------


def test_louvain_step_improves_modularity(spark, sf_dir):
    """The greedy round must not decrease modularity (every move has
    scaled gain ≥ 0 against the pre-round partition and moves are
    node-disjoint in their own term): check gains are ≥ 0, moved ⇔
    gain computation differs from stay, and the new partition's
    modularity (recomputed brute-force) is ≥ the old one's."""
    from aspep_etl_spark.operators.labelprop import label_propagation
    from aspep_etl_spark.operators.triangles import cooccurrence_knn_edges
    from aspep_etl_spark.sources.registry import load_table

    out = r7.graph_louvain_step(spark, sf_dir).toPandas()
    assert (out.gain >= 0).all()
    assert (out.moved == (out.new_community != out.old_community)).all()

    li = load_table(spark, sf_dir, "lineitem")
    edges_df = cooccurrence_knn_edges(
        li, "l_partkey", "l_suppkey", k=3, max_group_size=256
    )
    edges = [(r["u"], r["v"]) for r in edges_df.collect()]
    m = len(edges)

    def modularity(comm: dict) -> float:
        deg: dict = {}
        internal: dict = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
            if comm[u] == comm[v]:
                internal[comm[u]] = internal.get(comm[u], 0) + 1
        dsum: dict = {}
        for n, c in comm.items():
            dsum[c] = dsum.get(c, 0) + deg[n]
        return sum(
            (4 * m * internal.get(c, 0) - d * d) / (4 * m * m)
            for c, d in dsum.items()
        )

    old = dict(zip(out.node, out.old_community))
    new = dict(zip(out.node, out.new_community))
    # sanity: old is the LPA fixpoint
    lpa = {
        r["node"]: r["community"]
        for r in label_propagation(edges_df, iters=4).collect()
    }
    assert old == lpa
    # synchronous-round caveat: simultaneous moves CAN in theory clash,
    # but each gain is computed against the frozen partition — on this
    # graph the round must improve (or preserve) Q
    assert modularity(new) >= modularity(old) - 1e-12


# --------------------------------------------------------------------------
# streaming_rate_limit
# --------------------------------------------------------------------------


def test_rate_limit_equals_batch_twin_and_quota_holds(spark, sf_dir):
    from aspep_etl_spark.sources.registry import load_table
    from aspep_etl_spark.streaming.stateful import (
        rate_limit_batch,
        run_streaming_rate_limit,
    )

    streamed = run_streaming_rate_limit(
        spark, f"{sf_dir}/events.parquet", limit=3, slot_seconds=86400
    ).toPandas()
    batch = rate_limit_batch(
        load_table(spark, sf_dir, "events"), limit=3, slot_seconds=86400
    ).toPandas()
    key = ["user_id", "slot_s", "event_id", "slot_rank"]
    s = streamed[key].sort_values(key).reset_index(drop=True)
    b = batch[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, b)
    # the quota genuinely binds and holds
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert len(s) < len(ev)
    assert s.groupby(["user_id", "slot_s"]).size().max() <= 3
    assert (s.slot_rank <= 3).all() and (s.slot_rank >= 1).all()


# --------------------------------------------------------------------------
# events_agms_join_size
# --------------------------------------------------------------------------


def test_agms_estimate_unbiasedness_shape(spark, sf_dir):
    """The exact join size must match a pandas recompute; the AGMS
    median-of-64 estimate must land within a loose multiplicative band
    (tug-of-war variance is ~2·J² / w for join size J — the median over
    64 is well inside ±60% on this data; the point is the ESTIMATOR
    SHAPE is right, cross-engine exactness is the oracle's job)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    a = ev[ev.event_type == "click"].groupby("user_id").size()
    b = ev[ev.event_type == "purchase"].groupby("user_id").size()
    exact = int((a * b).dropna().sum())

    row = r7.events_agms_join_size(spark, sf_dir).collect()[0]
    assert row["exact_join_size"] == exact
    assert row["n_sketches"] == r7._AGMS_W
    assert abs(row["rel_error"]) < 0.6
    assert row["agms_estimate"] == pytest.approx(
        exact * (1 + row["rel_error"]), abs=1.0
    )
