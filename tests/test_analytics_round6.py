"""Round-6 analytics additions: k-core, common-neighbor link prediction,
ACF, Holt smoothing, binned KS, RAKE keywords — hand-checkable fixtures
(the registry oracles cover the full-table paths)."""

from __future__ import annotations

from datetime import datetime, timedelta

import aspep_etl_spark.plans.analytics_r6 as r6


def _events_from_daily_counts(spark, counts, event_type="click"):
    """One events row per unit: day i gets counts[i] events of the type."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append(
                (eid, datetime(2024, 1, 1 + i, 12, 0, j), 1, event_type, 1.0, "{}")
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_kcore_peels_pendants_keeps_cycle(spark, monkeypatch):
    # 4-cycle c1-s1-c2-s2-c1 (all degree 2) plus pendant c3-s1.
    # With k=2: round 1 drops c3 (deg 1); the cycle is stable.
    li = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2), (5, 1)],
        "l_orderkey long, l_suppkey long",
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 2), (4, 1), (5, 3)],
        "o_orderkey long, o_custkey long",
    )
    tables = {"lineitem": li, "orders": orders}
    monkeypatch.setattr(r6, "_t", lambda s, d, t: tables[t])
    monkeypatch.setattr(r6, "_KCORE_K", 2)
    out = {r["node"]: r["degree"] for r in r6.graph_kcore(spark, "x").collect()}
    # nodes: c1=2, c2=4, s1=3, s2=5; pendant c3=6 dropped
    assert out == {2: 2, 4: 2, 3: 2, 5: 2}


def test_kcore_full_peel_to_empty(spark, monkeypatch):
    # path c1-s1, c1-s2, c2-s1: k=2 unravels completely in two rounds
    li = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 1)], "l_orderkey long, l_suppkey long"
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "o_orderkey long, o_custkey long"
    )
    tables = {"lineitem": li, "orders": orders}
    monkeypatch.setattr(r6, "_t", lambda s, d, t: tables[t])
    monkeypatch.setattr(r6, "_KCORE_K", 2)
    assert r6.graph_kcore(spark, "x").count() == 0


def test_common_neighbors_hand_checked(spark, monkeypatch):
    # c1 and c2 share parts {1,2,3}; c3 bought only part 1
    li = spark.createDataFrame(
        [(o, p) for o, ps in [(1, [1, 2, 3]), (2, [1, 2, 3]), (3, [1])] for p in ps],
        "l_orderkey long, l_partkey long",
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "o_orderkey long, o_custkey long"
    )
    tables = {"lineitem": li, "orders": orders}
    monkeypatch.setattr(r6, "_t", lambda s, d, t: tables[t])
    rows = r6.graph_common_neighbors(spark, "x").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["u"], r["v"], r["n_common"], r["jaccard"]) == (1, 2, 3, 1.0)


def test_common_neighbors_df_cap_excludes_hot_part(spark, monkeypatch):
    # part 1 bought by everyone; with cap 2 it generates no pairs and
    # does not count toward set sizes
    li = spark.createDataFrame(
        [(o, p) for o, ps in [(1, [1, 2]), (2, [1, 2]), (3, [1])] for p in ps],
        "l_orderkey long, l_partkey long",
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "o_orderkey long, o_custkey long"
    )
    tables = {"lineitem": li, "orders": orders}
    monkeypatch.setattr(r6, "_t", lambda s, d, t: tables[t])
    monkeypatch.setattr(r6, "_CN_DF_CAP", 2)
    monkeypatch.setattr(r6, "_CN_MIN_COMMON", 1)
    rows = r6.graph_common_neighbors(spark, "x").collect()
    assert len(rows) == 1
    r = rows[0]
    # only part 2 is in the capped universe: sizes 1 and 1, common 1
    assert (r["u"], r["v"], r["n_common"], r["jaccard"]) == (1, 2, 1, 1.0)


def test_acf_hand_computed(spark, monkeypatch):
    # daily counts [2,1,2,1]: lag1 acf=-1, lag2 acf=1, lag3 undefined
    ev = _events_from_daily_counts(spark, [2, 1, 2, 1])
    monkeypatch.setattr(r6, "_t", lambda s, d, t: ev)
    out = {r["lag_k"]: r for r in r6.events_value_acf(spark, "x").collect()}
    assert set(out) == {1, 2, 3}
    # same IEEE formula as both engines: num / (sqrt(vx) * sqrt(vy))
    import math

    assert out[1]["n_pairs"] == 3
    assert out[1]["acf"] == -2.0 / (math.sqrt(2.0) * math.sqrt(2.0))
    assert out[2]["n_pairs"] == 2
    assert out[2]["acf"] == 1.0 / (math.sqrt(1.0) * math.sqrt(1.0))
    assert out[3]["n_pairs"] == 1 and out[3]["acf"] is None


def test_holt_hand_traced(spark, monkeypatch):
    # counts [1,4,2,8,5]; seed l=4, b=3; hand-traced fold:
    # e=2 -> (4.5, 2.375); e=8 -> (7.4375, 2.515625);
    # e=5 -> (7.4765625, 1.896484375)
    ev = _events_from_daily_counts(spark, [1, 4, 2, 8, 5])
    monkeypatch.setattr(r6, "_t", lambda s, d, t: ev)
    rows = r6.events_holt_forecast(spark, "x").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_days"] == 5
    # Spark round() is HALF_UP: 7.4765625 -> 7.476563 (python's
    # banker's round would give ...562)
    assert r["level"] == 7.476563
    assert r["trend"] == 1.896484
    assert r["forecast_7d"] == 20.751953


def test_ks_binned_hand_computed(spark, monkeypatch):
    # clicks at values 0.5, 1.5; errors at 0.5:
    # bin 0 -> |1*1 - 1*2| = 1; bin 1 -> |2*1 - 1*2| = 0; D = 1/2
    rows = [
        (0, datetime(2024, 1, 1), 1, "click", 0.5, "{}"),
        (1, datetime(2024, 1, 1), 1, "click", 1.5, "{}"),
        (2, datetime(2024, 1, 1), 1, "error", 0.5, "{}"),
        (3, datetime(2024, 1, 1), 1, "view", 9.5, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(r6, "_t", lambda s, d, t: ev)
    out = r6.events_ks_binned(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n1"], r["n2"], r["n_bins"], r["d_stat"]) == (2, 1, 2, 0.5)


def test_rake_hand_scored(spark, monkeypatch):
    # "fast join the fast join a slow scan": phrases "fast join" x2,
    # "slow scan" x1; every word has deg/freq = 2 -> both phrases score 2
    docs = spark.createDataFrame(
        [(1, "fast join the fast join a slow scan", "en", "s", 36)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(r6, "_t", lambda s, d, t: docs)
    rows = r6.docs_rake_keywords(spark, "x").collect()
    assert [(r["phrase"], r["n_occurrences"], r["score"]) for r in rows] == [
        ("fast join", 2, 2.0),
        ("slow scan", 1, 2.0),
    ]


def test_r6_plans_have_no_cartesian(spark):
    # candidate generation must stay bucketed/keyed at any scale
    sf = "/root/testdata/sf0.001"
    for fn in (r6.graph_common_neighbors, r6.docs_rake_keywords):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_fusion_arithmetic(spark, monkeypatch):
    # lex ranks: doc1=1, doc2=2; dense ranks: doc2=1, doc3=2
    import aspep_etl_spark.operators.similarity as sim
    import aspep_etl_spark.plans.analytics_extra as ax

    lex = spark.createDataFrame(
        [(1, 1, 2.0), (2, 1, 1.0)], "doc_id long, n_terms_matched long, bm25 double"
    )
    dense = spark.createDataFrame(
        [(0, 2, 0.9, 1), (0, 3, 0.8, 2)],
        "query_id long, neighbor_id long, cosine double, knn_rank int",
    )
    emb = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    monkeypatch.setattr(ax, "docs_bm25_search", lambda s, d: lex)
    monkeypatch.setattr(sim, "brute_force_topk", lambda *a, **k: dense)
    monkeypatch.setattr(r6, "_t", lambda s, d, t: emb)
    out = {r["doc_id"]: r for r in r6.docs_hybrid_rrf(spark, "x").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["rrf_score"] == 1.0 / 61.0 + 0.0
    assert out[2]["rrf_score"] == 1.0 / 62.0 + 1.0 / 61.0
    assert out[3]["rrf_score"] == 0.0 + 1.0 / 62.0
    assert out[3]["r_lex"] is None and out[1]["r_dense"] is None


def test_local_clustering_hand_graph(spark):
    from aspep_etl_spark.operators.triangles import local_clustering

    # triangle 1-2-3 plus pendant edge 3-4
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    out = {r["node"]: r for r in local_clustering(edges).collect()}
    assert out[1]["degree"] == 2 and out[1]["n_triangles"] == 1
    assert out[1]["lcc"] == 1.0
    assert out[2]["lcc"] == 1.0
    assert out[3]["degree"] == 3 and out[3]["n_triangles"] == 1
    assert out[3]["lcc"] == 2.0 / 6.0
    assert out[4]["degree"] == 1 and out[4]["n_triangles"] == 0
    assert out[4]["lcc"] is None


def test_cdc_chunks_properties(spark, monkeypatch):
    # identical docs chunk identically; lens sum to token count;
    # short docs are a single chunk
    text = " ".join(f"w{i % 7}x{i % 5}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, text, "en", "s", 0), (2, text, "en", "s", 0), (3, "a b c", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(r6, "_t", lambda s, d, t: docs)
    rows = r6.docs_cdc_chunks(spark, "x").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # duplicate docs -> identical (chunk_id, len, hash) sets
    k1 = sorted((r["chunk_id"], r["chunk_len"], r["chunk_hash"]) for r in by_doc[1])
    k2 = sorted((r["chunk_id"], r["chunk_len"], r["chunk_hash"]) for r in by_doc[2])
    assert k1 == k2
    assert sum(r["chunk_len"] for r in by_doc[1]) == 200
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == 3
