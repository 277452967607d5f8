"""Round-5 analytics additions: BM25, association rules, BFS — hand-
checkable fixtures (the registry oracles cover the full-table paths)."""

from __future__ import annotations

import math


def test_bm25_hand_computed(spark, monkeypatch):
    # 3 docs, query terms {'hash','join'}; doc 3 contains neither
    rows = [
        (1, "hash join hash build probe"),
        (2, "join order and scan cost"),
        (3, "window frame spill"),
    ]
    import aspep_etl_spark.plans.analytics_extra as ax

    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(ax, "_t", lambda s, d, t: df)
    out = {r["doc_id"]: r for r in ax.docs_bm25_search(spark, "ignored").collect()}
    assert set(out) == {1, 2}

    def bm25(tf, df_, n, dl, avgdl, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
        return idf * (tf * 2.2) / (tf + k1 * (0.25 + 0.75 * dl / avgdl))

    avgdl = (5 + 5 + 3) / 3
    exp1 = bm25(2, 1, 3, 5, avgdl) + bm25(1, 2, 3, 5, avgdl)  # hash + join
    exp2 = bm25(1, 2, 3, 5, avgdl)  # join only (scan: df=1? no — scan in doc2 only)
    exp2 += bm25(1, 1, 3, 5, avgdl)  # scan
    assert out[1]["bm25"] == round(exp1, 4)
    assert out[2]["bm25"] == round(exp2, 4)
    assert out[1]["n_terms_matched"] == 2


def test_association_rules_hand_checked(spark, monkeypatch):
    import aspep_etl_spark.plans.analytics_extra as ax

    # 4 baskets at brand grain: {A,B} x3, {A} x1 -> rule A->B sup 3,
    # conf 3/4, lift (3/4)/(3/4)=1; B->A conf 1, lift 1/(4/4)... = 1.0
    li = spark.createDataFrame(
        [(o, p) for o, ps in [(1, [1, 2]), (2, [1, 2]), (3, [1, 2]), (4, [1])] for p in ps],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(1, "A"), (2, "B")], "p_partkey long, p_brand string"
    )
    tables = {"lineitem": li, "part": part}
    monkeypatch.setattr(ax, "_t", lambda s, d, t: tables[t])
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in ax.basket_association_rules(spark, "ignored").collect()
    }
    assert set(out) == {("A", "B"), ("B", "A")}
    ab = out[("A", "B")]
    assert (ab["sup_ab"], ab["confidence"], ab["lift"]) == (3, 0.75, 1.0)
    ba = out[("B", "A")]
    assert (ba["sup_ab"], ba["confidence"], ba["lift"]) == (3, 1.0, 1.0)


def test_bfs_distances_on_path(spark, monkeypatch):
    import aspep_etl_spark.plans.analytics_extra as ax

    # chain: supplier 1 (nation 0, node 3) - customer 1 (node 2) -
    # supplier 2 (node 5) - customer 2 (node 4): dists 0,1,2,3
    li = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 2)], "l_orderkey long, l_suppkey long"
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "o_orderkey long, o_custkey long"
    )
    supplier = spark.createDataFrame(
        [(1, 0), (2, 7)], "s_suppkey long, s_nationkey long"
    )
    tables = {"lineitem": li, "orders": orders, "supplier": supplier}
    monkeypatch.setattr(ax, "_t", lambda s, d, t: tables[t])
    out = {r["node"]: r["dist"] for r in ax.graph_bfs_distance(spark, "x").collect()}
    # node ids: cust c -> 2c, supp s -> 2s+1
    assert out == {3: 0, 2: 1, 5: 2, 4: 3}


def test_labelprop_registry_graph_runs_small(spark, monkeypatch):
    import aspep_etl_spark.plans.analytics_extra as ax

    li = spark.createDataFrame(
        [(p, s) for p in range(4) for s in [p % 2, 2 + p % 2]],
        "l_partkey long, l_suppkey long",
    )
    monkeypatch.setattr(ax, "_t", lambda s, d, t: li)
    out = ax.graph_label_propagation(spark, "x").collect()
    assert len(out) == 4  # suppliers 0..3 all labeled


def test_pattern_match_hand_checked(spark, monkeypatch):
    import datetime as dt

    import aspep_etl_spark.plans.analytics_extra as ax

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda i: t0 + dt.timedelta(minutes=i)
    rows = [
        # user 1: v v c p v c p -> motifs 'vvcp' and 'vcp' = 2 matches
        (1, mk(0), 1, "view"), (1, mk(1), 2, "view"), (1, mk(2), 3, "click"),
        (1, mk(3), 4, "purchase"), (1, mk(4), 5, "view"), (1, mk(5), 6, "click"),
        (1, mk(6), 7, "purchase"),
        # user 2: p c v -> no match, dropped
        (2, mk(0), 8, "purchase"), (2, mk(1), 9, "click"), (2, mk(2), 10, "view"),
        # user 3: v e c e p -> error breaks the motif, no match
        (3, mk(0), 11, "view"), (3, mk(1), 12, "error"), (3, mk(2), 13, "click"),
        (3, mk(3), 14, "error"), (3, mk(4), 15, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    monkeypatch.setattr(ax, "_t", lambda s, d, t: ev)
    out = {r["user_id"]: r["n_conversion_motifs"]
           for r in ax.events_pattern_match(spark, "x").collect()}
    assert out == {1: 2}


def test_personalized_pagerank_mass_near_seeds(spark):
    from pyspark.sql import functions as F

    from aspep_etl_spark.operators.pagerank import personalized_pagerank

    # path graph a-b-c-d, seed {a}: rank must decay with distance from a
    e0 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([("a",)], "node string")
    # near the fixpoint: the far end of the chain ranks last, the seed
    # beats the equal-degree node two hops out (hub b may legitimately
    # outrank the seed — degree effects, not an error), and restart
    # keeps total mass <= 1
    pr = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(edges, seeds, iters=20).collect()
    }
    assert pr["d"] == min(pr.values())
    assert pr["a"] > pr["c"] > pr["d"]
    assert 0 < sum(pr.values()) <= 1.000001


def test_personalized_pagerank_empty_seed_set(spark):
    from pyspark.sql import functions as F

    from aspep_etl_spark.operators.pagerank import personalized_pagerank

    edges = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    seeds = spark.createDataFrame([], "node string")
    out = personalized_pagerank(edges, seeds).collect()
    assert all(r["rank"] == 0.0 for r in out)


def test_classifier_auc_matches_pandas_rank_formula(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    import aspep_etl_spark.plans.analytics_extra as ax
    from aspep_etl_spark.operators.classifier import score_documents

    sf = "/root/testdata/sf0.001"
    row = ax.docs_classifier_auc(spark, sf).collect()[0]
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pdf = (
        score_documents(docs, "text", "doc_id", dim=4096)
        .join(
            docs.select(
                "doc_id",
                (F.substring("source", 4, 10).cast("int") % 2 == 0)
                .cast("long")
                .alias("label"),
            ),
            "doc_id",
        )
        .select("score", "label")
        .toPandas()
    )
    ranks = pd.Series(pdf["score"]).rank(method="average")
    n_pos = int(pdf["label"].sum())
    n_neg = len(pdf) - n_pos
    auc = (ranks[pdf["label"] == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert abs(row["auc"] - auc) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0
