"""Similarity search: IVF approximate top-k recall against the exact
brute-force baseline on real testdata embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from aspep_etl_spark.operators.similarity import brute_force_topk, ivf_topk


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # Approximate by design; with 8 centroids and 4 probes on 500 vectors
    # recall should be high but < 1.0 is acceptable.
    assert recall >= 0.6, recall
    # every query returns exactly k ranked neighbors
    per_q = {}
    for q, _ in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert set(per_q.values()) == {5}


def test_srp_lsh_recall_in_design_regime(spark):
    """SRP-LSH's contract is the HIGH-cosine regime: on clustered data
    (each base vector with jittered copies at cos ≈ 0.99) the default
    8-plane × 8-table config must recover ≥95% of the true same-cluster
    neighbors.  (On this repo's near-orthogonal testdata recall is
    legitimately low — the collision bound collapses with angle; see the
    operator docstring.  IVF covers that regime.)"""
    import random

    from aspep_etl_spark.operators.similarity import brute_force_topk, srp_lsh_topk

    rng = random.Random(13)
    rows = []
    vid = 0
    for _ in range(30):
        base = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(4):  # base + 3 jittered copies, cosine ~0.99
            rows.append((vid, [b + rng.gauss(0, 0.08) for b in base]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(2)
    queries = emb.filter("vec_id % 4 = 0")  # one query per cluster

    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    srp = {
        (r["query_id"], r["neighbor_id"])
        for r in srp_lsh_topk(emb, queries, k=3).collect()
    }
    recall = len(brute & srp) / len(brute)
    assert recall >= 0.95, recall


def test_srp_planes_deterministic(spark):
    from aspep_etl_spark.operators.similarity import srp_planes

    a = srp_planes(8, 4, 2, seed=7)
    b = srp_planes(8, 4, 2, seed=7)
    c = srp_planes(8, 4, 2, seed=8)
    assert a == b and a != c
    flat = [x for t in a for p in t for x in p]
    assert set(flat) <= {1.0, -1.0}
    # roughly balanced signs (sha256-derived, not degenerate)
    assert 0.3 < sum(1 for x in flat if x > 0) / len(flat) < 0.7


def test_pq_adc_recall_vs_bruteforce(spark, sf_dir):
    """PQ-ADC screen + exact refine: candidates come from 2×4-code
    compressed distances, so recall < 1 is the design trade; the refine
    keeps emitted cosines exact and ranks deterministic."""
    from aspep_etl_spark.operators.similarity import pq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    rows = pq_adc_topk(emb, queries, k=5).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    per_q = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert set(per_q.values()) == {5}
    # emitted cosines are the EXACT fold values: spot-check against brute
    brute_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=500).collect()
    }
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute_cos:
            assert r["cosine"] == brute_cos[key]


def test_mmr_rank1_is_pure_relevance_and_penalizes_redundancy(spark):
    """Constructed corpus: two near-identical highly-relevant vectors and
    one moderately-relevant orthogonal one.  Pure top-2 takes the twins;
    MMR must take one twin then the diverse vector."""
    from aspep_etl_spark.operators.similarity import mmr_topk

    rows = [
        (0, [1.0, 0.0, 0.0]),        # query
        (1, [0.99, 0.14, 0.0]),      # relevant
        (2, [0.99, 0.141, 0.001]),   # near-duplicate of 1
        (3, [0.7, 0.0, 0.71]),       # diverse, less relevant
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    got = {
        r["mmr_rank"]: r["neighbor_id"]
        for r in mmr_topk(emb, q, k=2, pool=3, lam=0.5).collect()
    }
    assert got[1] == 1  # best relevance, id tie-break
    assert got[2] == 3  # diversity beats the near-duplicate twin
