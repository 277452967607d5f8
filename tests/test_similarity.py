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
