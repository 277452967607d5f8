"""Triangle counting (operators/triangles.py): hand-checkable graphs,
kNN edge construction, and the degree-orientation invariants."""

from __future__ import annotations

from aspep_etl_spark.operators.triangles import (
    cooccurrence_knn_edges,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def test_k4_has_four_triangles(spark):
    k4 = _edges(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    row = triangle_count(k4).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 6
    assert row["n_triangles"] == 4
    assert row["clustering_coefficient"] == 1.0


def test_path_graph_has_none(spark):
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    row = triangle_count(path).collect()[0]
    assert row["n_triangles"] == 0
    assert row["clustering_coefficient"] == 0.0


def test_two_disjoint_triangles_plus_tail(spark):
    g = _edges(spark, [(0, 1), (0, 2), (1, 2), (5, 6), (5, 7), (6, 7), (7, 8)])
    row = triangle_count(g).collect()[0]
    assert row["n_triangles"] == 2


def test_skewed_star_counts_correctly(spark):
    # hub 0 connected to 1..20, plus rim edges (1,2) and (3,4): exactly 2
    # triangles; the orientation must not blow the wedge join up on the hub
    edges = [(0, i) for i in range(1, 21)] + [(1, 2), (3, 4)]
    row = triangle_count(_edges(spark, edges)).collect()[0]
    assert row["n_triangles"] == 2


def test_knn_edges_bounded_and_deterministic(spark):
    # bipartite fixture: groups g0..g4, nodes 0..9; node n in group g iff
    # (n + g) % 3 == 0 — deterministic co-occurrence structure
    rows = [
        (g, n) for g in range(5) for n in range(10) if (n + g) % 3 == 0
    ]
    df = spark.createDataFrame(rows, "g long, n long")
    e1 = sorted(map(tuple, cooccurrence_knn_edges(df, "g", "n", k=2).collect()))
    e2 = sorted(map(tuple, cooccurrence_knn_edges(df, "g", "n", k=2).collect()))
    assert e1 == e2  # deterministic
    assert all(u < v for u, v in e1)
    assert len(e1) == len(set(e1))
    # per-node selection ≤ k each side → |E| ≤ k·n
    assert len(e1) <= 2 * 10


def test_knn_hot_group_cap_drops_group(spark):
    # one giant group with every node + tiny groups; with the cap at 8
    # the giant group must contribute no pairs
    rows = [(99, n) for n in range(50)] + [(1, 0), (1, 1), (2, 0), (2, 1)]
    df = spark.createDataFrame(rows, "g long, n long")
    edges = cooccurrence_knn_edges(df, "g", "n", k=5, max_group_size=8).collect()
    assert sorted(map(tuple, edges)) == [(0, 1)]
