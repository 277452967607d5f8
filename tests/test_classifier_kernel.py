"""Parity pin for the adopted ``mapInPandas`` scoring kernel (r10).

``score_documents`` now dispatches to the Arrow kernel; this pins it
BIT-IDENTICAL to the Catalyst expression twin ``score_documents_expr``
on every contract-relevant axis — scores, sigmoids, feature counts,
carried ``keep`` columns, and zero-token-doc filtering — so a drift in
the Python-side XXH64, the left-fold order, or the shortest-repr
HALF_UP rounding fails loudly here before it reaches the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aspep_etl_spark.operators.classifier import (
    score_documents,
    score_documents_expr,
    score_documents_kernel,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kernel_matches_expr_bit_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _rows(score_documents_expr(docs, "text", "doc_id", dim=4096))
    b = _rows(score_documents_kernel(docs, "text", "doc_id", dim=4096))
    assert a == b
    assert len(a) > 0


def test_kernel_matches_expr_with_keep(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _rows(score_documents_expr(docs, "text", "doc_id", dim=4096, keep=("lang",)))
    b = _rows(score_documents_kernel(docs, "text", "doc_id", dim=4096, keep=("lang",)))
    assert a == b


def test_kernel_drops_zero_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "!!! ??? ..."), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"] for r in score_documents(docs).collect()}
    assert out == {1}


def test_dispatch_is_kernel(spark, sf_dir):
    """score_documents must route through mapInPandas (the adopted arm) —
    and stay map-only: no Exchange in the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = score_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_kernel_edgecases_vs_expr(spark):
    """Single-token docs (no bigrams), long repeated docs, numerics."""
    rows = [
        (1, "a"),
        (2, "a a a a a a a a"),
        (3, "7 42 zz9 " * 40),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = _rows(score_documents_expr(docs))
    b = _rows(score_documents_kernel(docs))
    assert a == b and len(a) == 4
