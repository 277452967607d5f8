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
    """Single-token docs (no bigrams), long repeated docs, numerics,
    and NULL texts (both arms must DROP, not fail — r10 ADVICE)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        (1, "a"),
        (2, "a a a a a a a a"),
        (3, "7 42 zz9 " * 40),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, schema)
    a = _rows(score_documents_expr(docs))
    b = _rows(score_documents_kernel(docs))
    assert a == b and len(a) == 4
    assert 5 not in {r[0] for r in b}


def test_kernel_null_text_dropped_not_failed(spark):
    """A null text must be silently dropped by BOTH arms — the kernel
    previously raised AttributeError on texts[i].lower() (r10 ADVICE
    medium); this pins the fix with an all-null + mixed frame."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = spark.createDataFrame([(1, None), (2, None), (3, "ok doc")], schema)
    out = {r["doc_id"] for r in score_documents(docs).collect()}
    assert out == {3}
    expr_out = {r["doc_id"] for r in score_documents_expr(docs).collect()}
    assert expr_out == out


def test_kernel_rejects_non_power_of_two_dim(spark):
    """dim must be a power of two — the kernel's unsigned xxh64 % dim
    only equals the twin's pmod(signed, dim) when dim divides 2^64
    (r10 ADVICE low). The assert makes the assumption loud."""
    import pytest

    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="power of two"):
        score_documents_kernel(docs, dim=1000)
    # power-of-two dims still fine
    assert score_documents_kernel(docs, dim=2048).count() == 1
