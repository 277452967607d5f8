"""Prefix-filtered similarity join (operators/dedup.prefix_filter_pairs):
losslessness vs the full-posting-list strategy, candidate-volume
reduction, and edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aspep_etl_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_pairs,
    shingle_arrays,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("t", [0.3, 0.5])
def test_equals_full_posting_strategy(spark, docs, t):
    full = _rows(jaccard_pairs(docs, "doc_id", "text", n=3, threshold=t))
    pref = _rows(prefix_filter_pairs(docs, "doc_id", "text", n=3, threshold=t))
    assert pref == full
    assert len(pref) > 0  # fixture actually exercises the pair path


def test_prefix_postings_strictly_smaller(spark, docs):
    # the point of the strategy: the posting volume feeding pair
    # generation shrinks by ~t and shifts to rare shingles
    arrs = shingle_arrays(docs, "doc_id", "text", 3).filter(F.col("n_shingles") > 0)
    full_postings = arrs.select(F.explode("sh_arr")).count()
    t = 0.5
    sh = arrs.select("doc_id", F.explode("sh_arr").alias("shingle"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__df, shingle))), x -> x.shingle)"
            ).alias("o")
        )
        .withColumn(
            "p", F.size("o") - F.ceil(F.lit(t - 5e-5) * F.size("o")).cast("int") + F.lit(1)
        )
    )
    prefix_postings = ranked.select(
        F.explode(F.expr("slice(o, 1, p)"))
    ).count()
    assert prefix_postings < 0.6 * full_postings


def test_identical_and_disjoint_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(prefix_filter_pairs(df, "doc_id", "text", n=3, threshold=0.5))
    assert out == [(1, 2, 1.0)]


def test_overlapping_windows_pair_found(spark):
    # two 14-word sliding windows: 12 trigrams each, 10 shared →
    # J = 10/(12+12-10) = 10/14 = 0.7143 ≥ 0.5, must survive the prefix
    a = " ".join(f"w{i}" for i in range(14))       # 12 trigrams
    b = " ".join(f"w{i}" for i in range(2, 16))    # 12 trigrams, 10 shared
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = _rows(prefix_filter_pairs(df, "doc_id", "text", n=3, threshold=0.5))
    assert out == [(1, 2, round(10 / 14, 4))]
