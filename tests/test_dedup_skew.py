"""Adversarial-skew tests for the bucketed dedup candidate generators.

Posting lists (``jaccard_pairs``) and LSH band buckets
(``minhash_lsh_pairs``) both confine quadratic pair generation to rows
sharing a bucket — which degrades exactly when one bucket holds a large
corpus fraction.  These tests craft that degradation deliberately (a
stopword shingle present in EVERY document; an exact-dup cluster that
collides in every LSH band) and pin that the documented caps bound the
fan-out while keeping the true near-dup pairs.
"""

import pytest
from pyspark.sql import functions as F

from aspep_etl_spark.operators.dedup import (
    DEFAULT_SHINGLE_DF_FLOOR,
    DEFAULT_SHINGLE_DF_FRACTION,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingle_df_cap,
    shingles,
    shingle_df_cap as _cap,
)

N_DOCS = 60
HOT = "the quick brown fox jumps over"  # 6 words → every doc shares 4 trigrams


@pytest.fixture(scope="module")
def hot_shingle_docs(spark):
    """Every doc carries the same hot 6-word prefix (4 shared trigrams);
    only docs 0 and 1 are true near-dups (identical unique tails)."""
    rows = []
    for i in range(N_DOCS):
        tail_seed = 0 if i <= 1 else i  # docs 0,1 share a tail → true pair
        tail = " ".join(f"tail{tail_seed} word{tail_seed}x{j} unique{tail_seed}y{j}" for j in range(4))
        rows.append((i, f"{HOT} {tail}"))
    return spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2)


def test_shingle_df_cap_policy():
    assert shingle_df_cap(500) == 50
    assert shingle_df_cap(1_000_000) == 100_000
    # floor protects tiny corpora (exact behavior, affordable quadratic)
    assert shingle_df_cap(10) == DEFAULT_SHINGLE_DF_FLOOR
    assert shingle_df_cap(0) == DEFAULT_SHINGLE_DF_FLOOR
    assert DEFAULT_SHINGLE_DF_FRACTION == 0.1


def test_hot_shingle_fanout_bounded(spark, hot_shingle_docs):
    docs = hot_shingle_docs

    # Uncapped: the 4 corpus-wide trigrams put ALL C(60,2) pairs through the
    # intersection aggregation — the quadratic blow-up the cap exists for.
    uncapped = jaccard_pairs(docs, "doc_id", "text", threshold=0.0)
    assert uncapped.count() == N_DOCS * (N_DOCS - 1) // 2

    # Capped at the default policy (floor=8 here): the hot postings are
    # dropped; candidate fan-out collapses to the docs sharing RARE shingles.
    cap = shingle_df_cap(N_DOCS)
    assert cap == DEFAULT_SHINGLE_DF_FLOOR
    capped = jaccard_pairs(
        docs, "doc_id", "text", threshold=0.0, max_shingle_df=cap
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(0, 1)]

    # The surviving pair keeps its FULL-denominator Jaccard: the cap prunes
    # candidate generation, not the similarity definition — docs 0/1 share
    # the hot prefix AND the tail, differing only across the boundary
    # shingles, so jaccard stays high but below 1.
    assert 0.5 < capped[0]["jaccard"] < 1.0


def test_hot_shingle_posting_volume(spark, hot_shingle_docs):
    """The pair-generation INPUT (posting-list fan-out) is what the cap
    bounds: Σ df·(df−1)/2 over surviving postings."""
    sh = shingles(hot_shingle_docs, "doc_id", "text")
    df_counts = sh.groupBy("shingle").count()
    fanout = F.sum(F.expr("count * (count - 1) / 2"))
    total = df_counts.filter("count >= 2").agg(fanout).first()[0]
    capped_total = (
        df_counts.filter(f"count >= 2 AND count <= {_cap(N_DOCS)}").agg(fanout).first()[0]
    )
    # 4 hot trigrams × C(60,2) dominate uncapped volume …
    assert total >= 4 * N_DOCS * (N_DOCS - 1) // 2
    # … while the capped volume is the true-pair postings only
    assert capped_total < 50


def test_lsh_degenerate_bucket_capped(spark):
    """An exact-dup cluster collides in EVERY band: k docs → O(k²)
    candidates × bands.  max_bucket_df drops those buckets; distinct docs
    (and small clusters ≤ cap) are unaffected."""
    k = 30
    cluster = [(i, "identical boilerplate page body repeated verbatim for every mirror copy here") for i in range(k)]
    # distinct docs, long enough to shingle, pairwise dissimilar
    distinct = [
        (100 + i, " ".join(f"doc{i}w{j} alpha{i * 7 + j} beta{i}z{j}" for j in range(6)))
        for i in range(10)
    ]
    docs = spark.createDataFrame(cluster + distinct, ["doc_id", "text"]).coalesce(2)

    uncapped = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    assert uncapped.filter("id_a < 100 AND id_b < 100").count() == k * (k - 1) // 2

    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket_df=10
    )
    rows = capped.collect()
    # the oversized cluster's buckets are gone …
    assert not [r for r in rows if r["id_a"] < 100 and r["id_b"] < 100]
    # … and nothing else got caught in the guard (distinct docs don't pair)
    assert not [r for r in rows if r["id_a"] >= 100 or r["id_b"] >= 100]


def test_embedding_collapse_exact_under_duplication(spark):
    """collapse_exact pins the tiled-duplication pathology (r6 sf1: ×10
    copies → 8.7× wall): with m copies of every vector the quadratic core
    must see only the DISTINCT vectors, and the expanded output must equal
    the brute-force pair set on the duplicated corpus — including
    within-group (copy↔copy, cosine 1.0) pairs and cross-group pairs at
    every copy combination."""
    import math

    from aspep_etl_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_bucketed,
    )

    m = 6
    base = [
        [1.0, 0.0, 0.0],
        [math.cos(0.1), math.sin(0.1), 0.0],  # cos 0.995 vs v0
        [0.0, 1.0, 0.0],                      # far from both
    ]
    rows = [
        (g * 100 + c, v) for g, v in enumerate(base) for c in range(m)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.9, n_leaders=2, n_assign=2)
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dup_pairs_bucketed(emb, **kw).collect()
    }
    brute = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert got == brute
    # expected volume: C(6,2)=15 self pairs per group × 3 groups (cos 1.0)
    # + 36 cross pairs between group0 and group1 (cos ≈ 0.995)
    assert len(got) == 15 * 3 + 36
    assert sum(1 for _, _, c in got if c == 1.0) == 45
