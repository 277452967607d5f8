"""Unit tests for the round-4 scale-path LLM operators: hashed linear
classifier, bloom-filter pruning, stupid-backoff bigram LM, and
incremental delta-vs-corpus dedup.

Each operator gets an independent Python twin on a crafted fixture (the
DuckDB contract oracles cover the corpus-scale behavior; these pin the
semantics on inputs where the expected value is hand-checkable) plus the
plan-shape assertions that matter at 100 TB.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from aspep_etl_spark.operators.bloom import bloom_build, bloom_probe
from aspep_etl_spark.operators.classifier import score_documents
from aspep_etl_spark.operators.dedup import (
    incremental_jaccard_matches,
    jaccard_pairs,
    shingles,
)

from .xxh64_twin import xxh64_bytes


def _xx_bucket(feature: str, dim: int) -> int:
    # pmod(xxhash64(feature), dim): the unsigned XXH64 twin value mod a
    # power-of-two dim equals Spark's pmod of the signed hash
    return xxh64_bytes(feature.encode(), 42) % dim


def _py_classifier(text: str, dim: int = 4096):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    acc = 0.0
    for t in feats:  # ordered left fold, same as F.aggregate
        acc += (_xx_bucket(t, dim) % 2001) / 1000.0 - 1.0
    score = round(acc / len(feats), 6)
    prob = round(1.0 / (1.0 + math.exp(-score)), 6)
    return len(feats), score, prob


class TestClassifier:
    def test_matches_python_twin(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "spark shuffles are expensive at scale",
            "one",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_features"], r["score"], r["prob"])
            for r in score_documents(df).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _py_classifier(t), t

    def test_empty_doc_dropped(self, spark):
        df = spark.createDataFrame(
            [(0, "actual words"), (1, "!!! ...")], "doc_id long, text string"
        )
        assert [r["doc_id"] for r in score_documents(df).collect()] == [0]

    def test_map_only_plan(self, spark):
        df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        plan = score_documents(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBloom:
    def test_no_false_negatives(self, spark):
        # every inserted key MUST pass its own probe — structural property
        keys = spark.createDataFrame(
            [(f"shingle number {i}",) for i in range(500)], "k string"
        )
        bloom = bloom_build(keys, "k", m_bits=4096, k=3)
        probed = bloom_probe(keys, "k", bloom, m_bits=4096, k=3)
        assert probed.filter(~F.col("bloom_pass")).count() == 0

    def test_filter_is_broadcast_sized(self, spark):
        keys = spark.createDataFrame(
            [(f"key {i}",) for i in range(2000)], "k string"
        )
        bloom = bloom_build(keys, "k", m_bits=1024, k=3)
        assert bloom.count() <= 1024 // 32

    def test_nonmember_mostly_rejected(self, spark):
        # with m=16384, k=3, n=200 inserted the FPR is ~1e-4 — a probe set
        # of 300 fresh keys should see at most a couple of false positives
        ins = spark.createDataFrame([(f"in {i}",) for i in range(200)], "k string")
        out = spark.createDataFrame([(f"out {i}",) for i in range(300)], "k string")
        bloom = bloom_build(ins, "k", m_bits=16384, k=3)
        fp = bloom_probe(out, "k", bloom, m_bits=16384, k=3).filter(
            F.col("bloom_pass")
        )
        assert fp.count() <= 3

    def test_probe_join_is_broadcast(self, spark):
        keys = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
        bloom = bloom_build(keys, "k", m_bits=1024, k=3)
        plan = (
            bloom_probe(keys, "k", bloom, m_bits=1024, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestIncremental:
    FIX = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "completely different words entirely here now"),
        # ids ≡ 4 (mod 5) form the delta batch
        (4, "alpha beta gamma delta epsilon zeta"),       # dup of 0 (and near 1)
        (9, "totally novel content with fresh phrasing"),  # matches nothing
    ]

    def test_matches_against_corpus_only(self, spark):
        df = spark.createDataFrame(self.FIX, "doc_id long, text string")
        corpus = df.filter(F.col("doc_id") % 5 != 4)
        delta = df.filter(F.col("doc_id") % 5 == 4)
        out = {
            r["doc_id"]: r.asDict()
            for r in incremental_jaccard_matches(
                corpus, delta, "doc_id", "text", n=3, threshold=0.2
            ).collect()
        }
        assert set(out) == {4}
        assert out[4]["best_match_id"] == 0  # exact dup wins, jaccard 1.0
        assert out[4]["best_jaccard"] == 1.0
        assert out[4]["n_matches"] == 2  # doc 0 exact + doc 1 near

    def test_consistent_with_full_jaccard(self, spark, sf_dir):
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .limit(120)
        )
        corpus = docs.filter(F.col("doc_id") % 5 != 4)
        delta = docs.filter(F.col("doc_id") % 5 == 4)
        inc = incremental_jaccard_matches(
            corpus, delta, "doc_id", "text", n=3, threshold=0.1
        )
        # the full-corpus pair list restricted to (corpus, delta) pairs must
        # produce the same per-delta-doc match counts
        full = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.1)
        cross = full.filter(
            ((F.col("id_a") % 5 == 4) & (F.col("id_b") % 5 != 4))
            | ((F.col("id_b") % 5 == 4) & (F.col("id_a") % 5 != 4))
        ).withColumn(
            "new_id",
            F.when(F.col("id_a") % 5 == 4, F.col("id_a")).otherwise(F.col("id_b")),
        )
        expected = {
            r["new_id"]: r["n"]
            for r in cross.groupBy("new_id").agg(F.count("*").alias("n")).collect()
        }
        got = {r["doc_id"]: r["n_matches"] for r in inc.collect()}
        assert got == expected


class TestBigramBackoff:
    def test_backoff_branch_fires_and_matches_twin(self, spark, sf_dir):
        # crafted corpus: train half (even ids) never contains the bigram
        # "zebra quagga", score half (odd ids) does — the backoff branch
        # must fire for it and reproduce the stupid-backoff formula
        rows = [
            (0, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (1, "the cat sat quietly"),       # "sat quietly": unseen bigram
            (3, "zebra quagga run wild"),      # all-unseen tokens + bigrams
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        from aspep_etl_spark.plans.llm_scale import docs_bigram_logprob

        import aspep_etl_spark.plans.llm_scale as mod

        # run the query body against an in-memory frame by monkeypatching
        # the loader seam used by every contract query
        orig = mod._t
        mod._t = lambda spark_, sf_, name: df
        try:
            out = {r["doc_id"]: r for r in docs_bigram_logprob(spark, sf_dir).collect()}
        finally:
            mod._t = orig

        # python twin
        def toks(s):
            return re.findall(r"[a-z0-9]+", s.lower())

        train = [toks(t) for i, t in rows if i % 2 == 0]
        uni: dict[str, int] = {}
        bi: dict[tuple, int] = {}
        for ws in train:
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        total, vocab = sum(uni.values()), len(uni)
        for i, t in rows:
            if i % 2 == 0:
                continue
            ws = toks(t)
            logs = []
            for a, b in zip(ws, ws[1:]):
                if (a, b) in bi:
                    s = bi[(a, b)] / uni[a]
                else:
                    s = 0.4 * (uni.get(b, 0) + 1) / (total + vocab)
                logs.append(math.log10(s))
            assert out[i]["n_bigrams"] == len(logs)
            assert out[i]["avg_logprob"] == pytest.approx(
                round(sum(logs) / len(logs), 6), abs=1e-6
            )
        # sanity: doc 3 is all-backoff and must score far below doc 1
        assert out[3]["avg_logprob"] < out[1]["avg_logprob"]


class TestProperties:
    """Property-based cross-checks of the two ordered-fold operators
    against pure-Python twins on randomized inputs — the fold order and
    the md5-bucket hash must agree bit-for-bit with an independent
    implementation, not just on the fixture corpus."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _WORDS = ["spark", "join", "scan", "hash", "sort", "row", "batch", "key",
              "Zürich", "naïve", "0xdead", "42"]
    _texts = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=20).map(" ".join)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(st.lists(_texts, min_size=1, max_size=6))
    def test_classifier_random_texts_match_twin(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_features"], r["score"], r["prob"])
            for r in score_documents(df).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _py_classifier(t), t

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(st.lists(_texts, min_size=1, max_size=6))
    def test_entropy_random_texts_match_twin(self, spark, texts):
        from aspep_etl_spark.plans import analytics_extra as mod

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        orig = mod._t
        mod._t = lambda s, d, n: df
        try:
            got = {
                r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["token_entropy"])
                for r in mod.docs_token_entropy(spark, "unused").collect()
            }
        finally:
            mod._t = orig
        for i, t in enumerate(texts):
            toks = re.findall(r"[a-z0-9]+", t.lower())
            from collections import Counter

            cnt = Counter(toks)
            acc = 0.0
            for tok in sorted(cnt):
                p = cnt[tok] / len(toks)
                acc -= p * math.log2(p)
            assert got[i] == (len(toks), len(cnt), round(acc, 6)), t


class TestPageRank:
    def test_line_graph_matches_python_twin(self, spark):
        from aspep_etl_spark.operators.pagerank import pagerank

        # undirected path a-b-c (symmetrized): closed-form-checkable
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}

        # python twin with identical rounding discipline
        nodes = ["a", "b", "c"]
        out_deg = {"a": 1, "b": 2, "c": 1}
        adj_in = {"a": ["b"], "b": ["a", "c"], "c": ["b"]}
        n = float(len(nodes))
        rank = {v: round(1.0 / n, 9) for v in nodes}
        for _ in range(3):
            rank = {
                v: round(
                    (1.0 - 0.85) / n
                    + 0.85 * sum(rank[u] / out_deg[u] for u in adj_in[v]),
                    9,
                )
                for v in nodes
            }
        assert got == rank
        # symmetry: a and c are isomorphic endpoints
        assert got["a"] == got["c"]
        assert got["b"] > got["a"]

    def test_mass_approximately_conserved(self, spark):
        from aspep_etl_spark.operators.pagerank import pagerank

        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")]
        df = spark.createDataFrame(edges, "src string, dst string")
        total = sum(r["rank"] for r in pagerank(df, iters=3).collect())
        assert abs(total - 1.0) < 1e-6

    def test_iteration_storage_stays_bounded(self, spark):
        from aspep_etl_spark.cache import persistent_rdd_ids
        from aspep_etl_spark.operators.pagerank import pagerank

        before = persistent_rdd_ids(spark)
        edges = [(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)]
        edges += [(d, s) for s, d in edges]
        df = spark.createDataFrame(edges, "src string, dst string")
        pagerank(df, iters=6).count()
        # superseded rounds freed eagerly: at most the final frame's
        # blocks (plus nothing from the 5 dead rounds) may remain
        leaked = persistent_rdd_ids(spark) - before
        assert len(leaked) <= 1


class TestCountMin:
    def test_never_underestimates(self, spark, sf_dir):
        from aspep_etl_spark.operators.sketch import cms_build, cms_estimate

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        cms = cms_build(ev, "user_id", depth=4, width=32)  # heavy collisions
        exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
        est = cms_estimate(exact, "user_id", cms, depth=4, width=32)
        assert est.filter(F.col("cms_est") < F.col("exact")).count() == 0

    def test_exact_when_width_exceeds_cardinality(self, spark):
        from aspep_etl_spark.operators.sketch import cms_build, cms_estimate

        rows = [(i % 5,) for i in range(100)]
        df = spark.createDataFrame(rows, "k long")
        # 5 distinct keys, 4096 buckets: collision probability ~0 -> exact
        cms = cms_build(df, "k", depth=4, width=4096)
        exact = df.groupBy("k").agg(F.count("*").alias("exact"))
        est = cms_estimate(exact, "k", cms, depth=4, width=4096)
        assert est.filter(F.col("cms_est") != F.col("exact")).count() == 0

    def test_sketches_merge_by_union_sum(self, spark):
        from aspep_etl_spark.operators.sketch import cms_build

        a = spark.createDataFrame([(i % 7,) for i in range(50)], "k long")
        b = spark.createDataFrame([(i % 3,) for i in range(30)], "k long")
        both = a.union(b)
        merged = (
            cms_build(a, "k", 4, 64).union(cms_build(b, "k", 4, 64))
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        direct = cms_build(both, "k", 4, 64)
        assert merged.exceptAll(direct).count() == 0
        assert direct.exceptAll(merged).count() == 0


class TestGroupedSplit:
    def test_no_group_leakage(self, spark, sf_dir):
        from aspep_etl_spark.operators.sampling import split_column

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assigned = docs.withColumn(
            "split",
            split_column(["source"], {"train": 0.8, "val": 0.1, "test": 0.1},
                         salt="gsplit"),
        )
        leaky = (
            assigned.groupBy("source")
            .agg(F.count_distinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
        )
        assert leaky.count() == 0


class TestKMV:
    def test_exact_below_k(self, spark):
        from aspep_etl_spark.operators.sketch import kmv_build, kmv_estimate

        df = spark.createDataFrame([(i % 10,) for i in range(200)], "k long")
        sk = kmv_build(df, "k", k=64)
        est = sk.select(kmv_estimate(F.col("kmv"), 64).alias("e")).collect()[0]["e"]
        assert est == 10.0  # below k the sketch IS the distinct set

    def test_estimate_within_error_bound(self, spark):
        from aspep_etl_spark.operators.sketch import kmv_build, kmv_estimate

        # 2000 distinct >> k=64: estimation branch; std err ~ 1/sqrt(64)
        df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
        sk = kmv_build(df, "k", k=64)
        est = sk.select(kmv_estimate(F.col("kmv"), 64).alias("e")).collect()[0]["e"]
        assert 2000 * 0.6 < est < 2000 * 1.4

    def test_sketches_merge_by_union(self, spark):
        from aspep_etl_spark.operators.sketch import kmv_build

        a = spark.createDataFrame([(i,) for i in range(300)], "k long")
        b = spark.createDataFrame([(i,) for i in range(150, 450)], "k long")
        direct = kmv_build(a.union(b), "k", k=64).collect()[0]["kmv"]
        sa = kmv_build(a, "k", k=64).collect()[0]["kmv"]
        sb = kmv_build(b, "k", k=64).collect()[0]["kmv"]
        merged = sorted(set(sa) | set(sb))[:64]
        assert merged == direct


class TestGeo:
    def test_known_distance(self, spark):
        from aspep_etl_spark.operators.geo import haversine_km

        # London (51.5074, -0.1278) to Paris (48.8566, 2.3522) ~ 343.5 km
        df = spark.createDataFrame([(1,)], "x int").select(
            haversine_km(
                F.lit(51.5074), F.lit(-0.1278), F.lit(48.8566), F.lit(2.3522)
            ).alias("d")
        )
        assert abs(df.collect()[0]["d"] - 343.5) < 1.0

    def test_bucketing_equals_brute_force(self, spark):
        import itertools
        import math

        from aspep_etl_spark.operators.geo import radius_join

        pts = [
            (i, 40.0 + (i * 13 % 50) / 50.0, -74.0 + (i * 29 % 50) / 50.0)
            for i in range(80)
        ]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        got = {
            (r["id_a"], r["id_b"])
            for r in radius_join(df, radius_km=30.0, cell_deg=0.5).collect()
        }

        def hav(a, b):
            dlat = math.radians(b[1] - a[1]); dlon = math.radians(b[2] - a[2])
            x = (math.sin(dlat / 2) ** 2
                 + math.cos(math.radians(a[1])) * math.cos(math.radians(b[1]))
                 * math.sin(dlon / 2) ** 2)
            return 2 * 6371.0 * math.asin(math.sqrt(x))

        want = {
            (a[0], b[0])
            for a, b in itertools.combinations(pts, 2)
            if hav(a, b) <= 30.0
        }
        assert got == want

    def test_no_nested_loop_join(self, spark):
        from aspep_etl_spark.operators.geo import radius_join

        df = spark.createDataFrame(
            [(i, 40.0 + i / 100.0, -74.0) for i in range(20)],
            "id long, lat double, lon double",
        )
        plan = (
            radius_join(df, 25.0, 0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_cell_size_guard(self, spark):
        import pytest as _pytest

        from aspep_etl_spark.operators.geo import radius_join

        df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
        with _pytest.raises(AssertionError):
            radius_join(df, radius_km=100.0, cell_deg=0.5)

    def test_dense_hot_cell_candidate_fanout_bounded(self, spark):
        """r4 verdict ask #7 (mirrors test_dedup_skew.py): the degenerate
        density — EVERY point inside one grid cell — must produce each
        unordered pair exactly ONCE (the 3×3 expansion meets a pair at a
        unique offset; a buggy expansion would emit up to 9 duplicates),
        so candidate fan-out is the irreducible C(n,2) of the hot cell,
        never a multiple of it."""
        import itertools
        import math

        from aspep_etl_spark.operators.geo import radius_join

        # 120 points jittered inside ~0.1° — all in one 0.5° cell
        n = 120
        pts = [
            (i, 40.01 + (i * 13 % 97) / 1000.0, -74.49 + (i * 29 % 89) / 1000.0)
            for i in range(n)
        ]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        # radius big enough to accept every pair in the cell → output IS
        # the candidate set; count pins the fan-out
        rows = radius_join(df, radius_km=50.0, cell_deg=0.5).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(pairs) == len(set(pairs)), "duplicate candidate pairs"
        assert len(pairs) == n * (n - 1) // 2

        # and the distances are still exact vs brute force
        def hav(a, b):
            dlat = math.radians(b[1] - a[1]); dlon = math.radians(b[2] - a[2])
            x = (math.sin(dlat / 2) ** 2
                 + math.cos(math.radians(a[1])) * math.cos(math.radians(b[1]))
                 * math.sin(dlon / 2) ** 2)
            return 2 * 6371.0 * math.asin(math.sqrt(x))

        want = {
            (a[0], b[0]): round(hav(a, b), 3)
            for a, b in itertools.combinations(pts, 2)
        }
        got = {(r["id_a"], r["id_b"]): r["distance_km"] for r in rows}
        assert got == want

    def test_dense_hot_cell_on_antimeridian_seam(self, spark):
        """Same degenerate density parked ON the ±180° seam: half the
        points at lon≈+179.9, half at −179.9 — every pair must still
        meet exactly once through the wrapped neighbor cells."""
        from aspep_etl_spark.operators.geo import radius_join

        n = 60
        pts = [
            (
                i,
                10.0 + (i % 7) / 100.0,
                (179.95 if i % 2 else -179.95) + (i % 5) / 1000.0,
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        rows = radius_join(df, radius_km=50.0, cell_deg=0.5).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(pairs) == len(set(pairs)), "duplicate candidate pairs"
        assert len(pairs) == n * (n - 1) // 2


class TestGeoProperties:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _pts = st.lists(
        st.tuples(
            st.floats(min_value=35.0, max_value=36.0, allow_nan=False),
            st.floats(min_value=-120.0, max_value=-119.0, allow_nan=False),
        ),
        min_size=2,
        max_size=25,
        unique=True,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(_pts)
    def test_random_points_match_brute_force(self, spark, coords):
        import itertools
        import math

        from aspep_etl_spark.operators.geo import radius_join

        pts = [(i, la, lo) for i, (la, lo) in enumerate(coords)]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        got = {
            (r["id_a"], r["id_b"])
            for r in radius_join(df, radius_km=40.0, cell_deg=0.6).collect()
        }

        def hav(a, b):
            dlat = math.radians(b[1] - a[1]); dlon = math.radians(b[2] - a[2])
            x = (math.sin(dlat / 2) ** 2
                 + math.cos(math.radians(a[1])) * math.cos(math.radians(b[1]))
                 * math.sin(dlon / 2) ** 2)
            return 2 * 6371.0 * math.asin(math.sqrt(x))

        want = {
            (a[0], b[0])
            for a, b in itertools.combinations(pts, 2)
            if hav(a, b) <= 40.0
        }
        assert got == want


class TestGeoAntimeridian:
    def test_pair_across_dateline_found(self, spark):
        from aspep_etl_spark.operators.geo import radius_join

        pts = [(1, 0.0, 179.95), (2, 0.0, -179.95), (3, 0.0, 150.0)]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        got = {
            (r["id_a"], r["id_b"]): r["distance_km"]
            for r in radius_join(df, radius_km=25.0, cell_deg=0.5).collect()
        }
        # ~11.1 km apart across the +-180 seam
        assert (1, 2) in got and got[(1, 2)] < 12.0
        assert len(got) == 1

    def test_non_divisor_cell_rejected(self, spark):
        import pytest as _pytest

        from aspep_etl_spark.operators.geo import radius_join

        df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
        with _pytest.raises(ValueError, match="divide 360"):
            radius_join(df, radius_km=25.0, cell_deg=0.7)
