"""Integration semantics of the composed curation pipeline — the funnel
oracle checks the COUNTS; these tests check the membership invariants the
counts can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from aspep_etl_spark.plans.curation import curate_documents


def test_curation_stage_invariants(spark, sf_dir):
    st = curate_documents(spark, sf_dir)
    corpus = {r["doc_id"] for r in st["corpus"].select("doc_id").collect()}
    s1 = {r["doc_id"] for r in st["exact"].select("doc_id").collect()}
    s2 = {r["doc_id"] for r in st["neardup"].select("doc_id").collect()}
    s3 = {r["doc_id"] for r in st["decontam"].select("doc_id").collect()}
    s4 = {r["doc_id"] for r in st["quality"].select("doc_id").collect()}

    # monotone shrinking chain of subsets
    assert s4 <= s3 <= s2 <= s1 <= corpus
    assert len(s1) < len(corpus) or len(s2) < len(s1)  # something deduped

    # exact-dedup survivors: one per distinct text, the min id
    texts = st["corpus"].groupBy("text").agg(F.min("doc_id").alias("m"))
    assert s1 == {r["m"] for r in texts.collect()}

    # no two surviving near-dup docs share identical text
    n_texts = st["neardup"].select("text").distinct().count()
    assert n_texts == len(s2)

    # curated output: every doc has exactly one split and no raw PII left
    curated = st["curated"]
    assert curated.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    leaked = curated.filter(
        F.col("text").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}")
    ).count()
    assert leaked == 0
    assert curated.count() == len(s4)


class TestIngestFunnel:
    """Integration checks for the incremental ingest funnel (the day-2
    counterpart of the curation funnel)."""

    def test_stage_counts_monotone_and_coherent(self, spark, sf_dir):
        from aspep_etl_spark.plans.ingest_funnel import llm_ingest_funnel

        rows = {r["stage"]: r["n_docs"] for r in llm_ingest_funnel(spark, sf_dir).collect()}
        order = ["0_batch", "1_exact", "2_neardup", "3_decontam", "4_quality",
                 "5_classifier"]
        for a, b in zip(order, order[1:]):
            assert rows[b] <= rows[a], (a, b, rows)
        # split tail partitions the classifier survivors exactly
        split_total = sum(v for k, v in rows.items() if k.startswith("6_"))
        assert split_total == rows["5_classifier"]

    def test_no_corpus_doc_admitted(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from aspep_etl_spark.plans.ingest_funnel import ingest_batch

        st = ingest_batch(spark, sf_dir)
        bad = st["admitted"].filter(F.col("doc_id") % 5 != 4)
        assert bad.count() == 0
