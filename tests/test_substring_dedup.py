"""Semantics tests for exact substring (k-gram span) dedup.

Handcrafted corpora pin the policy decisions: first (doc_id, pos)
occurrence keeps its text, later copies are trimmed; overlapping
duplicated grams merge into ONE removed span (not k spans); in-doc
self-repetition trims the repeat; sub-k docs pass through untouched.
The full-corpus behavior is oracle-checked by the driver gate
(``docs_substring_dedup``).
"""

import pytest

from aspep_etl_spark.operators.dedup import substring_span_dedup

K = 8
BOILER = "this license text is identical across every mirrored page today"  # 10 tokens


@pytest.fixture(scope="module")
def result(spark):
    docs = [
        (0, f"alpha beta gamma {BOILER} delta epsilon"),
        (1, f"zeta eta {BOILER} theta iota kappa"),
        # in-doc repetition: same 8-gram twice
        (2, "one two three four five six seven eight filler one two three four five six seven eight"),
        (3, "short doc under k tokens"),
        (4, ""),
    ]
    out = substring_span_dedup(
        spark.createDataFrame(docs, ["doc_id", "text"]).coalesce(2),
        "doc_id",
        "text",
        k=K,
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_first_occurrence_keeps_text(result):
    r0 = result[0]
    assert r0["clean_text"] == f"alpha beta gamma {BOILER} delta epsilon"
    assert r0["n_tokens_removed"] == 0


def test_later_copy_trims_merged_span(result):
    # doc 1 shares the 10-token boilerplate: three overlapping duplicated
    # 8-grams merge into ONE 10-token removed span
    r1 = result[1]
    assert r1["clean_text"] == "zeta eta theta iota kappa"
    assert r1["n_tokens"] == 15 and r1["n_tokens_removed"] == 10


def test_in_doc_repetition_trims_second_copy(result):
    r2 = result[2]
    assert r2["clean_text"] == "one two three four five six seven eight filler"
    assert r2["n_tokens_removed"] == 8


def test_short_and_empty_docs_pass_through(result):
    assert result[3]["clean_text"] == "short doc under k tokens"
    assert result[3]["n_tokens_removed"] == 0
    assert result[4]["clean_text"] == ""
    assert result[4]["n_tokens"] == 0 and result[4]["n_tokens_removed"] == 0


def test_every_doc_emitted_once(result):
    assert sorted(result) == [0, 1, 2, 3, 4]
