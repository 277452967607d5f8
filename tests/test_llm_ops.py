"""Unit tests for the round-2 LLM-pipeline operators: connected
components, PII scan/redaction, repetition metrics, quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_connected_components_chain_and_islands(spark):
    """A 6-node chain (worst case for plain propagation — pointer jumping
    must collapse it), a 2-node island, and a self-contained triangle."""
    from aspep_etl_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain: component 1
         (10, 11),                                  # island: component 10
         (20, 21), (21, 22), (20, 22)],             # triangle: component 20
        ["id_a", "id_b"],
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_deterministic_min_label(spark):
    """Labels are min-ids regardless of pair orientation/order."""
    from aspep_etl_spark.operators.components import connected_components

    fwd = spark.createDataFrame([(7, 3), (3, 9), (9, 1)], ["id_a", "id_b"])
    rev = spark.createDataFrame([(1, 9), (9, 3), (3, 7)], ["id_a", "id_b"])
    a = {r["node"]: r["component"] for r in connected_components(fwd).collect()}
    b = {r["node"]: r["component"] for r in connected_components(rev).collect()}
    assert a == b == {1: 1, 3: 1, 7: 1, 9: 1}


def test_pii_counts_and_redaction(spark):
    from aspep_etl_spark.operators.text import pii_pattern_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://x.io/a?b=1 now"),
            (2, "call 555-123-4567 from 10.0.0.1 twice 555-123-4567"),
            (3, "clean text, nothing to scrub"),
        ],
        ["id", "text"],
    )
    out = df.withColumns(pii_pattern_counts(F.col("text"))).withColumn(
        "redacted", redact_pii(F.col("text"))
    )
    rows = {r["id"]: r for r in out.collect()}
    assert (rows[1]["n_email"], rows[1]["n_url"]) == (1, 1)
    assert (rows[2]["n_phone"], rows[2]["n_ipv4"]) == (2, 1)
    assert rows[3]["n_email"] == rows[3]["n_url"] == rows[3]["n_phone"] == rows[3]["n_ipv4"] == 0
    assert rows[1]["redacted"] == "contact [EMAIL] or visit [URL] now"
    assert rows[2]["redacted"] == "call [PHONE] from [IPV4] twice [PHONE]"
    assert rows[3]["redacted"] == rows[3]["text"]


def test_repetition_metrics_known_values(spark):
    from aspep_etl_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "a a a b"),            # run of 3, 3 bigrams: "a a" x2
            (2, "x y x y"),            # alternating, no run
        ],
        ["id", "text"],
    )
    m = repetition_metrics(F.col("text"))
    out = (
        df.withColumn("__toks", m["__toks"])
        .withColumn("__bi", m["__bi"])
        .select(
            "id",
            m["distinct_token_ratio"].alias("dtr"),
            m["top_bigram_fraction"].alias("tbf"),
            m["max_token_run"].alias("run"),
        )
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["run"] == 3
    assert rows[1]["dtr"] == 0.5          # {a, b} / 4
    assert rows[1]["tbf"] == pytest.approx(2 / 3, abs=1e-4)  # "a a" twice of 3
    assert rows[2]["run"] == 1
    assert rows[2]["tbf"] == pytest.approx(2 / 3, abs=1e-4)  # "x y" twice of 3


def test_quantize_roundtrip_error_bound(spark):
    """Max reconstruction error of int8 min/max quantization is bounded by
    scale/2; constant vectors are lossless."""
    from aspep_etl_spark.operators.quantize import with_quantize_stats

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.5, 0.25]), (2, [3.0, 3.0, 3.0])],
        ["id", "embedding"],
    )
    rows = {r["id"]: r for r in with_quantize_stats(df).collect()}
    assert rows[1]["q_max_err"] <= rows[1]["q_scale"] / 2 + 1e-12
    assert rows[2]["q_scale"] == 1.0 and rows[2]["q_max_err"] == 0.0


def test_redaction_case_insensitive(spark):
    from aspep_etl_spark.operators.text import redact_pii

    df = spark.createDataFrame([(1, "mail Bob@Example.COM or HTTPS://X.IO")], ["id", "text"])
    got = df.select(redact_pii(F.col("text")).alias("r")).first()["r"]
    assert got == "mail [EMAIL] or [URL]"


def test_power_iteration_matches_numpy_eigenvector(spark):
    """The pinned (rounded, fixed-iteration) contract must recover the
    TRUE top eigenvector when the data has one — reproducibility is
    worthless if the answer drifts from the math.  The driver corpus is
    near-isotropic (lambda2/lambda1 = 0.987, where NO iterative method
    separates the top direction quickly), so this test plants a dominant
    direction and checks recovery; the contract query on the real corpus
    is covered by the hash-exact oracle instead."""
    import numpy as np

    from aspep_etl_spark.operators.eigen import top_eigenvector

    rng = np.random.default_rng(7)
    u = rng.normal(size=32)
    u /= np.linalg.norm(u)
    x = rng.normal(size=(400, 32)) + 4.0 * rng.normal(size=(400, 1)) * u

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    )
    got = top_eigenvector(df, "embedding", iters=4, round_dp=6).collect()
    v = np.array([r["loading"] for r in sorted(got, key=lambda r: r["pos"])])

    c = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(c.T @ c)
    true_top = evecs[:, -1]

    assert abs(float(np.dot(v, true_top))) > 0.999
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit norm
