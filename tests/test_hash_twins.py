"""Exact-value checks for the hash-seeded near-dup estimators.

DuckDB has no xxhash64, so `dedup_minhash_lsh` / `dedup_simhash` cannot be
SQL-oracled — instead this file recomputes signatures, band buckets, and
bit votes with the independent pure-Python XXH64 twin (tests/xxh64_twin.py,
itself pinned against Spark's `xxhash64` on known values) and asserts
EXACT equality on real testdata documents, upgrading both operators from
rows-only to value-checked."""

from __future__ import annotations

import itertools
import re

import pytest

from aspep_etl_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures, simhash

from .xxh64_twin import spark_xxhash64, xxh64_long

NUM_PERM = 64
BANDS = 16
N_DOCS = 40  # pure-Python hashing is slow; 40 real docs is plenty of surface


def _py_shingles(text: str, n: int = 3) -> list[str]:
    words = re.findall(r"[a-z0-9]+", text.lower())
    seen: dict[str, None] = {}
    for i in range(len(words) - n + 1):
        seen.setdefault(" ".join(words[i : i + n]), None)
    return list(seen)


def _py_signature(text: str) -> list[int] | None:
    sh = _py_shingles(text)
    if not sh:
        return None
    return [min(spark_xxhash64(s, i) for s in sh) for i in range(NUM_PERM)]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sub = df.filter(f"doc_id < {N_DOCS}").select("doc_id", "text")
    return sub, {r["doc_id"]: r["text"] for r in sub.collect()}


def test_minhash_signatures_exact_vs_twin(docs):
    sub, texts = docs
    got = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(NUM_PERM)]
        for r in minhash_signatures(sub, "doc_id", "text", 3, NUM_PERM).collect()
    }
    exp = {d: sig for d, t in texts.items() if (sig := _py_signature(t)) is not None}
    assert got == exp


def test_minhash_lsh_pairs_exact_vs_twin(docs):
    sub, texts = docs
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            sub, "doc_id", "text", 3, NUM_PERM, BANDS, threshold=0.0
        ).collect()
    }

    sigs = {d: sig for d, t in texts.items() if (sig := _py_signature(t)) is not None}
    rows_per_band = NUM_PERM // BANDS

    def band_hashes(sig: list[int]) -> list[int]:
        out = []
        for b in range(BANDS):
            h = 42
            for v in sig[b * rows_per_band : (b + 1) * rows_per_band]:
                h = xxh64_long(v, h)
            out.append(h)
        return out

    bands = {d: band_hashes(s) for d, s in sigs.items()}
    exp = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        if any(x == y for x, y in zip(bands[a], bands[b])):  # LSH candidate
            agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            exp[(a, b)] = round(agree / NUM_PERM, 4)
    assert got == exp


def test_simhash_exact_vs_twin(docs):
    sub, texts = docs
    got = {r["doc_id"]: r["simhash64"] for r in simhash(sub, "doc_id", "text").collect()}

    exp = {}
    for d, t in texts.items():
        toks = re.findall(r"[a-z0-9]+", t.lower())  # all tokens, dup-weighted
        hashes = [spark_xxhash64(tok) for tok in toks]
        bits = 0
        for b in range(64):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hashes)
            if vote > 0:
                bits |= 1 << b
        exp[d] = bits - (1 << 64) if bits >= (1 << 63) else bits
    assert got == exp
