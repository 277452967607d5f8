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


def test_duckdb_xxh64_prelude_vs_twin():
    """The XXH64-in-SQL macro prelude (plans/xxh64_sql.py) that powers the
    dedup_minhash_lsh / dedup_simhash DuckDB oracles must agree with the
    pure-Python twin on every byte-length class (empty, <32 tail-only,
    exactly 32, multi-stripe), unicode, and both scalar fold paths."""
    import random

    import duckdb

    from aspep_etl_spark.plans.xxh64_sql import M64, P1, P5, PRELUDE

    from .xxh64_twin import xxh64_bytes, xxh64_int, xxh64_long

    con = duckdb.connect()
    con.sql(PRELUDE + "SELECT 1")
    rng = random.Random(11)

    for n in [0, 1, 3, 4, 7, 8, 15, 16, 31, 32, 33, 63, 64, 100, 129]:
        s = "".join(rng.choice("abcdef ü€中") for _ in range(n))
        got = con.sql(
            "SELECT xx_bytes(sb, 42::HUGEINT) FROM (SELECT xx_strbytes($s) AS sb)",
            params={"s": s},
        ).fetchone()[0]
        assert int(got) == xxh64_bytes(s.encode("utf-8"), 42), (n, s)

    for _ in range(20):
        v, seed = rng.randrange(64), rng.randrange(1 << 64)
        got = con.sql(f"SELECT xx_int({v}::HUGEINT, {seed}::HUGEINT)").fetchone()[0]
        assert int(got) == xxh64_int(v, seed)
        lv = rng.randrange(-(1 << 63), 1 << 63)
        got = con.sql(
            f"SELECT xx_long(xx_u64({lv}::HUGEINT), {seed}::HUGEINT)"
        ).fetchone()[0]
        assert int(got) == xxh64_long(lv, seed)
        # fused permutation chain == hashInt(i, base)
        base = rng.randrange(1 << 64)
        got = con.sql(
            f"SELECT xx_perm(xor({(base + P5 + 4) % M64}::HUGEINT,"
            f" {v * P1 % M64}::HUGEINT))"
        ).fetchone()[0]
        assert int(got) == xxh64_int(v, base)


def test_duckdb_halfword_perm_pipeline_vs_twin():
    """The staged UBIGINT half-word CTE pipeline that minhash_lsh_oracle
    actually runs (perm_pipeline_ctes — NOT the legacy HUGEINT xx_perm
    macro) must reproduce xxh64_int(i, base) for random bases across all
    permutation indices."""
    import random

    import duckdb

    from aspep_etl_spark.plans.xxh64_sql import M64, P5, perm_pipeline_ctes

    from .xxh64_twin import xxh64_int

    con = duckdb.connect()
    rng = random.Random(17)
    bases = [rng.randrange(1 << 64) for _ in range(40)] + [0, (1 << 64) - 1]
    ctes, n_stage = perm_pipeline_ctes(num_perm=16, src="dbase", key="rid")
    rows = ", ".join(
        f"({i}, {(b + P5 + 4) % M64}::HUGEINT)" for i, b in enumerate(bases)
    )
    cols = ", ".join(f"c_{i}" for i in range(16))
    sql = (
        f"WITH dbase AS (SELECT * FROM (VALUES {rows}) AS t(rid, bp)),\n"
        f"{ctes}\nSELECT rid, {cols} FROM p{n_stage} ORDER BY rid"
    )
    out = con.sql(sql).fetchall()
    for row in out:
        base = bases[row[0]]
        for i in range(16):
            exp = xxh64_int(i, base)
            exp = exp - (1 << 64) if exp >= (1 << 63) else exp
            assert int(row[1 + i]) == exp, (row[0], i)
