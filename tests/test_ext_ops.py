"""[EXT] operator unit tests: dedup family, similarity, text analysis,
multimodal plumbing — small handcrafted inputs with known answers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aspep_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash,
)
from aspep_etl_spark.operators.multimodal import documents_as_media, extract_media_features
from aspep_etl_spark.operators.similarity import brute_force_topk
from aspep_etl_spark.operators.text import analyze_documents


def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 44),
        (2, "the quick brown fox jumps over the lazy cat", "en", "s", 44),  # near-dup of 1
        (3, "completely different content here about spark engines", "en", "s", 52),
        (4, "the quick brown fox jumps over the lazy dog", "en", "s", 44),  # exact dup of 1
        (5, "el perro y el gato y la casa", "es", "s", 28),
        (6, "xy", "und", "s", 2),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_exact_dedup(spark):
    out = exact_dedup(docs(spark), ["text"], "doc_id").collect()
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id[1] == 2          # survivor is min(doc_id) of {1,4}
    assert 4 not in by_id
    assert by_id[2] == 1


def test_shingles_short_doc_empty(spark):
    sh = shingles(docs(spark), "doc_id", "text", 3)
    assert sh.filter(F.col("doc_id") == 6).count() == 0
    assert sh.filter(F.col("doc_id") == 1).count() == 7  # 9 words → 7 trigrams

def test_jaccard_pairs_finds_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             jaccard_pairs(docs(spark), "doc_id", "text", 3, threshold=0.4).collect()}
    assert pairs[(1, 4)] == 1.0          # exact dup
    assert 0.4 <= pairs[(1, 2)] < 1.0    # near-dup (last word differs)
    assert (1, 3) not in pairs


def test_minhash_lsh_catches_exact_and_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
             minhash_lsh_pairs(docs(spark), "doc_id", "text", 3, 64, 16, 0.4).collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs  # high estimated jaccard via shared bands


def test_simhash_identical_texts_equal_hash(spark):
    out = {r["doc_id"]: r["simhash64"] for r in simhash(docs(spark), "doc_id", "text").collect()}
    assert out[1] == out[4]
    # near-dup should be close in hamming distance
    ham = bin((out[1] ^ out[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 16
    ham_far = bin((out[1] ^ out[3]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham_far > ham


def test_brute_force_topk_self_excluded_and_ordered(spark):
    rows = [(i, [float(i == j) for j in range(4)], 0) for i in range(4)]
    rows.append((10, [1.0, 0.1, 0.0, 0.0], 0))  # closest to vec 0
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=2)
    got = [(r["neighbor_id"], r["knn_rank"]) for r in out.collect()]
    assert got[0][0] == 10 and got[0][1] == 1
    assert all(n != 0 for n, _ in got)


def test_analyze_documents_metrics(spark):
    out = {r["doc_id"]: r for r in analyze_documents(docs(spark)).collect()}
    d1 = out[1]
    assert d1["n_tokens"] == 9
    assert d1["pred_lang"] == "en"    # two "the"
    assert out[5]["pred_lang"] == "es"
    assert out[3]["pred_lang"] == "und"  # no marker words
    assert out[1]["fingerprint"] == out[4]["fingerprint"]
    assert d1["punct_ratio"] == 0.0
    assert math.isclose(d1["mean_token_len"], round(35 / 9, 4), rel_tol=1e-6)


def test_chunk_documents_windows_and_overlap(spark):
    from aspep_etl_spark.operators.text import chunk_documents

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens → chunks of 4, stride 2
        (2, "single"),
        (3, ""),  # empty → no chunks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=4, overlap=2)
    chunks = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    assert chunks[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert chunks[(1, 1)] == ("w2 w3 w4 w5", 4)  # 2-token overlap
    assert chunks[(1, 4)] == ("w8 w9", 2)  # final partial kept
    assert chunks[(2, 0)] == ("single", 1)
    assert all(d != 3 for d, _ in chunks)
    # every token of doc 1 appears in at least one chunk
    covered = set()
    for (d, _), (text, _) in chunks.items():
        if d == 1:
            covered.update(text.split())
    assert covered == {f"w{i}" for i in range(10)}


def test_multimodal_real_decode(spark):
    """End-to-end: synthesized real container bytes → real header decode.

    Expected values derive from documents_as_media's deterministic mapping
    (doc_id % 3 → png / wav / mp4 with id- and length-derived params).
    """
    feats = extract_media_features(documents_as_media(docs(spark))).collect()
    by_id = {r["asset_id"]: r for r in feats}
    assert len(by_id) == 6

    # doc 3: PNG image, width = 16 + 3, height = 16 + len(text=53 chars) % 48
    r3 = by_id[3]
    assert (r3["modality"], r3["format"]) == ("image", "png")
    assert (r3["width"], r3["height"]) == (19, 21)
    assert r3["duration_ms"] is None

    # doc 1: WAV audio, duration = 250 + (1*37) % 4000
    r1 = by_id[1]
    assert (r1["modality"], r1["format"]) == ("audio", "wav")
    assert r1["duration_ms"] == 287
    assert r1["sample_rate"] == 8000 and r1["channels"] == 1
    assert r1["width"] is None

    # doc 4: WAV, duration = 250 + 148 — distinct bytes from doc 1
    assert by_id[4]["duration_ms"] == 398
    assert by_id[4]["content_hash"] != r1["content_hash"]

    # doc 2: MP4 video, duration = 500 + (2*53) % 8000,
    # width = 160 + (2%32)*8, height = 120 + (len(text=43 chars)%24)*8
    r2 = by_id[2]
    assert (r2["modality"], r2["format"]) == ("video", "mp4")
    assert r2["duration_ms"] == 606
    assert (r2["width"], r2["height"]) == (176, 272)

    # every payload decoded — no format fell through to "unknown"
    assert all(r["format"] != "unknown" for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)


def test_binaryfile_media_ingest_end_to_end(spark, tmp_path):
    """The real media-lake ingest path: synthesized container files on
    disk → spark.read.format("binaryFile") → files_as_media →
    extract_media_features, with modality resolved from magic bytes (a
    deliberately WRONG file extension must not matter)."""
    from aspep_etl_spark.functions.media import make_mp4, make_png, make_wav
    from aspep_etl_spark.operators.multimodal import extract_media_features, files_as_media

    (tmp_path / "a.png").write_bytes(make_png(31, 17))
    (tmp_path / "b.wav").write_bytes(make_wav(1234))
    (tmp_path / "c.mp4").write_bytes(make_mp4(5678, 640, 480))
    (tmp_path / "mislabeled.png").write_bytes(make_wav(99))  # wav bytes, png name
    (tmp_path / "garbage.bin").write_bytes(b"\x00\x01\x02 not a container")

    bin_df = spark.read.format("binaryFile").load(str(tmp_path))
    feats = extract_media_features(files_as_media(bin_df))
    by_fmt = {}
    for r in feats.collect():
        by_fmt.setdefault(r["format"], []).append(r)

    (png,) = by_fmt["png"]
    assert (png["width"], png["height"]) == (31, 17) and png["modality"] == "image"
    wavs = sorted(by_fmt["wav"], key=lambda r: r["duration_ms"])
    assert [w["duration_ms"] for w in wavs] == [99, 1234]
    assert all(w["modality"] == "audio" for w in wavs)  # magic bytes win
    (mp4,) = by_fmt["mp4"]
    assert (mp4["width"], mp4["height"], mp4["duration_ms"]) == (640, 480, 5678)
    (unk,) = by_fmt["unknown"]
    assert unk["width"] is None and unk["n_bytes"] > 0
