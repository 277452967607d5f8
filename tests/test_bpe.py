"""BPE merge learning / encoding vs a pure-Python reference twin
(Sennrich-style: freq-weighted adjacent-pair counts, greedy
left-to-right non-overlapping merges, lexicographic tie-break)."""

from __future__ import annotations

from collections import Counter

import pytest

from aspep_etl_spark.operators.bpe import (
    END_MARK,
    apply_bpe_merges,
    bpe_learn_merges,
    initial_segmentation,
    word_frequencies,
)


def _py_merge(seg: list[str], left: str, right: str) -> list[str]:
    out = [seg[0]]
    for x in seg[1:]:
        if out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_bpe(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        import re

        words.update(re.findall("[a-z0-9]+", t.lower()))
    seg = {w: list(w) + [END_MARK] for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, f in words.items():
            s = seg[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, ties toward lexicographically smallest (left, right)
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        seg = {w: _py_merge(s, l, r) for w, s in seg.items()}
    return merges, seg


CORPORA = [
    ["low low low low low lower lower newest newest newest newest newest newest widest widest widest"],
    ["aaaa aaa aa a", "aaaa aaaa baba abab"],  # overlap + tie stress
    ["x y z", "x y", "x"],  # tiny, ties everywhere
]


@pytest.mark.parametrize("texts", CORPORA)
def test_learned_merges_match_python_twin(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_learn_merges(df, "text", n_merges=5).orderBy("merge_rank").collect()
    ]
    want, _ = _py_bpe(texts, 5)
    assert got == want


@pytest.mark.parametrize("texts", CORPORA)
def test_apply_merges_matches_python_segmentation(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges, seg = _py_bpe(texts, 5)
    rules = [(l, r) for _, l, r, _ in merges]
    from pyspark.sql import functions as F

    vocab = initial_segmentation(word_frequencies(df, "text"))
    enc = vocab.withColumn("seg", apply_bpe_merges(F.col("seg"), rules))
    got = {r["word"]: list(r["seg"]) for r in enc.collect()}
    assert got == seg


def test_single_char_word_survives_encoding(spark):
    """len-1 words (char + marker, possibly fully merged) must not break
    the fold's slice arithmetic."""
    df = spark.createDataFrame([(0, "a a a b")], "doc_id long, text string")
    merges = bpe_learn_merges(df, "text", n_merges=3).collect()
    assert merges[0]["left"] == "a" and merges[0]["right"] == END_MARK
