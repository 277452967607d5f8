"""[EXT] Hashed linear text classifier (fasttext-style) applied at scale.

The reference pipeline has no model-scoring operator; every serious
LLM-data pipeline does (quality classifiers gate most of the corpus).
This implements the *inference* side of a linear bag-of-features model
the way fasttext does it — features are word unigrams + adjacent-word
bigrams, hashed into a fixed-dimension bucket space, scored by a weight
lookup and a sigmoid — entirely with built-in array expressions:

- ZERO shuffles and ZERO Python: tokens, bigrams, buckets, weights and
  the ordered left-fold sum are all map-side Catalyst expressions, so
  scoring rides the corpus scan (at 100 TB the classifier pass is
  scan-bound, exactly like production quality-filter sweeps).
- The bucket hash is the first 8 hex chars of md5 (32-bit), which both
  Spark (`conv(_, 16, 10)`) and DuckDB (`CAST('0x' || _ AS BIGINT)`)
  parse identically — what makes the score hash-exact cross-engine.
- Weights come from a deterministic bucket->weight formula rather than
  a trained literal table, so the contract query needs no external
  artifact; swapping in real trained weights is a one-line change
  (replace `bucket_weight` with an `element_at(lit(weights), bucket)`
  lookup — a D-element double literal shipped in the task binary is
  fine up to ~10^6 buckets, same bound documented for the IVF
  centroid literal in operators/similarity.py).

The ordered left fold (`F.aggregate`) matters: a pairwise/tree sum
would be engine-dependent in IEEE result; the fold makes the
double-precision sum bit-identical to the DuckDB oracle's
`list_reduce` over the same feature order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WORD_RE


def hashed_bucket(feature: Column, dim: int) -> Column:
    """32-bit md5-prefix hash of a feature string, reduced mod `dim`."""
    h32 = F.conv(F.substring(F.md5(feature), 1, 8), 16, 10).cast("long")
    return h32 % F.lit(dim)


def bucket_weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight in [-1, 1]: (b % 2001)/1000 - 1."""
    return (bucket % 2001) / F.lit(1000.0) - F.lit(1.0)


def score_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    round_dp: int = 6,
    keep: tuple = (),
) -> DataFrame:
    """Linear-classifier quality score per document.

    Returns (id, *keep, n_features, score, prob): score is the mean
    hashed feature weight (ordered left-fold sum / count), prob its
    sigmoid.  ``keep`` names extra input columns to carry through (e.g.
    a label for downstream eval — keeping eval metrics on the SAME scan
    instead of a self-join back to the corpus).  Documents with zero
    word tokens are dropped (no features to score).  One map-only
    projection — the physical plan has no Exchange.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    bigrams = F.when(
        F.size(F.col("__toks")) >= 2,
        F.expr(
            "transform(sequence(0, size(__toks) - 2), "
            "i -> concat(__toks[i], ' ', __toks[i + 1]))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    weights = F.transform(
        F.concat(F.col("__toks"), F.col("__bi")),
        lambda t: bucket_weight(hashed_bucket(t, dim)),
    )
    fold = F.aggregate(F.col("__w"), F.lit(0.0), lambda acc, w: acc + w)
    return (
        docs.withColumn("__toks", toks)
        .filter(F.size("__toks") >= 1)
        .withColumn("__bi", bigrams)
        .withColumn("__w", weights)
        .withColumn("n_features", F.size("__w").cast("long"))
        .withColumn("score", F.round(fold / F.col("n_features"), round_dp))
        .withColumn(
            "prob",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), round_dp),
        )
        .select(id_col, *keep, "n_features", "score", "prob")
    )
