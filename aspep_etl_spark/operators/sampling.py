"""[EXT] Deterministic sampling and dataset splitting (SURVEY.md §2.11).

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across runs and engines, (b) stable under repartitioning,
and (c) assignable per-row with no global state.  ``df.sample()`` fails
all three (it seeds per-partition), so these operators derive the
selection from a cryptographic hash of the row key instead: the first 8
hex chars of ``md5(key)`` read as a uniform fraction in [0, 1).

Everything is a map-only JVM expression — no shuffle, no Python; the same
construction is expressible verbatim in any engine with ``md5`` (the
DuckDB oracles for `sample_stratified` / `docs_split` prove bit-equality).
Scale: hashing is embarrassingly parallel; a 100 TB sample never moves
data that isn't selected (the filter pushes to the scan's output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16**8  # 8 hex chars → 32-bit uniform


def _hash_hex(key_cols: list[Column], salt: str) -> Column:
    """First 8 hex chars of md5 over the salted, '|'-joined key — compare
    as STRINGS against a precomputed hex threshold so no engine-specific
    hex-to-int conversion is needed."""
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), *key_cols)), 1, 8)


def _hex_threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    n = int(rate * _HEX_SPAN)
    if n >= _HEX_SPAN:
        # rate 1.0 must include EVERY hash; format(16**8) is 9 chars and
        # would string-compare BELOW 'f…' hashes — 'g' sorts above every
        # hex digit instead
        return "g"
    return format(n, "08x")


def hash_sample(
    df: DataFrame,
    key_cols: list[str],
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, selected by row-key
    hash.  With ``key_cols`` including a stratum column, rates hold
    per-stratum (each stratum's keyspace hashes independently thanks to
    the joined key)."""
    return df.filter(
        _hash_hex([F.col(c).cast("string") for c in key_cols], salt)
        < F.lit(_hex_threshold(rate))
    )


def split_column(
    key_cols: list[str],
    splits: dict[str, float],
    salt: str = "split",
) -> Column:
    """A column assigning each row to one named split (e.g. train/val/
    test) by hash fraction.  ``splits`` maps name → weight; weights are
    normalized and laid out on [0, 1) in the given order, so every row
    lands in exactly one split, forever, on any engine."""
    total = sum(splits.values())
    h = _hash_hex([F.col(c).cast("string") for c in key_cols], salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name] / total
        cond = h < F.lit(_hex_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)
