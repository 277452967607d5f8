"""[EXT] Bloom-filter membership pruning as a first-class dataflow op.

Spark's own runtime row-level filtering injects a BloomFilterAggregate /
BloomFilterMightContain pair around shuffle joins; those expressions are
internal, so this module builds the same structure from public surface:

- ``bloom_build``: the filter is a tiny relation of (word_idx, bits) —
  m bits packed 32-per-BIGINT (m=16384 -> 512 rows).  Built with ONE
  aggregation (groupBy word_idx + bit_or of the shifted bit), i.e. the
  same partial+final pattern as any algebraic agg; never collected to
  the driver.
- ``bloom_probe``: probe keys fan out to k bit positions map-side and
  broadcast-join the filter relation on word_idx.  A key passes iff all
  k probed bits are set.  The join is broadcast by construction (the
  filter is m/32 rows regardless of data scale), so at 100 TB the probe
  is a scan-riding map-side filter — exactly the plan shape Spark's
  internal bloom pruning produces, but visible, testable and
  cross-engine reproducible.

Bits are packed 32-per-word (not 64) so every shifted value stays in
the positive BIGINT range — no sign-bit semantics to reconcile between
Spark's ``shiftleft``/``shiftright`` and DuckDB's ``<<``/``>>``.

Hashing: k independent 32-bit positions from md5 over a seed-prefixed
key (seed i -> ``md5(concat(i, '|', key))``), the same md5-prefix trick
the deterministic samplers use — both engines parse the 8-hex prefix to
the identical integer.

False positives are a property of the structure, not a bug: with m bits,
k hashes and n inserted keys, FPR ~ (1 - e^{-kn/m})^k.  ``bloom_probe``
therefore reports per-key verdicts so callers can (as the contract query
does) join back the exact membership and account for false positives
explicitly.  False NEGATIVES are impossible — pinned by test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 32


def _position(key: Column, seed: Column, m_bits: int) -> Column:
    """Deterministic bit position in [0, m_bits) for one hash seed.

    ``seed`` is a COLUMN (from an exploded seed sequence), not unrolled
    into an inline array: ``explode(array(md5..., md5..., md5...))``
    re-evaluates the whole array child once per EMITTED element (the
    explode-fence pathology, PERF.md; measured ~4x redundant hashing at
    k=4), while explode-the-cheap-sequence-then-hash evaluates each md5
    exactly once per generated row with no fence needed."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(seed.cast("string"), F.lit("|"), key)), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h32 % F.lit(m_bits)


def _seeds(k: int) -> Column:
    """Exploded seed column 1..k — a literal-sequence generator child,
    which is the cheap-child explode case (no re-evaluation concern)."""
    return F.explode(F.sequence(F.lit(1), F.lit(k)))


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 16384, k: int = 3
) -> DataFrame:
    """Aggregate a key relation into a packed bitset: (word_idx, bits).

    One shuffle on word_idx (at most m_bits/32 groups); the result is a
    broadcast-sized relation whatever the input cardinality.
    """
    pos = (
        keys.select(F.col(key_col).alias("__k"), _seeds(k).alias("__s"))
        .select(_position(F.col("__k"), F.col("__s"), m_bits).alias("pos"))
        .select(
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            (F.col("pos") % BITS_PER_WORD).cast("int").alias("bit"),
        )
    )
    # pyspark's shiftleft() only takes a literal shift amount — the
    # column-shift form goes through the SQL expression.
    return pos.groupBy("word_idx").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits")
    )


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Append ``bloom_pass`` (boolean) per probe row.

    Fans each probe key to its k (word_idx, bit) coordinates, broadcast-
    joins the filter, and requires all k bits set.  The fan-out collapses
    back with a groupBy on the probe's original columns, so input ROWS
    must be distinct (duplicate rows would collapse to one) — the natural
    shape for the semi-join use, where probes are (id, key) pairs.
    """
    cols = probes.columns
    fan = (
        probes.select(*cols, _seeds(k).alias("__s"))
        .select(
            *cols, _position(F.col(key_col), F.col("__s"), m_bits).alias("pos")
        )
        .select(
            *cols,
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            (F.col("pos") % BITS_PER_WORD).cast("int").alias("bit"),
        )
    )
    joined = fan.join(F.broadcast(bloom), "word_idx", "left")
    hit = (
        F.expr("shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit)") % 2 == 1
    )
    return (
        joined.withColumn("__hit", hit.cast("int"))
        .groupBy(*cols)
        .agg((F.sum("__hit") == F.lit(k)).alias("bloom_pass"))
    )
