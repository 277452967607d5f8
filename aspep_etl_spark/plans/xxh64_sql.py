"""DuckDB-SQL twin of Spark's ``xxhash64`` expression — promotes the
MinHash+LSH and SimHash queries from rows-only to full oracle checks.

DuckDB has no xxhash64 function, so the oracle implements the standard
XXH64 byte algorithm (the same one Spark's ``XxHash64`` expression runs
JVM-side; reference semantics pinned by ``tests/xxh64_twin.py`` +
``tests/test_hash_twins.py``) as a prelude of scalar macros executed in
the same multi-statement SQL string as the final SELECT:

- 64-bit wraparound arithmetic runs in HUGEINT with explicit mod-2^64
  reduction; multiplication splits into 32-bit halves so no intermediate
  exceeds 2^98 (signed-128 safe).
- Rotation is expressed as ``(x % 2^(64-r)) * 2^r + x // 2^(64-r)`` —
  the two fields are disjoint, so OR becomes +, and no bitwise ops
  beyond the built-in ``xor`` are needed.
- DuckDB macros inline textually at bind time, so a parameter referenced
  twice would DUPLICATE (and re-evaluate) its whole argument tree; every
  macro that reads a parameter more than once first binds it with the
  singleton ``list_transform([expr], v -> ...)[1]`` trick, which
  materializes the value once per row.
- Loops (the 32-byte stripe accumulator, tail words, trailing bytes)
  are ``list_reduce`` left-folds seeded by ``list_prepend``-ing the
  initial accumulator.

The per-seed/per-band fan-outs (64 MinHash permutations, 16 LSH bands,
64 SimHash bit votes) are unrolled Python-side into plain vectorized
column expressions — no per-row interpretation, and string hashing runs
once per DISTINCT shingle/token rather than per occurrence.
"""

from __future__ import annotations

# XXH64 primes and derived literals (public constants of the algorithm).
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 1 << 64
_H = "::HUGEINT"


def _lit(v: int) -> str:
    return f"{v}::HUGEINT"


PRELUDE = f"""
CREATE OR REPLACE MACRO xx_m64(x) AS x % {_lit(M64)};
CREATE OR REPLACE MACRO xx_u64(x) AS ((x{_H} % {_lit(M64)}) + {_lit(M64)}) % {_lit(M64)};
CREATE OR REPLACE MACRO xx_mul64(ma, mb) AS list_transform([ma{_H}], xa ->
  list_transform([mb{_H}], xb ->
    xx_m64((xa % {_lit(1 << 32)}) * (xb % {_lit(1 << 32)})
      + (((xa % {_lit(1 << 32)}) * (xb // {_lit(1 << 32)})
          + (xa // {_lit(1 << 32)}) * (xb % {_lit(1 << 32)})) % {_lit(1 << 32)})
        * {_lit(1 << 32)}))[1])[1];
CREATE OR REPLACE MACRO xx_add64(aa, ab) AS xx_m64(aa + ab);
CREATE OR REPLACE MACRO xx_rotl(rx, rr) AS list_transform([rx{_H}], xv ->
  xx_m64((xv % (1{_H} << (64 - rr))) * (1{_H} << rr) + xv // (1{_H} << (64 - rr))))[1];
CREATE OR REPLACE MACRO xx_fmix(fh) AS list_transform([fh{_H}], g0 ->
  list_transform([xor(g0, g0 // {_lit(1 << 33)})], g1 ->
  list_transform([xx_mul64(g1, {_lit(P2)})], g2 ->
  list_transform([xor(g2, g2 // {_lit(1 << 29)})], g3 ->
  list_transform([xx_mul64(g3, {_lit(P3)})], g4 ->
    xor(g4, g4 // {_lit(1 << 32)}))[1])[1])[1])[1])[1];
CREATE OR REPLACE MACRO xx_rnd(racc, rk) AS
  xx_mul64(xx_rotl(xx_add64(racc, xx_mul64(rk, {_lit(P2)})), 31), {_lit(P1)});
CREATE OR REPLACE MACRO xx_rnd0(zk) AS
  xx_mul64(xx_rotl(xx_mul64(zk, {_lit(P2)}), 31), {_lit(P1)});
CREATE OR REPLACE MACRO xx_mrg(mh, mv) AS
  xx_add64(xx_mul64(xor(mh, xx_rnd0(mv)), {_lit(P1)}), {_lit(P4)});
CREATE OR REPLACE MACRO xx_t8(th, tk) AS
  xx_add64(xx_mul64(xx_rotl(xor(th, xx_rnd0(tk)), 27), {_lit(P1)}), {_lit(P4)});
CREATE OR REPLACE MACRO xx_t4(fh, fw) AS
  xx_add64(xx_mul64(xx_rotl(xor(fh, xx_mul64(fw, {_lit(P1)})), 23), {_lit(P2)}), {_lit(P3)});
CREATE OR REPLACE MACRO xx_t1(oh, ob) AS
  xx_mul64(xx_rotl(xor(oh, xx_mul64(ob, {_lit(P5)})), 11), {_lit(P1)});
CREATE OR REPLACE MACRO xx_sgn(sv) AS list_transform([sv], sx ->
  CASE WHEN sx >= {_lit(1 << 63)} THEN sx - {_lit(M64)} ELSE sx END)[1];
CREATE OR REPLACE MACRO xx_w8(wb, wo) AS
    wb[(wo + 1)::BIGINT]       + wb[(wo + 2)::BIGINT] * {_lit(1 << 8)}
  + wb[(wo + 3)::BIGINT] * {_lit(1 << 16)} + wb[(wo + 4)::BIGINT] * {_lit(1 << 24)}
  + wb[(wo + 5)::BIGINT] * {_lit(1 << 32)} + wb[(wo + 6)::BIGINT] * {_lit(1 << 40)}
  + wb[(wo + 7)::BIGINT] * {_lit(1 << 48)} + wb[(wo + 8)::BIGINT] * {_lit(1 << 56)};
CREATE OR REPLACE MACRO xx_w4(vb, vo) AS
    vb[(vo + 1)::BIGINT]       + vb[(vo + 2)::BIGINT] * {_lit(1 << 8)}
  + vb[(vo + 3)::BIGINT] * {_lit(1 << 16)} + vb[(vo + 4)::BIGINT] * {_lit(1 << 24)};
CREATE OR REPLACE MACRO xx_strbytes(ss) AS list_transform([hex(encode(ss))], hx ->
  list_transform(range((length(hx) // 2)::BIGINT), bi ->
    (16 * (strpos('0123456789ABCDEF', substr(hx, (2 * bi + 1)::INTEGER, 1)) - 1)
       + (strpos('0123456789ABCDEF', substr(hx, (2 * bi + 2)::INTEGER, 1)) - 1)){_H}))[1];
CREATE OR REPLACE MACRO xx_int(iv, iseed) AS list_transform(
  [xor(xx_add64(iseed, {_lit((P5 + 4) % M64)}), xx_mul64(iv % {_lit(1 << 32)}, {_lit(P1)}))], ih ->
    xx_fmix(xx_add64(xx_mul64(xx_rotl(ih, 23), {_lit(P2)}), {_lit(P3)})))[1];
CREATE OR REPLACE MACRO xx_long(lv, lseed) AS list_transform(
  [xor(xx_add64(lseed, {_lit((P5 + 8) % M64)}),
       xx_mul64(xx_rotl(xx_mul64(xx_u64(lv), {_lit(P2)}), 31), {_lit(P1)}))], lh ->
    xx_fmix(xx_add64(xx_mul64(xx_rotl(lh, 27), {_lit(P1)}), {_lit(P4)})))[1];
CREATE OR REPLACE MACRO xx_mulc(ca, clo, chi) AS list_transform([ca{_H}], xa ->
  xx_m64((xa % {_lit(1 << 32)}) * clo
    + (((xa % {_lit(1 << 32)}) * chi + (xa // {_lit(1 << 32)}) * clo) % {_lit(1 << 32)})
      * {_lit(1 << 32)}))[1];
CREATE OR REPLACE MACRO xx_perm(px) AS list_transform([px{_H}], x0 ->
  list_transform([xx_m64((x0 % {_lit(1 << 41)}) * {_lit(1 << 23)} + x0 // {_lit(1 << 41)})], r0 ->
  list_transform([xx_m64(xx_mulc(r0, {_lit(P2 % (1 << 32))}, {_lit(P2 >> 32)}) + {_lit(P3)})], g0 ->
  list_transform([xor(g0, g0 // {_lit(1 << 33)})], g1 ->
  list_transform([xx_mulc(g1, {_lit(P2 % (1 << 32))}, {_lit(P2 >> 32)})], g2 ->
  list_transform([xor(g2, g2 // {_lit(1 << 29)})], g3 ->
  list_transform([xx_mulc(g3, {_lit(P3 % (1 << 32))}, {_lit(P3 >> 32)})], g4 ->
    xor(g4, g4 // {_lit(1 << 32)}))[1])[1])[1])[1])[1])[1])[1];
CREATE OR REPLACE MACRO xx_bytes(bs, bseed) AS list_transform([len(bs){_H}], xn ->
  list_transform([CASE WHEN xn >= 32 THEN
      list_reduce(
        list_prepend(
          [xx_add64(xx_add64(bseed, {_lit(P1)}), {_lit(P2)}),
           xx_add64(bseed, {_lit(P2)}),
           xx_u64(bseed),
           xx_u64(bseed{_H} - {_lit(P1)} + {_lit(M64)})],
          list_transform(range((xn // 32)::BIGINT), si ->
            [xx_w8(bs, 32 * si), xx_w8(bs, 32 * si + 8),
             xx_w8(bs, 32 * si + 16), xx_w8(bs, 32 * si + 24)])),
        (ac, st) -> [xx_rnd(ac[1], st[1]), xx_rnd(ac[2], st[2]),
                     xx_rnd(ac[3], st[3]), xx_rnd(ac[4], st[4])])
    ELSE NULL END], vs ->
  list_transform([CASE WHEN xn >= 32 THEN
      xx_mrg(xx_mrg(xx_mrg(xx_mrg(
        xx_add64(xx_add64(xx_rotl(vs[1], 1), xx_rotl(vs[2], 7)),
                 xx_add64(xx_rotl(vs[3], 12), xx_rotl(vs[4], 18))),
        vs[1]), vs[2]), vs[3]), vs[4])
    ELSE xx_add64(bseed, {_lit(P5)}) END], h0 ->
  list_transform([xx_add64(h0, xn)], h1 ->
  list_transform([list_reduce(
      list_prepend(h1, list_transform(range(((xn % 32) // 8)::BIGINT), tj ->
        xx_w8(bs, 32 * (xn // 32) + 8 * tj))),
      (ta, tk) -> xx_t8(ta, tk))], h2 ->
  list_transform([CASE WHEN xn % 8 >= 4 THEN xx_t4(h2, xx_w4(bs, xn - (xn % 8)))
                  ELSE h2 END], h3 ->
  list_transform([list_reduce(
      list_prepend(h3, bs[(xn - (xn % 4) + 1)::BIGINT : xn::BIGINT]),
      (oa, obv) -> xx_t1(oa, obv))], h4 ->
    xx_fmix(h4))[1])[1])[1])[1])[1])[1])[1];
"""


#: Per-doc token arrays — identical tokenization to operators/text.WORD_RE
#: and the existing vocab/tfidf oracles.
_TOKS = (
    "SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w"
    " FROM documents"
)


_U32 = 1 << 32


def _mulc_half(lo: str, hi: str, c: int, add: int = 0) -> tuple[str, str]:
    """(hi·2³² + lo) · c + add, mod 2^64, in UBIGINT half-words.  The
    lo·c_lo product expression is interpolated into both output columns —
    a cheap duplicate multiply on materialized inputs, simpler than
    threading a shared column through the stage."""
    clo, chi = c % _U32, c >> 32
    alo, ahi = add % _U32, add >> 32
    p0 = f"({lo} * {clo}::UBIGINT)"
    cross = f"(({lo} * {chi}::UBIGINT) % {_U32} + ({hi} * {clo}::UBIGINT) % {_U32})"
    if add:
        nlo_f = f"({p0} % {_U32} + {alo}::UBIGINT)"
        nhi = (
            f"(({cross} + {p0} // {_U32} + {ahi}::UBIGINT"
            f" + {nlo_f} // {_U32}) % {_U32})"
        )
        nlo = f"({nlo_f} % {_U32})"
    else:
        nlo = f"({p0} % {_U32})"
        nhi = f"(({cross} + {p0} // {_U32}) % {_U32})"
    return nlo, nhi


def perm_pipeline_ctes(num_perm: int, src: str = "dbase", key: str = "shingle") -> tuple[str, int]:
    """Staged CTE pipeline computing ``c_i = xx_int(i, base)`` (signed
    BIGINT) for i in 0..num_perm−1 from a ``(key, bp)`` source relation,
    where ``bp = (base + P5 + 4) mod 2^64``.

    xx_int(i, base) = fmix(rotl(xor(bp, (i·P1) mod 2^64), 23)·P2 + P3).
    The per-permutation xor mask constant-folds Python-side, and the
    pipeline runs as chained MATERIALIZED CTEs — one stage per fmix step,
    all num_perm values per stage.  Materialized columns make repeated
    references free, where macro-expanded trees would re-evaluate their
    argument per reference (or need per-row singleton-list let-binds —
    measured ~30 s for the 1M+ evaluations the minhash fan-out does at
    sf0.01, vs ~1 s staged).  Values are carried as UBIGINT (lo, hi)
    32-bit half-words: every product of two half-words fits hardware
    64-bit, so the whole hash runs native-width instead of HUGEINT
    software 128-bit arithmetic (measured 3× on this fan-out; exactness
    pinned directly against the Python twin in tests/test_hash_twins.py).
    Rotations/shifts become half-word shuffles; 2^63-boundary
    reconstruction happens once at the end.

    Returns (ctes_sql, n_stage) — the final CTE is ``p{n_stage}`` with
    columns (key, c_0..c_{num_perm-1}).
    """
    U32 = _U32

    def _cols(fmt) -> str:
        """One lo/hi column pair per permutation."""
        return ",\n    ".join(
            f"{fmt(i)[0]} AS lo_{i},\n    {fmt(i)[1]} AS hi_{i}"
            for i in range(num_perm)
        )

    stages = []
    # split + xor mask + rotl23, fused: x = xor(bp, mask) in half-words,
    # then (x<<23 | x>>41) = half-word shuffle (23 < 32)
    def _s1(i):
        m = i * P1 % M64
        xlo = f"xor((bp % {U32})::UBIGINT, {m % U32}::UBIGINT)"
        xhi = f"xor((bp // {U32})::UBIGINT, {m >> 32}::UBIGINT)"
        return (
            f"(({xlo} * 8388608) % {U32} + {xhi} // 512)",
            f"(({xhi} * 8388608) % {U32} + {xlo} // 512)",
        )

    stages.append(_cols(_s1))
    # · P2 + P3
    stages.append(_cols(lambda i: _mulc_half(f"lo_{i}", f"hi_{i}", P2, add=P3)))
    # fmix: ^= >>33 (low word only gets hi>>1)
    stages.append(_cols(lambda i: (f"xor(lo_{i}, hi_{i} // 2)", f"hi_{i}")))
    stages.append(_cols(lambda i: _mulc_half(f"lo_{i}", f"hi_{i}", P2)))
    # ^= >>29: low gets (hi mod 2^29)<<3 | lo>>29, high gets hi>>29
    stages.append(_cols(lambda i: (
        f"xor(lo_{i}, (hi_{i} % 536870912) * 8 + lo_{i} // 536870912)",
        f"xor(hi_{i}, hi_{i} // 536870912)",
    )))
    stages.append(_cols(lambda i: _mulc_half(f"lo_{i}", f"hi_{i}", P3)))
    # ^= >>32 then reconstruct the signed 64-bit value once
    recon = ",\n    ".join(
        f"CASE WHEN hi_{i} >= 2147483648"
        f" THEN ((hi_{i}::HUGEINT * {U32} + xor(lo_{i}, hi_{i})::HUGEINT)"
        f" - {_lit(M64)})::BIGINT"
        f" ELSE (hi_{i}::BIGINT * {U32} + xor(lo_{i}, hi_{i})::BIGINT) END AS c_{i}"
        for i in range(num_perm)
    )
    perm_ctes = ",\n".join(
        f"p{k} AS MATERIALIZED (\n  SELECT {key},\n    {cols}\n  FROM p{k - 1}\n)"
        for k, cols in enumerate(stages, start=1)
    ).replace("FROM p0", f"FROM {src}")
    n_stage = len(stages) + 1
    perm_ctes += (
        f",\np{n_stage} AS MATERIALIZED (\n  SELECT {key},\n    {recon}\n"
        f"  FROM p{n_stage - 1}\n)"
    )
    return perm_ctes, n_stage


def band_fold_ctes(
    num_perm: int, bands: int, src: str = "mh", id_col: str = "doc_id", seed: int = 42
) -> tuple[str, str]:
    """Staged half-word CTE pipeline computing the per-band LSH hash
    ``bh_b = xx_long(u64(mh_{b·rpb+3}), … xx_long(u64(mh_{b·rpb}), seed))``
    for every band from a ``(id, mh_0..mh_{num_perm-1})`` source relation
    — the same seed-chained XXH64-of-longs Spark's ``xxhash64(c0..c3)``
    runs per band.

    Rationale: the macro form (``xx_long`` nested 4 deep per band) is a
    deep HUGEINT expression tree re-interpreted per doc×band — measured
    16.3 s for 5000 docs × 16 bands at sf0.1, 85% of the whole minhash
    oracle.  This pipeline unrolls the fold into vectorized native-width
    column stages, exactly the ``perm_pipeline_ctes`` treatment: UBIGINT
    (lo, hi) 32-bit half-words so every product fits hardware 64-bit,
    rotations as half-word shuffles, one signed reconstruction at the
    end (same artifact: 16.3 s → ~0.2 s, values identical).  Exactness
    is pinned against the Python twin in tests/test_hash_twins.py.

    Returns (ctes_sql, final_cte_name); the final CTE has columns
    (id_col, bh_0..bh_{bands-1}) as signed BIGINT.
    """
    rpb = num_perm // bands
    U32 = _U32
    KADD = (P5 + 8) % M64  # seed-chain constant of XXH64's 8-byte path

    def stage(round_r: int, fmt, *, carry_state: bool) -> str:
        """One CTE body: per-band (lo, hi) exprs + pass-through columns."""
        cols = []
        for b in range(bands):
            lo, hi = fmt(b)
            cols.append(f"{lo} AS w_lo_{b}")
            cols.append(f"{hi} AS w_hi_{b}")
        if carry_state and round_r > 0:
            for b in range(bands):
                cols.append(f"s_lo_{b}")
                cols.append(f"s_hi_{b}")
        for j in range(num_perm):  # mh values consumed by LATER rounds
            if j % rpb > round_r:
                cols.append(f"mh_{j}")
        return ",\n    ".join(cols)

    stages: list[str] = []
    for r in range(rpb):
        v = lambda b: f"mh_{b * rpb + r}"  # noqa: B023 — consumed immediately

        # A: w = u64(v) · P2 (half-word split of the signed BIGINT fused in)
        def _a(b, _v=v):
            vlo = f"(({_v(b)} & 4294967295)::UBIGINT)"
            vhi = f"((({_v(b)} >> 32) & 4294967295)::UBIGINT)"
            return _mulc_half(vlo, vhi, P2)

        stages.append(stage(r, _a, carry_state=True))
        # B: w = rotl(w, 31): lo' = (lo%2)·2³¹ + hi//2, hi' = (hi%2)·2³¹ + lo//2
        stages.append(
            stage(
                r,
                lambda b: (
                    f"((w_lo_{b} % 2) * 2147483648 + w_hi_{b} // 2)",
                    f"((w_hi_{b} % 2) * 2147483648 + w_lo_{b} // 2)",
                ),
                carry_state=True,
            )
        )
        # C: w = w · P1
        stages.append(
            stage(r, lambda b: _mulc_half(f"w_lo_{b}", f"w_hi_{b}", P1), carry_state=True)
        )
        # D: w = xor(state + KADD, w); r=0 folds the constant Python-side
        if r == 0:
            t0 = (seed + KADD) % M64
            stages.append(
                stage(
                    r,
                    lambda b: (
                        f"xor({t0 % U32}::UBIGINT, w_lo_{b})",
                        f"xor({t0 >> 32}::UBIGINT, w_hi_{b})",
                    ),
                    carry_state=False,
                )
            )
        else:
            stages.append(
                stage(
                    r,
                    lambda b: (
                        f"xor((s_lo_{b} + {KADD % U32}::UBIGINT) % {U32}, w_lo_{b})",
                        f"xor((s_hi_{b} + {KADD >> 32}::UBIGINT"
                        f" + (s_lo_{b} + {KADD % U32}::UBIGINT) // {U32}) % {U32},"
                        f" w_hi_{b})",
                    ),
                    carry_state=False,
                )
            )
        # E: w = rotl(w, 27): lo' = (lo·2²⁷)%2³² + hi//2⁵, hi' symmetric
        stages.append(
            stage(
                r,
                lambda b: (
                    f"((w_lo_{b} * 134217728) % {U32} + w_hi_{b} // 32)",
                    f"((w_hi_{b} * 134217728) % {U32} + w_lo_{b} // 32)",
                ),
                carry_state=False,
            )
        )
        # F: w = w · P1 + P4
        stages.append(
            stage(
                r,
                lambda b: _mulc_half(f"w_lo_{b}", f"w_hi_{b}", P1, add=P4),
                carry_state=False,
            )
        )
        # G-J: fmix steps 1-4 (^>>33, ·P2, ^>>29, ·P3)
        stages.append(
            stage(
                r,
                lambda b: (f"xor(w_lo_{b}, w_hi_{b} // 2)", f"w_hi_{b}"),
                carry_state=False,
            )
        )
        stages.append(
            stage(r, lambda b: _mulc_half(f"w_lo_{b}", f"w_hi_{b}", P2), carry_state=False)
        )
        stages.append(
            stage(
                r,
                lambda b: (
                    f"xor(w_lo_{b}, (w_hi_{b} % 536870912) * 8 + w_lo_{b} // 536870912)",
                    f"xor(w_hi_{b}, w_hi_{b} // 536870912)",
                ),
                carry_state=False,
            )
        )
        stages.append(
            stage(r, lambda b: _mulc_half(f"w_lo_{b}", f"w_hi_{b}", P3), carry_state=False)
        )
        # K: fmix step 5 (^>>32) — becomes the next round's state
        k_cols = []
        for b in range(bands):
            k_cols.append(f"xor(w_lo_{b}, w_hi_{b}) AS s_lo_{b}")
            k_cols.append(f"w_hi_{b} AS s_hi_{b}")
        for j in range(num_perm):
            if j % rpb > r:
                k_cols.append(f"mh_{j}")
        stages.append(",\n    ".join(k_cols))

    recon = ",\n    ".join(
        f"CASE WHEN s_hi_{b} >= 2147483648"
        f" THEN ((s_hi_{b}::HUGEINT * {U32} + s_lo_{b}::HUGEINT) - {_lit(M64)})::BIGINT"
        f" ELSE (s_hi_{b}::BIGINT * {U32} + s_lo_{b}::BIGINT) END AS bh_{b}"
        for b in range(bands)
    )
    ctes = ",\n".join(
        f"bf{k} AS MATERIALIZED (\n  SELECT {id_col},\n    {cols}\n  FROM bf{k - 1}\n)"
        for k, cols in enumerate(stages, start=1)
    ).replace("FROM bf0", f"FROM {src}")
    final = f"bf{len(stages) + 1}"
    ctes += (
        f",\n{final} AS MATERIALIZED (\n  SELECT {id_col},\n    {recon}\n"
        f"  FROM bf{len(stages)}\n)"
    )
    return ctes, final


def minhash_lsh_oracle(num_perm: int = 64, bands: int = 16, threshold: float = 0.2) -> str:
    """Oracle for ``minhash_lsh_pairs(docs, "doc_id", "text", 3, 64, 16, 0.2)``.

    String hashing runs once per DISTINCT shingle (``xx_bytes`` macro);
    the per-permutation hashes run through the half-word staged pipeline
    (``perm_pipeline_ctes``); minima, band folds, and the agreement count
    are unrolled into vectorized column expressions.
    """
    perm_ctes, n_stage = perm_pipeline_ctes(num_perm)
    bf_ctes, bf_final = band_fold_ctes(num_perm, bands)

    mh_cols = ",\n    ".join(f"min(c_{i}) AS mh_{i}" for i in range(num_perm))
    bh_list = ",\n      ".join(f"bh_{b}" for b in range(bands))
    agree = " + ".join(
        f"CASE WHEN x.mh_{i} = y.mh_{i} THEN 1 ELSE 0 END" for i in range(num_perm)
    )
    return f"""{PRELUDE}
WITH toks AS MATERIALIZED ({_TOKS}),
sh AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(len(w) - 2),
                gi -> w[gi + 1] || ' ' || w[gi + 2] || ' ' || w[gi + 3]))) AS shingle
  FROM toks WHERE len(w) >= 3
),
dbase AS MATERIALIZED (
  SELECT shingle, xx_add64(xx_bytes(sb, {_lit(42)}), {_lit((P5 + 4) % M64)}) AS bp
  FROM (SELECT shingle, xx_strbytes(shingle) AS sb
        FROM (SELECT DISTINCT shingle FROM sh))
),
{perm_ctes},
mh AS MATERIALIZED (
  SELECT doc_id,
    {mh_cols}
  FROM sh JOIN p{n_stage} USING (shingle)
  GROUP BY doc_id
),
{bf_ctes},
bands AS MATERIALIZED (
  SELECT doc_id,
         unnest(range({bands})) AS band,
         unnest([
      {bh_list}
    ]) AS band_hash
  FROM {bf_final}
),
cand AS (
  SELECT DISTINCT ba.doc_id AS id_a, bb.doc_id AS id_b
  FROM bands ba JOIN bands bb USING (band, band_hash)
  WHERE ba.doc_id < bb.doc_id
)
SELECT id_a, id_b, est_jaccard
FROM (
  -- the {num_perm}-term agreement CASE sum is the oracle's hot
  -- expression: evaluate it ONCE per candidate pair in this inline
  -- subquery instead of twice (SELECT + WHERE), values unchanged
  SELECT c.id_a, c.id_b,
         round(({agree}) / {num_perm}.0, 4) AS est_jaccard
  FROM cand c
  JOIN mh x ON x.doc_id = c.id_a
  JOIN mh y ON y.doc_id = c.id_b
)
WHERE est_jaccard >= {threshold}
"""


def classifier_wts_ctes(src: str = "documents") -> str:
    """CTE fragment (no leading ``WITH``) twinning
    ``operators/classifier.score_documents`` feature weighting, ending in
    ``wts(doc_id, wv)`` where ``wv`` is the doc's ordered DOUBLE weight
    list (unigrams then bigrams, document order).

    Requires ``PRELUDE`` earlier in the statement.  The per-feature hash
    is Spark's ``pmod(xxhash64(t), 4096)``; the twin runs the XXH64 byte
    macro once per DISTINCT feature and joins back (the macro is a deep
    expression tree — per-occurrence evaluation would blow the oracle
    budget), then rebuilds each doc's weight list ordered by feature
    position so the downstream IEEE left fold sums in exactly Spark's
    order.  ``xx_bytes`` is the UNSIGNED hash, and 4096 divides 2⁶⁴, so
    unsigned-mod equals Spark's signed ``pmod``.  Weight formula matches
    ``bucket_weight``: (b % 2001)/1000 − 1."""
    return f"""cbase AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w FROM {src}
), cfeat AS (
  SELECT doc_id,
         list_concat(w, [w[i] || ' ' || w[i + 1] FOR i IN range(1, len(w))]) AS f
  FROM cbase WHERE len(w) >= 1
), cfpos AS MATERIALIZED (
  SELECT doc_id, unnest(f) AS t, generate_subscripts(f, 1) AS pos FROM cfeat
), cfdw AS MATERIALIZED (
  SELECT t,
         ((xx_bytes(xx_strbytes(t), {_lit(42)}) % 4096) % 2001)::BIGINT
           / 1000.0 - 1.0 AS wt
  FROM (SELECT DISTINCT t FROM cfpos)
), wts AS MATERIALIZED (
  SELECT doc_id, list(wt ORDER BY pos) AS wv
  FROM cfpos JOIN cfdw USING (t)
  GROUP BY doc_id
)"""


def simhash_oracle() -> str:
    """Oracle for ``simhash(docs, "doc_id", "text")``: dup-weighted token
    votes (token hashed once per DISTINCT token, weighted by occurrence
    count), 64 unrolled bit-vote sums, empty-token docs emitting 0.

    The ±1 bit signs are extracted per DISTINCT token in ``dh`` (64
    BIGINT columns on the tiny token dimension), so the per-occurrence
    vote aggregate is native ``cnt·sign`` integer math — the previous
    form ran the HUGEINT ``(h // 2^b) % 2`` division per (doc, tok, bit)
    = 7.4M software-128-bit ops (9.0 s of the oracle's 9.2 s at sf0.1;
    now ~0.3 s, values identical — integer math either way)."""
    signs = ",\n    ".join(
        f"(2 * ((h // {_lit(1 << b)}) % 2) - 1)::BIGINT AS s_{b}" for b in range(64)
    )
    votes = ",\n    ".join(
        f"sum(tc.cnt * dh.s_{b}) AS v_{b}" for b in range(64)
    )
    bits = " + ".join(
        f"CASE WHEN v_{b} > 0 THEN {_lit(1 << b)} ELSE {_lit(0)} END" for b in range(64)
    )
    return f"""{PRELUDE}
WITH toks AS MATERIALIZED ({_TOKS}),
tc AS MATERIALIZED (
  SELECT doc_id, tok, count(*)::BIGINT AS cnt
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
  GROUP BY doc_id, tok
),
dh AS MATERIALIZED (
  SELECT tok,
    {signs}
  FROM (SELECT tok, xx_bytes(xx_strbytes(tok), {_lit(42)}) AS h
        FROM (SELECT DISTINCT tok FROM tc))
),
votes AS MATERIALIZED (
  SELECT tc.doc_id,
    {votes}
  FROM tc JOIN dh USING (tok)
  GROUP BY tc.doc_id
),
sigs AS (
  SELECT doc_id, ({bits}) AS raw FROM votes
)
SELECT d.doc_id, coalesce(xx_sgn(s.raw), {_lit(0)})::BIGINT AS simhash64
FROM documents d LEFT JOIN sigs s USING (doc_id)
"""
