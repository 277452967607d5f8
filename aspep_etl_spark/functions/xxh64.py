"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression byte
semantics — the package-side dependency of the ``mapInPandas`` scoring
kernel (``operators/classifier.score_documents_kernel``), which memoizes
it per distinct feature string so the per-occurrence cost is a dict hit.

This is deliberately a SEPARATE implementation from the independent
cross-check twin in ``tests/xxh64_twin.py`` (which exists to verify the
engine and must not serve it); both are pinned against the engine's
``F.xxhash64`` output in ``tests/test_hash_twins.py``.

Algorithm: the public XXH64 specification (Cyan4973/xxHash), which
Spark's ``XxHash64`` expression implements JVM-side for UTF-8 string
bytes.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _stripe(acc: int, k: int) -> int:
    return (_rotl((acc + k * _P2) & _M, 31) * _P1) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of ``data`` with ``seed`` (Spark hashes string
    columns as their UTF-8 bytes through exactly this)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _stripe(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _stripe(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _stripe(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _stripe(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _stripe(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _stripe(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h
