"""Pure-Python XXH64 — the oracle-side twin of Spark's ``F.xxhash64``.

Spark's ``xxhash64(cols...)`` chains: ``h = 42; for col: h = XXH64(col, h)``
where a string column contributes its UTF-8 bytes and a long column its
8 little-endian bytes. We reimplement the public XXH64 algorithm
(Cyan4973/xxHash spec) so the pytest oracle can reproduce shingle hashes
and LSH band keys without touching the Spark path; ``tests/test_hashing.py``
asserts bit-equality against Spark on a corpus of strings/longs.

The reference used opaque C hashes from libpostal for its blocking keys
(/root/reference/lib/lieu/dedupe.py:250-325); ours are xxhash64 band keys.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * _P1) & MASK64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed`` → unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h


def to_signed64(u: int) -> int:
    """Unsigned 64-bit → Java/Spark signed long."""
    return u - (1 << 64) if u >= (1 << 63) else u


def to_unsigned64(s: int) -> int:
    return s & MASK64


def xxh64_string(s: str, seed: int = 42) -> int:
    """Spark-equivalent hash of one StringType value (signed)."""
    return to_signed64(xxh64(s.encode("utf-8"), seed & MASK64))


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark-equivalent hash of one LongType value (signed)."""
    return to_signed64(xxh64((v & MASK64).to_bytes(8, "little"), seed & MASK64))


def xxh64_chain(values: list, seed: int = 42) -> int:
    """Spark-equivalent ``xxhash64(c1, c2, ...)`` over a mix of str/int
    scalars and lists of ints (ArrayType(LongType) columns hash element-
    wise with the running seed, like Spark's HashExpression)."""
    h = seed & MASK64
    for v in values:
        if isinstance(v, str):
            h = xxh64(v.encode("utf-8"), h)
        elif isinstance(v, list):
            for el in v:
                h = xxh64((el & MASK64).to_bytes(8, "little"), h)
        elif isinstance(v, int):
            h = xxh64((v & MASK64).to_bytes(8, "little"), h)
        else:
            raise TypeError(f"unsupported type for xxh64_chain: {type(v)}")
    return to_signed64(h)
