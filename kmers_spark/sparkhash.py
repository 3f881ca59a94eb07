"""Driver-side reimplementation of Spark's `xxhash64` expression.

`decode.lookup_keys` must map probe keys to the same buckets the encode
job's `partitioning.with_bucket` produced (F.xxhash64-based). Computing
that on the driver removes one Spark job per lookup call; correctness
is pinned by a golden test against F.xxhash64 itself
(tests/test_encode_e2e.py) across lengths covering every tail branch.

Spark hashes each argument with the running hash as the seed
(XxHash64Function: strings/binary as UTF-8 bytes, longs as one 8-byte
little-endian word), default seed 42. The byte algorithm is standard
XXH64 (Cyan4973/xxHash, public spec).
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * P2) & _M, 31) * P1) & _M


def _avalanche(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _tail(h: int, b: bytes, i: int, end: int) -> int:
    while i + 8 <= end:
        k = int.from_bytes(b[i : i + 8], "little")
        h = (_rotl(h ^ _round(0, k), 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= end:
        h = (_rotl(h ^ (int.from_bytes(b[i : i + 4], "little") * P1) & _M, 23) * P2 + P3) & _M
        i += 4
    while i < end:
        h = (_rotl(h ^ (b[i] * P5) & _M, 11) * P1) & _M
        i += 1
    return _avalanche(h)


def xxh64_bytes(b: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(b)
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        i = 0
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(b[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(b[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(b[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(b[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
        i = 0
    h = (h + n) & _M
    return _tail(h, b, i, n)


def xxh64_long(v: int, seed: int) -> int:
    """XXH64 of one long (Spark hashes long args as an 8-byte word)."""
    h = (seed + P5 + 8) & _M
    h = (_rotl(h ^ _round(0, v & _M), 27) * P1 + P4) & _M
    return _avalanche(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64(*args, seed: int = 42) -> int:
    """Spark's F.xxhash64 over str/bytes/int args: each argument's hash
    chains the previous result as its seed. Returns SIGNED int64 (what
    the Spark expression yields)."""
    h = seed
    for a in args:
        if isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, (bytes, bytearray)):
            h = xxh64_bytes(bytes(a), h)
        elif isinstance(a, int):
            h = xxh64_long(a, h)
        else:
            raise TypeError(f"unsupported xxhash64 arg type {type(a)!r}")
    return _signed(h)


def pmod(x: int, m: int) -> int:
    """Spark's pmod on int64 (non-negative result)."""
    return ((x % m) + m) % m
