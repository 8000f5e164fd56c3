"""Independent pure-python XXH64 twin of Spark's ``xxhash64`` expression.

Implements the public xxHash64 specification (Cyan4973/xxHash) plus
Spark's column-chaining convention (each column hashed with the previous
column's hash as seed; initial seed 42; IntegerType via the 4-byte path,
LongType via the 8-byte path, StringType as UTF-8 bytes). Exists so the
d06 golden oracle can be generated WITHOUT running the engine's Spark
expressions — parity with ``F.xxhash64`` is asserted in
tests/test_units.py before the goldens are trusted.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M
    k = (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                lane = int.from_bytes(data[i + off:i + off + 8], "little")
                acc = (v1, v2, v3, v4)[v - 1]
                acc = (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M
                if v == 1:
                    v1 = acc
                elif v == 2:
                    v2 = acc
                elif v == 3:
                    v3 = acc
                else:
                    v4 = acc
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def spark_xxhash64(*cols) -> int:
    """F.xxhash64(col1, col2, ...) over python values. int → 4-byte path,
    'long:'-prefixed or python values tagged via tuple ('long', v) → 8-byte
    path, str → UTF-8 bytes. Returns Spark's signed int64."""
    h = 42
    for c in cols:
        if isinstance(c, tuple) and c[0] == "long":
            h = hash_long(int(c[1]), h)
        elif isinstance(c, bool):
            raise TypeError("bool not supported")
        elif isinstance(c, int):
            h = hash_int(c, h)
        elif isinstance(c, str):
            h = hash_bytes(c.encode("utf-8"), h)
        elif isinstance(c, bytes):
            h = hash_bytes(c, h)
        else:
            raise TypeError(f"unsupported type {type(c)}")
    return _to_signed(h)
