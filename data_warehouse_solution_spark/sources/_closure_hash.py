"""Executor-shippable hash/bloom builders for the Python DataSource
factories.

The functions are returned as NESTED closures: their qualified names
(`make_bloom_fns.<locals>._xxh_long`, ...) are unimportable, so
cloudpickle serializes them BY VALUE into executor/worker processes
where this package is not on sys.path — the repo's self-contained-
closure rule, without pasting a third copy of XXH64 into every
factory. Semantics are bit-identical to ``cowtable._xxh64_long`` /
``_xxh64_bytes`` / ``_build_bloom`` (Spark's XxHash64 chain, seed 42;
parity is pinned by tests/test_cow_batch_source.py and the DSv2
bloom-parity test against engine staging).
"""

from __future__ import annotations


def make_bloom_fns():
    """(xxh_long, xxh_bytes, bloom_build) as by-value-picklable
    closures. ``bloom_build(values)`` takes the canonical string forms
    (CAST AS STRING) of a file's non-null column values and returns a
    manifest bloom entry {m, k, b64}, or None past the NDV saturation
    gate (any seed's distinct positions > m/8) — exactly what
    ``cowtable._stage_files`` records."""
    U64 = (1 << 64) - 1
    P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    M_BITS, K = 1 << 16, 5

    def _rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & U64

    def _fmix(h):
        h ^= h >> 33
        h = (h * P2) & U64
        h ^= h >> 29
        h = (h * P3) & U64
        return h ^ (h >> 32)

    def _round(acc, k):
        acc = (acc + k * P2) & U64
        return (_rotl(acc, 31) * P1) & U64

    def xxh_long(value, seed):
        h = (seed + P5 + 8) & U64
        h ^= _round(0, value & U64)
        h = (_rotl(h, 27) * P1 + P4) & U64
        return _fmix(h)

    def xxh_bytes(data, seed):
        n, i = len(data), 0
        if n >= 32:
            v1 = (seed + P1 + P2) & U64
            v2 = (seed + P2) & U64
            v3 = seed & U64
            v4 = (seed - P1) & U64
            while i <= n - 32:
                v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
                v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
                v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
                v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
                i += 32
            h = (
                _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
            ) & U64
            for v in (v1, v2, v3, v4):
                h ^= _round(0, v)
                h = (h * P1 + P4) & U64
        else:
            h = (seed + P5) & U64
        h = (h + n) & U64
        while i <= n - 8:
            h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
            h = (_rotl(h, 27) * P1 + P4) & U64
            i += 8
        if i <= n - 4:
            h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & U64
            h = (_rotl(h, 23) * P2 + P3) & U64
            i += 4
        while i < n:
            h ^= (data[i] * P5) & U64
            h = (_rotl(h, 11) * P1) & U64
            i += 1
        return _fmix(h)

    def bloom_build(values):
        import base64 as _b64

        seeds = [xxh_long(i, 42) for i in range(K)]
        per_seed = [set() for _ in range(K)]
        for s in values:
            b = s.encode("utf-8")
            for i in range(K):
                per_seed[i].add(xxh_bytes(b, seeds[i]) & (M_BITS - 1))
        if any(len(ps) > M_BITS // 8 for ps in per_seed):
            return None
        bitmap = bytearray(M_BITS >> 3)
        for ps in per_seed:
            for p in ps:
                bitmap[p >> 3] |= 1 << (p & 7)
        return {
            "m": M_BITS,
            "k": K,
            "b64": _b64.b64encode(bytes(bitmap)).decode(),
        }

    return xxh_long, xxh_bytes, bloom_build


def make_murmur_fns():
    """(hash_literal, bucket_of_key) as by-value-picklable closures —
    Spark's Murmur3_x86_32 over typed literals and the chained
    HashPartitioning.partitionIdExpression fold, mirroring
    ``cowtable._spark_hash_literal`` / ``_bucket_of_key`` (parity
    with F.hash pinned by tests/test_cow_bucketed.py; reader-vs-
    engine drift pinned by tests/test_cow_batch_source.py)."""
    M32 = 0xFFFFFFFF

    def _rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M32

    def _mixk1(k1):
        k1 = (k1 * 0xCC9E2D51) & M32
        return (_rotl(k1, 15) * 0x1B873593) & M32

    def _mixh1(h1, k1):
        h1 ^= k1
        return (_rotl(h1, 13) * 5 + 0xE6546B64) & M32

    def _fmix(h1, n):
        h1 ^= n
        h1 ^= h1 >> 16
        h1 = (h1 * 0x85EBCA6B) & M32
        h1 ^= h1 >> 13
        h1 = (h1 * 0xC2B2AE35) & M32
        return h1 ^ (h1 >> 16)

    def hash_literal(value, col_type, seed):
        import datetime as _dt

        if isinstance(value, bool):
            return None
        if col_type in ("tinyint", "smallint", "int"):
            if not isinstance(value, int) or not (-(1 << 31) <= value < (1 << 31)):
                return None
            return _fmix(_mixh1(seed, _mixk1(value & M32)), 4)
        if col_type == "bigint":
            if not isinstance(value, int):
                return None
            u = value & ((1 << 64) - 1)
            h1 = _mixh1(seed, _mixk1(u & M32))
            h1 = _mixh1(h1, _mixk1((u >> 32) & M32))
            return _fmix(h1, 8)
        if col_type == "string":
            if not isinstance(value, str):
                return None
            data = value.encode("utf-8")
            n = len(data)
            aligned = n - n % 4
            h1 = seed
            for i in range(0, aligned, 4):
                h1 = _mixh1(h1, _mixk1(int.from_bytes(data[i : i + 4], "little")))
            for i in range(aligned, n):
                b = data[i]
                if b >= 128:
                    b -= 256
                h1 = _mixh1(h1, _mixk1(b & M32))
            return _fmix(h1, n)
        if col_type == "date":
            if isinstance(value, _dt.datetime):
                return None
            if isinstance(value, _dt.date):
                days = (value - _dt.date(1970, 1, 1)).days
            elif isinstance(value, str):
                try:
                    days = (
                        _dt.date.fromisoformat(value) - _dt.date(1970, 1, 1)
                    ).days
                except ValueError:
                    return None
            else:
                return None
            return _fmix(_mixh1(seed, _mixk1(days & M32)), 4)
        return None

    def bucket_of_key(vals, col_types, nb):
        h = 42
        for v, t in zip(vals, col_types):
            h = hash_literal(v, t, h)
            if h is None:
                return None
        signed = h - (1 << 32) if h >= (1 << 31) else h
        return signed % nb

    return hash_literal, bucket_of_key
