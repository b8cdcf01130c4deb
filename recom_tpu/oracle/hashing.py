"""FarmHash64 (Fingerprint64) — the hash behind TF ``StringToHashBucketFast``.

TF's ``tf.strings.to_hash_bucket_fast`` computes
``Fingerprint64(utf8_bytes) % num_buckets`` where ``Fingerprint64`` is
FarmHash's platform-independent 64-bit fingerprint (farmhashna::Hash64).  The
reference relies on TF for this op and inlines only the *bucketize* stage into
its generated kernels (cuda_emitter.cc EmitInputInline); string hashing stays
on host there too.  We implement the same public-domain algorithm
(Google FarmHash, farmhashna) from its specification so lookup ids are
bit-for-bit identical to TF.

This module is the slow, obviously-correct Python implementation; the C++
batch implementation in ``recom_tpu/native/host_ops.cc`` must agree exactly
(cross-checked in tests/test_hashing.py).
"""

from __future__ import annotations

from typing import Iterable, List, Union

import numpy as np

_M64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F


def _fetch64(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 8], "little")


def _fetch32(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 4], "little")


def _rotr(v: int, n: int) -> int:
    return ((v >> n) | (v << (64 - n))) & _M64


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & _M64


def _hash_len_16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M64
    b ^= b >> 47
    return (b * mul) & _M64


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (K2 + n * 2) & _M64
        a = (_fetch64(s, 0) + K2) & _M64
        b = _fetch64(s, n - 8)
        c = (_rotr(b, 37) * mul + a) & _M64
        d = ((_rotr(a, 25) + b) * mul) & _M64
        return _hash_len_16(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & _M64
        a = _fetch32(s, 0)
        return _hash_len_16((n + (a << 3)) & _M64, _fetch32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2 ^ z * K0) & _M64) * K2) & _M64
    return K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & _M64
    a = (_fetch64(s, 0) * K1) & _M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & _M64
    d = (_fetch64(s, n - 16) * K2) & _M64
    return _hash_len_16(
        (_rotr((a + b) & _M64, 43) + _rotr(c, 30) + d) & _M64,
        (a + _rotr((b + K2) & _M64, 18) + c) & _M64,
        mul,
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & _M64
    a = (_fetch64(s, 0) * K2) & _M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & _M64
    d = (_fetch64(s, n - 16) * K2) & _M64
    y = (_rotr((a + b) & _M64, 43) + _rotr(c, 30) + d) & _M64
    z = _hash_len_16(y, (a + _rotr((b + K2) & _M64, 18) + c) & _M64, mul)
    e = (_fetch64(s, 16) * mul) & _M64
    f = _fetch64(s, 24)
    g = ((y + _fetch64(s, n - 32)) * mul) & _M64
    h = ((z + _fetch64(s, n - 24)) * mul) & _M64
    return _hash_len_16(
        (_rotr((e + f) & _M64, 43) + _rotr(g, 30) + h) & _M64,
        (e + _rotr((f + a) & _M64, 18) + g) & _M64,
        mul,
    )


def _weak_hash_len_32_with_seeds(s: bytes, i: int, a: int, b: int):
    w = _fetch64(s, i)
    x = _fetch64(s, i + 8)
    y = _fetch64(s, i + 16)
    z = _fetch64(s, i + 24)
    a = (a + w) & _M64
    b = _rotr((b + a + z) & _M64, 21)
    c = a
    a = (a + x + y) & _M64
    b = (b + _rotr(a, 44)) & _M64
    return (a + z) & _M64, (b + c) & _M64


def farmhash64(data: Union[str, bytes]) -> int:
    """FarmHash Fingerprint64 of ``data`` (utf-8 encoded if str)."""
    s = data.encode("utf-8") if isinstance(data, str) else bytes(data)
    n = len(s)
    if n <= 16:
        return _hash_len_0_to_16(s)
    if n <= 32:
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    seed = 81
    x = seed
    y = (seed * K1 + 113) & _M64
    z = (_shift_mix((y * K2 + 113) & _M64) * K2) & _M64
    v = (0, 0)
    w = (0, 0)
    x = (x * K2 + _fetch64(s, 0)) & _M64

    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rotr((x + y + v[0] + _fetch64(s, i + 8)) & _M64, 37) * K1) & _M64
        y = (_rotr((y + v[1] + _fetch64(s, i + 48)) & _M64, 42) * K1) & _M64
        x ^= w[1]
        y = (y + v[0] + _fetch64(s, i + 40)) & _M64
        z = (_rotr((z + w[0]) & _M64, 33) * K1) & _M64
        v = _weak_hash_len_32_with_seeds(s, i, (v[1] * K1) & _M64, (x + w[0]) & _M64)
        w = _weak_hash_len_32_with_seeds(
            s, i + 32, (z + w[1]) & _M64, (y + _fetch64(s, i + 16)) & _M64
        )
        z, x = x, z
        i += 64
        if i == end:
            break

    mul = (K1 + ((z & 0xFF) << 1)) & _M64
    i = last64
    w0 = (w[0] + ((n - 1) & 63)) & _M64
    v0 = (v[0] + w0) & _M64
    w0 = (w0 + v0) & _M64
    v = (v0, v[1])
    w = (w0, w[1])
    x = (_rotr((x + y + v[0] + _fetch64(s, i + 8)) & _M64, 37) * mul) & _M64
    y = (_rotr((y + v[1] + _fetch64(s, i + 48)) & _M64, 42) * mul) & _M64
    x ^= (w[1] * 9) & _M64
    y = (y + v[0] * 9 + _fetch64(s, i + 40)) & _M64
    z = (_rotr((z + w[0]) & _M64, 33) * mul) & _M64
    v = _weak_hash_len_32_with_seeds(s, i, (v[1] * mul) & _M64, (x + w[0]) & _M64)
    w = _weak_hash_len_32_with_seeds(
        s, i + 32, (z + w[1]) & _M64, (y + _fetch64(s, i + 16)) & _M64
    )
    z, x = x, z
    return _hash_len_16(
        (_hash_len_16(v[0], w[0], mul) + _shift_mix(y) * K0 + z) & _M64,
        (_hash_len_16(v[1], w[1], mul) + x) & _M64,
        mul,
    )


_KMUL = 0xC6A4A7935BD1E995  # MurmurHash64A multiplier (TF fingerprint.h)


def fingerprint_cat64(fp1: int, fp2: int) -> int:
    """TF FingerprintCat64: order-dependent combination of two 64-bit
    fingerprints (tensorflow/core/platform/fingerprint.h), used by hashed
    feature crosses.  Validated against installed TF 2.21:
    crossed_column(("u1","x"), 1000 buckets) -> 79, ("u2","y") -> 195."""
    result = (fp1 ^ _KMUL) & _M64
    result ^= _shift_mix((fp2 * _KMUL) & _M64) * _KMUL & _M64
    result &= _M64
    result = (result * _KMUL) & _M64
    result = (_shift_mix(result) * _KMUL) & _M64
    return _shift_mix(result)


def cross_hash(values, num_buckets: int, hash_key: int = 0xDECAFCAFFE) -> int:
    """Hashed cross of one tuple: string members Fingerprint64-hashed,
    INTEGER members fed RAW (TF sparse_cross_op.cc: int64 column features
    are the values themselves — validated vs TF 2.21: identity(7) x "z"
    at 1000 buckets -> 494), combined left-to-right from ``hash_key``
    (tf.feature_column.crossed_column semantics)."""
    cur = hash_key
    for v in values:
        if isinstance(v, (int, np.integer)):
            fp = int(v) & _M64
        else:
            if isinstance(v, (bytes, np.bytes_)):
                v = bytes(v)
            fp = farmhash64(v)
        cur = fingerprint_cat64(cur, fp)
    return cur % num_buckets


def hash_bucket_fast(
    values: Iterable[Union[str, bytes, int, np.integer]], num_buckets: int
) -> np.ndarray:
    """``tf.strings.to_hash_bucket_fast`` over a flat list.  Integer inputs
    are hashed via their decimal string form (tf.feature_column
    categorical_column_with_hash_bucket behavior for integer dtypes)."""
    out: List[int] = []
    for v in values:
        if isinstance(v, (int, np.integer)):
            v = str(int(v))
        out.append(farmhash64(v) % num_buckets)
    return np.asarray(out, dtype=np.int64)
