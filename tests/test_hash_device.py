"""Device-side FarmHash (ops/hash_device.py) vs the NumPy oracle.

The exactness contract: XLA's u64 emulation + the vectorized FarmHash
must reproduce oracle/hashing.py (== TF StringToHashBucketFast, itself
validated against real TF in test_tf_ground_truth.py) bit-for-bit for
pieces up to 64 bytes, including empty rows, empty pieces between
delimiters, and every length-branch boundary (0,1,3,4,7,8,16,17,32,33,64).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recom_tpu.oracle.hashing import farmhash64, hash_bucket_fast
from recom_tpu.ops import hash_device as hd

if not jax.config.jax_enable_x64:
    jax.config.update("jax_enable_x64", True)


def _pad_rows(rows, extra=8):
    """list[bytes] -> NUL-padded [n, Wp] uint8, Wp = align4(max+extra)."""
    w = max((len(r) for r in rows), default=1)
    wp = ((w + extra + 3) // 4) * 4
    out = np.zeros((len(rows), wp), np.uint8)
    for i, r in enumerate(rows):
        out[i, : len(r)] = np.frombuffer(r, np.uint8)
    return out


ALPHA = b"abcdefghijklmnopqrstuvwxyzABCDEF0123456789"


def _rand_piece(rng, n):
    return bytes(ALPHA[i] for i in rng.integers(0, len(ALPHA), n))


@pytest.mark.parametrize("max_len", [16, 64])
def test_farmhash_pieces_all_length_branches(max_len):
    rng = np.random.default_rng(0)
    cap = max_len
    lens = [l for l in
            [0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64]
            if l <= cap]
    rows = [_rand_piece(rng, l) for l in lens for _ in range(3)]
    b = _pad_rows(rows)
    ln = np.asarray([len(r) for r in rows], np.int32)
    off = np.zeros_like(ln)
    got = np.asarray(
        jax.jit(hd.farmhash64_pieces, static_argnames=("max_len",))(
            jnp.asarray(b), jnp.asarray(off)[:, None],
            jnp.asarray(ln)[:, None], max_len=max_len,
        )
    )[:, 0]
    want = np.asarray([farmhash64(r.decode()) for r in rows], np.uint64)
    np.testing.assert_array_equal(got, want)


def test_fixed_hash_ids_matches_oracle():
    rng = np.random.default_rng(1)
    C, B = 5, 33
    buckets = np.asarray([7, 100, 10_000, 1 << 23, 3], np.int64)
    cols = []
    for c in range(C):
        rows = [_rand_piece(rng, int(rng.integers(0, 17)))
                for _ in range(B)]
        cols.append(rows)
    w = max(len(r) for col in cols for r in col)
    wp = ((w + 8 + 3) // 4) * 4
    b = np.zeros((C, B, wp), np.uint8)
    for c, col in enumerate(cols):
        for i, r in enumerate(col):
            b[c, i, : len(r)] = np.frombuffer(r, np.uint8)
    got = np.asarray(
        jax.jit(hd.fixed_hash_ids, static_argnames=("max_len",))(
            jnp.asarray(b), jnp.asarray(buckets), max_len=16
        )
    )
    for c in range(C):
        want = hash_bucket_fast(
            [r.decode() for r in cols[c]], int(buckets[c])
        )
        np.testing.assert_array_equal(got[c], np.asarray(want), f"col {c}")


def test_split_hash_ids_matches_native_semantics():
    """Empty rows -> all -1; empty pieces between delimiters hash '' ;
    pieces beyond rowlen drop; in-row order preserved."""
    rng = np.random.default_rng(2)
    C, B, L = 3, 40, 6
    delims = np.frombuffer(b";|,", np.uint8)
    buckets = np.asarray([101, 9999, 1 << 20], np.int64)
    cols = []
    for c in range(C):
        d = bytes([delims[c]])
        rows = []
        for _ in range(B):
            k = int(rng.integers(0, 9))     # up to 8 pieces, some > L
            pieces = [
                _rand_piece(rng, int(rng.integers(0, 13)))
                for _ in range(k)
            ]
            rows.append(d.join(pieces))
        rows[0] = b""                        # empty row
        if B > 1:
            rows[1] = d * 3                  # only delimiters: 4 empty pieces
        cols.append(rows)
    w = max((len(r) for col in cols for r in col), default=1)
    wp = ((w + 8 + 3) // 4) * 4
    b = np.zeros((C, B, wp), np.uint8)
    for c, col in enumerate(cols):
        for i, r in enumerate(col):
            b[c, i, : len(r)] = np.frombuffer(r, np.uint8)
    got = np.asarray(
        jax.jit(
            hd.split_hash_ids, static_argnames=("rowlen", "max_len")
        )(
            jnp.asarray(b), jnp.asarray(delims), jnp.asarray(buckets),
            rowlen=L, max_len=16,
        )
    )
    for c in range(C):
        d = bytes([delims[c]]).decode()
        for i, r in enumerate(cols[c]):
            s = r.decode()
            want = np.full(L, -1, np.int64)
            if s:
                ids = hash_bucket_fast(s.split(d)[:L], int(buckets[c]))
                want[: len(ids)] = ids
            np.testing.assert_array_equal(
                got[c, i], want, f"col {c} row {i} ({s!r})"
            )


def test_split_hash_ids_matches_native_library():
    """Cross-check against the C++ host path on identical wire bytes."""
    from recom_tpu.native import ops as nops
    from recom_tpu.native.build import get_lib

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    B, L = 64, 8
    rows = []
    for _ in range(B):
        k = int(rng.integers(1, 11))
        rows.append(b";".join(_rand_piece(rng, 8) for _ in range(k)))
    arr = np.asarray([r.decode() for r in rows], dtype="S")
    out = np.zeros((1, B, L), np.int32)
    nops.split_hash_multi_out(
        [arr], np.frombuffer(b";", np.uint8), np.asarray([4096], np.int64),
        L, out, B,
    )
    w = arr.dtype.itemsize
    wp = ((w + 8 + 3) // 4) * 4
    b = np.zeros((1, B, wp), np.uint8)
    b[0, :, :w] = arr.view(np.uint8).reshape(B, w)
    got = np.asarray(
        jax.jit(
            hd.split_hash_ids, static_argnames=("rowlen", "max_len")
        )(
            jnp.asarray(b), np.frombuffer(b";", np.uint8),
            np.asarray([4096], np.int64), rowlen=L, max_len=16,
        )
    )
    np.testing.assert_array_equal(got, out)
