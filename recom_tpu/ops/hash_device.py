"""Device-side string split + FarmHash: FC string processing ON the TPU.

The reference moves feature-column compute off the host and onto the
accelerator (the entire point of its fused CUDA megakernel,
cuda_emitter.cc:2097-2134) — EXCEPT string ops, which it pins to CPU
(SetFCBeginToCPU, cuda_emitter.cc:172-190) because string hashing on GPU
was not worth building.  On our single-core TPU hosts that exception is
the serving ceiling: at model-E scale the host spends ~1ms/request
splitting + FarmHashing delimited string features while the device idles
(BENCH_r03: device 0.044ms vs host 1.67ms).  This module removes the
exception: the wire ships RAW string bytes (NUL-padded fixed-width rows,
numpy 'S' layout) and the device splits, hashes, and mods them itself.

Exactness: TPU has no native 64-bit integers, but XLA emulates u64
arithmetic (mul/add/xor/shift/rem) with u32 pairs EXACTLY — validated
element-for-element against the NumPy oracle on the real chip (see
tests/test_hash_device.py and the bench gate).  The FarmHash
Fingerprint64 below reproduces oracle/hashing.py (same public-domain
algorithm as TF's StringToHashBucketFast) for byte strings up to 64
bytes, which covers every recsys token; longer pieces require the
iterative Hash64 loop and are routed to host prep by the plan (the
host's count scan knows each request's max piece length).

Everything is straight-line vectorized math over [..., L] piece slots:
no data-dependent control flow, static shapes — XLA fuses the whole
thing into a handful of TPU VPU loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# FarmHash constants (public-domain farmhashna::Hash64, identical to
# oracle/hashing.py and native/host_ops.cc)
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F


def _u64(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.uint64)


def _rot(v, n: int):
    # n is a Python int in (0, 64)
    return (v >> jnp.uint64(n)) | (v << jnp.uint64(64 - n))


def _shift_mix(v):
    return v ^ (v >> jnp.uint64(47))


def _hash_len_16(u, v, mul):
    a = (u ^ v) * mul
    a = a ^ (a >> jnp.uint64(47))
    b = (v ^ a) * mul
    b = b ^ (b >> jnp.uint64(47))
    return b * mul


def _bytes_to_words(b: jnp.ndarray) -> jnp.ndarray:
    """[..., W] uint8 -> [..., W//4] uint32 little-endian words.  W must be
    a multiple of 4 (callers pad).  Runs in u32 (cheap on TPU)."""
    w = b.astype(jnp.uint32).reshape(*b.shape[:-1], b.shape[-1] // 4, 4)
    return (
        w[..., 0]
        | (w[..., 1] << 8)
        | (w[..., 2] << 16)
        | (w[..., 3] << 24)
    )


def _fetch32(words: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    """Unaligned little-endian u32 at byte offset ``off``.

    words: [..., NW] u32; off: [...] int32 (clamped into range by caller
    construction: the word array carries >= 4 pad bytes past any read).
    Returns [...] uint32."""
    i = (off >> 2).astype(jnp.int32)
    sh = ((off & 3) << 3).astype(jnp.uint32)
    w0 = jnp.take_along_axis(words, i[..., None], axis=-1)[..., 0]
    w1 = jnp.take_along_axis(words, (i + 1)[..., None], axis=-1)[..., 0]
    # sh in {0,8,16,24}; (w1 << (32-sh)) at sh=0 would shift by 32 (XLA:
    # undefined) — select the aligned case explicitly
    hi = jnp.where(sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh))
    return jnp.where(sh == 0, w0, (w0 >> sh) | hi)


def _fetch64(words: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    lo = _fetch32(words, off)
    hi = _fetch32(words, off + 4)
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def _fetch_byte(bytes_u8: jnp.ndarray, off: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(
        bytes_u8, off[..., None].astype(jnp.int32), axis=-1
    )[..., 0]


def _hash0to16(words, bytes_u8, off, ln):
    """farmhash Hash64 for pieces of length 0..16 (HashLen0to16)."""
    ln64 = ln.astype(jnp.uint64)
    k2 = _u64(_K2)
    mul = k2 + ln64 * jnp.uint64(2)

    # len >= 8
    a8 = _fetch64(words, off) + k2
    b8 = _fetch64(words, off + jnp.maximum(ln - 8, 0))
    c8 = _rot(b8, 37) * mul + a8
    d8 = (_rot(a8, 25) + b8) * mul
    h8 = _hash_len_16(c8, d8, mul)

    # 4 <= len < 8
    a4 = _fetch32(words, off).astype(jnp.uint64)
    b4 = _fetch32(words, off + jnp.maximum(ln - 4, 0)).astype(jnp.uint64)
    h4 = _hash_len_16(ln64 + (a4 << jnp.uint64(3)), b4, mul)

    # 1 <= len < 4
    sa = _fetch_byte(bytes_u8, off).astype(jnp.uint32)
    sb = _fetch_byte(bytes_u8, off + (ln >> 1)).astype(jnp.uint32)
    sc = _fetch_byte(
        bytes_u8, off + jnp.maximum(ln - 1, 0)
    ).astype(jnp.uint32)
    y = sa + (sb << 8)
    z = ln.astype(jnp.uint32) + (sc << 2)
    h1 = (
        _shift_mix(
            y.astype(jnp.uint64) * _u64(_K2) ^ z.astype(jnp.uint64) * _u64(_K0)
        )
        * _u64(_K2)
    )

    h = jnp.where(ln >= 8, h8, jnp.where(ln >= 4, h4, h1))
    return jnp.where(ln > 0, h, k2)


def _hash17to32(words, off, ln):
    ln64 = ln.astype(jnp.uint64)
    mul = _u64(_K2) + ln64 * jnp.uint64(2)
    a = _fetch64(words, off) * _u64(_K1)
    b = _fetch64(words, off + 8)
    c = _fetch64(words, off + jnp.maximum(ln - 8, 0)) * mul
    d = _fetch64(words, off + jnp.maximum(ln - 16, 0)) * _u64(_K2)
    return _hash_len_16(
        _rot(a + b, 43) + _rot(c, 30) + d,
        a + _rot(b + _u64(_K2), 18) + c,
        mul,
    )


def _hash33to64(words, off, ln):
    ln64 = ln.astype(jnp.uint64)
    mul = _u64(_K2) + ln64 * jnp.uint64(2)
    a = _fetch64(words, off) * _u64(_K2)
    b = _fetch64(words, off + 8)
    c = _fetch64(words, off + jnp.maximum(ln - 8, 0)) * mul
    d = _fetch64(words, off + jnp.maximum(ln - 16, 0)) * _u64(_K2)
    y = _rot(a + b, 43) + _rot(c, 30) + d
    z = _hash_len_16(y, a + _rot(b + _u64(_K2), 18) + c, mul)
    e = _fetch64(words, off + 16) * mul
    f = _fetch64(words, off + 24)
    g = (y + _fetch64(words, off + jnp.maximum(ln - 32, 0))) * mul
    h = (z + _fetch64(words, off + jnp.maximum(ln - 24, 0))) * mul
    return _hash_len_16(
        _rot(e + f, 43) + _rot(g, 30) + h,
        e + _rot(f + a, 18) + g,
        mul,
    )


def farmhash64_pieces(
    bytes_u8: jnp.ndarray,
    off: jnp.ndarray,
    ln: jnp.ndarray,
    max_len: int = 64,
) -> jnp.ndarray:
    """Fingerprint64 of byte pieces described by (offset, length) into the
    trailing axis of ``bytes_u8``.

    bytes_u8: [..., W] uint8 with W % 4 == 0 and at least 8 NUL pad bytes
    past the last addressable piece byte (callers lay the wire views out
    so; reads past a piece stay inside the row and never affect the
    result — lengths gate every byte that reaches the hash).
    off/ln: [..., L] int32 piece offsets/lengths, ln in [0, max_len].
    max_len: static bound on piece length — 16 skips the 17..64 paths
    (tokens of model E/F shape), 64 covers the full straight-line
    FarmHash.  Returns [..., L] uint64."""
    words = _bytes_to_words(bytes_u8)
    # broadcast words/bytes over the piece-slot axis L
    wB = words[..., None, :]
    bB = bytes_u8[..., None, :]
    # Unselected length branches read past the piece (up to off+35 for the
    # 33..64 path on a short piece); XLA gather clamps out-of-range
    # indices, and the jnp.where below discards those lanes — only the
    # SELECTED branch's reads must be real, and those stay within
    # off + ln + 3 <= W + 3, covered by the >= 8 NUL pad bytes + word
    # rounding the wire layout guarantees.
    off = jnp.maximum(off, 0).astype(jnp.int32)
    ln = ln.astype(jnp.int32)
    h = _hash0to16(wB, bB, off, ln)
    if max_len > 16:
        h = jnp.where(ln > 16, _hash17to32(wB, off, ln), h)
    if max_len > 32:
        h = jnp.where(ln > 32, _hash33to64(wB, off, ln), h)
    return h


def mod_buckets(h: jnp.ndarray, num_buckets: jnp.ndarray) -> jnp.ndarray:
    """h % num_buckets as int32 (TF StringToHashBucketFast's final step).
    num_buckets broadcasts against h."""
    return (h % num_buckets.astype(jnp.uint64)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Row machinery: NUL-padded fixed-width rows -> piece (offset, length) pairs
# ---------------------------------------------------------------------------


def row_lengths(bytes_u8: jnp.ndarray) -> jnp.ndarray:
    """Byte length of each NUL-right-padded row (numpy 'S' convention):
    position of the last non-NUL byte + 1.  [..., W] u8 -> [...] int32."""
    w = bytes_u8.shape[-1]
    nz = bytes_u8 != 0
    # last True index + 1; 0 when all NUL
    idx = jnp.arange(1, w + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(nz, idx, 0), axis=-1)


def fixed_hash_ids(
    bytes_u8: jnp.ndarray,
    num_buckets: jnp.ndarray,
    max_len: int = 64,
) -> jnp.ndarray:
    """ids for fixed-width single-value string columns (class-1 members):
    bytes_u8 [C, B, W] u8 -> [C, B] int32 = Fingerprint64(row) % buckets[c].
    Matches native rt_hash_fixed_multi_out / oracle hash_bucket_fast."""
    ln = row_lengths(bytes_u8)
    h = farmhash64_pieces(
        bytes_u8,
        jnp.zeros(ln.shape + (1,), jnp.int32),
        ln[..., None],
        max_len=max_len,
    )[..., 0]
    return mod_buckets(h, num_buckets[:, None])


def split_pieces(
    bytes_u8: jnp.ndarray,
    delim: jnp.ndarray,
    rowlen: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Delimiter split of NUL-padded rows into up to ``rowlen`` pieces.

    bytes_u8: [C, B, W] u8; delim: [C] u8 (single-byte delimiters, the
    wire convention).  Returns (off [C,B,L] int32, ln [C,B,L] int32,
    npieces [C,B] int32).  Semantics match native SplitHashPadT: an empty
    row has 0 pieces; empty pieces between delimiters DO count; pieces
    beyond rowlen are dropped (callers size rowlen from the count scan).
    """
    w = bytes_u8.shape[-1]
    ln_row = row_lengths(bytes_u8)                        # [C, B]
    pos = jnp.arange(w, dtype=jnp.int32)
    in_row = pos < ln_row[..., None]                      # [C, B, W]
    isd = (bytes_u8 == delim[:, None, None]) & in_row     # [C, B, W]
    # piece index of each byte = number of delimiters strictly before it
    pid = jnp.cumsum(isd.astype(jnp.int32), axis=-1) - isd.astype(jnp.int32)
    npieces = jnp.where(
        ln_row > 0, jnp.sum(isd.astype(jnp.int32), axis=-1) + 1, 0
    )                                                     # [C, B]
    # piece j starts at (position of j-th delimiter) + 1; piece 0 at 0.
    # one-hot over delimiter ordinals: delim at byte w with ordinal k
    # (k = pid value AT the delimiter position, since the delimiter
    # belongs to the piece before it... its pid counts delimiters before
    # it, so the j-th delimiter (0-based) has pid == j).
    slots = jnp.arange(rowlen, dtype=jnp.int32)
    # start[j] for j>=1: sum over w of (w+1) where isd and pid == j-1
    sel = isd[..., None, :] & (
        pid[..., None, :] == (slots[:, None] - 1)
    )                                                     # [C,B,L,W]
    start = jnp.sum(
        jnp.where(sel, pos[None, :] + 1, 0), axis=-1
    )                                                     # [C,B,L]
    start = jnp.where(slots == 0, 0, start)
    # end[j] = start[j+1] - 1 for pieces before the last; last ends at
    # ln_row.  Equivalently: end[j] = position of j-th delimiter, or
    # ln_row for the final piece.
    endsel = isd[..., None, :] & (pid[..., None, :] == slots[:, None])
    end = jnp.sum(jnp.where(endsel, pos[None, :], 0), axis=-1)
    is_last = slots[None, None, :] == (npieces[..., None] - 1)
    end = jnp.where(is_last, ln_row[..., None], end)
    valid = slots[None, None, :] < npieces[..., None]
    off = jnp.where(valid, start, 0).astype(jnp.int32)
    plen = jnp.where(valid, end - start, 0).astype(jnp.int32)
    return off, plen, npieces


def split_hash_ids(
    bytes_u8: jnp.ndarray,
    delim: jnp.ndarray,
    num_buckets: jnp.ndarray,
    rowlen: int,
    max_len: int = 64,
) -> jnp.ndarray:
    """Device analogue of native rt_split_hash_multi_out: delimited
    [C, B, W] rows -> [C, B, rowlen] int32 ids, -1 padded.  Bit-exact vs
    the host path for pieces up to ``max_len`` bytes."""
    off, plen, npieces = split_pieces(bytes_u8, delim, rowlen)
    h = farmhash64_pieces(bytes_u8, off, plen, max_len=max_len)
    ids = mod_buckets(h, num_buckets[:, None, None])
    slots = jnp.arange(rowlen, dtype=jnp.int32)
    valid = slots[None, None, :] < npieces[..., None]
    return jnp.where(valid, ids, jnp.int32(-1))
