"""NumPy-facing wrappers over the native host library, with pure-Python
fallbacks (semantics defined by oracle/hashing.py; equality cross-checked in
tests/test_hashing.py)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from recom_tpu.native.build import get_lib


def _as_fixed_bytes(values) -> np.ndarray:
    """Coerce str/bytes inputs to a contiguous numpy 'S<w>' array."""
    arr = np.asarray(values)
    if arr.dtype.kind == "U":
        arr = arr.astype("S")  # UTF-8 encode? numpy U->S is ASCII-only
    if arr.dtype.kind != "S":
        raise TypeError(f"expected string array, got {arr.dtype}")
    return np.ascontiguousarray(arr)


def _encode_varlen(values: Sequence[Union[str, bytes]]):
    bufs = [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values]
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    return b"".join(bufs), offsets


def hash_strings(values, num_buckets: int) -> np.ndarray:
    """FarmHash Fingerprint64 % num_buckets over a batch of strings.

    Accepts a numpy 'S'/'U' array (fast fixed-width path, no Python loop) or
    any sequence of str/bytes (concatenated-buffer path)."""
    lib = get_lib()
    if lib is None:
        from recom_tpu.oracle.hashing import hash_bucket_fast

        if isinstance(values, np.ndarray):
            # ravel first: .tolist() on a 2-D array yields nested lists
            # the per-element decode below would choke on (the native
            # path handles N-D via ravel+reshape — match it)
            flat = values.ravel().tolist()
            out = hash_bucket_fast(
                [v.decode() if isinstance(v, bytes) else v for v in flat],
                num_buckets,
            )
            return np.asarray(out).reshape(values.shape)
        return hash_bucket_fast(
            [v.decode() if isinstance(v, bytes) else v for v in values],
            num_buckets,
        )

    out_shape = None
    if isinstance(values, np.ndarray) and values.dtype.kind in ("S", "U"):
        # ASCII fast path; non-ASCII U arrays need per-element encoding
        if values.dtype.kind == "U":
            try:
                arr = _as_fixed_bytes(values)
            except UnicodeEncodeError:
                arr = None
        else:
            arr = _as_fixed_bytes(values)
        if arr is not None:
            out = np.empty(arr.size, dtype=np.int64)
            if arr.size:
                lib.rt_hash_fixed_batch(
                    arr.ctypes.data, arr.dtype.itemsize, arr.size,
                    num_buckets, out.ctypes.data,
                )
            return out.reshape(arr.shape)
        out_shape = values.shape
        values = values.ravel().tolist()

    buf, offsets = _encode_varlen(values)
    n = len(offsets) - 1
    out = np.empty(n, dtype=np.int64)
    if n:
        bufarr = np.frombuffer(buf, dtype=np.uint8)
        lib.rt_hash_bytes_batch(
            bufarr.ctypes.data if n else 0, offsets.ctypes.data, n,
            num_buckets, out.ctypes.data,
        )
    return out.reshape(out_shape) if out_shape else out


def hash_ints(values, num_buckets: int) -> np.ndarray:
    """Hash int64 values via their decimal-string form (TF semantics)."""
    arr = np.ascontiguousarray(np.asarray(values, dtype=np.int64))
    lib = get_lib()
    if lib is None:
        from recom_tpu.oracle.hashing import hash_bucket_fast

        return hash_bucket_fast(arr.ravel().tolist(), num_buckets).reshape(
            arr.shape
        )
    out = np.empty(arr.size, dtype=np.int64)
    if arr.size:
        lib.rt_hash_int_batch(
            arr.ctypes.data, arr.size, num_buckets, out.ctypes.data
        )
    return out.reshape(arr.shape)


def split_hash_padded(
    values: np.ndarray, delimiter: str, num_buckets: int, rowlen: int
) -> Tuple[np.ndarray, int]:
    """Split fixed-width strings by ``delimiter``, hash each piece, return
    ([n, rowlen] int32 ids padded with -1, max pieces seen).

    This is the one-call host path for the reference's delimited sparse
    string features (tf.strings.split(';') -> hash_bucket, dlrm.py:88-104).
    """
    arr = _as_fixed_bytes(values)
    d = delimiter.encode()
    assert len(d) == 1, "single-byte delimiter only"
    lib = get_lib()
    if lib is None:
        from recom_tpu.oracle.hashing import hash_bucket_fast

        out = np.full((arr.size, rowlen), -1, dtype=np.int32)
        maxp = 0
        for i, raw in enumerate(arr.ravel()):
            s = raw.decode()
            if not s:
                continue
            parts = s.split(delimiter)
            maxp = max(maxp, len(parts))
            ids = hash_bucket_fast(parts[:rowlen], num_buckets)
            out[i, : len(ids)] = ids
        return out, maxp
    out = np.empty((arr.size, rowlen), dtype=np.int32)
    maxp = lib.rt_split_hash_pad(
        arr.ctypes.data, arr.dtype.itemsize, arr.size, d[0], num_buckets,
        rowlen, out.ctypes.data,
    )
    return out, int(maxp)


def _ptr_array(arrays: List[np.ndarray]) -> np.ndarray:
    return np.asarray([a.ctypes.data for a in arrays], dtype=np.int64)


def hash_int_multi(
    arrays: List[np.ndarray], buckets: Sequence[int]
) -> Optional[np.ndarray]:
    """Hash several int64 columns in ONE native call.

    arrays: per-column [batch] arrays (equal lengths).  Returns
    [n_cols, batch] int32, or None when the native lib is unavailable
    (callers fall back to the per-column path)."""
    lib = get_lib()
    if lib is None or not arrays:
        return None
    cols = [
        np.ascontiguousarray(np.asarray(a, dtype=np.int64)) for a in arrays
    ]
    batch = cols[0].shape[0]
    out = np.empty((len(cols), batch), dtype=np.int32)
    # keep pointer/param arrays alive across the foreign call
    ptrs, bkts = _ptr_array(cols), np.asarray(buckets, np.int64)
    lib.rt_hash_int_multi(
        ptrs.ctypes.data, bkts.ctypes.data, len(cols), batch, out.ctypes.data,
    )
    return out


def hash_fixed_multi(
    arrays: List[np.ndarray], buckets: Sequence[int]
) -> Optional[np.ndarray]:
    """Hash several fixed-width ('S<w>') string columns in one call.
    Returns [n_cols, batch] int32 or None (native lib missing)."""
    lib = get_lib()
    if lib is None or not arrays:
        return None
    batch = arrays[0].shape[0]
    out = np.empty((len(arrays), batch), dtype=np.int32)
    ptrs = _ptr_array(arrays)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    bkts = np.asarray(buckets, np.int64)
    lib.rt_hash_fixed_multi(
        ptrs.ctypes.data, widths.ctypes.data, bkts.ctypes.data,
        len(arrays), batch, out.ctypes.data,
    )
    return out


def split_count_multi(
    arrays: List[np.ndarray], delims: Sequence[bytes]
) -> Optional[int]:
    lib = get_lib()
    if lib is None or not arrays:
        return None
    ptrs = _ptr_array(arrays)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    dl = np.asarray([d[0] for d in delims], np.uint8)
    return int(
        lib.rt_split_count_multi(
            ptrs.ctypes.data, widths.ctypes.data, dl.ctypes.data,
            len(arrays), arrays[0].shape[0],
        )
    )


def split_scan_multi(
    arrays: List[np.ndarray], delims: Sequence[bytes]
) -> Optional[Tuple[int, int]]:
    """(max piece count, max piece byte length) over several delimited
    columns in one pass — sizes the rowlen bucket AND gates device-side
    hashing (pieces past the device kernel's 64-byte cap route the group
    to host hashing for the request).  The length is EXACT above 62 bytes
    and may underreport below (the AVX-512 scan only measures runs that
    touch a 64B-chunk boundary) — gate-safe for any cap >= 62: reported
    <= cap still implies true max <= cap.  None when the native lib is
    missing (callers fall back to the pure count + conservative length)."""
    lib = get_lib()
    if lib is None or not arrays:
        return None
    ptrs = _ptr_array(arrays)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    dl = np.asarray([d[0] for d in delims], np.uint8)
    ml = np.zeros(1, np.int64)
    mp = int(
        lib.rt_split_scan_multi(
            ptrs.ctypes.data, widths.ctypes.data, dl.ctypes.data,
            len(arrays), arrays[0].shape[0], ml.ctypes.data,
        )
    )
    return mp, int(ml[0])


def split_hash_multi(
    arrays: List[np.ndarray],
    delims: Sequence[bytes],
    buckets: Sequence[int],
    rowlen: int,
) -> Optional[Tuple[np.ndarray, int]]:
    """Split+hash several delimited columns in one call.  Returns
    ([n_cols, batch, rowlen] int32, max pieces seen) or None.  The max
    piece count lets callers hash directly at a CACHED rowlen bucket and
    detect after the fact whether it sufficed (steady-state serving skips
    the separate counting scan entirely)."""
    lib = get_lib()
    if lib is None or not arrays:
        return None
    batch = arrays[0].shape[0]
    _check_rows(arrays, batch)
    out = np.empty((len(arrays), batch, rowlen), dtype=np.int32)
    ptrs = _ptr_array(arrays)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    dl = np.asarray([d[0] for d in delims], np.uint8)
    bkts = np.asarray(buckets, np.int64)
    maxp = lib.rt_split_hash_multi(
        ptrs.ctypes.data, widths.ctypes.data, dl.ctypes.data,
        bkts.ctypes.data, len(arrays), batch, rowlen, out.ctypes.data,
    )
    return out, int(maxp)


# ---------------------------------------------------------------------------
# Direct-write ("wire") variants: one strided native call per column CLASS,
# writing straight into the packed blob (the reference's ConcatInputs
# staging, concat_inputs_ops.cc:42-77).  `out` is a [n_cols, ...] numpy view
# of the blob (int8/int16/int32); column c lands at row c.  Input pointers
# come from the CPython buffer helper when available (rt_ptrs_from_buffers,
# ~100ns/column incl. dtype validation) with a coercing ctypes fallback.
# All have pure-NumPy fallbacks when the native library is missing.

_PTR_ANY, _PTR_F32, _PTR_I64 = 0, 1, 2


def _check_rows(arrays: List, batch: int) -> None:
    """Every per-column feed must carry >= batch rows: the native kernels
    read batch elements per column, and the _PTR_ANY (string) mode has no
    uniform min_bytes to enforce it (per-column S-widths differ) — a
    short feed would read past the allocation."""
    for i, a in enumerate(arrays):
        if a.shape[0] < batch:
            raise ValueError(
                f"column {i}: {a.shape[0]} rows for batch {batch} — "
                "every feed must carry at least batch rows"
            )


def _fast_ptrs(items: List, mode: int, min_bytes: int) -> Optional[np.ndarray]:
    from recom_tpu.native.build import get_pylib

    plib = get_pylib()
    if plib is None or not isinstance(items, list):
        return None
    out = np.empty(len(items), np.int64)
    rc = plib.rt_ptrs_from_buffers(
        items, len(items), mode, min_bytes, out.ctypes.data
    )
    return out if rc == 0 else None


def _in_ptrs(
    arrays: List, mode: int, dtype, batch: int
) -> Tuple[np.ndarray, List]:
    """(pointer array, keep-alive list).  Optimistic zero-copy through the
    buffer helper; coerce + ctypes when any array fails validation.  The
    coercing fallback must re-check LENGTH: the native kernels read
    ``batch`` elements per column, and a short feed (caller sent fewer
    rows for one field than the batch-size field implies) would read out
    of bounds — raise the shape error the fast path's min_bytes check
    enforces instead."""
    itemsize = np.dtype(dtype).itemsize
    ptrs = _fast_ptrs(arrays, mode, batch * itemsize)
    if ptrs is not None:
        return ptrs, arrays
    cols = [np.ascontiguousarray(a, dtype=dtype) for a in arrays]
    for i, c in enumerate(cols):
        if c.nbytes < batch * itemsize:
            raise ValueError(
                f"column {i}: {c.shape[0] if c.ndim else 0} rows "
                f"({c.nbytes} bytes) for batch {batch} — every feed must "
                "carry at least batch rows"
            )
    return _ptr_array(cols), cols


def ceil32(bounds64: np.ndarray) -> np.ndarray:
    """Smallest float32 >= each float64 boundary.  For f32 inputs x
    (exact in f64):  b <= float64(x)  <=>  ceil32(b) <= x  — so f32
    comparisons against ceil32 boundaries reproduce the oracle's float64
    upper_bound EXACTLY (the native bucketize kernel relies on this)."""
    b32 = np.asarray(bounds64, np.float64).astype(np.float32)
    low = b32.astype(np.float64) < bounds64
    b32[low] = np.nextafter(b32[low], np.float32(np.inf))
    return b32


def bucketize_multi(
    arrays: List[np.ndarray],
    bounds32: np.ndarray,
    counts: np.ndarray,
    inv_ds: np.ndarray,
    affine: np.ndarray,
    lut_ptrs: Optional[np.ndarray],
    luts: Optional[List[Optional[np.ndarray]]],
    out: np.ndarray,
    batch: int,
    steps: Optional[np.ndarray] = None,
) -> None:
    """TF Bucketize (+ optional fused post-bucketize LUT) for a column
    group, written into out[:, :batch] (out: [n_cols, Bp] int view).

    arrays: per-column [>=batch] float32; bounds32: [n, kmax] ceil32
    boundaries padded +inf (kmax a power of two, kmax >= max(counts)+1);
    counts: [n] int32; inv_ds/affine: affine index-guess slope + validity
    flag per column (see host_ops.cc rt_bucketize_multi); lut_ptrs:
    prebuilt int64 pointer array over `luts` (plan-static) or None.
    Semantics = oracle float64 upper_bound (NaN -> count), then lut[id]."""
    lib = get_lib()
    if lib is None:
        for c, x in enumerate(arrays):
            k = int(counts[c])
            # ceil32 boundaries make the f32 searchsorted exactly equal to
            # the oracle's f64 upper_bound (see ceil32 docstring)
            ids = np.searchsorted(
                bounds32[c, :k],
                np.ascontiguousarray(x[:batch], np.float32),
                side="right",
            )
            if luts is not None and luts[c] is not None:
                ids = luts[c][ids]
            out[c, :batch] = ids.astype(out.dtype)
        return
    ptrs, keep = _in_ptrs(arrays, _PTR_F32, np.float32, batch)
    lib.rt_bucketize_multi(
        ptrs.ctypes.data, bounds32.ctypes.data, bounds32.shape[1],
        counts.ctypes.data, inv_ds.ctypes.data,
        steps.ctypes.data if steps is not None else 0,
        affine.ctypes.data,
        lut_ptrs.ctypes.data if lut_ptrs is not None else 0,
        len(arrays), batch, out.ctypes.data,
        out.strides[0] // out.itemsize, out.itemsize,
    )


def hash_int_multi_out(
    arrays: List[np.ndarray],
    buckets: np.ndarray,
    out: np.ndarray,
    batch: int,
    lut_ptrs: Optional[np.ndarray] = None,
    luts: Optional[List[np.ndarray]] = None,
    lut_size: int = 0,
) -> None:
    """Hash int64 columns into out[:, :batch] (out: [n_cols, Bp(, 1)] int
    view); input -1 -> id -1 (TF ignore_value).

    lut_ptrs/luts: optional plan-static per-column id tables for values
    [0, lut_size) — TF's int hash is hash(str(v)), a pure function of v,
    so common small ids skip the format+hash entirely.  ``luts`` is the
    keep-alive list backing ``lut_ptrs``."""
    lib = get_lib()
    if lib is None:
        for c, a in enumerate(arrays):
            v = np.asarray(a[:batch], np.int64)
            ids = hash_ints(v, int(buckets[c]))
            out[c, :batch] = np.where(v == -1, -1, ids).reshape(
                out[c, :batch].shape
            ).astype(out.dtype)
        return
    ptrs, keep = _in_ptrs(arrays, _PTR_I64, np.int64, batch)
    lib.rt_hash_int_multi_out(
        ptrs.ctypes.data, buckets.ctypes.data,
        lut_ptrs.ctypes.data if lut_ptrs is not None else 0,
        lut_size, len(arrays), batch,
        out.ctypes.data, out.strides[0] // out.itemsize, out.itemsize,
    )


def hash_fixed_multi_out(
    arrays: List[np.ndarray],
    buckets: np.ndarray,
    out: np.ndarray,
    batch: int,
) -> None:
    """Hash fixed-width 'S' string columns into out[:, :batch]."""
    lib = get_lib()
    if lib is None:
        for c, a in enumerate(arrays):
            out[c, :batch] = hash_strings(a[:batch], int(buckets[c])).reshape(
                out[c, :batch].shape
            ).astype(out.dtype)
        return
    _check_rows(arrays, batch)
    ptrs, keep = _in_ptrs(arrays, _PTR_ANY, None, 0)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    lib.rt_hash_fixed_multi_out(
        ptrs.ctypes.data, widths.ctypes.data, buckets.ctypes.data,
        len(arrays), batch, out.ctypes.data,
        out.strides[0] // out.itemsize, out.itemsize,
    )


def split_hash_multi_out(
    arrays: List[np.ndarray],
    delims: np.ndarray,
    buckets: np.ndarray,
    rowlen: int,
    out: np.ndarray,
    batch: int,
) -> int:
    """Split+hash delimited 'S' columns into out[:, :batch, :] (out:
    [n_cols, Bp, rowlen] int view, -1 pad); returns max piece count."""
    lib = get_lib()
    if lib is None:
        maxp = 0
        for c, a in enumerate(arrays):
            packed, mp = split_hash_padded(
                a[:batch], delims[c:c + 1].tobytes().decode(),
                int(buckets[c]), rowlen,
            )
            out[c, :batch] = packed.astype(out.dtype)
            maxp = max(maxp, mp)
        return maxp
    _check_rows(arrays, batch)
    ptrs, keep = _in_ptrs(arrays, _PTR_ANY, None, 0)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    return int(
        lib.rt_split_hash_multi_out(
            ptrs.ctypes.data, widths.ctypes.data, delims.ctypes.data,
            buckets.ctypes.data, len(arrays), batch, rowlen,
            out.ctypes.data, out.strides[0] // out.itemsize, out.itemsize,
        )
    )


def copy_f32_multi(
    arrays: List[np.ndarray], out: np.ndarray, batch: int
) -> None:
    """Stage float32 columns into out[:, :batch] (out: [n_cols, Bp] f32
    view) — one native memcpy sweep instead of a Python fill loop."""
    lib = get_lib()
    ptrs = None
    if lib is not None:
        ptrs = _fast_ptrs(arrays, _PTR_F32, batch * 4)
    if ptrs is None:
        for c, a in enumerate(arrays):
            out[c, :batch] = np.asarray(a, np.float32)[:batch]
        return
    lib.rt_copy_f32_multi(
        ptrs.ctypes.data, len(arrays), batch, out.ctypes.data,
        out.strides[0] // 4,
    )


def copy_bytes_multi(
    arrays: List[np.ndarray], out: np.ndarray, batch: int
) -> bool:
    """Stage 'S'-layout string columns into out[:, :batch, :itemsize]
    (out: [n_cols, Bp, W] u8 view) in one native call.  Returns False when
    the native lib is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None or not arrays:
        return False
    _check_rows(arrays, batch)
    ptrs, keep = _in_ptrs(arrays, _PTR_ANY, None, 0)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    lib.rt_copy_bytes_multi(
        ptrs.ctypes.data, widths.ctypes.data, len(arrays), batch,
        out.ctypes.data, out.shape[1], out.shape[2],
    )
    return True


def copy_verbatim_multi(
    arrays: List[np.ndarray], out2d: np.ndarray, batch: int
) -> bool:
    """Verbatim staging: column c's 'S' buffer copies byte-for-byte into
    out2d[c] (a [n_cols, stride] u8 view, stride >= batch*itemsize) and
    the slack past batch*itemsize is ZEROED — safe over an np.empty blob.
    One native call for the class.  Returns False when the native lib is
    unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None or not arrays:
        return False
    _check_rows(arrays, batch)
    ptrs, keep = _in_ptrs(arrays, _PTR_ANY, None, 0)
    widths = np.asarray([a.dtype.itemsize for a in arrays], np.int64)
    lib.rt_copy_verbatim_multi(
        ptrs.ctypes.data, widths.ctypes.data, len(arrays), batch,
        out2d.ctypes.data, out2d.shape[1],
    )
    return True


def split_count_max(values: np.ndarray, delimiter: str) -> int:
    arr = _as_fixed_bytes(values)
    d = delimiter.encode()
    lib = get_lib()
    if lib is None:
        m = 0
        for raw in arr.ravel():
            s = raw.decode()
            if s:
                m = max(m, s.count(delimiter) + 1)
        return m
    return int(
        lib.rt_split_count_max(
            arr.ctypes.data, arr.dtype.itemsize, arr.size, d[0]
        )
    )


def parse_criteo(
    data: bytes, max_lines: Optional[int] = None
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]]:
    """Parse up to ``max_lines`` complete Criteo-TSV lines from ``data``
    (default: every complete line — counted by newline scan).

    Returns (labels [n] f32, dense [13, n] f32 raw values, cats [26, n]
    int64, n, consumed_bytes) — a trailing line without '\\n' is left
    unconsumed for the caller to carry into the next chunk.  None when the
    native library is unavailable (callers keep the Python line loop)."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    if max_lines is None:
        max_lines = data.count(b"\n")
    cap = max(1, int(max_lines))
    labels = np.empty(cap, np.float32)
    dense = np.empty((13, cap), np.float32)
    cats = np.empty((26, cap), np.int64)
    consumed = np.zeros(1, np.int64)
    n = int(
        lib.rt_parse_criteo(
            buf.ctypes.data if buf.size else 0, buf.size, cap,
            cap, labels.ctypes.data, dense.ctypes.data, cats.ctypes.data,
            consumed.ctypes.data,
        )
    )
    return labels[:n], dense[:, :n], cats[:, :n], n, int(consumed[0])
