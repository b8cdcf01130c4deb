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

        vals = values.tolist() if isinstance(values, np.ndarray) else values
        return hash_bucket_fast(
            [v.decode() if isinstance(v, bytes) else v for v in vals],
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
