"""JIT build + cache for the native host-ops library.

The reference compiles generated CUDA with `nvcc --shared -O3`, keys the
artifact by source MD5, and dlopens it (cuda_emitter.cc:86-116).  We apply
the same pattern to the host library: g++ -O3 -shared, artifact cached in
RECOM_TPU_CACHE_DIR keyed by source hash, loaded via ctypes.  A build/load
failure degrades to the pure-Python hash path (the reference's
graceful-degradation contract) with a one-time warning.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "host_ops.cc")
_PY_SRC = os.path.join(os.path.dirname(__file__), "py_helpers.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False
_pylib: Optional[ctypes.PyDLL] = None
_pyfailed = False


def _cache_dir() -> str:
    return os.environ.get(
        "RECOM_TPU_CACHE_DIR", os.path.expanduser("~/.cache/recom_tpu")
    )


def _host_fingerprint() -> bytes:
    """-march=native binaries are CPU-specific: key the cache on the host's
    ISA so a shared/NFS cache dir never serves SIGILL-inducing builds."""
    import platform

    parts = [platform.machine().encode()]
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags") or line.startswith(b"Features"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return b"|".join(parts)


def _build_one(
    src_path: str, stem: str, extra_flags=(), verbose: bool = False
) -> str:
    with open(src_path, "rb") as f:
        src = f.read()
    key = hashlib.md5(src + _host_fingerprint()).hexdigest()[:16]
    out_dir = _cache_dir()
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, f"{stem}_{key}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        # no FMA contraction: the bucketize affine-guess validation is
        # performed in numpy's two-rounding arithmetic; a fused
        # (v-b0)*inv_d+1.0f could differ by 1 ulp and break the proven
        # error<=1 bound the branchless fix-up relies on
        "-ffp-contract=off",
        "-pthread", *extra_flags, src_path, "-o", tmp,
    ]
    if verbose:
        print("[recom_tpu.native]", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    os.replace(tmp, so_path)  # atomic: safe under concurrent builds
    return so_path


def build_lib(verbose: bool = False) -> str:
    return _build_one(_SRC, "libhostops", verbose=verbose)


def build_pylib(verbose: bool = False) -> str:
    """CPython-API helpers (py_helpers.cc); needs Python headers.  Symbols
    like PyObject_GetBuffer resolve from the running interpreter at load."""
    import sysconfig

    inc = sysconfig.get_paths()["include"]
    return _build_one(
        _PY_SRC, "libpyhelpers", extra_flags=(f"-I{inc}",), verbose=verbose
    )


def _declare(lib: ctypes.CDLL):
    c = ctypes
    lib.rt_farmhash64.restype = c.c_uint64
    lib.rt_farmhash64.argtypes = [c.c_char_p, c.c_int64]
    lib.rt_hash_bytes_batch.restype = None
    lib.rt_hash_bytes_batch.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p
    ]
    lib.rt_hash_fixed_batch.restype = None
    lib.rt_hash_fixed_batch.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_int64, c.c_void_p
    ]
    lib.rt_hash_int_batch.restype = None
    lib.rt_hash_int_batch.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_void_p
    ]
    lib.rt_split_count_max.restype = c.c_int64
    lib.rt_split_count_max.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_uint8
    ]
    lib.rt_split_hash_pad.restype = c.c_int64
    lib.rt_split_hash_pad.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_uint8, c.c_int64, c.c_int64,
        c.c_void_p,
    ]
    lib.rt_hash_int_multi.restype = None
    lib.rt_hash_int_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p
    ]
    lib.rt_hash_fixed_multi.restype = None
    lib.rt_hash_fixed_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p
    ]
    lib.rt_split_count_multi.restype = c.c_int64
    lib.rt_split_count_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64
    ]
    lib.rt_split_scan_multi.restype = c.c_int64
    lib.rt_split_scan_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p
    ]
    lib.rt_split_hash_multi.restype = c.c_int64
    lib.rt_split_hash_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64,
        c.c_int64, c.c_int64, c.c_void_p,
    ]
    lib.rt_bucketize_multi.restype = None
    lib.rt_bucketize_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
        c.c_void_p, c.c_int64, c.c_int64,
    ]
    lib.rt_hash_int_multi_out.restype = None
    lib.rt_hash_int_multi_out.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
        c.c_int64, c.c_void_p, c.c_int64, c.c_int64,
    ]
    lib.rt_hash_fixed_multi_out.restype = None
    lib.rt_hash_fixed_multi_out.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64, c.c_int64,
        c.c_void_p, c.c_int64, c.c_int64,
    ]
    lib.rt_split_hash_multi_out.restype = c.c_int64
    lib.rt_split_hash_multi_out.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int64,
        c.c_int64, c.c_int64, c.c_void_p, c.c_int64, c.c_int64,
    ]
    lib.rt_copy_f32_multi.restype = None
    lib.rt_copy_f32_multi.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_void_p, c.c_int64
    ]
    lib.rt_copy_bytes_multi.restype = None
    lib.rt_copy_bytes_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p,
        c.c_int64, c.c_int64,
    ]
    lib.rt_copy_verbatim_multi.restype = None
    lib.rt_copy_verbatim_multi.argtypes = [
        c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p,
        c.c_int64,
    ]
    lib.rt_parse_criteo.restype = c.c_int64
    lib.rt_parse_criteo.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_int64, c.c_void_p,
        c.c_void_p, c.c_void_p, c.c_void_p,
    ]


def get_pylib() -> Optional[ctypes.PyDLL]:
    """CPython-API helper library (PyDLL: calls run WITH the GIL held);
    None when Python headers/toolchain are unavailable."""
    global _pylib, _pyfailed
    if _pylib is not None or _pyfailed:
        return _pylib
    with _lock:
        if _pylib is not None or _pyfailed:
            return _pylib
        try:
            path = build_pylib()
            lib = ctypes.PyDLL(path)
            lib.rt_ptrs_from_buffers.restype = ctypes.c_int64
            lib.rt_ptrs_from_buffers.argtypes = [
                ctypes.py_object, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            _pylib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            _pyfailed = True
            print(
                f"[recom_tpu.native] py-helper build failed ({e}); "
                "using ctypes pointer extraction",
                file=sys.stderr,
            )
    return _pylib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if the
    toolchain is unavailable (callers fall back to pure Python)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            path = build_lib()
            lib = ctypes.CDLL(path)
            _declare(lib)
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            _failed = True
            print(
                f"[recom_tpu.native] build/load failed ({e}); "
                "falling back to pure-Python host ops",
                file=sys.stderr,
            )
    return _lib


def native_available() -> bool:
    return get_lib() is not None
