"""Single-blob wire staging: host prep -> ONE packed uint8 array -> device.

The TPU analogue of the reference's ConcatInputs op (concat_inputs_ops.cc:
42-77), which packs every host-side FC input into one byte blob + offsets so
the whole step crosses PCIe as a single H2D copy.  Here the same idea kills
the dominant serving cost on remote-attached TPUs: per-ARRAY transfer RPCs.
A prepared model-E batch is ~12 separate arrays; under tunnel congestion
each array pays a round-trip, so the step cost is ~12x the RPC latency.
Packing into one blob makes it exactly 1x, and narrow id dtypes (int8/int16
chosen from each group's compile-time id range) cut the bytes ~2.3x on top.

Layout is a pure function of (CompiledModel, batch_bucket, rowlen_buckets) —
the same shape signature that keys the jit cache — so the device program
unpacks the blob with static slices + bitcasts that XLA fuses into the first
consumers (measured ~0.02ms for a 1.2MB blob: free).

Views per group, in blob order (8-byte aligned each):
  dense     f32 [n_dense, Bp]
  weights   f32 [C_host, Bp, L]        (ragged groups with weights)
  raw_bz    f32 [n_bz, Bp]             (host_bucketize=False only)
  bz_ids    i8/i16/i32 [n_bz, Bp]      (host_bucketize=True: host-side
                                        native bucketize + fused LUT)
  str_w     i32 [n_str]                (device_hash: per-column itemsize)
  str_raw   u8 [n_str, Bp*W]           (device_hash: verbatim 'S' buffers)
  split_w   i32 [n_fast]               (device_hash, delimited class)
  split_raw u8 [n_fast, Bp*W]
  host_ids  i8/i16/i32 [C_host, Bp, L]

Bit-exactness: the host bucketize (native/host_ops.cc rt_bucketize_multi)
implements the oracle's float64 upper_bound semantics, and id dtypes are
chosen so every id the compiler's range analysis admits fits losslessly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from recom_tpu.compiler.buckets import pick_bucket
from recom_tpu.compiler.lowering import CompiledModel, LookupGroup
from recom_tpu.ir.spec import Combiner
from recom_tpu.oracle.reference import softmax_scores
from recom_tpu.runtime.host_prep import (
    PreparedBatch,
    _is_string_array,
    host_ids_for_member,
)


def _id_dtype(lo: int, hi: int) -> np.dtype:
    """Smallest signed integer dtype holding [lo, hi] (and the -1 pad)."""
    lo = min(lo, -1)
    if lo >= -128 and hi <= 127:
        return np.dtype(np.int8)
    if lo >= -32768 and hi <= 32767:
        return np.dtype(np.int16)
    return np.dtype(np.int32)


def _group_dtypes(g: LookupGroup) -> Tuple[np.dtype, np.dtype]:
    """(bz_ids dtype, host_ids dtype) from compile-time id ranges."""
    bz_hi, bz_lo = 0, -1
    for m in g.members[: g.n_bucketize]:
        if m.device_lut is not None:
            bz_hi = max(bz_hi, int(m.device_lut.max()))
            bz_lo = min(bz_lo, int(m.device_lut.min()))
        else:
            bz_hi = max(bz_hi, len(m.device_bucketize.boundaries))
    host_hi, host_lo = 0, -1
    for m in g.members[g.n_bucketize :]:
        host_hi = max(host_hi, m.vocab_size - 1)
        # chains ending in SelectRange may substitute outside [0, vocab)
        from recom_tpu.ir.spec import SelectRange

        for t in m.host_chain:
            if isinstance(t, SelectRange):
                host_lo = min(host_lo, int(t.substitute))
                host_hi = max(host_hi, int(t.substitute))
    return _id_dtype(bz_lo, bz_hi), _id_dtype(host_lo, host_hi)


@dataclasses.dataclass
class WireView:
    name: str                 # "dense" | "raw_bz" | "bz_ids" | "host_ids"
                              # | "weights"
    gid: int                  # -1 for the model-level dense view
    dtype: np.dtype
    shape: Tuple[int, ...]
    offset: int               # byte offset into the blob
    nbytes: int = 0           # precomputed at layout build (the view list
                              # is per-signature static; recomputing the
                              # prod per request cost ~0.2ms at 1000 cols)

    def __post_init__(self):
        if not self.nbytes:
            n = self.dtype.itemsize
            for s in self.shape:
                n *= s
            self.nbytes = n


@dataclasses.dataclass
class WireLayout:
    views: List[WireView]
    total_bytes: int

    def view_np(self, blob: np.ndarray, v: WireView) -> np.ndarray:
        return (
            blob[v.offset : v.offset + v.nbytes].view(v.dtype).reshape(v.shape)
        )


def wire_layout(
    compiled: CompiledModel,
    bp: int,
    rowlens: Tuple[int, ...],
    host_bucketize: bool,
    wsig: Tuple = (),
) -> WireLayout:
    """Blob layout for one shape signature (cached on the CompiledModel).

    ``wsig``: device-hash variant — per-group (ws, wd) byte-width buckets.
    ws > 0 moves the fixed-string class (host indices [n_int, n_int+n_str))
    out of host_ids into VERBATIM raw views the device hashes itself:
    "str_raw" [n, Bp*ws] carries each column's numpy 'S' buffer byte-for-
    byte (ONE contiguous memcpy per column — no per-row padding on host)
    and "str_w" [n] i32 its actual itemsize; the device re-pads rows to
    the ws bucket with a gather (unpack_blob) before hashing.  wd > 0 does
    the same for the delimited class ([fast_lo, fast_lo+n_fast) ->
    "split_raw"/"split_w").  Remaining host members stay in a SHRUNK
    host_ids view, prefix+suffix concatenated in member order."""
    cache = getattr(compiled, "_wire_cache", None)
    if cache is None:
        cache = {}
        compiled._wire_cache = cache
    key = (bp, tuple(rowlens), host_bucketize, tuple(wsig))
    hit = cache.get(key)
    if hit is not None:
        return hit

    plans = _plan(compiled) if wsig else None
    views: List[WireView] = []
    off = 0

    def add(name, gid, dtype, shape):
        nonlocal off
        off = (off + 7) & ~7
        v = WireView(name, gid, np.dtype(dtype), tuple(shape), off)
        views.append(v)
        off += v.nbytes
        return v

    add("dense", -1, np.float32, (compiled.n_dense, bp))
    for gi, (g, rl) in enumerate(zip(compiled.groups, rowlens)):
        rl = rl if g.ragged else 1
        n_host = len(g.members) - g.n_bucketize
        bz_dt, ids_dt = _group_dtypes(g)
        ws, wd = wsig[gi] if wsig else (0, 0)
        p = plans[gi] if plans is not None else None
        if g.has_weights and g.ragged and n_host:
            add("weights", g.gid, np.float32, (n_host, bp, rl))
        if g.n_bucketize:
            if host_bucketize:
                add("bz_ids", g.gid, bz_dt, (g.n_bucketize, bp))
            else:
                add("raw_bz", g.gid, np.float32, (g.n_bucketize, bp))
        n_rem = n_host
        if ws:
            add("str_w", g.gid, np.int32, (p.n_str,))
            add("str_raw", g.gid, np.uint8, (p.n_str, bp * ws))
            n_rem -= p.n_str
        if wd:
            add("split_w", g.gid, np.int32, (p.n_fast,))
            add("split_raw", g.gid, np.uint8, (p.n_fast, bp * wd))
            n_rem -= p.n_fast
        if n_rem:
            add("host_ids", g.gid, ids_dt, (n_rem, bp, rl))
    layout = WireLayout(views, (off + 7) & ~7)
    cache[key] = layout
    return layout


# ---------------------------------------------------------------------------
# Per-model host-prep plan: everything derivable from the spec alone, built
# once so the per-request loop touches only the data (at 1000 columns the
# per-request isinstance/plan checks were ~3ms of pure Python).
# ---------------------------------------------------------------------------


_INT_LUT_SIZE = 1024

# device-hash staging (config.device_hash): padded byte-width buckets for
# the raw string views.  Each bucket is align4(itemsize + 4) slack so the
# device kernel's unaligned u32 word fetches stay inside the row
# (ops/hash_device.py); a small ladder keeps the jit-signature space
# bounded (same reasoning as the batch/rowlen ladders).
_WIRE_WBUCKETS = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)
_DEVICE_PIECE_CAP = 64      # straight-line FarmHash covers <= 64B pieces


def _wbucket(itemsize: int) -> int:
    """Padded width bucket for an 'S<itemsize>' column class, or 0 when no
    bucket fits (the class falls back to host hashing this request)."""
    need = ((itemsize + 4 + 3) // 4) * 4
    for b in _WIRE_WBUCKETS:
        if b >= need:
            return b
    return 0


def _fill_verbatim(
    w_view: np.ndarray, raw_view: np.ndarray,
    arrs: List[np.ndarray], bs: int,
) -> None:
    """Verbatim column staging: each column's numpy 'S' buffer crosses the
    wire byte-for-byte (ONE contiguous memcpy per column) plus its actual
    itemsize; the device re-pads rows to the bucket width with a gather
    (unpack_blob._verbatim_rows).  This replaces the per-row padded copies
    that made the r04 dev_hash arm a net loss (ARMS_r04: 3.43ms prep vs
    1.62 host — ~51k small strided row copies); a verbatim copy of the
    same bytes is ~25x cheaper at model-E scale.  Slack past bs*itemsize
    is zeroed here (the blob is np.empty — every view defines its own
    bytes); rows past bs then read as empty on device."""
    from recom_tpu.native import ops as native_ops

    for c, a in enumerate(arrs):
        w_view[c] = a.dtype.itemsize
    if native_ops.copy_verbatim_multi(arrs, raw_view, bs):
        return
    for c, a in enumerate(arrs):
        w = a.dtype.itemsize
        n = min(bs, a.shape[0]) * w
        raw_view[c, :n] = a.view(np.uint8).ravel()[:n]
        raw_view[c, n:] = 0


@dataclasses.dataclass
class _GroupPlan:
    gid: int
    ragged: bool
    n_bz: int
    # bucketize members (device order 0..n_bz); plan-static native args
    bz_fields: List[str]
    bz_bounds32: Optional[np.ndarray]      # [n_bz, kmax] ceil32, +inf pad
    bz_counts: Optional[np.ndarray]        # [n_bz] int32
    bz_inv_ds: Optional[np.ndarray]        # [n_bz] f32 affine guess slope
    bz_steps: Optional[np.ndarray]         # [n_bz] f32 exact boundary step
    bz_affine: Optional[np.ndarray]        # [n_bz] uint8 guess-valid flag
    bz_luts: Optional[List[Optional[np.ndarray]]]
    bz_lut_ptrs: Optional[np.ndarray]      # int64 ptr array over bz_luts
    # host members occupy CONTIGUOUS class ranges (lowering._host_class
    # sort order): ints [0, n_int), strs [n_int, n_int+n_str), delimited
    # fast [fast_lo, fast_lo + n_fast) in ragged groups (class-0/1 members
    # forced ragged — e.g. softmax-weighted scalar hashes — sort BEFORE
    # the class-2 run, so fast_lo is NOT always 0), generic chains at the
    # tail.
    n_int: int
    int_fields: List[str]
    int_buckets: Optional[np.ndarray]      # int64
    int_luts: Optional[List[np.ndarray]]   # per-col ids for values [0,1024)
    int_lut_ptrs: Optional[np.ndarray]     # int64 ptr array over int_luts
    n_str: int
    str_fields: List[str]
    str_buckets: Optional[np.ndarray]
    n_fast: int
    fast_lo: int                           # first host index of the run
    fast_fields: List[str]
    fast_delims: List[bytes]
    fast_delims_np: Optional[np.ndarray]   # uint8
    fast_buckets: Optional[np.ndarray]
    rest: List[Tuple[int, object]]         # (host index, GroupMember)
    has_weights: bool


def _build_plan(compiled: CompiledModel) -> List[_GroupPlan]:
    from recom_tpu.compiler.lowering import _host_class

    plans = []
    for g in compiled.groups:
        host_members = g.members[g.n_bucketize :]
        bz_fields = [
            m.column.source.field for m in g.members[: g.n_bucketize]
        ]
        bz_bounds = bz_counts = bz_luts = bz_lut_ptrs = None
        bz_inv_ds = bz_steps = bz_affine = None
        if g.n_bucketize:
            from recom_tpu.native.ops import ceil32

            bz_counts = np.ascontiguousarray(g.boundary_counts, np.int32)
            # pad width: power of two STRICTLY greater than every count
            # (the native branchless search needs >= 1 pad slot, see
            # host_ops.cc rt_bucketize_multi)
            kmax = 1
            while kmax <= int(bz_counts.max()):
                kmax *= 2
            bz_bounds = np.full(
                (g.n_bucketize, kmax), np.inf, dtype=np.float32
            )
            bz_inv_ds = np.zeros(g.n_bucketize, np.float32)
            bz_steps = np.zeros(g.n_bucketize, np.float32)
            bz_affine = np.zeros(g.n_bucketize, np.uint8)
            for i, m in enumerate(g.members[: g.n_bucketize]):
                b64 = np.asarray(m.device_bucketize.boundaries, np.float64)
                b32 = ceil32(b64)
                k = len(b32)
                bz_bounds[i, :k] = b32
                if k < 2 or not np.isfinite(b32[[0, -1]]).all():
                    continue
                span = float(b32[-1]) - float(b32[0])
                if span <= 0:
                    continue
                inv_d = np.float32((k - 1) / span)
                # validate the affine guess at the boundaries and their
                # midpoints (the guess is monotone between probes, so
                # interior error is bounded by probe error + 1):
                #   probe error 0      -> |any input's error| <= 1 -> the
                #                         BRANCHLESS fix-up path (flag 2)
                #   probe error <= 4   -> guess + short fix-up loops (1)
                #   else               -> branchless binary search (0)
                probes = np.concatenate(
                    [b32, (b32[:-1] + b32[1:]) * 0.5]
                ).astype(np.float32)
                truth = np.searchsorted(b32, probes, side="right")
                g32 = (probes - b32[0]) * inv_d + np.float32(1.0)
                guess = np.minimum(g32, np.float32(k)).astype(np.int64)
                err = np.abs(guess - truth).max()
                if err == 0:
                    bz_inv_ds[i] = inv_d
                    bz_affine[i] = 2
                    # flag 3: boundaries proven EXACTLY b0 + j*step in
                    # f32 (uniform integer grids, the model-E shape) —
                    # the kernel then computes both fix-up probe values
                    # with one FMA each, no boundary-array reads.  The
                    # FMA equals RN32(exact j*step + b0); requiring the
                    # f64-computed values to be f32-representable AND
                    # equal to b32 makes that single rounding exact
                    # (an f64 value within 1 ulp64 of an f32-exact
                    # number rounds to it).
                    d64 = (float(b32[-1]) - float(b32[0])) / (k - 1)
                    d32 = np.float32(d64)
                    if np.float64(d32) == d64:
                        vals = (
                            np.float64(b32[0])
                            + np.arange(k, dtype=np.float64) * d64
                        )
                        v32 = vals.astype(np.float32)
                        if (
                            np.all(v32.astype(np.float64) == vals)
                            and np.array_equal(v32, b32)
                        ):
                            bz_steps[i] = d32
                            bz_affine[i] = 3
                elif err <= 4:
                    bz_inv_ds[i] = inv_d
                    bz_affine[i] = 1
            bz_luts = [
                None if m.device_lut is None
                else np.ascontiguousarray(m.device_lut, np.int32)
                for m in g.members[: g.n_bucketize]
            ]
            if any(l is not None for l in bz_luts):
                bz_lut_ptrs = np.asarray(
                    [0 if l is None else l.ctypes.data for l in bz_luts],
                    np.int64,
                )
        classes = [_host_class(m) for m in host_members]
        assert classes == sorted(classes), (
            "lowering must order host members by prep class"
        )
        by_cls: Dict[int, List] = {0: [], 1: [], 2: [], 3: []}
        for i, (m, cls) in enumerate(zip(host_members, classes)):
            by_cls[cls].append((i, m))
        ints = by_cls[0] if not g.ragged else []
        strs = by_cls[1] if not g.ragged else []
        int_luts = None
        if ints:
            # plan-static small-value id tables: TF's int hash is
            # hash(decimal(v)) — a pure function of v — so ids for the
            # common [0, 1024) range precompute once per model
            from recom_tpu.native import ops as _nops

            int_luts = [
                np.ascontiguousarray(
                    _nops.hash_ints(
                        np.arange(_INT_LUT_SIZE, dtype=np.int64),
                        int(m.host_chain[0].num_buckets),
                    ),
                    np.int32,
                )
                for _, m in ints
            ]
        fasts = by_cls[2] if g.ragged else []
        rest = by_cls[3] + (by_cls[0] + by_cls[1] if g.ragged else []) + (
            by_cls[2] if not g.ragged else []
        )
        p = _GroupPlan(
            gid=g.gid, ragged=g.ragged, n_bz=g.n_bucketize,
            bz_fields=bz_fields, bz_bounds32=bz_bounds, bz_counts=bz_counts,
            bz_inv_ds=bz_inv_ds, bz_steps=bz_steps, bz_affine=bz_affine,
            bz_luts=bz_luts, bz_lut_ptrs=bz_lut_ptrs,
            n_int=len(ints),
            int_fields=[m.column.source.field for _, m in ints],
            int_buckets=np.asarray(
                [m.host_chain[0].num_buckets for _, m in ints], np.int64
            ) if ints else None,
            int_luts=int_luts,
            int_lut_ptrs=np.asarray(
                [l.ctypes.data for l in int_luts], np.int64
            ) if int_luts else None,
            n_str=len(strs),
            str_fields=[m.column.source.field for _, m in strs],
            str_buckets=np.asarray(
                [m.host_chain[0].num_buckets for _, m in strs], np.int64
            ) if strs else None,
            n_fast=len(fasts),
            # class-2 members form a contiguous run AFTER any (ragged-
            # forced) class-0/1 members in the sorted host order
            fast_lo=fasts[0][0] if fasts else 0,
            fast_fields=[m.column.source.field for _, m in fasts],
            fast_delims=[
                m.column.source.delimiter.encode() for _, m in fasts
            ],
            fast_delims_np=np.asarray(
                [m.column.source.delimiter.encode()[0] for _, m in fasts],
                np.uint8,
            ) if fasts else None,
            fast_buckets=np.asarray(
                [m.host_chain[0].num_buckets for _, m in fasts], np.int64
            ) if fasts else None,
            rest=rest, has_weights=g.has_weights,
        )
        plans.append(p)
    return plans


def _plan(compiled: CompiledModel) -> List[_GroupPlan]:
    plans = getattr(compiled, "_prep_plan", None)
    if plans is None:
        plans = _build_plan(compiled)
        compiled._prep_plan = plans
        # plan-static model facts the per-request loop must not recompute
        # (dense_columns is a filtering property: ~0.15ms/request at 1000
        # columns).  dense_rows: (field, dim|None) per staged row; the
        # all-scalar flag keeps the common case on the zero-copy path.
        compiled._dense_all_scalar = all(
            j is None for _, j in compiled.dense_rows
        )
    return plans


def _as_s_array(data) -> Optional[np.ndarray]:
    """Contiguous 'S' bytes array, or None when the fast path can't apply."""
    if not _is_string_array(data):
        return None
    arr = np.asarray(data)
    if arr.dtype.kind == "U":
        try:
            arr = arr.astype("S")
        except UnicodeEncodeError:
            return None
    return np.ascontiguousarray(arr)


def prepare_batch_wire(
    compiled: CompiledModel,
    batch: Dict,
    batch_size: Optional[int] = None,
    rowlen_hints: Optional[Dict[int, int]] = None,
    _rowlen_overrides: Optional[Dict[int, int]] = None,
    timers=None,
) -> PreparedBatch:
    """Packed single-blob PreparedBatch (arrays = {"blob": uint8[total]}).

    Mirrors host_prep.prepare_batch semantics exactly (same oracle-shared
    transform code for slow columns, same native fast paths) but writes
    every column straight into its blob view.  ``timers``: optional
    StageTimer; per-class host-prep costs land under "prep.*" stages
    (two clock reads per class — the breakdown VERDICT r02 item 7 asks
    the bench to publish).  Ragged row-length discovery
    keeps the optimistic-hint strategy: hash at the hinted bucket, detect a
    busted hint from the returned max piece count, and redo the (rare)
    mispredicted request with exact rowlens."""
    from recom_tpu.native import ops as native_ops

    model, config = compiled.model, compiled.config
    plans = _plan(compiled)
    host_bz = getattr(config, "host_bucketize", True)

    if batch_size is None:
        for col in model.columns:
            probe = col.source.field
            if probe in batch:
                batch_size = len(batch[probe])
                break
            if col.source.fields:
                batch_size = len(batch[col.source.fields[0]])
                break
        if batch_size is None:
            raise ValueError("cannot infer batch size from batch dict")
    bp = pick_bucket(
        config.batch_buckets, batch_size, config.allow_truncate_overflow
    )
    if batch_size > bp:
        batch_size = bp
    bs = batch_size

    import time as _time

    _marks = {} if timers is not None else None
    _t0 = _time.perf_counter() if timers is not None else 0.0

    def _mark(cls):
        nonlocal _t0
        if _marks is None:
            return
        t = _time.perf_counter()
        _marks[cls] = _marks.get(cls, 0.0) + (t - _t0)
        _t0 = t

    # ---- phase 1: slow-member evaluation + ragged rowlen resolution -----
    dh = bool(getattr(config, "device_hash", False))
    wsig: List[Tuple[int, int]] = []
    str_arrs: Dict[int, List[np.ndarray]] = {}
    memo: Optional[Dict] = {} if config.dedup_subcolumns else None
    slow_sps: Dict[int, List] = {}          # gid -> [(host idx, sp)]
    rowlens: List[int] = []
    optimistic: Dict[int, bool] = {}
    fast_arrs: Dict[int, List[np.ndarray]] = {}
    for p, g in zip(plans, compiled.groups):
        if not p.ragged:
            rowlens.append(1)
            ws = 0
            if dh and p.n_str:
                # fixed-string class -> device hash when every feed is a
                # contiguous 'S' array short enough for the straight-line
                # kernel (row = one piece, so itemsize caps piece length)
                arrs_s = []
                for f in p.str_fields:
                    a = _as_s_array(batch[f])
                    if a is None or a.dtype.itemsize > _DEVICE_PIECE_CAP:
                        arrs_s = None
                        break
                    arrs_s.append(a)
                if arrs_s:
                    ws = _wbucket(max(a.dtype.itemsize for a in arrs_s))
                    if ws:
                        str_arrs[p.gid] = arrs_s
            wsig.append((ws, 0))
            continue
        slow_max = 1
        sps = []
        for i, m in p.rest:
            # evaluated once here, kept for the packing phase
            sp = host_ids_for_member(m, batch, memo)
            if sp.values is not None and len(sp.row_ids):
                c = np.bincount(sp.row_ids, minlength=sp.batch).max()
                slow_max = max(slow_max, int(c))
            sps.append((i, sp))
        arrs = []
        ok = p.n_fast > 0
        for f in p.fast_fields:
            a = _as_s_array(batch[f])
            if a is None:
                ok = False
                break
            arrs.append(a)
        if not ok and p.n_fast:
            # wire-format surprise (e.g. pre-split lists): route the fast
            # members (host indices [fast_lo, fast_lo + n_fast)) through
            # the oracle chain path for this request
            g_members = g.members[p.n_bz :]
            for i in range(p.fast_lo, p.fast_lo + p.n_fast):
                sp = host_ids_for_member(g_members[i], batch, memo)
                if sp.values is not None and len(sp.row_ids):
                    c = np.bincount(sp.row_ids, minlength=sp.batch).max()
                    slow_max = max(slow_max, int(c))
                sps.append((i, sp))
            arrs = []
        slow_sps[p.gid] = sps
        fast_arrs[p.gid] = arrs
        slow_bucket = pick_bucket(
            config.rowlen_buckets, slow_max, config.allow_truncate_overflow
        )
        if dh and arrs and not p.has_weights:
            # device-hash staging: ONE scan yields the exact rowlen (no
            # optimistic-hint redo) AND the max piece length that gates
            # the device kernel.  Weighted groups stay on host (their
            # weights plane derives from host-computed ids).
            scan = native_ops.split_scan_multi(arrs, p.fast_delims)
            if scan is not None:
                maxp, maxl = scan
                rowlens.append(
                    pick_bucket(
                        config.rowlen_buckets, max(slow_max, maxp, 1),
                        config.allow_truncate_overflow,
                    )
                )
                optimistic[p.gid] = False
                wd = 0
                if maxl <= _DEVICE_PIECE_CAP:
                    wd = _wbucket(max(a.dtype.itemsize for a in arrs))
                wsig.append((0, wd))
                continue
        override = (_rowlen_overrides or {}).get(p.gid)
        hint = (rowlen_hints or {}).get(p.gid)
        if override is not None:
            rowlens.append(max(override, slow_bucket))
            optimistic[p.gid] = False
        elif arrs and hint is not None and hint >= slow_bucket:
            rowlens.append(hint)
            optimistic[p.gid] = True
        elif arrs:
            cnt = native_ops.split_count_multi(arrs, p.fast_delims)
            if cnt is None:
                cnt = max(
                    native_ops.split_count_max(a, d.decode())
                    for a, d in zip(arrs, p.fast_delims)
                )
            rowlens.append(
                pick_bucket(
                    config.rowlen_buckets, max(slow_max, int(cnt)),
                    config.allow_truncate_overflow,
                )
            )
            optimistic[p.gid] = False
        else:
            rowlens.append(slow_bucket)
            optimistic[p.gid] = False
        wsig.append((0, 0))

    _mark("prep.rowlen")

    # ---- phase 2: allocate blob, fill views ------------------------------
    wsig_t: Tuple = tuple(wsig) if dh else ()
    layout = wire_layout(compiled, bp, tuple(rowlens), host_bz, wsig_t)
    # np.empty, NOT np.zeros: a full-blob zero fill cost ~0.1ms/request at
    # model-E dev-hash scale and every view defines its own bytes below —
    # fully-written views (bz_ids, host_ids, weights, str_w) need nothing,
    # row-tail views (dense, bz, host_ids past bs) zero/-1 their tails
    # explicitly, and _fill_verbatim zeroes the raw views' slack.
    # Alignment gaps between views are never read by unpack_blob's static
    # slices.
    blob = np.empty(layout.total_bytes, dtype=np.uint8)
    by_key = {(v.gid, v.name): v for v in layout.views}
    _mark("prep.alloc")             # layout compute + blob alloc

    dense_v = layout.view_np(blob, by_key[(-1, "dense")])
    # raw arrays, no pre-coercion: copy_f32_multi's pointer helper
    # validates dtype/contiguity zero-copy and falls back to a coercing
    # fill per column only when needed (pre-coercing here would pay the
    # ascontiguousarray walk TWICE per request)
    if compiled._dense_all_scalar:
        rows = [batch[f] for f, _ in compiled.dense_rows]
    else:
        # width-k vector feeds [B, k]: transpose once per field so each
        # staged row is a contiguous f32 view the native sweep accepts
        rows, _tposed = [], {}
        for f, j in compiled.dense_rows:
            if j is None:
                rows.append(batch[f])
                continue
            t = _tposed.get(f)
            if t is None:
                t = np.ascontiguousarray(
                    np.asarray(batch[f], np.float32).T
                )
                _tposed[f] = t
            rows.append(t[j])
    native_ops.copy_f32_multi(rows, dense_v, bs)
    if bs < bp:
        dense_v[:, bs:] = 0.0           # pad rows (empty blob)
    _mark("prep.dense")

    redo: Dict[int, int] = {}
    for gi, (p, g, rl) in enumerate(zip(plans, compiled.groups, rowlens)):
        ws, wd = wsig_t[gi] if wsig_t else (0, 0)
        truncate = config.allow_truncate_overflow
        if p.n_bz:
            # raw arrays: bucketize_multi/copy_f32_multi validate and
            # coerce only when an array fails the zero-copy pointer check
            cols = [batch[f] for f in p.bz_fields]
            if host_bz:
                out = layout.view_np(blob, by_key[(p.gid, "bz_ids")])
                native_ops.bucketize_multi(
                    cols, p.bz_bounds32, p.bz_counts, p.bz_inv_ds,
                    p.bz_affine, p.bz_lut_ptrs, p.bz_luts, out, bs,
                    steps=p.bz_steps,
                )
                if bs < bp:
                    out[:, bs:] = 0     # pad rows (empty blob)
            else:
                out = layout.view_np(blob, by_key[(p.gid, "raw_bz")])
                native_ops.copy_f32_multi(cols, out, bs)
                if bs < bp:
                    out[:, bs:] = 0.0
            _mark("prep.bz")
        n_host = len(g.members) - p.n_bz
        if not n_host:
            continue
        ids_v = None
        hk = by_key.get((p.gid, "host_ids"))
        if hk is not None:
            ids_v = layout.view_np(blob, hk)
            if bs < bp:
                ids_v[:, bs:] = -1
        if not p.ragged:
            # contiguous class ranges (lowering._host_class sort): ints
            # [0, n_int), strings [n_int, n_int+n_str), generic tail.
            # Under device-hash staging (ws > 0) the string class leaves
            # host_ids for a raw byte view; remaining rows shift: host
            # index i maps to view row i (ints) / i - n_str (rest).
            if p.n_int:
                native_ops.hash_int_multi_out(
                    [batch[f] for f in p.int_fields], p.int_buckets,
                    ids_v[: p.n_int], bs,
                    lut_ptrs=p.int_lut_ptrs, luts=p.int_luts,
                    lut_size=_INT_LUT_SIZE,
                )
                _mark("prep.int")
            str_rest: List[Tuple[int, object]] = []
            if p.n_str and ws:
                _fill_verbatim(
                    layout.view_np(blob, by_key[(p.gid, "str_w")]),
                    layout.view_np(blob, by_key[(p.gid, "str_raw")]),
                    str_arrs[p.gid], bs,
                )
                _mark("prep.strcpy")
            elif p.n_str:
                arrs = []
                for f in p.str_fields:
                    a = _as_s_array(batch[f])
                    if a is None:
                        arrs = None
                        break
                    arrs.append(a)
                if arrs is not None:
                    native_ops.hash_fixed_multi_out(
                        arrs, p.str_buckets,
                        ids_v[p.n_int : p.n_int + p.n_str], bs,
                    )
                    _mark("prep.str")
                else:
                    # wire-format surprise: whole class via oracle chains
                    host_members = g.members[p.n_bz :]
                    str_rest = [
                        (i, host_members[i])
                        for i in range(p.n_int, p.n_int + p.n_str)
                    ]
            for i, m in list(p.rest) + str_rest:
                sp = host_ids_for_member(m, batch, memo)
                row = i - p.n_str if (ws and i >= p.n_int) else i
                _pack_sparse_into(
                    ids_v[row], None, sp, 1, bp, truncate,
                    cap=m.vocab_size - 1,
                )
            if p.rest or str_rest:
                _mark("prep.slow")
        else:
            weights_v = None
            if p.has_weights:
                weights_v = layout.view_np(blob, by_key[(p.gid, "weights")])
            arrs = fast_arrs[p.gid]
            if arrs and wd:
                # device-hash staging: raw rows cross the wire; the device
                # splits + hashes them (unpack_blob -> ops/hash_device)
                _fill_verbatim(
                    layout.view_np(blob, by_key[(p.gid, "split_w")]),
                    layout.view_np(blob, by_key[(p.gid, "split_raw")]),
                    arrs, bs,
                )
                _mark("prep.splitcpy")
            elif arrs:
                # fast delimited members are host indices
                # [fast_lo, fast_lo + n_fast) — ragged-forced class-0/1
                # members sort before them and are packed via p.rest
                maxp = native_ops.split_hash_multi_out(
                    arrs, p.fast_delims_np, p.fast_buckets, rl,
                    ids_v[p.fast_lo : p.fast_lo + p.n_fast], bs,
                )
                _mark("prep.split")
                needed = pick_bucket(
                    config.rowlen_buckets, max(1, maxp), truncate
                )
                if needed > rl and optimistic[p.gid]:
                    redo[p.gid] = needed
                    continue
                # non-optimistic overflow only under truncate (the counted
                # pass sized rl exactly otherwise) — native path truncated
            slow_i = set()
            host_members = g.members[p.n_bz :]
            for i, sp in slow_sps[p.gid]:
                slow_i.add(i)
                w_out = weights_v[i] if weights_v is not None else None
                # under device-hash staging the fast run left host_ids:
                # host index i >= fast_lo + n_fast shifts down by n_fast
                row = i - p.n_fast if (wd and i >= p.fast_lo) else i
                _pack_sparse_into(
                    ids_v[row], w_out, sp, rl, bp, truncate,
                    cap=host_members[i].vocab_size - 1,
                )
            if slow_sps[p.gid]:
                _mark("prep.slow")
            if weights_v is not None:
                # columns packed by the fast path are unweighted by plan
                # construction: weight 1 at every non-pad slot
                for i in range(n_host):
                    if i not in slow_i:
                        weights_v[i] = ids_v[i] >= 0
                for i in range(n_host):
                    if host_members[i].combiner is Combiner.SOFTMAX:
                        # scores -> rowwise masked softmax ON HOST; the
                        # device pools this member as a weighted SUM
                        weights_v[i] = softmax_scores(ids_v[i], weights_v[i])
                _mark("prep.weights")

    if redo:
        if timers is not None:
            # the busted-hint first pass's work was real wall time: flush
            # its marks so the breakdown sums to the request's total (the
            # redo pass adds its own on top)
            for cls, dt in _marks.items():
                timers.add(cls, dt)
        overrides = dict(_rowlen_overrides or {})
        overrides.update(redo)
        return prepare_batch_wire(
            compiled, batch, batch_size, rowlen_hints=None,
            _rowlen_overrides=overrides, timers=timers,
        )

    if timers is not None:
        for cls, dt in _marks.items():
            timers.add(cls, dt)
    return PreparedBatch(
        bs, bp, tuple(rowlens), {"blob": blob}, wsig=wsig_t
    )


def _pack_sparse_into(
    out_ids: np.ndarray,
    out_weights: Optional[np.ndarray],
    sp,
    rowlen: int,
    batch_padded: int,
    truncate: bool,
    cap: Optional[int] = None,
) -> None:
    """host_prep._pack_sparse writing into pre-allocated blob views.

    out_ids: [Bp, L] (any int dtype); out_weights: [Bp, L] f32 or None.
    ``cap``: the member's last valid row — ids above it clamp (the
    serving contract for over-range chains) and anything negative maps
    to -1 (missing).  Mandatory before narrowing to int8/int16: an
    unclamped 735 would WRAP to -33 in int8 and silently change
    semantics."""
    out_ids[:] = -1
    values = np.asarray(sp.values, dtype=np.int64)
    row_ids = sp.row_ids
    keep = None
    pos = None
    if values.size:
        if cap is not None:
            values = np.where(
                values < 0, np.int64(-1), np.minimum(values, cap)
            )
        counts = np.bincount(row_ids, minlength=sp.batch)
        if counts.max() > rowlen and not truncate:
            raise ValueError(
                f"row length {int(counts.max())} exceeds bucket {rowlen}"
            )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(row_ids.shape[0]) - starts[row_ids]
        keep = pos < rowlen
        if truncate:
            keep &= row_ids < batch_padded
        row_ids, pos, values = row_ids[keep], pos[keep], values[keep]
        out_ids[row_ids, pos] = values.astype(out_ids.dtype)
    if out_weights is not None:
        out_weights[:] = 0.0
        if sp.weights is not None:
            if values.size:
                w = np.asarray(sp.weights)[keep]
                out_weights[row_ids, pos] = w
        else:
            out_weights[:] = out_ids >= 0


def make_empty_prepared_wire(
    compiled: CompiledModel,
    batch_padded: int,
    rowlens: Optional[Tuple[int, ...]] = None,
) -> PreparedBatch:
    """Zero-filled blob with the given shape signature (warmup compiles).
    Zero bytes parse as dense 0.0 / id 0 — valid for every group."""
    config = compiled.config
    if rowlens is None:
        rowlens = tuple(
            max(config.rowlen_buckets) if g.ragged else 1
            for g in compiled.groups
        )
    layout = wire_layout(
        compiled, batch_padded, tuple(rowlens),
        getattr(config, "host_bucketize", True),
    )
    blob = np.zeros(layout.total_bytes, dtype=np.uint8)
    return PreparedBatch(
        batch_padded, batch_padded, tuple(rowlens), {"blob": blob}
    )


# ---------------------------------------------------------------------------
# Device-side unpack (traced under jit; static slices + bitcasts, fused).
# ---------------------------------------------------------------------------


def unpack_blob(
    compiled: CompiledModel,
    blob,
    bp: int,
    rowlens: Tuple[int, ...],
    wsig: Tuple = (),
):
    """blob uint8[total] -> the structured {"dense", "groups"} pytree the
    executor's forward consumes.  Id views are widened to int32 here (XLA
    fuses the cast; downstream kernels are dtype-uniform).

    Under device-hash staging (``wsig``), the verbatim str_raw/split_raw
    views are first re-padded to [n, Bp, W] rows with a gather
    (_verbatim_rows), then split + FarmHashed HERE (ops/hash_device.py,
    exact u64) and merged back into a full host_ids tensor in member
    order — downstream device code is identical either way."""
    import jax.numpy as jnp
    from jax import lax

    def _verbatim_rows(raw, widths, bp_, wbk):
        """[n, Bp*W] verbatim column bytes + [n] actual itemsizes ->
        [n, Bp, W] u8 NUL-padded rows (the numpy 'S' layout the
        hash_device kernels consume).  Row r of column c occupies bytes
        [r*w_c, (r+1)*w_c) of the verbatim buffer; bytes at j >= w_c are
        forced NUL.  Index math: (bp-1)*w + W-1 < bp*W whenever w <= W,
        so every gather index is in range by construction."""
        n = raw.shape[0]
        r = jnp.arange(bp_, dtype=jnp.int32)[None, :, None]
        j = jnp.arange(wbk, dtype=jnp.int32)[None, None, :]
        w = widths.astype(jnp.int32)[:, None, None]
        idx = (r * w + j).reshape(n, -1)
        rows = jnp.take_along_axis(raw, idx, axis=1, mode="clip")
        rows = rows.reshape(n, bp_, wbk)
        return jnp.where(j < w, rows, jnp.uint8(0))

    host_bz = getattr(compiled.config, "host_bucketize", True)
    layout = wire_layout(compiled, bp, tuple(rowlens), host_bz, tuple(wsig))
    plans = _plan(compiled) if wsig else None

    def get(v: WireView):
        sl = lax.slice(blob, (v.offset,), (v.offset + v.nbytes,))
        isz = v.dtype.itemsize
        jdt = jnp.dtype(v.dtype)
        if isz == 1:
            x = lax.bitcast_convert_type(sl, jdt) if v.dtype != np.uint8 else sl
        else:
            x = lax.bitcast_convert_type(sl.reshape(-1, isz), jdt)
        x = x.reshape(v.shape)
        if v.dtype.kind == "i" and v.name in ("bz_ids", "host_ids"):
            x = x.astype(jnp.int32)
        return x

    by_key = {(v.gid, v.name): v for v in layout.views}
    dense = get(by_key[(-1, "dense")])
    groups = []
    for gi, g in enumerate(compiled.groups):
        arrs = {}
        for name in ("raw_bz", "bz_ids", "host_ids", "weights"):
            v = by_key.get((g.gid, name))
            if v is not None:
                arrs[name] = get(v)
        ws, wd = wsig[gi] if wsig else (0, 0)
        if ws or wd:
            from recom_tpu.ops import hash_device as hd

            p = plans[gi]
            host = arrs.get("host_ids")
            if ws:
                sids = hd.fixed_hash_ids(
                    _verbatim_rows(
                        get(by_key[(g.gid, "str_raw")]),
                        get(by_key[(g.gid, "str_w")]),
                        bp, ws,
                    ),
                    jnp.asarray(p.str_buckets),
                )[..., None]                        # [n_str, Bp, 1]
                pre = host[: p.n_int] if host is not None else None
                suf = host[p.n_int :] if host is not None else None
            else:
                rl = rowlens[gi]
                sids = hd.split_hash_ids(
                    _verbatim_rows(
                        get(by_key[(g.gid, "split_raw")]),
                        get(by_key[(g.gid, "split_w")]),
                        bp, wd,
                    ),
                    jnp.asarray(p.fast_delims_np),
                    jnp.asarray(p.fast_buckets),
                    rowlen=rl,
                )                                   # [n_fast, Bp, rl]
                pre = host[: p.fast_lo] if host is not None else None
                suf = host[p.fast_lo :] if host is not None else None
            parts = [
                x for x in (pre, sids, suf)
                if x is not None and x.shape[0]
            ]
            arrs["host_ids"] = (
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=0)
            )
        groups.append(arrs)
    return {"dense": dense, "groups": groups}
