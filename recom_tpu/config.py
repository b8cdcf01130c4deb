"""Engine configuration.

The reference configures everything through environment variables read at
static-init (RECOM_SHAPE_OPT, RECOM_PRE_LOOKUP_OPT, ... — reference
passes/fc_optimize_pass.cc:41-73, utils.cc:22-25).  We use a typed dataclass
with the same on/off switches, and honor ``RECOM_TPU_*`` env overrides so the
zero-code-change deployment story is preserved.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence


def _env_bool(key: str, default: bool) -> bool:
    v = os.environ.get(key)
    if v is None:
        return default
    return v.lower() in ("1", "on", "true", "yes")


def _env_int(key: str, default: int) -> int:
    v = os.environ.get(key)
    return int(v) if v is not None else default


@dataclasses.dataclass
class EngineConfig:
    """All knobs for compilation and execution.

    Pipeline gates mirror the reference's env flags
    (fc_optimize_pass.cc:41-73): each compiler stage can be disabled
    independently to bisect miscompiles, and a disabled stage must leave
    behavior unchanged (graceful-degradation contract, SURVEY.md section 4).
    """

    # --- compiler pass gates (reference: RECOM_* env flags) ---
    prune_useless: bool = True          # RECOM_SHAPE_OPT analogue
    pre_lookup_opt: bool = True         # RECOM_PRE_LOOKUP_OPT
    lookup_opt: bool = True             # RECOM_LOOKUP_OPT
    dedup_subcolumns: bool = True       # new: shared sub-column elimination
    use_pallas: bool = True             # RECOM_CODEGEN analogue
    # fail the build when a chain's id range can exceed its table vocab
    # (default: warn + serve with runtime clamp/mask — the reference's
    # leave-unchanged contract)
    strict_id_ranges: bool = False

    # --- shape bucketing (replaces symbolic shapes) ---
    batch_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048)
    # per-group row-length (nnz-per-row) ladder; rows longer than the last
    # bucket are truncated from the *end* (documented divergence knob, off by
    # default: overflow instead raises).  The 12 rung fills the wasteful
    # 8->16 gap: common behavioral-feature caps (10-12 items) otherwise pad
    # 60% of the id plane, which is pure wire bytes on remote-attached
    # serving.
    rowlen_buckets: Sequence[int] = (1, 2, 4, 8, 12, 16, 32, 64, 128)
    allow_truncate_overflow: bool = False

    # --- host/device staging ---
    # pack every prepared array into ONE uint8 blob per step (the
    # reference's ConcatInputs single-H2D staging, concat_inputs_ops.cc:
    # 42-77).  Ids travel at the narrowest dtype their compile-time range
    # admits (int8/int16); the device program unpacks with fused static
    # bitcasts.  Effective on the single-device path; mesh execution keeps
    # structured arrays (batch-axis sharding needs per-array layouts).
    wire_pack: bool = True
    # compute Bucketize ids on the host (native float64 upper_bound + fused
    # post-bucketize LUT) instead of shipping raw floats to the device:
    # 4x less wire traffic for bucketize columns at ~the same host cost.
    # Off restores the device bucketize / fused Pallas one-hot path.
    host_bucketize: bool = True
    # hash string features ON DEVICE (ops/hash_device.py): the wire ships
    # each string column's numpy 'S' buffer VERBATIM (one memcpy; the
    # device re-pads rows with a gather) and the TPU splits + FarmHashes
    # them itself via XLA's exact u64 emulation — removing the dominant
    # host-prep cost.  Default ON since r05: with verbatim staging the
    # measured on-chip arm wins sync AND async at model E@512 (ARMS_r05;
    # host prep 1.40 -> 0.97 ms) and fixes the F@2048 host dip.  Applies
    # to the unweighted single-HashBucket string classes (fixed strings
    # and single-byte-delimited lists); everything else keeps host prep.
    # Per-request fallback to host hashing when a row/piece exceeds the
    # device kernel's byte caps.  Wire-pack path only.
    device_hash: bool = True

    # --- kernel selection ---
    # tables with vocab <= this use the MXU one-hot matmul megakernel path;
    # larger tables use the row-gather path (XLA gather / Pallas DMA gather).
    onehot_vocab_limit: int = 4096
    # group output strip width for the megakernel (MXU lane width).
    lane_width: int = 128
    # dtype for table storage on device ("float32" keeps bit-exactness with
    # the TF oracle; "bfloat16" trades exactness for bandwidth).
    table_dtype: str = "float32"
    compute_dtype: str = "float32"      # tower compute dtype
    # TPU hardware division/sqrt are reciprocal-approximation based (not
    # IEEE correctly rounded); exact mode routes combiner divisor math
    # through emulated f64 so mean/sqrtn pooling stays bit-exact with TF.
    exact_combiner_math: bool = True

    # --- parallelism ---
    mesh_shape: Optional[Sequence[int]] = None   # None -> single device
    mesh_axis_names: Sequence[str] = ("data", "model")
    # tables whose row count exceeds this are row-sharded over the "model"
    # axis (reference analogue: max_table_size CPU fallback,
    # cuda_emitter.cc:1080-1094 — we shard instead of falling back to host).
    shard_rows_above: int = 1 << 22
    # comm strategy for row-sharded lookups:
    #   "all_to_all" — id exchange + row return (bit-exact pooling order,
    #                  1/m of the gather work per device)
    #   "psum"       — masked local gather + psum of partial pools (moves
    #                  pooled [b,C,d]; better for very long ragged rows)
    #   "auto"       — all_to_all when the local batch divides the model
    #                  axis and rows are short, else psum
    shard_comm: str = "auto"
    # static per-destination bucket capacity = ceil(N/m) * this factor for
    # the all-to-all path; overflowing ids drop (counted + surfaced)
    a2a_capacity_factor: float = 2.0
    # split the a2a row-RETURN exchange into this many capacity-slice
    # all_to_alls so the restoration gather of slice k overlaps the
    # exchange of slice k+1 (comm/compute pipelining, SURVEY §7 hard part
    # 3).  1 = monolithic exchange.  Bit-exact for any value.
    a2a_chunks: int = 2
    # what predict does when an a2a step reports dropped ids:
    #   "recompute" — re-run via the a2a path at full (provably
    #                 overflow-free) capacity_factor=m (default: preserves
    #                 the BIT-exact serving contract — same path, same
    #                 pooling order; skewed batches pay a doubled step,
    #                 the steady state doesn't)
    #   "warn"      — keep the degraded result (affected entries pool 0)
    #   "raise"     — fail the request
    a2a_overflow_policy: str = "recompute"
    # tensor-parallel (embedding-dim) sharding: groups whose dim exceeds
    # this are stored P(None, "model") and GSPMD partitions the gather —
    # each shard holds every row's d/m slice, no id exchange at all.  The
    # right layout for few-rows x wide-dim tables (row striping covers the
    # many-rows case).  Groups over shard_rows_above take row sharding
    # first.  None disables.
    dim_shard_above: Optional[int] = None

    # --- observability ---
    dump_ir_dir: Optional[str] = None   # per-pass IR dumps (reference:
                                        # DumpGraphDefToFile before/after)
    log_verbosity: int = _env_int("RECOM_TPU_LOG_VERBOSITY", 0)

    # --- caching ---
    cache_dir: str = os.environ.get(
        "RECOM_TPU_CACHE_DIR", os.path.expanduser("~/.cache/recom_tpu")
    )
    # XLA persistent compilation cache: ~10x faster process restarts (0.7s
    # vs 6s re-compiles measured), but executable serialization makes the
    # FIRST-ever compile much slower through remote-compile tunnels
    # (~130s measured under axon).  Opt-in; recommended on for production
    # serving hosts with local compilers.
    persistent_compilation_cache: bool = False

    interpret: bool = False             # run Pallas kernels in interpreter
                                        # mode (CPU tests)

    def __post_init__(self):
        # env overrides, read at construction (not static-init, unlike the
        # reference — makes tests hermetic).
        self.prune_useless = _env_bool("RECOM_TPU_SHAPE_OPT", self.prune_useless)
        self.pre_lookup_opt = _env_bool("RECOM_TPU_PRE_LOOKUP_OPT", self.pre_lookup_opt)
        self.lookup_opt = _env_bool("RECOM_TPU_LOOKUP_OPT", self.lookup_opt)
        self.use_pallas = _env_bool("RECOM_TPU_CODEGEN", self.use_pallas)
        self.device_hash = _env_bool(
            "RECOM_TPU_DEVICE_HASH", self.device_hash
        )
        self.persistent_compilation_cache = _env_bool(
            "RECOM_TPU_PERSIST_CACHE", self.persistent_compilation_cache
        )
        self.batch_buckets = tuple(sorted(self.batch_buckets))
        self.rowlen_buckets = tuple(sorted(self.rowlen_buckets))
        if not self.batch_buckets or self.batch_buckets[0] < 1:
            raise ValueError("batch_buckets must be non-empty positive ints")
        if not self.rowlen_buckets or self.rowlen_buckets[0] < 1:
            raise ValueError("rowlen_buckets must be non-empty positive ints")
        if self.table_dtype not in ("float32", "bfloat16", "int8"):
            # an unknown dtype would fail deep inside lowering with an
            # unrelated-looking KeyError
            raise ValueError(
                f"table_dtype={self.table_dtype!r}: expected 'float32', "
                "'bfloat16', or 'int8'"
            )
        if self.shard_comm not in ("auto", "all_to_all", "psum"):
            # an unrecognized value would silently take the psum path,
            # which only promises 1e-6 where all_to_all promises bit-exact
            raise ValueError(
                f"shard_comm={self.shard_comm!r}: expected 'auto', "
                "'all_to_all', or 'psum'"
            )
        if self.a2a_overflow_policy not in ("recompute", "warn", "raise"):
            raise ValueError(
                f"a2a_overflow_policy={self.a2a_overflow_policy!r}: "
                "expected 'recompute', 'warn', or 'raise'"
            )
