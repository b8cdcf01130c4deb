"""Leveled logging — the RECOM_VLOG / RECOM_VLOG_WARNING analogue
(reference utils.h:51-84, gated by RECOM_LOG_VERBOSITY read once at
static-init; ours re-reads per logger construction so tests stay hermetic).

Levels: 0 = errors only, 1 = warnings, 2 = verbose.
"""

from __future__ import annotations

import os
import sys
import time


class Logger:
    def __init__(self, name: str, verbosity: int = None):
        self.name = name
        if verbosity is None:
            verbosity = int(os.environ.get("RECOM_TPU_LOG_VERBOSITY", "0"))
        self.verbosity = verbosity

    def _emit(self, level: str, msg: str):
        ts = time.strftime("%H:%M:%S")
        print(f"[{ts} recom_tpu/{self.name} {level}] {msg}", file=sys.stderr)

    def error(self, msg: str):
        self._emit("E", msg)

    def warning(self, msg: str):
        if self.verbosity >= 1:
            self._emit("W", msg)

    def vlog(self, msg: str):
        if self.verbosity >= 2:
            self._emit("V", msg)


class StageTimer:
    """Accumulates per-stage wall-time samples; reports mean/p50/p99.
    The observability the reference delegates to --timeline FULL_TRACE
    dumps (recom_examples.patch:241-258), kept always-on here because the
    overhead is two clock reads per stage."""

    MAX_SAMPLES = 8192           # per-stage ring: bounded memory for
                                 # long-running servers (always-on timers)

    def __init__(self):
        from collections import deque

        self._deque = deque
        self.samples = {}

    def add(self, stage: str, seconds: float):
        dq = self.samples.get(stage)
        if dq is None:
            dq = self.samples[stage] = self._deque(maxlen=self.MAX_SAMPLES)
        dq.append(seconds)

    def summary(self):
        import numpy as np

        out = {}
        for stage, xs in self.samples.items():
            arr = np.asarray(xs) * 1e3
            out[stage] = {
                "count": len(xs),
                "mean_ms": round(float(arr.mean()), 3),
                "p50_ms": round(float(np.percentile(arr, 50)), 3),
                "p99_ms": round(float(np.percentile(arr, 99)), 3),
            }
        return out
