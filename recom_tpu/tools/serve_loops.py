"""Shared single-threaded serving-loop measurement protocol.

ONE implementation of the confirm-every-N backlog loop, used by both the
headline bench (bench.py) and the AE sweep (tools/ae_sweep.py) so the two
artifacts cannot drift apart protocol-wise (a prior round kept two nearly
identical copies).

Transport invariant (CLAUDE.md): the tunnel caches repeated
(program, inputs) uploads AND executions, so every timed dispatch must
carry batch content never dispatched before in this process.  Callers
pass DISTINCT batches; each is served exactly once.
"""

from __future__ import annotations

import time

import numpy as np


def loop_windows(eng, warm_batches, batches, confirm_every=8, windows=5,
                 factory=None, total=None):
    """Single-threaded serving loop: prep + dispatch inline, confirming
    the backlog every ``confirm_every`` requests (and at window end) with
    one wait call.  ``confirm_every=1`` is the strict synchronous loop —
    on THIS host often the fastest mode, because the tunnel client
    busy-spins the single CPU core while async work is in flight
    (measured: host prep inflates 4.4ms -> 40-60ms with transfers
    outstanding).  Each batch is served exactly once.  Returns
    (median per-request s, window ms list, per-request ms list).

    ``factory``/``total``: generate each window's batches JUST BEFORE the
    window (factory(k) -> k fresh batches; generation is outside the
    timed section) instead of passing one pre-built ``batches`` list.
    Measured r05: holding ~60 raw model-E batches live (~1.5 GB of small
    numpy arrays) slows the tunnel DISPATCH path ~5x (15 ms/request vs
    2.5 with a small pool; freeing the pool restores speed instantly) —
    pre-building a whole run's batches poisons the very loop it feeds."""
    import jax

    for sb in warm_batches:     # warm signatures + rowlen hints
        p = eng.prepare(sb)
        fn = eng._get_jitted(p.signature)
        jax.block_until_ready(fn(eng.device_params, p.arrays)["output"])
    # near-equal window boundaries covering EVERY batch (a floor-division
    # per-window count silently dropped the len % windows tail, so the
    # artifact reported more distinct inputs than were ever dispatched)
    n_total = total if factory is not None else len(batches)
    bounds = np.linspace(0, n_total, windows + 1).round().astype(int)
    samples = []
    req_ms = []                 # per-request wall times across ALL windows
    for w in range(windows):
        if factory is not None:
            use = factory(int(bounds[w + 1] - bounds[w]))
        else:
            use = batches[bounds[w]: bounds[w + 1]]
        if not use:
            continue
        backlog = []
        t0 = time.perf_counter()
        tprev = t0
        for b in use:
            p = eng.prepare(b)
            fn = eng._get_jitted(p.signature)
            backlog.append(fn(eng.device_params, p.arrays)["output"])
            if len(backlog) >= confirm_every:
                jax.block_until_ready(backlog)
                backlog = []
            tnow = time.perf_counter()
            req_ms.append(round((tnow - tprev) * 1e3, 3))
            tprev = tnow
        if backlog:
            jax.block_until_ready(backlog)
        samples.append((time.perf_counter() - t0) / len(use))
    return (
        float(np.median(samples)),
        [round(s * 1e3, 3) for s in samples],
        req_ms,
    )
