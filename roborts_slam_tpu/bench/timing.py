"""Honest device timing through pipelined / memoizing dispatch layers.

Naive ``block_until_ready`` wall-clock is unreliable through the axon TPU
tunnel used in this environment:

- ``block_until_ready`` can return before device execution finishes (the
  relay acknowledges enqueue, not completion), so short programs "cost" ~0.
- Repeated executions with bit-identical (executable, args) can be served
  from a relay-side memo, so min-of-reps measures a cache hit.
- Every dispatch carries a large (~30-45 ms) content-independent floor that
  overlaps with device compute.

The only measurement that survives all three is a **two-point K-scaling
slope with a host fetch**: build the workload as K iterations chained inside
one jitted program whose iterations are data-dependent (so nothing folds or
reorders), fetch the scalar result to host (``np.asarray``, which genuinely
waits), vary an input every rep (defeats memoization), and report
``(t(K2) - t(K1)) / (K2 - K1)`` — the dispatch floor and the warm-compile
path cancel in the difference.

Validation: this protocol measures chained 2048^3 bf16 matmuls at
188 TFLOPS on the v5e tunnel (rated peak ~197), where naive
block_until_ready timing reported an impossible 2667+ TFLOPS.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def k_slope_dynamic(f: Callable, k_points: tuple[int, int] = (16, 64),
                    reps: int = 3, deadline: float | None = None,
                    log=None, partial_out: dict | None = None
                    ) -> tuple[float, dict]:
    """Seconds per iteration via the two-point K slope with ONE compiled
    program: ``f(seed, K)`` runs K chained iterations where K is a traced
    argument (``lax.fori_loop`` with a dynamic bound), so both K points —
    and any degraded protocol — share a single executable. Through the axon
    tunnel a compile can cost minutes; one program instead of two is the
    difference between landing in the driver's budget and rc=124.

    ``deadline`` (time.monotonic value) degrades the protocol instead of
    overrunning: fewer reps once past it. Returns (sec_per_iter, detail)
    where detail carries the raw best times for diagnostics."""
    import time as _t

    k1, k2 = k_points
    assert k2 > k1 > 0
    np.asarray(f(0, k1))                   # the one compile + warm
    if log:
        log("compile+warm done")
    totals = {}
    rep_times: dict = {}
    for k in (k1, k2):
        np.asarray(f(1009 + k, k))         # warm this trip count
        best = float("inf")
        r = reps
        if deadline is not None and _t.monotonic() > deadline:
            r = 1
        times = []
        for i in range(r):
            t0 = _t.perf_counter()
            np.asarray(f(7 * i + k, k))
            times.append(_t.perf_counter() - t0)
            best = min(best, times[-1])
        totals[k] = best
        rep_times[k] = times
        if partial_out is not None:
            partial_out[k] = best          # SIGALRM fallback reads these
        if log:
            log(f"K={k}: best {best:.4f}s over {r} reps")
    sec = max((totals[k2] - totals[k1]) / (k2 - k1), 1e-12)
    return sec, {"t_k1": totals[k1], "t_k2": totals[k2],
                 "k_points": k_points, "rep_times": rep_times}


def k_slope(make_chain: Callable[[int], Callable],
            k_points: tuple[int, int] = (16, 64),
            reps: int = 3) -> float:
    """Seconds per iteration via the two-point K slope.

    ``make_chain(K)`` must return ``f(seed) -> scalar-ish`` where ``f`` runs
    K chained iterations of the workload in ONE jitted program and the seed
    perturbs the inputs (any cheap variation defeats relay memoization; the
    perturbation must not change program shape). The returned value is
    fetched with ``np.asarray`` so the timing waits for real completion.
    """
    k1, k2 = k_points
    assert k2 > k1 > 0
    totals = {}
    for k in (k1, k2):
        f = make_chain(k)
        np.asarray(f(0))                       # compile + warm
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(i + 1))
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    return max((totals[k2] - totals[k1]) / (k2 - k1), 1e-12)
