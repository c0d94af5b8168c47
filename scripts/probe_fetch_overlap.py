"""Probe: do multiple in-flight device->host fetches overlap through the
axon tunnel, or serialize at ~1 RTT each?

The double-buffered fetch pipeline (VERDICT r4 #3) only reaches ~60
kept scans/s if D in-flight summary fetches complete in ~RTT total, not
D x RTT. Measures:
  serial:   dispatch+fetch one at a time, D times
  pipeline: dispatch D programs, start D async host copies, then consume
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B

B._enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def step(x, seed):
    # ~1 ms of real device work producing a small summary
    y = x
    for _ in range(4):
        y = jnp.tanh(y @ y.T * 1e-3 + seed)
    return y[0, :15]


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.asarray(np.random.default_rng(0).random((512, 512), np.float32))
    jax.block_until_ready(step(x, 0.0))

    for D in (1, 2, 3, 4, 6):
        # serial
        t0 = time.perf_counter()
        for i in range(D):
            np.asarray(step(x, float(i) * 1e-6 + 1e-3))
        serial = time.perf_counter() - t0
        # pipelined: all dispatches first, then all copies
        t0 = time.perf_counter()
        outs = [step(x, float(i) * 1e-6 + 2e-3) for i in range(D)]
        for o in outs:
            try:
                o.copy_to_host_async()
            except Exception:
                pass
        vals = [np.asarray(o) for o in outs]
        pipe = time.perf_counter() - t0
        print(f"D={D}: serial {serial*1e3:7.1f} ms ({serial/D*1e3:6.1f}/op)  "
              f"pipelined {pipe*1e3:7.1f} ms ({pipe/D*1e3:6.1f}/op)  "
              f"overlap x{serial/pipe:4.2f}", flush=True)

    # interleaved pattern (the engine's actual shape): dispatch i+1 before
    # consuming i, window of W in flight
    for W in (1, 2, 3, 4):
        N = 16
        t0 = time.perf_counter()
        inflight = []
        k = 0
        for i in range(N):
            o = step(x, float(i) * 1e-6 + 3e-3)
            try:
                o.copy_to_host_async()
            except Exception:
                pass
            inflight.append(o)
            if len(inflight) > W:
                np.asarray(inflight.pop(0))
        while inflight:
            np.asarray(inflight.pop(0))
        wall = time.perf_counter() - t0
        print(f"W={W}: {N} scans in {wall*1e3:7.1f} ms -> "
              f"{N/wall:6.1f} scans/s", flush=True)


if __name__ == "__main__":
    main()
