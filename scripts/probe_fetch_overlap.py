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


if __name__ == "__main__" and not any(a in sys.argv for a in ("--donated", "--big", "--pallas", "--alt")):
    main()


def probe_donated():
    """Does a DONATED chained-state dispatch serialize behind its donor's
    execution through the tunnel? Engine-shaped: state chains with
    donation, a small packed summary is fetched with lag W."""
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step_don(state, seed):
        y = state
        for _ in range(4):
            y = jnp.tanh(y @ y.T * 1e-3 + seed)
        return y, y[0, :15]

    @jax.jit
    def step_nodon(state, seed):
        y = state
        for _ in range(4):
            y = jnp.tanh(y @ y.T * 1e-3 + seed)
        return y, y[0, :15]

    for name, fn in (("donated", step_don), ("nodonate", step_nodon)):
        state = jnp.asarray(
            np.random.default_rng(0).random((512, 512), np.float32))
        state, s = fn(state, 0.0)
        jax.block_until_ready(s)
        for W in (1, 3):
            N = 16
            t0 = time.perf_counter()
            inflight = []
            disp = 0.0
            for i in range(N):
                t1 = time.perf_counter()
                state, s = fn(state, float(i) * 1e-6 + 1e-3)
                disp += time.perf_counter() - t1
                try:
                    s.copy_to_host_async()
                except Exception:
                    pass
                inflight.append(s)
                if len(inflight) > W:
                    np.asarray(inflight.pop(0))
            while inflight:
                np.asarray(inflight.pop(0))
            wall = time.perf_counter() - t0
            print(f"{name:8s} W={W}: {N / wall:6.1f} scans/s  "
                  f"dispatch {disp / N * 1e3:6.2f} ms/op", flush=True)


if __name__ == "__main__" and "--donated" in sys.argv:
    probe_donated()


def probe_big():
    """Engine-shaped arg profile: ~15 MB donated chained state + ~10 MB
    donated side buffers + small operands. Is the 19 ms pipe_dispatch a
    function of donated buffer volume / arg count?"""
    from functools import partial

    H = 1900

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(hits, passes, pts, msk, x, seed):
        h2 = hits.at[5, 5].add(seed)
        p2 = passes.at[3, 3].add(1.0)
        y = jnp.tanh(x @ x.T * 1e-3 + seed)
        pts2 = pts.at[0, 0, 0].add(seed)
        msk2 = msk
        return h2, p2, pts2, msk2, y[0, :15]

    rng = np.random.default_rng(0)
    hits = jnp.asarray(rng.random((H, H), np.float32))
    passes = jnp.asarray(rng.random((H, H), np.float32))
    pts = jnp.asarray(rng.random((256, 2048, 2), np.float32))
    msk = jnp.asarray(np.ones((256, 2048), bool))
    x = jnp.asarray(rng.random((256, 256), np.float32))
    out = step(hits, passes, pts, msk, x, 0.0)
    hits, passes, pts, msk, s = out
    jax.block_until_ready(s)
    for W in (1, 3):
        N = 12
        t0 = time.perf_counter()
        inflight = []
        disp = 0.0
        for i in range(N):
            t1 = time.perf_counter()
            hits, passes, pts, msk, s = step(hits, passes, pts, msk, x,
                                             float(i) * 1e-6 + 1e-3)
            disp += time.perf_counter() - t1
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            inflight.append(s)
            if len(inflight) > W:
                np.asarray(inflight.pop(0))
        while inflight:
            np.asarray(inflight.pop(0))
        wall = time.perf_counter() - t0
        print(f"big W={W}: {N / wall:6.1f} scans/s  "
              f"dispatch {disp / N * 1e3:6.2f} ms/op", flush=True)


if __name__ == "__main__" and "--big" in sys.argv:
    probe_big()


def probe_pallas():
    """Engine programs embed Pallas kernels — does a pallas_call inside
    the jitted program change the relay's dispatch cost?"""
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pk(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, seed):
        y = jnp.tanh(state @ state.T * 1e-3 + seed)
        z = pl.pallas_call(
            pk, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        )(y[:256, :256])
        return state + seed * 1e-9, z[0, :15]

    state = jnp.asarray(
        np.random.default_rng(0).random((512, 512), np.float32))
    state, s = step(state, 0.0)
    jax.block_until_ready(s)
    for W in (1, 3):
        N = 12
        t0 = time.perf_counter()
        inflight = []
        disp = 0.0
        for i in range(N):
            t1 = time.perf_counter()
            state, s = step(state, float(i) * 1e-6 + 1e-3)
            disp += time.perf_counter() - t1
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            inflight.append(s)
            if len(inflight) > W:
                np.asarray(inflight.pop(0))
        while inflight:
            np.asarray(inflight.pop(0))
        wall = time.perf_counter() - t0
        print(f"pallas W={W}: {N / wall:6.1f} scans/s  "
              f"dispatch {disp / N * 1e3:6.2f} ms/op", flush=True)


if __name__ == "__main__" and "--pallas" in sys.argv:
    probe_pallas()


def probe_alt():
    """The engine alternates two executables (plain/fused). Does switching
    executables per dispatch break the relay's pipelining?"""
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step_a(state, seed):
        y = jnp.tanh(state @ state.T * 1e-3 + seed)
        return y, y[0, :15]

    @partial(jax.jit, donate_argnums=(0,))
    def step_b(state, seed):
        y = jnp.cos(state @ state.T * 1e-3 + seed)
        return y, y[0, :16]

    state = jnp.asarray(
        np.random.default_rng(0).random((512, 512), np.float32))
    state, s = step_a(state, 0.0)
    jax.block_until_ready(s)
    state, s = step_b(state, 0.0)
    jax.block_until_ready(s)
    for W in (3,):
        N = 16
        t0 = time.perf_counter()
        inflight = []
        disp = 0.0
        for i in range(N):
            fn = step_a if i % 2 == 0 else step_b
            t1 = time.perf_counter()
            state, s = fn(state, float(i) * 1e-6 + 1e-3)
            disp += time.perf_counter() - t1
            try:
                s.copy_to_host_async()
            except Exception:
                pass
            inflight.append(s)
            if len(inflight) > W:
                np.asarray(inflight.pop(0))
        while inflight:
            np.asarray(inflight.pop(0))
        wall = time.perf_counter() - t0
        print(f"alt W={W}: {N / wall:6.1f} scans/s  "
              f"dispatch {disp / N * 1e3:6.2f} ms/op", flush=True)


if __name__ == "__main__" and "--alt" in sys.argv:
    probe_alt()
