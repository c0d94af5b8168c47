"""Per-tier kernel micro-bench for the Pallas correlation matcher.

Times each tier's ``score_candidates_pallas`` (and the shared slab build)
in isolation with the dynamic-K slope protocol — small single-tier
programs compile fast through the tunnel, so kernel experiments iterate
at minutes instead of the full bench's one big compile. Also prints a
utilization estimate per tier (achieved sample-windows/s vs the VPU
ceiling) — the roofline column VERDICT r2 asked for.

Usage: python scripts/kernel_bench.py [--tiers coarse fine super] [--slab]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import bench as B

B._enable_compile_cache()

import jax
import jax.numpy as jnp

from roborts_slam_tpu.bench.timing import k_slope_dynamic
from roborts_slam_tpu.ops.pallas import correlation as C

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def setup(beams=1081):
    from roborts_slam_tpu.bench.workload import headline_workload

    w = headline_workload(beams)
    matcher = w["matcher"]
    tiers = {"coarse": matcher.coarse, "fine": matcher.fine,
             "super": matcher.super_fine}
    return (w["fine_spec"], w["fine_probs"], w["offset"], w["points"],
            w["mask"], w["n_valid"], tiers)


def time_tier(name, params, spec, probs, offset, points, mask, n_valid,
              k_points, reps):
    center = jnp.array([1024.0, 1024.0, 0.05], jnp.float32)

    @jax.jit
    def chain(p, K):
        def body(i, carry):
            pr, acc = carry
            scores, *_ = C.score_candidates_pallas(
                spec, params, pr, offset, points, mask, n_valid,
                center + 1e-6 * acc, interpret=False)
            s = scores.sum()
            return (pr, acc + s)
        return jax.lax.fori_loop(0, K, body, (p, jnp.float32(0)))[1]

    f = lambda seed, K: chain(probs + jnp.float32(seed) * 1e-7, jnp.int32(K))
    sec, detail = k_slope_dynamic(f, k_points=k_points, reps=reps, log=None)
    A, N = params.n_angles, params.n_space
    S = params.max_samples
    windows = A * S
    st = int(round(params.search_space_resolution * spec.inv_res))
    rows = (C._window_rows(N) if st >= 3
            else C._window_rows(st * (N - 1) + 1))
    # VPU ceiling: 8x128 f32 lanes/cycle at ~0.94 GHz; each window moves
    # (rows+8, 256) f32 through convert+2 rolls+add ≈ 5 touches
    els = (rows + 8) * 256 * 5
    ceiling_s = els / (8 * 128 * 0.94e9)
    util = 100.0 * (windows * ceiling_s) / sec
    log(f"{name:7s}: {sec * 1e6:8.1f} us/call  A={A:3d} N={N:2d} S={S} "
        f"windows={windows:5d}  {sec / windows * 1e9:6.1f} ns/window  "
        f"~{util:.0f}% of issue ceiling")
    return sec


def time_slab(spec, probs, offset, k_points, reps):
    pose = jnp.array([0.2, 0.3, 0.05], jnp.float32)

    @jax.jit
    def chain(p, K):
        def body(i, carry):
            pr, acc = carry
            tiles, oy, ox = C.build_slab_cache(spec, pr, offset,
                                               pose + 1e-6 * acc)
            return (pr, acc + tiles.astype(jnp.float32).sum() * 1e-9)
        return jax.lax.fori_loop(0, K, body, (p, jnp.float32(0)))[1]

    f = lambda seed, K: chain(probs + jnp.float32(seed) * 1e-7, jnp.int32(K))
    sec, _ = k_slope_dynamic(f, k_points=k_points, reps=reps)
    log(f"slab   : {sec * 1e6:8.1f} us/build (pad+slice+cast, "
        f"{spec.height}x{spec.width} map)")
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", nargs="*",
                    default=["coarse", "fine", "super"])
    ap.add_argument("--slab", action="store_true")
    ap.add_argument("--k", default="64,256")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    k_points = tuple(int(x) for x in args.k.split(","))

    spec, probs, offset, points, mask, n_valid, tiers = setup()
    log(f"backend={jax.default_backend()}")
    total = 0.0
    for name in args.tiers:
        total += time_tier(name, tiers[name], spec, probs, offset, points,
                           mask, n_valid, k_points, args.reps)
    if args.slab:
        time_slab(spec, probs, offset, k_points, args.reps)
    if len(args.tiers) == 3:
        log(f"3-tier kernel total: {total * 1e6:.1f} us/match "
            f"(r3 headline ran at ~{1e6 / 3404:.0f} us/scan)")


if __name__ == "__main__":
    main()
