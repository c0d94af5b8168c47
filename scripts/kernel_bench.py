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
    # ACTUAL windows accumulated: the kernel's segment loop runs over the
    # dynamically-valid sample count (the reference subsample rule yields
    # ~use_point_size+ceil(P/step) samples, not the static max_samples pad)
    import numpy as np

    sidx, svalid, _ = __import__(
        "roborts_slam_tpu.ops.correlative", fromlist=["x"]
    )._sample_indices(n_valid, params.use_point_size, params.max_samples)
    S = int(np.asarray(svalid).sum())
    windows = A * S
    st = int(round(params.search_space_resolution * spec.inv_res))
    rows = (C._window_rows(N) if st >= 3
            else C._window_rows(st * (N - 1) + 1))
    # VPU issue model for the bitcast pipeline (1024 lanes/cycle, 0.94 GHz):
    # load (R,256)bf16 + i32 lane-roll (R/2,256) + f32 convert/row-roll/add
    # at (R,128) — R = rows+8. Scalar-unit address/roll setup (~10-15 ops
    # per window) is NOT modeled and is the measured bottleneck for small R.
    R = rows + 8
    cycles = (R * 256 / 2 + R / 2 * 256 + 3 * R * 128) / 1024.0
    ceiling_s = cycles / 0.94e9
    util = 100.0 * (windows * ceiling_s) / sec
    log(f"{name:7s}: {sec * 1e6:8.1f} us/call  A={A:3d} N={N:2d} S={S} "
        f"windows={windows:5d}  {sec / windows * 1e9:6.1f} ns/window  "
        f"~{util:.0f}% of VPU issue ceiling")
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
        note = ""
        try:
            import json
            rec = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))[
                "correlative_scan_match_throughput"]
            note = (f" (headline last measured ~{1e6 / rec['value']:.0f} "
                    f"us/scan at {rec['measured_at']})")
        except (OSError, KeyError, ValueError):
            pass
        log(f"3-tier kernel total: {total * 1e6:.1f} us/match{note}")


if __name__ == "__main__":
    main()
