"""Headline benchmark: correlative scan-match throughput (scans/sec/chip).

Mirrors the reference front end's per-scan hot path — the 3-tier
(coarse/fine/super-fine) correlative search with the simulation parameters
(config/simulatin_param.yaml:51-70) on a 2048x2048 fine map (0.01 m), willow
lidar beam count — against the measured single-core CPU baseline
(native/baseline_correlative.cpp, same tiers/map/scan; the reference
publishes no numbers, BASELINE.md).

Measurement notes: timed with the two-point K-scaling slope protocol
(roborts_slam_tpu/bench/timing.py) — K matches chained in ONE jitted
program (a lax.fori_loop whose carried pose feeds the next match, exactly
the online SLAM dependency chain), batched over B independent scans (the
back-end chain-match / loop-closure verification workload shape), result
fetched to host, inputs perturbed per rep, slope of t(K2)-t(K1). This is
the only protocol that survives the tunnel's dispatch pipelining and
relay-side memoization (see timing.py for the validation).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
NATIVE_SRC = os.path.join(REPO, "native", "baseline_correlative.cpp")
NATIVE_BIN = os.path.join(REPO, "native", "baseline_correlative")

def _enable_compile_cache():
    """Persistent compile cache: the TPU tunnel's compiles are slow and
    erratic. Must go through jax.config because jax may already be imported
    (sitecustomize preloads it)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cpu_baseline_scans_per_sec(beams: int = 1081, iters: int = 20) -> float:
    if not os.path.exists(NATIVE_BIN) or (
            os.path.getmtime(NATIVE_BIN) < os.path.getmtime(NATIVE_SRC)):
        subprocess.run(["g++", "-O2", "-std=c++17", "-o", NATIVE_BIN,
                        NATIVE_SRC], check=True)
    out = subprocess.run([NATIVE_BIN, str(beams), str(iters)],
                         check=True, capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.startswith("cpu_scans_per_sec"):
            return float(line.split()[1])
    raise RuntimeError(f"unexpected baseline output: {out!r}")


def tpu_scans_per_sec(beams: int = 1081, batch: int = 16,
                      k_points=(16, 64), reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.frontend.matchers import MatcherParams, scan_match
    from roborts_slam_tpu.models.grid_map import ProbMapSpec

    cfg = load_config("/root/reference/config/simulatin_param.yaml")
    matcher = MatcherParams.from_config(cfg, use_center_penalty=True)

    H = W = 2048
    fine_spec = ProbMapSpec(resolution=0.01, height=H, width=W,
                            deviation=cfg.fine_map_deviation,
                            blur_offset=cfg.gaussian_blur_offset)
    coarse_spec = ProbMapSpec(resolution=0.08, height=256, width=256,
                              deviation=cfg.coarse_map_deviation,
                              blur_offset=cfg.gaussian_blur_offset)

    # same pseudo-random map content as the CPU baseline
    idx = np.arange(H * W, dtype=np.uint64)
    probs = ((idx * 2654435761 & 0xFFFF) / 65535.0).astype(np.float32)
    fine_probs = jnp.asarray(probs.reshape(H, W))
    coarse_probs = jnp.full((256, 256), 0.3, jnp.float32)
    offset = jnp.array([10.24, 10.24], jnp.float32)
    coff = jnp.array([10.24, 10.24], jnp.float32)

    ang = np.linspace(-2.35, 2.35, beams)
    r = 3.0 + 2.0 * np.sin(5 * ang)
    P = cfg.max_points
    points = np.zeros((P, 2), np.float32)
    points[:beams, 0] = r * np.cos(ang)
    points[:beams, 1] = r * np.sin(ang)
    mask = np.zeros(P, bool)
    mask[:beams] = True
    points, mask = jnp.asarray(points), jnp.asarray(mask)
    n_valid = jnp.int32(beams)

    from roborts_slam_tpu.bench.timing import k_slope

    inits = jnp.tile(jnp.array([[0.01, 0.0, 0.0]], jnp.float32), (batch, 1))

    def make_chain(K):
        @jax.jit
        def chained(fp):
            def one(init):
                out = scan_match(matcher, fine_spec, fp, offset,
                                 coarse_spec, coarse_probs, coff,
                                 points, mask, n_valid, init)
                return out.pose, out.score

            def body(i, carry):
                # feed the matched pose into the next match (the online SLAM
                # dependency chain); epsilon keeps the loop body live
                poses, acc = carry
                p, s = jax.vmap(one)(poses)
                return (p + 1e-6 * i, acc + s.sum())

            out = jax.lax.fori_loop(0, K, body, (inits, jnp.float32(0)))
            return out[1]

        # the seed perturbation defeats relay-side memoization (timing.py)
        return lambda seed: chained(fine_probs + jnp.float32(seed) * 1e-7)

    per_iter = k_slope(make_chain, k_points=k_points, reps=reps)
    return batch / per_iter


def main():
    beams = 1081
    cpu = cpu_baseline_scans_per_sec(beams=beams)
    tpu = tpu_scans_per_sec(beams=beams)
    print(json.dumps({
        "metric": "correlative_scan_match_throughput",
        "value": round(tpu, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
