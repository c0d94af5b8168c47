"""Headline benchmark: correlative scan-match throughput (scans/sec/chip).

Mirrors the reference front end's per-scan hot path — the 3-tier
(coarse/fine/super-fine) correlative search with the simulation parameters
(config/simulatin_param.yaml:51-70) on a 2048x2048 fine map (0.01 m), willow
lidar beam count — against the measured single-core CPU baseline
(native/baseline_correlative.cpp, same tiers/map/scan; the reference
publishes no numbers, BASELINE.md).

Measurement notes: the TPU tunnel in this environment has a large,
content-independent per-dispatch overhead (tens of ms), so the match is
benchmarked amortized — K matches chained in ONE jitted program (a
lax.fori_loop whose carried pose feeds the next match, exactly the online
SLAM dependency chain), batched over B independent scans (the back-end
chain-match / loop-closure verification workload shape).

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


def tpu_scans_per_sec(beams: int = 1081, batch: int = 16, chain: int = 64,
                      reps: int = 5) -> float:
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

    def one(init):
        out = scan_match(matcher, fine_spec, fine_probs, offset,
                         coarse_spec, coarse_probs, coff,
                         points, mask, n_valid, init)
        return out.pose, out.score

    vone = jax.vmap(one)

    def chained(inits):
        def body(i, carry):
            poses, acc = carry
            p, s = vone(poses)
            # feed the matched pose into the next match (the online SLAM
            # dependency chain); epsilon keeps the loop body live
            return (p + 1e-6 * i, acc + s.sum())
        return jax.lax.fori_loop(0, chain, body, (inits, jnp.float32(0)))

    f = jax.jit(chained)
    inits = jnp.tile(jnp.array([[0.01, 0.0, 0.0]], jnp.float32), (batch, 1))
    jax.block_until_ready(f(inits))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(inits))
        times.append(time.perf_counter() - t0)
    per_match = float(np.min(times)) / (batch * chain)
    return 1.0 / per_match


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
