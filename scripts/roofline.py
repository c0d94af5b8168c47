"""Speed-of-light check for the 3-tier correlative match (VERDICT r3 #4).

Measures, on the SAME chip and through the same K-slope timing protocol the
headline bench uses (roborts_slam_tpu/bench/timing.py):

1. HBM copy bandwidth — chained ``x = x * c`` over a 64 MB f32 plane
   (reads + writes 128 MB per iteration);
2. VPU f32 add throughput — 8 independent accumulators x 16 dependent adds
   per iteration over a VMEM-sized block (compute-bound by construction:
   arithmetic intensity 64 adds/byte of HBM traffic);
3. the shared-slab 3-tier ``scan_match`` on the headline workload;

then divides the match's analytic VPU-add count and HBM byte traffic
(roborts_slam_tpu/bench/roofline.scan_match_cost — derived from the kernel's
own planning helpers) by the measured peaks. Prints a markdown block for
PERFORMANCE.md.

Run on the real TPU (no JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    assert jax.default_backend() == "tpu", "run on the TPU backend"

    from roborts_slam_tpu.bench.roofline import (
        roofline_summary, scan_match_cost,
    )
    from roborts_slam_tpu.bench.timing import k_slope_dynamic
    from roborts_slam_tpu.bench.workload import headline_workload
    from roborts_slam_tpu.frontend.matchers import scan_match

    def log(m):
        print(m, file=sys.stderr, flush=True)

    # ---- 1. HBM copy bandwidth ----
    M = 64 * 1024 * 1024 // 4
    x0 = jnp.arange(M, dtype=jnp.float32).reshape(4096, -1)

    @jax.jit
    def copy_chain(x, K):
        return jax.lax.fori_loop(
            0, K, lambda i, x: x * jnp.float32(1.0 + 1e-12), x).sum()

    per, _ = k_slope_dynamic(
        lambda seed, K: copy_chain(x0 + jnp.float32(seed), jnp.int32(K)),
        k_points=(16, 64), reps=3)
    hbm_gbps = 2.0 * M * 4 / per / 1e9
    log(f"measured copy bandwidth: {hbm_gbps:.0f} GB/s")

    # ---- 2. VPU f32 add throughput ----
    B = 512 * 1024 // 4                    # 512 KB block: VMEM-resident
    blk = jnp.ones((B // 128, 128), jnp.float32)

    @jax.jit
    def add_chain(y, K):
        def body(i, accs):
            out = []
            for a in accs:                 # 8 independent chains x 16 adds
                for _ in range(16):
                    a = a + y
                out.append(a)
            return tuple(out)
        accs = jax.lax.fori_loop(
            0, K, body, tuple(blk * (j + 1) for j in range(8)))
        return sum(a.sum() for a in accs)

    per_v, _ = k_slope_dynamic(
        lambda seed, K: add_chain(blk * jnp.float32(1 + seed * 1e-9),
                                  jnp.int32(K)),
        k_points=(16, 64), reps=3)
    vpu_adds_per_s = 8 * 16 * B / per_v
    log(f"measured VPU f32 add rate: {vpu_adds_per_s / 1e12:.2f} Tadds/s")

    # ---- 3. the 3-tier match on the headline workload ----
    w = headline_workload(1081)

    @jax.jit
    def match_chain(fp, K):
        def body(i, carry):
            pose, acc = carry
            out = scan_match(w["matcher"], w["fine_spec"], fp, w["offset"],
                             w["coarse_spec"], w["coarse_probs"], w["coff"],
                             w["points"], w["mask"], w["n_valid"], pose)
            return (out.pose + 1e-6 * i, acc + out.score)
        return jax.lax.fori_loop(
            0, K, body, (w["init_pose"], jnp.float32(0)))[1]

    per_m, _ = k_slope_dynamic(
        lambda seed, K: match_chain(w["fine_probs"] + jnp.float32(seed) * 1e-7,
                                    jnp.int32(K)),
        k_points=(64, 256), reps=3)
    log(f"measured 3-tier match: {per_m * 1e6:.0f} us")

    cost = scan_match_cost(w["matcher"], w["fine_spec"])
    s = roofline_summary(cost, per_m, hbm_peak_gbps=hbm_gbps,
                         vpu_peak_adds_per_s=vpu_adds_per_s)

    bound = "VPU" if s["vpu_frac"] > s["hbm_frac"] else "HBM"
    print(f"""## Correlation-kernel roofline (measured {jax.devices()[0].device_kind})

| Quantity | Value |
|---|---|
| 3-tier match (shared slab) | {s['match_us']:.0f} us |
| Analytic VPU adds / match | {s['vpu_adds'] / 1e6:.1f} M |
| Analytic HBM bytes / match | {s['hbm_bytes'] / 1e6:.1f} MB |
| Achieved VPU add rate | {s['achieved_gadds'] / 1e3:.2f} Tadds/s |
| Microbenchmarked VPU peak | {vpu_adds_per_s / 1e12:.2f} Tadds/s |
| **VPU fraction of peak** | **{100 * s['vpu_frac']:.0f}%** |
| Achieved HBM bandwidth | {s['achieved_gbps']:.0f} GB/s |
| Microbenchmarked copy peak | {hbm_gbps:.0f} GB/s |
| **HBM fraction of peak** | **{100 * s['hbm_frac']:.0f}%** |
| Binding resource | {bound} |

Per-tier plan (angles x samples x rows x 128-lane adds):""")
    for t in cost.tiers:
        print(f"- {t.name}: A={t.n_angles} S={t.samples} rows={t.rows} "
              f"deint={t.deinterleaved} -> {t.vpu_adds / 1e6:.1f} M adds, "
              f"{t.hbm_bytes / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
