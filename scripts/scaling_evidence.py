"""Scaling evidence for the distributed SPA solve (VERDICT r1 item 10).

Without a pod, the ≥80%-at-≥2-hosts target cannot be measured directly;
this script produces the evidence a model needs and the regression hooks
that keep it honest:

1. **Collective count from compiled HLO**: the edge-sharded solve is
   lowered for an N-device mesh and its all-reduces are counted. The count
   must be independent of the edge count (it scales with solver/CG
   iterations only) — that is the structural property that makes scaling
   efficiency approach 1 as edges grow.
2. **Bytes-on-the-wire per CG iteration**: each psum moves O(poses) data
   (the HVP vector / gradient / diagonal), independent of the edge shard
   size, so the comm:compute ratio falls linearly with edges/device.
3. **Modeled communication fraction** vs edge count for a v5e-class chip
   (197 TFLOPs bf16, ~45 GB/s per ICI link pair, ~1 µs collective launch),
   tabulated so the ≥80% claim is tied to explicit arithmetic.
4. **Virtual-mesh sharding-overhead curve** (bench_scaling.py): not a
   hardware measurement (virtual devices share 2 cores) but pins the
   sharded programs' overhead trend.

Run: python scripts/scaling_evidence.py [--devices 8]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--cg-iters", type=int, default=25)
    ap.add_argument("--max-iters", type=int, default=10)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from roborts_slam_tpu.parallel.dist_spa import (
        pad_edges_to, solve_pose_graph_sharded,
    )
    from roborts_slam_tpu.parallel.mesh import make_mesh
    from roborts_slam_tpu.parallel.multihost import make_synthetic_loop_graph

    mesh = make_mesh(args.devices)
    axis = mesh.axis_names[0]

    print(f"## Distributed SPA scaling evidence ({args.devices}-device mesh, "
          f"{args.max_iters} LM iters x {args.cg_iters} CG iters)\n")

    # --- 1. collective sites in the compiled loop body (must be
    # edge-count independent: they execute once per solver iteration) ---
    print("| nodes | edges | all-reduce sites in HLO |")
    print("|---|---|---|")
    counts = []
    for n_nodes in (128, 512, 2048):
        data = make_synthetic_loop_graph(n_nodes, seed=0)
        data = pad_edges_to(data, args.devices)

        def run(d=data):
            return solve_pose_graph_sharded(
                d, mesh, axis=axis, max_iters=args.max_iters,
                cg_iters=args.cg_iters)

        txt = jax.jit(run).lower().compile().as_text()
        n_ar = len(re.findall(r"all-reduce(?:-start)?\(", txt))
        counts.append(n_ar)
        print(f"| {n_nodes} | {data.edge_ij.shape[0]} | {n_ar} |")
    assert len(set(counts)) == 1, (
        f"all-reduce site count varies with edge count: {counts} — "
        "collectives are no longer edge-independent")
    print(f"\nall-reduce sites: {counts[0]} per compiled program, inside the "
          "solver loops (LM setup: gradient + diagonal; CG: one HVP vector "
          "psum + scalar reductions). Per-iteration collective VOLUME is "
          "O(nodes), independent of the edge count.\n")

    # --- 2+3. comm fraction model anchored on measured device numbers ---
    # per-edge compute: measured on a v5e-class chip via the K-slope
    # protocol over chained lm_solve calls (2026-08-19, 2048 & 16384-node
    # loop graphs): ~55 ns per edge per CG iteration (gather-bound).
    EDGE_NS = 55e-9
    ICI_BW = 45e9                # bytes/s usable per link direction
    LAUNCH = 2e-6                # per-collective latency (s)
    print("| edges/device | nodes | psum bytes/CG | comm s/CG |"
          " compute s/CG | comm fraction | efficiency model |")
    print("|---|---|---|---|---|---|---|")
    for edges_dev in (1_000, 10_000, 100_000, 1_000_000):
        n_nodes = min(edges_dev, 200_000)
        psum_bytes = n_nodes * 3 * 4      # HVP vector f32
        t_comm = psum_bytes / ICI_BW + 3 * LAUNCH   # 1 vector + ~2 scalar psums
        t_comp = edges_dev * EDGE_NS
        frac = t_comm / (t_comm + t_comp)
        print(f"| {edges_dev:,} | {n_nodes:,} | {psum_bytes:,} |"
              f" {t_comm*1e6:.1f}µs | {t_comp*1e6:.1f}µs |"
              f" {frac*100:.1f}% | {(1-frac)*100:.0f}% |")
    print("\n(per-edge cost measured on-device; at these constants the ≥80% "
          "efficiency bound holds from ~1k edges/device upward — any "
          "realistic shard of a mega-sequence pose graph)\n")

    # --- 4. virtual-mesh sharding-overhead curve ---
    from roborts_slam_tpu.parallel.multihost import (
        scaling_run, spa_scaling_workload,
    )

    wf = spa_scaling_workload(n_nodes=512, max_iters=args.max_iters,
                              cg_iters=args.cg_iters)
    sizes = [n for n in (1, 2, 4, 8) if n <= args.devices]
    print("| devices | seconds | edge-iters/s | wall-time vs 1-dev |")
    print("|---|---|---|---|")
    pts = scaling_run(wf, sizes)
    base_s = pts[0].seconds
    for p in pts:
        print(f"| {p.n_devices} | {p.seconds:.3f} | {p.throughput:,.0f} |"
              f" {p.seconds / base_s:.2f}x |")
    print("\n(virtual devices share 2 host cores: the wall-clock column is "
          "contention, not hardware scaling; the evidence above is the "
          "collective structure + model)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
