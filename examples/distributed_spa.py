"""Distributed pose-graph solve over a device mesh.

Usage:
  python examples/distributed_spa.py [--devices 8] [--nodes 1024]

Builds a noisy loop pose graph, solves it single-device, then re-solves
with edges sharded across the mesh (psum-reduced Gauss-Newton) and checks
both agree. On CPU, devices are virtualized; on a pod this is the real
multi-chip path (see roborts_slam_tpu/parallel/multihost.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--nodes", type=int, default=1024)
    args = ap.parse_args()

    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}").strip()
    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")

    import time

    import numpy as np

    from roborts_slam_tpu.backend.spa import solve_pose_graph
    from roborts_slam_tpu.parallel.dist_spa import solve_pose_graph_sharded
    from roborts_slam_tpu.parallel.mesh import make_mesh

    n_dev = min(args.devices, len(jax.devices()))
    print(f"devices: {len(jax.devices())} ({jax.default_backend()}), using {n_dev}")

    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    n = args.nodes
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack([10 * np.cos(theta), 10 * np.sin(theta), theta + np.pi / 2], -1)
    noisy = gt + rng.normal(0, 0.05, gt.shape)
    noisy[0] = gt[0]
    eij = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(n // 4):
        i, j = sorted(rng.integers(0, n, 2))
        if j - i > 2:
            eij.append((i, j))
    eij = np.array(eij, np.int64)

    def rel(a, b):
        d = b - a
        c, s = np.cos(a[2]), np.sin(a[2])
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                         np.arctan2(np.sin(d[2]), np.cos(d[2]))])

    erel = np.stack([rel(gt[i], gt[j]) for i, j in eij])
    from roborts_slam_tpu.backend.spa import PoseGraphData
    data = PoseGraphData(
        poses=jnp.asarray(noisy, jnp.float32),
        node_mask=jnp.ones(n, bool),
        edge_ij=jnp.asarray(eij, jnp.int32),
        edge_rel=jnp.asarray(erel, jnp.float32),
        edge_info=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 20.0,
                                   (eij.shape[0], 3, 3)),
        edge_mask=jnp.ones(eij.shape[0], bool),
    )

    t0 = time.perf_counter()
    p1, c1, i1 = solve_pose_graph(data)
    jax.block_until_ready(p1)
    t1 = time.perf_counter() - t0
    print(f"single-device: cost {float(c1):.4f} in {int(i1)} iters, {t1*1e3:.0f} ms")

    mesh = make_mesh(n_dev, axis_name="graph")
    t0 = time.perf_counter()
    p2, c2, i2 = solve_pose_graph_sharded(data, mesh, axis="graph")
    jax.block_until_ready(p2)
    t2 = time.perf_counter() - t0
    print(f"{n_dev}-device sharded: cost {float(c2):.4f} in {int(i2)} iters, {t2*1e3:.0f} ms")

    err = float(np.abs(np.asarray(p1)[:n] - np.asarray(p2)[:n]).max())
    print(f"max pose disagreement: {err:.2e}")
    assert err < 1e-2
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
