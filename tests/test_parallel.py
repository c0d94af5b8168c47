"""Multi-device tests on the 8-way virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from roborts_slam_tpu.backend.spa import solve_pose_graph
from roborts_slam_tpu.parallel.dist_spa import solve_pose_graph_sharded
from roborts_slam_tpu.parallel.mesh import make_mesh
from tests.test_spa import _make_loop_graph


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_spa_matches_single_device():
    data, gt, n = _make_loop_graph(n=48, noise=0.06, seed=11)
    p1, c1, i1 = solve_pose_graph(data)
    mesh = make_mesh(axis_name="graph")
    p2, c2, i2 = solve_pose_graph_sharded(data, mesh, axis="graph")
    assert abs(float(c1) - float(c2)) < 1e-3 * (abs(float(c1)) + 1e-6), (c1, c2)
    np.testing.assert_allclose(np.asarray(p1)[:n], np.asarray(p2)[:n],
                               atol=1e-3)


def test_sharded_batch_scan_match():
    from roborts_slam_tpu.frontend.matchers import MatcherParams
    from roborts_slam_tpu.config import SlamConfig
    from roborts_slam_tpu.models.grid_map import ProbMapSpec, make_prob_map
    from roborts_slam_tpu.ops.raster import stamp_scan
    from roborts_slam_tpu.parallel.sharded_match import make_batched_scan_matcher

    cfg = SlamConfig(use_optimize_scan_match=False,
                     coarse_search_space_size=0.4,
                     coarse_search_space_resolution=0.05,
                     coarse_search_angle_offset=0.175,
                     coarse_search_angle_resolution=0.0349,
                     fine_search_space_size=0.1,
                     fine_search_space_resolution=0.02,
                     fine_search_angle_offset=0.0698,
                     fine_search_angle_resolution=0.0349,
                     super_fine_search_space_size=0.02,
                     super_fine_search_space_resolution=0.01,
                     super_fine_search_angle_offset=0.0349,
                     super_fine_search_angle_resolution=0.00349)
    matcher = MatcherParams.from_config(cfg)
    fine_spec = ProbMapSpec(0.02, 512, 512, 0.05, 0.88)
    coarse_spec = ProbMapSpec(0.08, 128, 128, 0.24, 0.88)

    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    pts = np.stack([2.5 * np.cos(t), 1.5 * np.sin(t)], -1).astype(np.float32)
    P = 128
    points = np.zeros((P, 2), np.float32)
    points[:100] = pts
    mask = np.zeros(P, bool)
    mask[:100] = True

    fine = stamp_scan(fine_spec, make_prob_map(fine_spec, [5.12, 5.12]),
                      jnp.asarray(points), jnp.asarray(mask), jnp.zeros(3))
    coarse = stamp_scan(coarse_spec, make_prob_map(coarse_spec, [5.12, 5.12]),
                        jnp.asarray(points), jnp.asarray(mask), jnp.zeros(3))

    B = 8
    rng = np.random.default_rng(0)
    inits = rng.uniform(-0.08, 0.08, size=(B, 3)).astype(np.float32)
    batch_pts = np.tile(points[None], (B, 1, 1))
    batch_msk = np.tile(mask[None], (B, 1))
    nvals = np.full(B, 100, np.int32)

    mesh = make_mesh(axis_name="data")
    matchfn = make_batched_scan_matcher(fine_spec, coarse_spec, matcher, mesh)
    poses, scores, covs = matchfn(fine.probs, fine.offset, coarse.probs,
                                  coarse.offset, jnp.asarray(batch_pts),
                                  jnp.asarray(batch_msk), jnp.asarray(nvals),
                                  jnp.asarray(inits))
    poses = np.asarray(poses)
    assert np.all(np.asarray(scores) > 0.5)
    assert np.abs(poses[:, :2]).max() < 0.03, poses


def test_multihost_harness_cpu():
    """Mechanics only: the mesh/scaling harness runs on the virtual mesh
    (efficiency is meaningless on shared CPU cores; real numbers come from
    pod runs)."""
    from roborts_slam_tpu.parallel.multihost import (
        global_mesh, scaling_run, spa_scaling_workload)

    m = global_mesh()
    assert m.shape["data"] * m.shape["graph"] == len(jax.devices())
    wf = spa_scaling_workload(n_nodes=64, max_iters=3, cg_iters=5)
    pts = scaling_run(wf, [1, 2], reps=1)
    assert len(pts) == 2
    assert pts[0].throughput > 0 and pts[1].throughput > 0
    assert pts[0].efficiency == 1.0
