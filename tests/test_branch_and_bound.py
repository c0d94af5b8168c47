"""Branch-and-bound (beam search) matcher vs exhaustive dense scoring."""

import numpy as np
import jax.numpy as jnp

from roborts_slam_tpu.models.grid_map import ProbMapSpec, make_prob_map
from roborts_slam_tpu.ops.branch_and_bound import BnBParams, bnb_scan_match
from roborts_slam_tpu.ops.correlative import (
    COARSE, CorrelativeParams, score_candidates,
)
from roborts_slam_tpu.models.grid_map import world_to_map_pose
from roborts_slam_tpu.ops.raster import stamp_scan


def _scan(n=160, max_points=192):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([2.4 * np.cos(t) + 0.5 * np.cos(3 * t),
                    1.8 * np.sin(t)], -1).astype(np.float32)
    points = np.zeros((max_points, 2), np.float32)
    points[:n] = pts
    mask = np.zeros(max_points, bool)
    mask[:n] = True
    return jnp.asarray(points), jnp.asarray(mask), n


def _map_and_scan():
    spec = ProbMapSpec(resolution=0.01, height=1024, width=1024,
                       deviation=0.03, blur_offset=0.88)
    points, mask, n = _scan()
    pmap = make_prob_map(spec, offset=[5.12, 5.12])
    pmap = stamp_scan(spec, pmap, points, mask, jnp.zeros(3))
    return spec, pmap, points, mask, n


def test_bnb_matches_exhaustive_best():
    spec, pmap, points, mask, n = _map_and_scan()
    bnb = BnBParams(search_space_size=0.32, search_space_resolution=0.01,
                    search_angle_offset=0.0698,
                    search_angle_resolution=0.0349,
                    max_depth=3, beam_width=640, use_point_size=100)
    init = jnp.array([0.03, -0.02, 0.0], jnp.float32)
    res = bnb_scan_match(spec, bnb, pmap.probs, pmap.offset,
                         points, mask, jnp.int32(n), init)

    dense = CorrelativeParams(
        search_space_size=0.32, search_space_resolution=0.01,
        search_angle_offset=0.0698, search_angle_resolution=0.0349,
        response_threshold=0.5, use_point_size=100,
        use_center_penalty=False, tier=COARSE)
    center = world_to_map_pose(pmap.offset, spec.inv_res, init)
    scores, angles, xs, ys = score_candidates(
        spec, dense, pmap.probs, pmap.offset, points, mask, jnp.int32(n),
        center)
    best_dense = float(jnp.max(scores))
    assert abs(float(res.response) - best_dense) < 1e-5, (
        float(res.response), best_dense)


def test_bnb_recovers_perturbed_pose():
    spec, pmap, points, mask, n = _map_and_scan()
    bnb = BnBParams(search_space_size=0.4, search_space_resolution=0.01,
                    search_angle_offset=0.14, search_angle_resolution=0.0175,
                    max_depth=4, beam_width=512)
    init = jnp.array([0.09, -0.07, 0.05], jnp.float32)
    res = bnb_scan_match(spec, bnb, pmap.probs, pmap.offset,
                         points, mask, jnp.int32(n), init)
    pose = np.asarray(res.pose)
    assert float(res.response) > 0.6
    assert abs(pose[0]) < 0.025 and abs(pose[1]) < 0.025, pose
    assert abs(pose[2]) < 0.03, pose


def test_bnb_low_score_keeps_pose():
    spec, pmap, points, mask, n = _map_and_scan()
    bnb = BnBParams(search_space_size=0.16, search_space_resolution=0.01,
                    search_angle_offset=0.0349,
                    search_angle_resolution=0.0349, max_depth=2)
    far = jnp.array([4.5, 4.5, 0.0], jnp.float32)   # empty map corner
    res = bnb_scan_match(spec, bnb, pmap.probs, pmap.offset,
                         points, mask, jnp.int32(n), far)
    assert float(res.response) <= 0.5
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(far), atol=1e-6)
