"""Parity: the Pallas band-walk carve kernel must reproduce the XLA scatter
DDA mark image bit-exactly (both use the same exact-integer cell rule)."""

import numpy as np
import jax.numpy as jnp
import pytest

from roborts_slam_tpu.models.grid_map import CountMapSpec
from roborts_slam_tpu.ops.raster import (scan_mark_image_pallas,
                                         scan_mark_image_xla)


def _scan(rng, n, rmax):
    ang = rng.uniform(-2.4, 2.4, n)
    r = rng.uniform(0.2, rmax, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)
    mask = rng.random(n) > 0.1
    return jnp.asarray(pts), jnp.asarray(mask)


@pytest.mark.parametrize("seed,pose,offset_m", [
    (0, [0.0, 0.0, 0.0], 6.4),
    (1, [1.3, -0.7, 0.9], 6.4),
    (2, [-5.0, 5.5, -2.2], 6.4),    # near the window-clamp corner
    (3, [0.2, 0.1, 0.0], 0.0),      # sensor near the map origin edge
])
def test_mark_image_parity(seed, pose, offset_m):
    rng = np.random.default_rng(seed)
    spec = CountMapSpec(resolution=0.05, height=256, width=256,
                        max_ray_cells=52, carve_window=128)
    offset = jnp.array([offset_m, offset_m], jnp.float32)
    pts, mask = _scan(rng, 64, rmax=2.4)
    pose = jnp.asarray(pose, jnp.float32)

    ref = np.asarray(scan_mark_image_xla(spec, offset, pts, mask, pose))
    got = np.asarray(scan_mark_image_pallas(spec, offset, pts, mask, pose,
                                            interpret=True))
    mismatches = int((ref != got).sum())
    assert mismatches == 0, (
        f"{mismatches} mark cells differ "
        f"(free ref={int((ref == 1).sum())} got={int((got == 1).sum())}, "
        f"occ ref={int((ref == 2).sum())} got={int((got == 2).sum())})")
    assert (ref == 2).sum() > 0  # sanity: endpoints actually stamped


def test_mark_image_parity_long_rays_small_window():
    """Rays that exit the window/map: the in-map prefix must still match."""
    rng = np.random.default_rng(7)
    spec = CountMapSpec(resolution=0.05, height=128, width=128,
                        max_ray_cells=52, carve_window=128)
    offset = jnp.array([3.2, 3.2], jnp.float32)
    pts, mask = _scan(rng, 48, rmax=2.5)
    pose = jnp.array([2.8, -2.9, 0.7], jnp.float32)  # close to map corner
    ref = np.asarray(scan_mark_image_xla(spec, offset, pts, mask, pose))
    got = np.asarray(scan_mark_image_pallas(spec, offset, pts, mask, pose,
                                            interpret=True))
    assert (ref != got).sum() == 0


def test_penalty_parity():
    """The Pallas ray-check kernel must count the same bad rays as the XLA
    gather DDA, across map states and poses."""
    import jax.numpy as jnp

    from roborts_slam_tpu.models.grid_map import CountMap
    from roborts_slam_tpu.ops import raycast
    from roborts_slam_tpu.ops.raster import _cell_round
    from roborts_slam_tpu.utils.geometry import transform_points

    rng = np.random.default_rng(11)
    spec = CountMapSpec(resolution=0.05, height=256, width=256,
                        max_ray_cells=52, carve_window=128)
    # map with scattered occupied blobs
    passes = (rng.random((256, 256)) * 8).astype(np.float32)
    hits = passes * (rng.random((256, 256)) > 0.7)
    cmap = CountMap(jnp.asarray(hits), jnp.asarray(passes),
                    jnp.asarray([6.4, 6.4], jnp.float32))
    for seed, pose in [(0, [0.0, 0.0, 0.0]), (1, [1.1, -0.8, 0.5]),
                       (2, [-4.9, 5.2, 2.0])]:
        r2 = np.random.default_rng(seed)
        pts, mask = _scan(r2, 80, rmax=2.4)
        pose_j = jnp.asarray(pose, jnp.float32)
        pose_map = jnp.asarray(
            (jnp.concatenate([(pose_j[:2] + cmap.offset) * spec.inv_res,
                              pose_j[2:]])))
        sidx, svalid = raycast._sample_beams(pts, mask, jnp.int32(80), 40)
        pts_map = transform_points(pose_map, pts[sidx] * spec.inv_res)
        end = _cell_round(pts_map)
        start = _cell_round(pose_map[:2])
        same = (end[:, 0] == start[0]) & (end[:, 1] == start[1])
        end_in = ((end[:, 0] > 0) & (end[:, 0] < spec.width)
                  & (end[:, 1] > 0) & (end[:, 1] < spec.height))
        ray_ok = svalid & ~same & end_in
        args = (spec, cmap, start, end, ray_ok,
                jnp.float32(3.0), jnp.float32(0.5), 26)
        ref = int(raycast._bad_rays_xla(*args))
        got = int(raycast._bad_rays_pallas(*args, interpret=True))
        assert ref == got, (seed, ref, got)
    assert ref >= 0


def test_empty_scan():
    spec = CountMapSpec(resolution=0.05, height=128, width=128,
                        max_ray_cells=52, carve_window=128)
    offset = jnp.array([3.2, 3.2], jnp.float32)
    pts = jnp.zeros((16, 2), jnp.float32)
    mask = jnp.zeros(16, bool)
    got = np.asarray(scan_mark_image_pallas(spec, offset, pts, mask,
                                            jnp.zeros(3), interpret=True))
    assert (got == 0).all()
