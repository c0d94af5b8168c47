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


def test_empty_scan():
    spec = CountMapSpec(resolution=0.05, height=128, width=128,
                        max_ray_cells=52, carve_window=128)
    offset = jnp.array([3.2, 3.2], jnp.float32)
    pts = jnp.zeros((16, 2), jnp.float32)
    mask = jnp.zeros(16, bool)
    got = np.asarray(scan_mark_image_pallas(spec, offset, pts, mask,
                                            jnp.zeros(3), interpret=True))
    assert (got == 0).all()
