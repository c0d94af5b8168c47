"""Map-consistency raycast check.

TPU-native replacement for ``OccuGridMap::MapFeedbackResponsePenalty``
(src/map/occu_grid_map.h:331-392 + CheckOccuLineVisitorCallback :447-471):
ray-trace a pose hypothesis against the pub map and penalize rays that cross
an occupied cell well before their endpoint. Two equivalent paths:

- XLA: masked exact-integer DDA sample grid over (rays, steps) + gathers.
- Pallas (TPU default): the band-walk ray-check kernel
  (ops/pallas/raycarve.py) reading a VMEM occupancy-bitmap window — cost
  proportional to actual ray cells instead of rays x max_ray_cells gathers.

Both use the same integer cell rule and integer squared-distance test, so
they agree bit-exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.grid_map import CountMap, CountMapSpec, world_to_map_pose
from ..utils.geometry import transform_points
from .raster import _cell_round


def _sample_beams(points, mask, n_valid, check_point_num: int):
    """Beam subsampling with the scan matcher's striding rule
    (occu_grid_map.h:362-369)."""
    use = check_point_num
    small = n_valid < 2 * use
    step = jnp.where(small, 1, n_valid // jnp.maximum(use - 1, 1))
    max_samples = 2 * use
    sidx = jnp.arange(max_samples, dtype=jnp.int32) * step
    svalid = sidx < n_valid
    sidx = jnp.clip(sidx, 0, points.shape[0] - 1)
    svalid &= mask[sidx]
    return sidx, svalid


def map_feedback_penalty(spec: CountMapSpec, cmap: CountMap,
                         points, mask, n_valid, pose_world,
                         check_point_num: int, bound_tolerance: float,
                         penalty_gain: float,
                         min_passthrough, occu_threshold):
    """Returns the response coefficient in [0.1, 1+2*gain].

    Reference semantics: subsample ``check_point_num`` beams; a ray is "bad"
    (adds 1) if any visited cell is Occupied (pass >= min_passthrough and
    prob >= occu_threshold, grid_map_cell.h:125-136) at distance
    > bound_tolerance cells from the beam endpoint; coefficient =
    max(1 + 2*gain − gain·Σbad, 0.1) (occu_grid_map.h:388-389).
    """
    inv_res = spec.inv_res
    pose_map = world_to_map_pose(cmap.offset, inv_res, pose_world)
    in_map = ((pose_map[0] > 0) & (pose_map[0] < spec.width)
              & (pose_map[1] > 0) & (pose_map[1] < spec.height))

    sidx, svalid = _sample_beams(points, mask, n_valid, check_point_num)
    pts_map = transform_points(pose_map, points[sidx] * inv_res)  # (S,2)
    end = _cell_round(pts_map)
    start = _cell_round(pose_map[:2])
    same = (end[:, 0] == start[0]) & (end[:, 1] == start[1])
    end_in = ((end[:, 0] > 0) & (end[:, 0] < spec.width)
              & (end[:, 1] > 0) & (end[:, 1] < spec.height))
    ray_ok = svalid & ~same & end_in

    # d > tol  <=>  d^2 >= floor(tol^2) + 1  (d^2 integer)
    thr_d2 = int(math.floor(bound_tolerance * bound_tolerance)) + 1

    if spec.carve_window and jax.default_backend() == "tpu":
        bad_total = _bad_rays_pallas(spec, cmap, start, end, ray_ok,
                                     min_passthrough, occu_threshold, thr_d2)
    else:
        bad_total = _bad_rays_xla(spec, cmap, start, end, ray_ok,
                                  min_passthrough, occu_threshold, thr_d2)

    penalty = bad_total.astype(jnp.float32) * penalty_gain
    coeff = jnp.maximum(1.0 + 2.0 * penalty_gain - penalty, 0.1)
    return jnp.where(in_map, coeff, 0.0)


def _bad_rays_xla(spec, cmap, start, end, ray_ok,
                  min_passthrough, occu_threshold, thr_d2: int):
    S = spec.max_ray_cells
    delta = end - start[None, :]                                  # (P,2) int
    nsteps = jnp.maximum(jnp.max(jnp.abs(delta), axis=-1), 1)
    t = jnp.arange(S, dtype=jnp.int32)[None, :]
    n2 = (2 * nsteps)[:, None, None]
    num = (n2 * start[None, None, :]
           + 2 * delta[:, None, :] * t[:, :, None] + nsteps[:, None, None])
    cells = num // n2                                             # (P,S,2)
    on_line = t <= nsteps[:, None]

    cx = jnp.clip(cells[..., 0], 0, spec.width - 1)
    cy = jnp.clip(cells[..., 1], 0, spec.height - 1)
    passes = cmap.passes[cy, cx]
    hits = cmap.hits[cy, cx]
    prob = jnp.where(passes > 0, hits / jnp.maximum(passes, 1e-9), 0.5)
    occupied = (passes >= min_passthrough) & (prob >= occu_threshold)

    d2 = jnp.sum((cells - end[:, None, :]) ** 2, axis=-1)
    bad_cell = occupied & (d2 >= thr_d2) & on_line & ray_ok[:, None]
    return jnp.sum(jnp.any(bad_cell, axis=-1).astype(jnp.int32))


def _bad_rays_pallas(spec, cmap, start, end, ray_ok,
                     min_passthrough, occu_threshold, thr_d2: int,
                     interpret: bool = False):
    from .pallas.raycarve import pack_codes, ray_check_window

    W = spec.carve_window
    oy = jnp.clip(start[1] - W // 2, 0, spec.height - W)
    ox = jnp.clip(start[0] - W // 2, 0, spec.width - W)
    passes_w = jax.lax.dynamic_slice(cmap.passes, (oy, ox), (W, W))
    hits_w = jax.lax.dynamic_slice(cmap.hits, (oy, ox), (W, W))
    prob = jnp.where(passes_w > 0, hits_w / jnp.maximum(passes_w, 1e-9), 0.5)
    occ = ((passes_w >= min_passthrough)
           & (prob >= occu_threshold)).astype(jnp.int32)

    origin = jnp.stack([ox, oy])
    info = (start - origin).astype(jnp.int32)
    codes = pack_codes(end - origin[None, :], ray_ok)
    return ray_check_window(info, codes, occ, window=W, thr_d2=thr_d2,
                            interpret=interpret)
