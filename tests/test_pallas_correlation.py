"""Pallas correlation kernel (interpret mode on CPU) vs the XLA gather path."""

import numpy as np
import jax.numpy as jnp

from roborts_slam_tpu.models.grid_map import ProbMapSpec
from roborts_slam_tpu.ops.correlative import (
    COARSE, FINE, SUPER, CorrelativeParams, score_candidates,
)
from roborts_slam_tpu.ops.pallas.correlation import score_candidates_pallas


def _setup(seed=0, n_points=90, max_points=128, res=0.02):
    rng = np.random.default_rng(seed)
    spec = ProbMapSpec(resolution=res, height=1024, width=1024, deviation=0.05,
                       blur_offset=0.88, default_prob=0.3)
    probs = rng.uniform(0, 1, (spec.height, spec.width)).astype(np.float32)
    pts = rng.uniform(-3, 3, size=(max_points, 2)).astype(np.float32)
    mask = np.zeros(max_points, bool)
    mask[:n_points] = True
    pts[n_points:] = 0
    center = np.array([512.0, 512.0, 0.4], np.float32)
    return spec, jnp.asarray(probs), jnp.asarray(pts), jnp.asarray(mask), n_points, jnp.asarray(center)


def _check_tier(params, seed=0):
    spec, probs, pts, mask, n, center = _setup(seed)
    s_ref, a_ref, x_ref, y_ref = score_candidates(
        spec, params, probs, jnp.zeros(2), pts, mask, n, center)
    s_pal, a_pal, x_pal, y_pal = score_candidates_pallas(
        spec, params, probs, jnp.zeros(2), pts, mask, n, center,
        interpret=True)
    np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_pal), atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_pal), atol=1e-4)
    # bf16 map quantization: |err| <= ~0.4% relative on sums of ~100 values
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pal),
                               atol=5e-3)


def test_coarse_tier_matches_xla():
    _check_tier(CorrelativeParams(0.6, 0.1, 0.175, 0.0349, 0.6, 40, True,
                                  COARSE))


def test_fine_tier_matches_xla():
    _check_tier(CorrelativeParams(0.2, 0.04, 0.0698, 0.0349, 0.6, 40, True,
                                  FINE), seed=1)


def test_super_tier_matches_xla():
    _check_tier(CorrelativeParams(0.04, 0.02, 0.0349, 0.00349, 0.6, 60, True,
                                  SUPER), seed=2)


def test_small_scan_fewer_than_2x_use_points():
    spec, probs, pts, mask, n, center = _setup(3, n_points=30)
    params = CorrelativeParams(0.4, 0.04, 0.0698, 0.0349, 0.6, 40, True, COARSE)
    s_ref, *_ = score_candidates(spec, params, probs, jnp.zeros(2), pts, mask,
                                 30, center)
    s_pal, *_ = score_candidates_pallas(spec, params, probs, jnp.zeros(2),
                                        pts, mask, 30, center, interpret=True)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pal), atol=5e-3)


def test_randomized_config_sweep():
    """Property test: pallas == XLA scoring across randomized tier
    geometries (step sizes, window sizes, angle grids, scan sizes, map
    offsets) — the parity net for future kernel changes."""
    rng = np.random.default_rng(42)
    for trial in range(6):
        res = float(rng.choice([0.01, 0.02, 0.025, 0.05]))
        st = int(rng.choice([1, 2, 4, 5]))
        n_sp = int(rng.integers(2, 8))
        params = CorrelativeParams(
            search_space_size=st * res * n_sp,
            search_space_resolution=st * res,
            search_angle_offset=float(rng.uniform(0.03, 0.3)),
            search_angle_resolution=float(rng.uniform(0.01, 0.05)),
            response_threshold=0.6,
            use_point_size=int(rng.choice([20, 40, 100])),
            use_center_penalty=True,
            tier=int(rng.choice([COARSE, FINE, SUPER])),
        )
        n_points = int(rng.integers(15, 120))
        spec, probs, pts, mask, n, center = _setup(
            seed=100 + trial, n_points=n_points, res=res)
        center = jnp.asarray(np.array(
            [512.0 + rng.uniform(-40, 40), 512.0 + rng.uniform(-40, 40),
             rng.uniform(-3, 3)], np.float32))
        s_ref, a_ref, *_ = score_candidates(
            spec, params, probs, jnp.zeros(2), pts, mask, n_points, center)
        s_pal, a_pal, *_ = score_candidates_pallas(
            spec, params, probs, jnp.zeros(2), pts, mask, n_points, center,
            interpret=True)
        np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_pal),
                                   atol=1e-6, err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pal),
                                   atol=6e-3, err_msg=f"trial {trial}")
