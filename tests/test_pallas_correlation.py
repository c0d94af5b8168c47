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


def _tiled_setup(seed, n_points, res, size, reach_m, coverage_m,
                 center_xy, max_points=256):
    """Map larger than one slab: beams out to ``reach_m`` force the tiled
    slab plan (VERDICT r1 'range cliff': bases beyond one crop must read
    true map content, not the default border)."""
    rng = np.random.default_rng(seed)
    spec = ProbMapSpec(resolution=res, height=size, width=size,
                       deviation=0.05, blur_offset=0.88, default_prob=0.3,
                       coverage_cells=int(np.ceil(coverage_m / res)))
    probs = rng.uniform(0, 1, (size, size)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, max_points)
    r = rng.uniform(0.5, reach_m, max_points)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)
    mask = np.zeros(max_points, bool)
    mask[:n_points] = True
    pts[n_points:] = 0
    center = np.array([*center_xy, 0.3], np.float32)
    return (spec, jnp.asarray(probs), jnp.asarray(pts), jnp.asarray(mask),
            n_points, jnp.asarray(center))


def _check_tiled(params, setup):
    from roborts_slam_tpu.ops.pallas.correlation import plan_tiles

    spec, probs, pts, mask, n, center = setup
    ty, tx, crop = plan_tiles(spec)
    assert ty * tx > 1, f"test must exercise tiling, got plan {(ty, tx, crop)}"
    s_ref, a_ref, *_ = score_candidates(
        spec, params, probs, jnp.zeros(2), pts, mask, n, center)
    s_pal, a_pal, *_ = score_candidates_pallas(
        spec, params, probs, jnp.zeros(2), pts, mask, n, center,
        interpret=True)
    np.testing.assert_allclose(np.asarray(a_ref), np.asarray(a_pal), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pal), atol=6e-3)


def test_tiled_slab_multi_tile_parity():
    """2560-cell map @ 1 cm with 12 m beams -> 2x2 slab tiles."""
    setup = _tiled_setup(seed=7, n_points=80, res=0.01, size=2560,
                         reach_m=12.0, coverage_m=14.0,
                         center_xy=(1180.0, 1420.0))
    _check_tiled(CorrelativeParams(0.2, 0.02, 0.06, 0.02, 0.6, 30, True,
                                   FINE), setup)


def test_tiled_slab_deinterleaved_tier():
    """Large-stride (deinterleaved) tier on the tiled plan."""
    setup = _tiled_setup(seed=8, n_points=60, res=0.01, size=2560,
                         reach_m=12.0, coverage_m=14.0,
                         center_xy=(1300.0, 1250.0))
    _check_tiled(CorrelativeParams(0.6, 0.05, 0.07, 0.035, 0.6, 25, True,
                                   COARSE), setup)


def test_rm_shaped_long_range_parity():
    """The rm scene shape (30 m lidar, 1 cm fine map): beams ~28 m from the
    search center, far beyond one 2048-cell slab, some past the map edge.
    Round-1 kernel silently scored all of them as default_prob."""
    setup = _tiled_setup(seed=9, n_points=70, res=0.01, size=3584,
                         reach_m=28.0, coverage_m=32.0,
                         center_xy=(1700.0, 1500.0))
    _check_tiled(CorrelativeParams(0.2, 0.02, 0.05, 0.025, 0.6, 25, True,
                                   FINE), setup)


def test_out_of_coverage_defaults():
    """Bases outside the tiled coverage are outside the map and must score
    exactly default_prob per sample (analytic compensation path)."""
    setup = _tiled_setup(seed=10, n_points=50, res=0.01, size=2560,
                         reach_m=25.0, coverage_m=14.0,
                         center_xy=(2500.0, 60.0))
    # beams reach far beyond coverage (14 m) — all their map cells are
    # out-of-map here because the center sits at the map corner
    spec, probs, pts, mask, n, center = setup
    params = CorrelativeParams(0.2, 0.02, 0.05, 0.025, 0.6, 25, True, FINE)
    s_ref, *_ = score_candidates(spec, params, probs, jnp.zeros(2), pts,
                                 mask, n, center)
    s_pal, *_ = score_candidates_pallas(spec, params, probs, jnp.zeros(2),
                                        pts, mask, n, center, interpret=True)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_pal),
                               atol=6e-3)


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


def test_v2_pair_kernel_matches_xla():
    """The v2 (same-r lane-paired) scoring path — selectable with
    ROBORTS_CORR_KERNEL=2; measured speed-equal to v1 on v5e (see the
    module design block) — must match the XLA scorer on every tier."""
    from roborts_slam_tpu.models.grid_map import ProbMapSpec
    from roborts_slam_tpu.ops import correlative as CR
    from roborts_slam_tpu.ops.pallas.correlation import (
        score_candidates_pallas_v2,
    )

    spec = ProbMapSpec(resolution=0.01, height=512, width=512,
                       deviation=0.03, blur_offset=0.5)
    rng = np.random.default_rng(5)
    probs = jnp.asarray(rng.random((512, 512), np.float32))
    P = 64
    pts = rng.uniform(-2, 2, (P, 2)).astype(np.float32)
    mask = np.ones(P, bool)
    mask[50:] = False                  # exercise invalid-slot padding
    center = jnp.array([256.0, 256.0, 0.1], jnp.float32)
    tiers = [
        CR.CorrelativeParams(0.6, 0.05, 0.523, 0.0349, 0.3, 20, True,
                             CR.COARSE),
        CR.CorrelativeParams(0.2, 0.02, 0.175, 0.0349, 0.3, 20, True,
                             CR.FINE),
        CR.CorrelativeParams(0.02, 0.01, 0.0349, 0.00349, 0.3, 20, True,
                             CR.SUPER),
    ]
    for params in tiers:
        s_ref, *_ = CR.score_candidates(
            spec, params, probs, jnp.zeros(2), jnp.asarray(pts),
            jnp.asarray(mask), jnp.int32(50), center)
        s_v2, *_ = score_candidates_pallas_v2(
            spec, params, probs, jnp.zeros(2), jnp.asarray(pts),
            jnp.asarray(mask), jnp.int32(50), center, interpret=True)
        np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_v2),
                                   atol=5e-3)
