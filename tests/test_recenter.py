"""Rolling-window scan-match maps (auto-recenter)."""

import numpy as np
import jax.numpy as jnp

from roborts_slam_tpu.engine import SlamEngine
from roborts_slam_tpu.io.scenes import SCENES, load_scene_map
from roborts_slam_tpu.io.simulate import simulate_log
from roborts_slam_tpu.models.grid_map import ProbMap, ProbMapSpec, shift_prob_map
from roborts_slam_tpu.utils.evaluation import ate_rmse, match_by_time
from tests.test_e2e_small import _small_config


def test_shift_prob_map_geometry():
    spec = ProbMapSpec(resolution=0.1, height=16, width=16, deviation=0.1,
                       blur_offset=0.9, default_prob=0.25)
    probs = np.full((16, 16), 0.25, np.float32)
    probs[4, 7] = 0.9                       # marked world point
    pmap = ProbMap(jnp.asarray(probs), jnp.asarray([0.8, 0.8], jnp.float32))
    # world position of the mark: map (x=7, y=4) -> w = m*res - off
    wx, wy = 7 * 0.1 - 0.8, 4 * 0.1 - 0.8

    shifted = shift_prob_map(spec, pmap, (2, 3))       # (sy, sx)
    # same world point must map to the same value through the new offset
    off = np.asarray(shifted.offset)
    mx = round((wx + off[0]) / 0.1)
    my = round((wy + off[1]) / 0.1)
    arr = np.asarray(shifted.probs)
    assert arr[my, mx] == np.float32(0.9), (mx, my)
    # exposed cells take the default
    assert arr[-1, -1] == np.float32(0.25)
    # negative shifts too
    back = shift_prob_map(spec, shifted, (-2, -3))
    np.testing.assert_allclose(np.asarray(back.offset),
                               np.asarray(pmap.offset), atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.probs)[4, 7], 0.9)


def test_windowed_run_tracks_long_trajectory():
    """rm arena with a match window much smaller than the world: the rolling
    maps must recenter repeatedly without losing track."""
    sc = SCENES["rm"]
    gt = load_scene_map(sc)
    log = simulate_log(gt, sc.laser, odom_error=sc.odom_error,
                       range_noise=0.005, seed=5, speed=1.0)
    cfg = _small_config().replace(world_size=40.0, max_points=384,
                                  match_map_window=12.0)
    eng = SlamEngine(cfg, log.laser)
    n = len(log) // 2
    for i in range(n):
        eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
    eng.finish()
    # window (12 m) << trajectory span; recentering must have happened
    fs = eng.fspec.fine_spec
    # window rounds up to the 128-cell tile, never to the world extent
    assert fs.width * fs.resolution <= 13.0
    init_off = np.array([fs.width * fs.resolution / 2] * 2)
    assert not np.allclose(np.asarray(eng.state.fine.offset), init_off), \
        "window never recentered"
    est, gtm = match_by_time(eng.trajectory_array(), log.gt_poses, log.times)
    ate = ate_rmse(est, gtm)
    assert eng.diag.scans_processed > 10
    assert ate < 0.15, ate
