"""Engine subsystems: async back-end pipeline, running-range window,
checkpoint/resume."""

import os

import numpy as np
import pytest

from roborts_slam_tpu.engine import ScanStore, SlamEngine
from roborts_slam_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from roborts_slam_tpu.io.scenes import SCENES, load_scene_map
from roborts_slam_tpu.io.simulate import simulate_log
from roborts_slam_tpu.utils.evaluation import ate_rmse, match_by_time
from tests.test_e2e_small import _small_config


@pytest.fixture(scope="module")
def icra_log():
    sc = SCENES["icra"]
    gt = load_scene_map(sc)
    return simulate_log(gt, sc.laser, odom_error=sc.odom_error,
                        range_noise=0.005, seed=3)


def test_device_store_mirrors_host():
    """The device-resident scan buffers must track the host store exactly
    through appends, pose corrections, and capacity growth — a stale pose
    here silently poisons every back-end chain map (caught as a
    checkpoint-resume trajectory divergence before this pin existed)."""
    rng = np.random.default_rng(0)
    st = ScanStore(max_points=8)
    st._DEV_BUCKET_START = 4          # exercise capacity doubling cheaply

    def check():
        pts, msk, nv, poses, cap = st.device_arrays()
        n = len(st)
        assert cap >= n
        np.testing.assert_array_equal(np.asarray(pts[:n]),
                                      np.stack(st._points))
        np.testing.assert_array_equal(np.asarray(msk[:n]),
                                      np.stack(st._masks))
        np.testing.assert_array_equal(np.asarray(nv[:n]), st._n_valid)
        np.testing.assert_allclose(np.asarray(poses[:n]),
                                   st.poses_array().astype(np.float32),
                                   atol=0)
        assert (np.asarray(nv[n:]) == 0).all()

    def add(i):
        st.add(rng.random((8, 2), np.float32).astype(np.float32),
               np.ones(8, bool), 8, np.array([float(i), -1.0, 0.1 * i]),
               np.zeros(3), i)

    for i in range(3):
        add(i)
    check()                            # initial build
    add(3)
    check()                            # in-place append
    st.set_pose(1, np.array([9.0, 9.0, 9.0]))
    check()                            # stale poses refreshed
    for i in range(4, 11):
        add(i)                         # overflows cap 4 -> rebuild at 16
    check()


def test_running_range_window():
    store = ScanStore(max_points=8, running_range_max_scans=5,
                      running_range_max_distance=2.0)
    pts = np.zeros((8, 2), np.float32)
    msk = np.ones(8, bool)
    # walk along x in 0.5 m steps: span cap (2.0 m) binds before count cap
    for i in range(10):
        store.add(pts, msk, 8, np.array([0.5 * i, 0.0, 0.0]), np.zeros(3), i)
    ids = store.running_ids
    assert len(ids) <= 5
    ps = np.array([store.poses[j][:2] for j in ids])
    assert (ps.max(0) - ps.min(0)).max() <= 2.0 + 1e-9
    assert ids[-1] == 9       # newest always kept


def test_async_backend_pipeline(icra_log):
    cfg = _small_config()
    log = icra_log
    sync = SlamEngine(cfg, log.laser, synchronous_backend=True)
    t_sync = sync.run_log(log)
    async_e = SlamEngine(cfg, log.laser, synchronous_backend=False)
    t_async = async_e.run_log(log)      # run_log flushes via finish()
    assert async_e._backend_thread is None   # joined

    est_s, gt_s = match_by_time(t_sync, log.gt_poses, log.times)
    est_a, gt_a = match_by_time(t_async, log.gt_poses, log.times)
    ate_s = ate_rmse(est_s, gt_s)
    ate_a = ate_rmse(est_a, gt_a)
    # same graph construction stream => same links; timing may shift
    # correction application, so require quality parity not bit equality
    assert async_e.backend.num_links >= 1
    assert ate_a < max(2.0 * ate_s, 0.15), (ate_a, ate_s)


def test_warm_backend_is_side_effect_free(icra_log):
    """warm_backend pre-compiles the solver/correction/chain-match programs
    (so the first loop closure doesn't pay mid-run jit compiles) and must
    not perturb ANY engine state: continuing the run after warming must
    reproduce the unwarmed trajectory bit-for-bit."""
    cfg = _small_config()
    log = icra_log
    n_pre = 12

    plain = SlamEngine(cfg, log.laser, synchronous_backend=True)
    warmed = SlamEngine(cfg, log.laser, synchronous_backend=True)
    for eng in (plain, warmed):
        for i in range(n_pre):
            eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
    warmed.warm_backend(solver_buckets=(64,), match_buckets=(1,))
    g = warmed.backend.graph
    n_v, n_e = g.num_vertices, len(g.edges)
    for eng in (plain, warmed):
        for i in range(n_pre, min(len(log), 60)):
            eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
        eng.finish()
    assert (warmed.backend.graph.num_vertices, warmed.backend.num_links) == \
        (plain.backend.graph.num_vertices, plain.backend.num_links)
    assert g.num_vertices >= n_v and len(g.edges) >= n_e
    np.testing.assert_array_equal(plain.trajectory_array(),
                                  warmed.trajectory_array())
    np.testing.assert_array_equal(plain.get_pub_map(), warmed.get_pub_map())


def test_checkpoint_roundtrip(tmp_path, icra_log):
    cfg = _small_config()
    log = icra_log
    half = len(log) // 2

    full = SlamEngine(cfg, log.laser)
    for i in range(len(log)):
        full.process(log.ranges[i], log.odom[i], float(log.times[i]))

    part = SlamEngine(cfg, log.laser)
    for i in range(half):
        part.process(log.ranges[i], log.odom[i], float(log.times[i]))
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(part, path)

    resumed = load_checkpoint(path)
    assert len(resumed.store) == len(part.store)
    assert resumed.backend.graph.num_vertices == part.backend.graph.num_vertices
    np.testing.assert_allclose(resumed.store.poses_array(),
                               part.store.poses_array(), atol=1e-12)
    for i in range(half, len(log)):
        resumed.process(log.ranges[i], log.odom[i], float(log.times[i]))

    t_full = full.trajectory_array()
    t_res = resumed.trajectory_array()
    assert t_full.shape == t_res.shape
    # resume is bit-exact in state, so trajectories agree to float tolerance
    np.testing.assert_allclose(t_res, t_full, atol=1e-5)


def test_engine_dedistortion_path(icra_log):
    """use_odom_correct + laser.scan_time wires LaserDataProcessor parity
    into ingest; the corrected run must still track ground truth."""
    import dataclasses
    cfg = _small_config().replace(use_odom_correct=True)
    log = icra_log
    laser = dataclasses.replace(log.laser, scan_time=0.025)
    eng = SlamEngine(cfg, laser)
    n = len(log) // 2
    for i in range(n):
        eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
    eng.finish()
    assert eng.diag.scans_processed > 20
    est, gt = match_by_time(eng.trajectory_array(), log.gt_poses, log.times)
    assert ate_rmse(est, gt) < 0.15


def test_async_backend_survives_finish(icra_log):
    """finish() must not be terminal: run_log flushes via finish(), and a
    second run on the same engine must still drive the back end."""
    cfg = _small_config()
    log = icra_log
    eng = SlamEngine(cfg, log.laser, synchronous_backend=False)
    third = len(log) // 3
    for i in range(third):
        eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
    eng.finish()
    links_before = eng.backend.num_links
    assert links_before > 0
    for i in range(third, 2 * third):
        eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
    eng.finish()
    assert eng.backend.num_links > links_before, (
        "backend thread did not restart after finish()")


def test_pub_map_grows_with_trajectory(icra_log):
    """The published map grows on demand when scans escape the preallocated
    extent (GridMapBase::UpdateBound/ExtendSize, grid_map_base.h:188-274):
    a run whose world_size is far too small must reproduce the map content
    of a comfortably-sized run instead of warn-then-clip."""
    log = icra_log
    cfg = _small_config().replace(match_map_window=10.0)
    n = min(90, len(log))

    big = SlamEngine(cfg, log.laser, world_size=40.0)
    small = SlamEngine(cfg, log.laser, world_size=8.0)
    for i in range(n):
        big.process(log.ranges[i], log.odom[i], float(log.times[i]))
        small.process(log.ranges[i], log.odom[i], float(log.times[i]))

    sspec = small.fspec.pub_spec
    assert max(sspec.width, sspec.height) > 256, (
        "pub map did not grow past its 8 m (256-cell) preallocation")
    tb, ts = big.trajectory_array(), small.trajectory_array()
    assert tb.shape == ts.shape
    np.testing.assert_allclose(ts[:, 1:3], tb[:, 1:3], atol=5e-3)

    # identical content over the aligned overlap; nothing outside it
    pb, ps = big.get_pub_map(), small.get_pub_map()
    ob = np.asarray(big.state.pub.offset, np.float64)
    osm = np.asarray(small.state.pub.offset, np.float64)
    res = cfg.map_resolution
    shift = np.round((osm - ob) / res).astype(int)          # (x, y) cells
    np.testing.assert_allclose((osm - ob) / res, shift, atol=1e-3)
    Hb, Wb = pb.shape
    Hs, Ws = ps.shape
    y0, x0 = max(0, -shift[1]), max(0, -shift[0])
    y1, x1 = min(Hb, Hs - shift[1]), min(Wb, Ws - shift[0])
    b = pb[y0:y1, x0:x1]
    s = ps[y0 + shift[1]:y1 + shift[1], x0 + shift[0]:x1 + shift[0]]
    assert (b == 100).sum() > 200, "comparison region carries no walls"
    mismatch = float(np.mean(b != s))
    assert mismatch < 0.005, f"map content diverged: {mismatch:.4%} cells"
    outside = pb.copy()
    outside[y0:y1, x0:x1] = -1
    assert (outside == -1).all(), "big run has content the grown map misses"


def test_async_corrections_reanchor_trailing_scans(icra_log):
    """Corrections computed from a stale snapshot (async mode) must carry
    the trailing scans with the last corrected scan's rigid delta, so
    relative placement across the snapshot boundary is preserved exactly
    (the reference corrects EVERY stored scan under the map mutex,
    slam_processor.cpp:329-370)."""
    cfg = _small_config()
    log = icra_log
    eng = SlamEngine(cfg, log.laser, synchronous_backend=True)
    i = 0
    while len(eng.store) < 8 and i < len(log):
        eng.process(log.ranges[i], log.odom[i], float(log.times[i]))
        i += 1
    n = len(eng.store)
    assert n >= 8
    n_corr = n - 3                      # 3 scans trail the solve snapshot
    before = eng.store.poses_array().copy()

    dth = 0.12
    c, s = np.cos(dth), np.sin(dth)
    tr = np.array([0.35, -0.2])

    def apply_delta(p):
        return np.array([tr[0] + c * p[0] - s * p[1],
                         tr[1] + s * p[0] + c * p[1], p[2] + dth])

    corrected = np.stack([apply_delta(before[k]) for k in range(n_corr)])
    eng._apply_corrections(corrected)

    after = eng.store.poses_array()
    for k in range(n):                  # trailing scans included: tight pin
        exp = apply_delta(before[k])
        np.testing.assert_allclose(after[k, :2], exp[:2], atol=1e-9)
        dang = after[k, 2] - exp[2]
        assert abs(np.arctan2(np.sin(dang), np.cos(dang))) < 1e-9
    # trajectory mirrors the store, boundary included
    traj = eng.trajectory_array()
    np.testing.assert_allclose(traj[-1, 1:3], after[-1, :2], atol=1e-9)


def test_windowed_running_range_match(icra_log):
    """use_running_range_scan_match: the engine matches against maps rebuilt
    from the running-range window (the reference's disabled windowed path,
    slam_processor.cpp:134-159, enabled here via config)."""
    log = icra_log
    cfg = _small_config().replace(use_running_range_scan_match=True,
                                  running_range_size=12)
    engine = SlamEngine(cfg, log.laser, synchronous_backend=True)
    n = min(120, len(log))
    for i in range(n):
        engine.process(log.ranges[i], log.odom[i], float(log.times[i]))
    assert engine.fspec.window_fine_spec is not None
    assert engine.diag.scans_processed > 10, engine.diag
    traj = engine.trajectory_array()
    est, gt = match_by_time(traj, log.gt_poses, log.times)
    ate = ate_rmse(est, gt)
    odom_est = log.odom[np.searchsorted(log.times, traj[:, 0]).clip(0, len(log) - 1)]
    ate_odom = ate_rmse(odom_est, gt)
    print(f"windowed ATE={ate:.3f} odom={ate_odom:.3f}")
    assert ate < 0.15 and np.isfinite(ate)
