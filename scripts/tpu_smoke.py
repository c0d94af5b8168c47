"""On-device TPU smoke: Pallas↔XLA kernel parity + a live engine slice.

CI pins every test to a virtual CPU mesh (tests/conftest.py), so the Pallas
kernels are only interpreted there; this script is the per-round on-device
check (VERDICT r1 item 6) that catches Mosaic/layout regressions CI cannot.
Run WITHOUT the CPU switch so jax uses the real TPU:

    python scripts/tpu_smoke.py          # ~2-4 min (first run compiles)

Prints one PASS/FAIL line per check and exits non-zero on any failure.
Covers: correlation scoring (single-tile, tiled multi-slab, deinterleaved
large-stride, rm-shaped 28 m long-range), the ray-carve mark image, the
ray-check consistency counter, and a 50-scan icra slice through the real
jitted front-end step (Pallas path) cross-checked against the XLA path.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAILURES = []


def check(name: str, ok: bool, detail: str = ""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    if not ok:
        FAILURES.append(name)


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def correlation_checks():
    import jax.numpy as jnp

    from roborts_slam_tpu.models.grid_map import ProbMapSpec
    from roborts_slam_tpu.ops.correlative import (
        COARSE, FINE, CorrelativeParams, score_candidates,
    )
    from roborts_slam_tpu.ops.pallas.correlation import (
        plan_tiles, score_candidates_pallas,
    )

    rng = np.random.default_rng(0)

    def run(name, size, res, coverage_m, reach_m, params, center_xy):
        spec = ProbMapSpec(resolution=res, height=size, width=size,
                           deviation=0.03, blur_offset=0.72,
                           coverage_cells=int(np.ceil(coverage_m / res)))
        probs = jnp.asarray(rng.uniform(0, 1, (size, size)).astype(np.float32))
        P = 512
        ang = rng.uniform(-np.pi, np.pi, P)
        r = rng.uniform(0.5, reach_m, P)
        pts = np.zeros((P, 2), np.float32)
        n = 120
        pts[:n] = np.stack([r[:n] * np.cos(ang[:n]),
                            r[:n] * np.sin(ang[:n])], -1)
        mask = np.zeros(P, bool)
        mask[:n] = True
        center = jnp.asarray(np.array([*center_xy, 0.25], np.float32))
        s_ref, *_ = score_candidates(spec, params, probs, jnp.zeros(2),
                                     jnp.asarray(pts), jnp.asarray(mask),
                                     jnp.int32(n), center)
        s_pal, *_ = score_candidates_pallas(spec, params, probs, jnp.zeros(2),
                                            jnp.asarray(pts), jnp.asarray(mask),
                                            jnp.int32(n), center,
                                            interpret=False)
        d = float(np.abs(np.asarray(s_ref) - np.asarray(s_pal)).max())
        check(f"correlation/{name} (plan {plan_tiles(spec)})", d < 6e-3,
              f"max|Δscore|={d:.2e}")

    run("single-tile", 2048, 0.01, 9.0, 7.0,
        CorrelativeParams(0.2, 0.02, 0.07, 0.035, 0.6, 50, True, FINE),
        (1024.0, 1024.0))
    run("tiled-2x2", 2560, 0.01, 14.0, 12.0,
        CorrelativeParams(0.2, 0.02, 0.06, 0.02, 0.6, 40, True, FINE),
        (1180.0, 1420.0))
    run("tiled-deinterleaved", 2560, 0.01, 14.0, 12.0,
        CorrelativeParams(0.6, 0.05, 0.07, 0.035, 0.6, 40, True, COARSE),
        (1300.0, 1250.0))
    run("rm-shaped-28m", 3584, 0.01, 32.0, 28.0,
        CorrelativeParams(0.2, 0.02, 0.05, 0.025, 0.6, 40, True, FINE),
        (1700.0, 1500.0))


def raster_checks():
    import jax.numpy as jnp

    from roborts_slam_tpu.models.grid_map import CountMap, CountMapSpec
    from roborts_slam_tpu.ops.raster import (
        scan_mark_image_pallas, scan_mark_image_xla,
    )
    from roborts_slam_tpu.ops.raycast import _bad_rays_pallas, _bad_rays_xla

    rng = np.random.default_rng(1)
    spec = CountMapSpec(resolution=0.05, height=1024, width=1024,
                        max_ray_cells=204, carve_window=512)
    P = 512
    ang = rng.uniform(-np.pi, np.pi, P)
    r = rng.uniform(0.3, 9.5, P)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)
    mask = rng.uniform(size=P) < 0.9
    pose = jnp.asarray(np.array([1.3, -0.7, 0.4], np.float32))
    offset = jnp.asarray(np.array([25.0, 25.0], np.float32))

    m_x = np.asarray(scan_mark_image_xla(spec, offset, jnp.asarray(pts),
                                         jnp.asarray(mask), pose))
    m_p = np.asarray(scan_mark_image_pallas(spec, offset, jnp.asarray(pts),
                                            jnp.asarray(mask), pose))
    check("raycarve/mark-image", np.array_equal(m_x, m_p),
          f"diff cells={int((m_x != m_p).sum())}")

    hits = rng.uniform(0, 8, (1024, 1024)).astype(np.float32)
    passes = rng.uniform(0, 10, (1024, 1024)).astype(np.float32)
    cmap = CountMap(jnp.asarray(hits), jnp.asarray(passes), offset)
    start = jnp.asarray(np.array([540, 500], np.int32))
    end = jnp.asarray(
        np.clip(rng.integers(350, 700, (P, 2)), 0, 1023).astype(np.int32))
    ray_ok = jnp.asarray(mask)
    bx = int(_bad_rays_xla(spec, cmap, start, end, ray_ok, 3.0, 0.2, 9))
    bp = int(_bad_rays_pallas(spec, cmap, start, end, ray_ok, 3.0, 0.2, 9))
    check("raycheck/bad-rays", bx == bp, f"xla={bx} pallas={bp}")


def engine_slice_check():
    import jax
    import jax.numpy as jnp

    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.engine import SlamEngine
    from roborts_slam_tpu.io.scenes import SCENES, load_scene_map
    from roborts_slam_tpu.io.simulate import simulate_log

    sc = SCENES["icra"]
    gt = load_scene_map(sc)
    log = simulate_log(gt, sc.laser, odom_error=sc.odom_error,
                       range_noise=0.005, seed=3)
    cfg = load_config("/root/reference/config/simulatin_param.yaml")

    t0 = time.time()
    engine = SlamEngine(cfg, log.laser, synchronous_backend=True)
    n = min(50, len(log))
    for i in range(n):
        engine.process(log.ranges[i], log.odom[i], float(log.times[i]))
    traj = engine.trajectory_array()
    dt = time.time() - t0
    ok = (engine.diag.scans_processed >= 10
          and np.all(np.isfinite(traj)))
    check("engine/50-scan icra slice (TPU)", ok,
          f"kept={engine.diag.scans_processed} wall={dt:.0f}s")

    # cross-check the final pose against the XLA matcher on the final state:
    # re-match the last kept scan against the engine's maps via both paths
    from roborts_slam_tpu.ops.correlative import correlative_scan_match

    st = engine.store
    if len(st) >= 2:
        pts, msk, nv = st.scan_arrays(len(st) - 1)
        pose = jnp.asarray(st.poses[-1], jnp.float32)
        args = (engine.fspec.fine_spec, engine.fspec.matcher.fine,
                engine.state.fine.probs, engine.state.fine.offset,
                pts, msk, nv, pose, jnp.eye(3))
        r_p = correlative_scan_match(*args, use_pallas=True)
        r_x = correlative_scan_match(*args, use_pallas=False)
        d = abs(float(r_p.response) - float(r_x.response))
        check("engine/final-state pallas-vs-xla re-match", d < 6e-3,
              f"|Δresponse|={d:.2e}")


def perf_pin_check():
    """Per-round perf regression pin (VERDICT r2 next-2): the full 3-tier
    scan_match per-call cost vs a stored budget, ±50%. One compiled
    program (dynamic-K slope, B=1) — this exact pin would have caught the
    round-2 slab-crop regression (292 -> ~560 us) before it shipped.
    Re-baseline intentionally with PERF_REBASELINE=1 after a *deliberate*
    protocol/workload change, and say why in the commit."""
    import json

    import jax
    import jax.numpy as jnp

    from roborts_slam_tpu.bench.timing import k_slope_dynamic
    from roborts_slam_tpu.frontend.matchers import scan_match

    budget_path = os.path.join(REPO, "scripts", "perf_budgets.json")
    budgets = json.load(open(budget_path)) if os.path.exists(budget_path) \
        else {}

    from roborts_slam_tpu.bench.workload import headline_workload

    w = headline_workload()
    matcher, fine_spec, coarse_spec = (w["matcher"], w["fine_spec"],
                                       w["coarse_spec"])
    fine_probs, coarse_probs = w["fine_probs"], w["coarse_probs"]
    offset, coff = w["offset"], w["coff"]
    points, mask, n_valid = w["points"], w["mask"], w["n_valid"]
    init = w["init_pose"]

    def measure(m, key, label, plaus=(50.0, 5000.0)):
        @jax.jit
        def chain(fp, K):
            def body(i, carry):
                pose, acc = carry
                out = scan_match(m, fine_spec, fp, offset, coarse_spec,
                                 coarse_probs, coff, points, mask,
                                 n_valid, pose)
                return (out.pose + 1e-6 * i, acc + out.score)
            return jax.lax.fori_loop(0, K, body, (init, jnp.float32(0)))[1]

        f = lambda seed, K: chain(fine_probs + jnp.float32(seed) * 1e-7,
                                  jnp.int32(K))
        # K spread sized so the device-time delta (~200 x 0.3 ms) dwarfs
        # the tunnel's +-10 ms execution jitter; (4,16) measured a bogus
        # 0 us here
        sec, _ = k_slope_dynamic(f, k_points=(64, 256), reps=3)
        us = sec * 1e6
        if not plaus[0] < us < plaus[1]:
            check(f"perf/{label} measurement plausible", False,
                  f"{us:.1f} us — slope collapsed (jitter swamped the K "
                  "delta or the loop body folded); NOT saved as a budget")
            return
        budget = budgets.get(key)
        if os.environ.get("PERF_REBASELINE") or budget is None:
            budgets[key] = round(us, 1)
            with open(budget_path, "w") as fh:
                json.dump(budgets, fh, indent=1)
            check(f"perf/{label} budget (re)baselined", True, f"{us:.0f} us")
            return
        # two-sided: impossibly-fast is the classic broken-measurement
        # symptom (PERFORMANCE.md "known quirks"), so it must FAIL too
        check(f"perf/{label} within budget", 0.5 * budget < us < 1.5 * budget,
              f"{us:.0f} us vs budget {budget:.0f} us (±50% gate)")

    measure(matcher, "three_tier_match_us", "3-tier match")
    # config-reachable matcher variants (VERDICT r2 weak #8: these shipped
    # with correctness tests only — nothing failed if one doubled in cost)
    import dataclasses as _dc

    from roborts_slam_tpu.frontend.matchers import MatcherParams

    cfg = w["cfg"]
    # BnB is genuinely ~20 ms on TPU: branch-and-bound's data-dependent
    # tree walk (lax.while_loop, scalar-ish node expansion) is a poor fit —
    # the dense Pallas sweep it replaces costs ~107 us. Pinned anyway so a
    # further regression of the config-reachable path still fails loudly.
    bnb_m = MatcherParams.from_config(
        _dc.replace(cfg, use_fast_correlation_match=True),
        use_center_penalty=True)
    measure(bnb_m, "bnb_match_us", "BnB-coarse match", plaus=(50.0, 50000.0))
    opt_m = MatcherParams.from_config(
        _dc.replace(cfg, use_optimize_scan_match=True),
        use_center_penalty=True)
    measure(opt_m, "optimize_match_us", "optimize+fallback match")


def main():
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}; devices: {jax.devices()}")
    if backend != "tpu":
        print("FAIL  not running on TPU — launch without JAX_PLATFORMS=cpu")
        sys.exit(2)
    _enable_compile_cache()

    correlation_checks()
    raster_checks()
    engine_slice_check()
    perf_pin_check()

    print(f"\n{'SMOKE FAIL: ' + ', '.join(FAILURES) if FAILURES else 'SMOKE OK'}")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
