"""Measure the reference pipeline (headless harness) and the TPU engine on
the SAME simulated logs, and emit BASELINE_MEASURED.md.

This executes VERDICT.md item 1: the reference core
(/root/reference/src/slam/slam_processor.cpp:65-247 and the full matcher /
pose-graph stack) is compiled unmodified by native/ref_harness/build.sh and
replayed on the icra / rm / willow logs from tools/export_ref_logs.py;
per-stage ms/scan come from the reference's own TIMER macros
(-DSLAM_TIME_DEBUG, src/util/slam_util.h:63-65) and end-to-end ATE from the
final corrected trajectory.

Usage:
  python tools/measure_reference.py ref    [--scenes icra rm willow] [--realtime 1]
  python tools/measure_reference.py ours   [--scenes icra rm willow]
  python tools/measure_reference.py report

Results accumulate in out/ref_logs/results.json; `report` renders the
markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "out", "ref_logs")
RESULTS = os.path.join(OUT_DIR, "results.json")
HARNESS = os.path.join(REPO, "native", "ref_harness", "ref_harness")

STAGE_RE = re.compile(r"\[(\w+)\]cost time: ([0-9.eE+-]+)ms")
SCAN_RE = re.compile(
    r"HARNESS scan (\d+) id (\d+) kept (\d) ok (\d) ms ([0-9.eE+-]+)")
SOLVER_RE = re.compile(
    r"HARNESS solver solves (\d+) iters (\d+) ms ([0-9.eE+-]+) "
    r"last_poses (\d+) last_constraints (\d+)")


def load_results() -> dict:
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    # out/ is gitignored, so a fresh checkout has no results store — but the
    # committed report embeds every raw record; seed the store from it so a
    # partial re-measure doesn't silently drop the other sections' rows
    md = os.path.join(REPO, "BASELINE_MEASURED.md")
    if os.path.exists(md):
        m = re.search(r"## Raw records\n\n```json\n(.*?)\n```",
                      open(md).read(), re.S)
        if m:
            try:
                return json.loads(m.group(1))
            except ValueError:
                pass
    return {}


def save_results(res: dict) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=2)


def ensure_logs(scenes: list[str]) -> None:
    from tools.export_ref_logs import export_scene, flatten_yaml_params

    for name in scenes:
        if not os.path.exists(os.path.join(OUT_DIR, f"{name}.refbin")):
            print(f"exporting {name} log ...")
            export_scene(name, OUT_DIR)
    params = os.path.join(OUT_DIR, "params_sim.txt")
    if not os.path.exists(params):
        flatten_yaml_params(
            "/root/reference/config/simulatin_param.yaml", params)


def ate_from_csv(csv_path: str) -> tuple[float, float, int]:
    from roborts_slam_tpu.utils.evaluation import ate_rmse

    rows = np.loadtxt(csv_path, delimiter=",", skiprows=1)
    est_xy = rows[:, 2:4]
    gt_xy = rows[:, 5:7]
    odom_xy = rows[:, 8:10]
    return (ate_rmse(est_xy, gt_xy, align=True),
            ate_rmse(odom_xy, gt_xy, align=True), rows.shape[0])


def measure_ref(scene: str, realtime: float) -> dict:
    log_path = os.path.join(OUT_DIR, f"{scene}.refbin")
    params = os.path.join(OUT_DIR, "params_sim.txt")
    traj = os.path.join(OUT_DIR, f"{scene}_ref_traj.csv")
    cmd = [HARNESS, log_path, params, traj]
    if realtime > 0:
        cmd += ["--realtime", str(realtime)]
    print("running:", " ".join(cmd))
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
        raise RuntimeError(f"harness failed on {scene}")

    stages: dict[str, list[float]] = {}
    for name, ms in STAGE_RE.findall(proc.stdout):
        stages.setdefault(name, []).append(float(ms))
    scans = SCAN_RE.findall(proc.stdout)
    kept = [s for s in scans if s[2] == "1"]
    per_scan_ms = [float(s[4]) for s in scans]
    kept_ms = [float(s[4]) for s in kept]
    m = SOLVER_RE.search(proc.stdout)
    solver = dict(zip(
        ["solves", "iters", "ms", "last_poses", "last_constraints"],
        [float(x) for x in m.groups()])) if m else {}

    ate, odom_ate, n_kept = ate_from_csv(traj)
    result = {
        "scene": scene,
        "realtime": realtime,
        "wall_s": wall,
        "n_scans": len(scans),
        "n_kept": n_kept,
        "ate_m": ate,
        "odom_ate_m": odom_ate,
        "mean_process_ms_kept": float(np.mean(kept_ms)) if kept_ms else 0.0,
        "p50_process_ms_kept": float(np.median(kept_ms)) if kept_ms else 0.0,
        "p95_process_ms_kept": float(np.percentile(kept_ms, 95)) if kept_ms else 0.0,
        "total_front_end_ms": float(np.sum(per_scan_ms)),
        "stages_mean_ms": {k: float(np.mean(v)) for k, v in stages.items()},
        "stages_count": {k: len(v) for k, v in stages.items()},
        "solver": solver,
    }
    # throughput over kept scans in unthrottled mode
    if realtime == 0 and kept_ms:
        result["scans_per_sec"] = 1000.0 / float(np.mean(kept_ms))
    return result


def _world_from_log(log) -> float:
    """Preallocated world extent for an offline replay: the maps are centered
    on the start pose, so they must span the farthest beam endpoint (the
    reference instead grows its maps dynamically, grid_map_base.h:188-274)."""
    la = log.laser
    ang = np.linspace(la.angle_min, la.angle_max, la.num_beams)
    start = log.odom[0, :2]
    dmax = la.range_max
    for i in range(0, len(log), 5):
        p = log.odom[i]
        r = log.ranges[i]
        ok = (r > la.range_min) & (r < la.range_threshold)
        if not ok.any():
            continue
        a = ang[ok] + p[2]
        ex = p[0] + r[ok] * np.cos(a) - start[0]
        ey = p[1] + r[ok] * np.sin(a) - start[1]
        dmax = max(dmax, float(np.abs(np.concatenate([ex, ey])).max()))
    return 2.0 * (dmax + 3.0)


def measure_ours(scene: str) -> dict:
    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.engine import SlamEngine
    from roborts_slam_tpu.io.scan_log import ScanLog
    from roborts_slam_tpu.utils.evaluation import ate_rmse, match_by_time

    log = ScanLog.load(os.path.join(OUT_DIR, f"{scene}.npz"))
    cfg = load_config("/root/reference/config/simulatin_param.yaml")
    world = _world_from_log(log)
    # very large worlds: cap the scan-match maps with the rolling window
    # (the engine's unbounded-world mode); 4x the lidar range keeps every
    # beam inside the window between recenters
    if world / cfg.fine_map_resolution > 4608:
        window = 4.0 * log.laser.range_threshold + 2.0
        if window < world:
            cfg = cfg.replace(match_map_window=window)
    engine = SlamEngine(cfg, log.laser, world_size=world,
                        synchronous_backend=True)

    t0 = time.time()
    traj = engine.run_log(log, progress=True)
    wall = time.time() - t0

    est, gt = match_by_time(traj, log.gt_poses, log.times)
    ate = ate_rmse(est, gt, align=True)
    np.save(os.path.join(OUT_DIR, f"{scene}_ours_traj.npy"), traj)
    timers = {name: s.mean_ms for name, s in engine.timers.stages.items()}
    return {
        "scene": scene,
        "wall_s": wall,
        "n_scans": len(log),
        "n_kept": len(traj),
        "ate_m": float(ate),
        "loop_closures": engine.diag.loop_closures,
        "stages_mean_ms": timers,
        "scans_per_sec": len(traj) / wall if wall > 0 else 0.0,
    }


def _engine_for_scene(scene: str, synchronous_backend: bool = True):
    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.engine import SlamEngine
    from roborts_slam_tpu.io.scan_log import ScanLog

    log = ScanLog.load(os.path.join(OUT_DIR, f"{scene}.npz"))
    cfg = load_config("/root/reference/config/simulatin_param.yaml")
    world = _world_from_log(log)
    if world / cfg.fine_map_resolution > 4608:
        window = 4.0 * log.laser.range_threshold + 2.0
        if window < world:
            cfg = cfg.replace(match_map_window=window)
    return SlamEngine(cfg, log.laser, world_size=world,
                      synchronous_backend=synchronous_backend), log


def measure_ours_tpu(scene: str, warm_scans: int = 40) -> dict:
    """Device-timed front-end throughput on the real TPU.

    Wall-clock through the dispatch tunnel is dominated by a ~30-45 ms
    content-independent floor, so per-scan latency is measured with the
    two-point K-slope protocol (roborts_slam_tpu/bench/timing.py): K
    front-end steps chained in ONE jitted program over genuine engine state
    (maps built by replaying the first ``warm_scans`` scans of the same
    log), real scan points, slope of t(K2)-t(K1). This mirrors the
    reference's per-scan front-end ms (mean_process_ms_kept)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    assert jax.default_backend() == "tpu", (
        "ours-tpu must run on the TPU backend (no JAX_PLATFORMS=cpu)")

    from roborts_slam_tpu.bench.timing import k_slope
    from roborts_slam_tpu.frontend.processor import frontend_step

    engine, log = _engine_for_scene(scene)
    n_warm = min(warm_scans, len(log))
    for i in range(n_warm):
        engine.process(log.ranges[i], log.odom[i], float(log.times[i]))
    assert len(engine.store) >= 2, "warmup kept no scans"

    state0 = engine.state
    spec = engine.fspec
    pts, msk, nv = engine.store.scan_arrays(len(engine.store) - 1)
    odom = jnp.asarray(engine.store.odoms[-1], jnp.float32)

    def make_chain(K):
        @jax.jit
        def chained(state, seed):
            def body(i, st):
                # perturb the odom pair per iteration: keeps every step's
                # inputs data-dependent on i (nothing folds) while the
                # workload stays the per-kept-scan front-end cost
                d = 1e-5 * (i + 1) + seed * 1e-7
                st2, info = frontend_step(spec, st, pts, msk, nv,
                                          odom + d)
                return st2
            out = jax.lax.fori_loop(0, K, body, state)
            return out.pose.sum() + out.scan_index

        return lambda seed: chained(state0, jnp.float32(seed))

    per_scan_s = k_slope(make_chain, k_points=(8, 24), reps=3)
    return {
        "scene": scene,
        "method": "k-slope chained frontend_step on real engine state",
        "warm_scans_kept": len(engine.store),
        "frontend_ms_per_scan": per_scan_s * 1000.0,
        "scans_per_sec": 1.0 / per_scan_s,
    }


def measure_ours_tpu_e2e(scene: str, max_scans: int = 200,
                         max_wall_s: float = 300.0,
                         synchronous: bool = True,
                         pipelined: bool = False) -> dict:
    """Sustained END-TO-END (front-end + back-end) wall-clock throughput on
    the real TPU — the system-level number beside the K-slope front-end
    device time (VERDICT r2 weak #4). Includes every host<->device dispatch
    the engine makes; through this environment's axon tunnel each dispatch
    carries a ~30-45 ms content-independent floor, so the result is a LOWER
    bound set mostly by (dispatches/scan) x floor rather than device
    compute. Per-stage call counts are reported so that contribution can be
    quantified; on directly-attached TPU hardware the same dispatch floor
    is ~100 us (i.e. multiply dispatches/scan by ~0.1 ms for the attached-
    hardware estimate)."""
    import jax

    from roborts_slam_tpu.utils.profiling import StageTimers

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    assert jax.default_backend() == "tpu", (
        "ours-tpu-e2e must run on the TPU backend")

    engine, log = _engine_for_scene(scene, synchronous_backend=synchronous)
    if pipelined:
        engine.pipelined_fetch = True
    n = min(len(log), max_scans)
    warm = min(30, max(n // 4, 2))       # jit compiles amortize here
    t_start = time.time()
    t_meas0 = None
    kept0 = fed0 = 0
    diag0: dict = {}
    fed = 0
    for i in range(n):
        engine.process(log.ranges[i], log.odom[i], float(log.times[i]))
        fed = i + 1
        if fed == warm:
            engine.finish()
            # pre-compile the loop-closure / solver / correction programs:
            # without this the FIRST loop closure pays their jit compiles
            # inside the measured window (observed: one 95 s solver compile
            # dominating an entire icra replay) — a robot warms at boot
            engine.warm_backend()
            engine.timers = StageTimers()
            t_meas0 = time.time()
            kept0, fed0 = len(engine.store), fed
            diag0 = {"fused_steps": engine.diag.fused_steps,
                     "chain": engine.backend.num_chain_dispatches,
                     "hits": engine.backend.num_fused_hits,
                     "misses": engine.backend.num_fused_misses,
                     "solves": engine.backend.num_solves,
                     "clip": engine.diag.pub_clip_rebuilds}
        if time.time() - t_start > max_wall_s and t_meas0 is not None:
            break
    # dispatch accounting snapshot at measurement start (diag/backend
    # counters are cumulative; the warm-up segment must not count)
    engine.finish()
    wall = time.time() - (t_meas0 or t_start)
    kept = len(engine.store) - kept0
    stages = engine.timers.stages
    b = engine.backend
    d = engine.diag
    dispatch = {
        # the fused program = frontend step + chain matches + store append
        "fused_steps": d.fused_steps - diag0.get("fused_steps", 0),
        # pipelined mode times dispatches under "pipe_dispatch"
        "plain_frontend_steps": (
            (stages["frontend_step"].count if "frontend_step" in stages
             else stages["pipe_dispatch"].count if "pipe_dispatch" in stages
             else 0)
            - (d.fused_steps - diag0.get("fused_steps", 0))),
        "separate_chain_batches": (b.num_chain_dispatches
                                   - diag0.get("chain", 0)),
        "fused_chain_hits": b.num_fused_hits - diag0.get("hits", 0),
        "fused_chain_misses": b.num_fused_misses - diag0.get("misses", 0),
        "solves": b.num_solves - diag0.get("solves", 0),
        "pub_clip_rebuilds": d.pub_clip_rebuilds - diag0.get("clip", 0),
    }
    n_dispatch = (dispatch["fused_steps"] + dispatch["plain_frontend_steps"]
                  + dispatch["separate_chain_batches"] + dispatch["solves"])
    return {
        "scene": scene,
        "mode": ("pipelined" if pipelined
                 else "sync" if synchronous else "async"),
        "method": "sustained wall-clock replay through the tunnel "
                  "(dispatch floor ~30-45 ms/call in this environment)",
        "scans_fed": fed - fed0,
        "scans_kept": kept,
        "wall_s": wall,
        "kept_scans_per_sec": kept / wall if wall > 0 else 0.0,
        "fed_scans_per_sec": (fed - fed0) / wall if wall > 0 else 0.0,
        "stages_mean_ms": {k: s.mean_ms for k, s in stages.items()},
        "stages_count": {k: s.count for k, s in stages.items()},
        "stage_calls_per_kept_scan": (
            sum(s.count for s in stages.values()) / max(kept, 1)),
        # true device-dispatch accounting (round-4 fusion: the steady-state
        # sync path is ONE dispatch per processed scan — chain matches and
        # the store append ride the frontend program; solves/corrections
        # and fused-set misses add the remainder)
        "dispatches": dispatch,
        "dispatches_per_kept_scan": n_dispatch / max(kept, 1),
    }


def render_report(res: dict) -> str:
    lines = [
        "# BASELINE_MEASURED — reference vs TPU engine on identical logs",
        "",
        "Reference core compiled headlessly (native/ref_harness; unmodified",
        "sources from /root/reference/src, per-stage timings from its own",
        "TIMER macros under -DSLAM_TIME_DEBUG). Both sides replay the SAME",
        "simulated logs (tools/export_ref_logs.py, seed 0). The harness",
        "substitutes a sparse-LM drop-in for Ceres (identical SPA cost,",
        "native/ref_harness/solver_impl.h) since Ceres is unavailable here;",
        "solver wall-time is reported separately.",
        "",
        f"Host: 2-core CPU (reference side), TPU v5e-class single chip",
        "(engine side). Generated by tools/measure_reference.py on "
        + time.strftime("%Y-%m-%d") + ".",
        "",
    ]
    scenes = sorted({k.split("/")[1] for k in res if "/" in k})
    # ATE + throughput table. ours ATE: full CPU replay of the identical log
    # (quality is backend-independent). ours ms/scan + scans/s: device-timed
    # on the real TPU via the K-slope protocol (measure_ours_tpu), mirroring
    # the reference's per-kept-scan front-end time.
    lines += ["## End-to-end quality + throughput", "",
              "| Scene | ref ATE (m) | ours ATE (m) | ATE ratio | odom-only"
              " ATE (m) | ref ms/scan | ours ms/scan (TPU) | ref scans/s |"
              " ours scans/s (TPU) | speedup |",
              "|---|---|---|---|---|---|---|---|---|---|"]
    for s in scenes:
        r = res.get(f"ref/{s}") or res.get(f"ref_rt/{s}")
        rq = res.get(f"ref_rt/{s}") or r   # quality from paced run if present
        o = res.get(f"ours/{s}")
        ot = res.get(f"ours_tpu/{s}")
        if not r:
            continue
        ref_ate = rq["ate_m"]
        ref_ms = r["mean_process_ms_kept"]
        ref_sps = r.get("scans_per_sec", 0.0)
        ate_s = f"{o['ate_m']:.3f}" if o else "—"
        ratio_s = (f"{o['ate_m'] / ref_ate:.2f}x"
                   if o and ref_ate > 0 else "—")
        ms_s = f"{ot['frontend_ms_per_scan']:.2f}" if ot else "—"
        sps_s = f"{ot['scans_per_sec']:.0f}" if ot else "—"
        speed_s = (f"{ot['scans_per_sec'] / ref_sps:.1f}x"
                   if ot and ref_sps else "—")
        lines.append(
            f"| {s} | {ref_ate:.3f} | {ate_s} | {ratio_s} |"
            f" {rq['odom_ate_m']:.3f} | {ref_ms:.1f} | {ms_s} |"
            f" {ref_sps:.1f} | {sps_s} | {speed_s} |")
    lines.append("")

    # sustained end-to-end (front + back) on the TPU side, beside the
    # reference's full-pipeline scans/s — the system-level number, stated
    # with the tunnel dispatch-floor caveat quantified
    e2e_keys = [k for k in res if k.startswith("ours_tpu_e2e")]
    if e2e_keys:
        lines += [
            "## Sustained end-to-end (front + back) on TPU", "",
            "Wall-clock replay through this environment's dispatch tunnel."
            " Round-4 fusion runs the frontend step, the LinkNearChains +"
            " TryCloseLoop-coarse chain matches, and the device-store append"
            " as ONE program, and the host fetches a single packed (15,)"
            " summary per scan — `disp/scan` is the TRUE device-dispatch"
            " count per kept scan (fused + plain steps + fallback chain"
            " batches + solves). The remaining per-scan floor is one ~30 ms"
            " fetch round-trip; on directly-attached hardware the same"
            " fetch is ~100 us.", "",
            "| Scene | mode | kept scans/s (tunnel) | disp/scan |"
            " fused hits/misses | dispatch ms | fetch ms | loop ms |"
            " ref full-pipeline scans/s |",
            "|---|---|---|---|---|---|---|---|---|"]
        for key in sorted(e2e_keys):
            e = res[key]
            s = e["scene"]
            r = res.get(f"ref/{s}")
            st = e["stages_mean_ms"]
            d = e.get("dispatches", {})
            ref_sps = f"{r['scans_per_sec']:.1f}" if r else "—"
            dps = e.get("dispatches_per_kept_scan",
                        e.get("stage_calls_per_kept_scan", 0))
            hm = (f"{d.get('fused_chain_hits', 0)}/"
                  f"{d.get('fused_chain_misses', 0)}" if d else "—")
            lines.append(
                f"| {s} | {e['mode']} | {e['kept_scans_per_sec']:.1f} |"
                f" {dps:.2f} | {hm} |"
                f" {st.get('frontend_step', 0):.1f} |"
                f" {st.get('frontend_fetch', 0):.1f} |"
                f" {st.get('backend_loop_closure', 0):.0f} | {ref_sps} |")
        lines.append("")

    lines += ["## Reference per-stage ms (mean, unthrottled replay)", "",
              "| Scene | FrontEndScanMatch | UpdateAllMap | SlamFrontEnd"
              "Process | BackEndScanMatch | BackEndResetMap | BackEndProcess |"
              " SPA solves | SPA ms total |",
              "|---|---|---|---|---|---|---|---|---|"]
    for s in scenes:
        r = res.get(f"ref/{s}")
        if not r:
            continue
        st = r["stages_mean_ms"]
        sv = r.get("solver", {})
        lines.append(
            f"| {s} | {st.get('FrontEndScanMatch', 0):.1f} |"
            f" {st.get('UpdateAllMap', 0):.1f} |"
            f" {st.get('SlamFrontEndProcess', 0):.1f} |"
            f" {st.get('BackEndScanMatch', 0):.1f} |"
            f" {st.get('BackEndResetMap', 0):.1f} |"
            f" {st.get('BackEndProcess', 0):.1f} |"
            f" {int(sv.get('solves', 0))} | {sv.get('ms', 0):.0f} |")
    lines.append("")

    lines += ["## Raw records", "", "```json",
              json.dumps(res, indent=2, sort_keys=True), "```", ""]
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ref", "ours", "ours-tpu",
                                     "ours-tpu-e2e", "report"])
    ap.add_argument("--scenes", nargs="*", default=["icra", "rm", "willow"])
    ap.add_argument("--realtime", type=float, default=0.0,
                    help="pace the reference replay at N x real time")
    ap.add_argument("--pipelined", action="store_true",
                    help="ours-tpu-e2e: double-buffered fetch pipeline")
    ap.add_argument("--async-backend", action="store_true",
                    help="ours-tpu-e2e: pipeline the back end on a worker "
                         "thread (the reference's threading model)")
    ap.add_argument("--max-scans", type=int, default=200)
    args = ap.parse_args()

    res = load_results()
    if args.mode == "ref":
        ensure_logs(args.scenes)
        os.environ.setdefault("REF_HARNESS_PARAMS",
                              os.path.join(OUT_DIR, "params_sim.txt"))
        for scene in args.scenes:
            key = f"ref_rt/{scene}" if args.realtime > 0 else f"ref/{scene}"
            res[key] = measure_ref(scene, args.realtime)
            save_results(res)
            print(json.dumps(res[key], indent=2))
    elif args.mode == "ours":
        # quality replay runs on the CPU backend: per-scan dispatches
        # through the tunnel would make full-log replays take hours, and
        # holding the chip would serialize against any concurrent TPU job
        # (the env-var pin alone cannot override the sitecustomize preload)
        import jax

        jax.config.update("jax_platforms", "cpu")
        ensure_logs(args.scenes)
        for scene in args.scenes:
            res[f"ours/{scene}"] = measure_ours(scene)
            save_results(res)
            print(json.dumps(res[f"ours/{scene}"], indent=2))
    elif args.mode == "ours-tpu":
        ensure_logs(args.scenes)
        for scene in args.scenes:
            res[f"ours_tpu/{scene}"] = measure_ours_tpu(scene)
            save_results(res)
            print(json.dumps(res[f"ours_tpu/{scene}"], indent=2))
    elif args.mode == "ours-tpu-e2e":
        ensure_logs(args.scenes)
        suffix = ("_pipe" if args.pipelined
                  else "_async" if args.async_backend else "")
        for scene in args.scenes:
            res[f"ours_tpu_e2e{suffix}/{scene}"] = measure_ours_tpu_e2e(
                scene, max_scans=args.max_scans,
                synchronous=not args.async_backend,
                pipelined=args.pipelined)
            save_results(res)
            print(json.dumps(res[f"ours_tpu_e2e{suffix}/{scene}"], indent=2))
    else:
        report = render_report(res)
        with open(os.path.join(REPO, "BASELINE_MEASURED.md"), "w") as f:
            f.write(report)
        print(report[:2000])
        print("\nwrote BASELINE_MEASURED.md")


if __name__ == "__main__":
    main()
