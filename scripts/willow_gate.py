"""Full-scene willow regression gate (VERDICT r4 #9).

Replays the ENTIRE willow log (all ~3,942 scans) through the real engine
on the TPU — the strongest end-to-end evidence in the repo (round 4:
103 s wall, ATE 0.0317 m vs the reference's 0.067 m) — and checks the
result against the committed baseline record so kernel/fetch changes
cannot silently regress quality.

Usage:
    python scripts/willow_gate.py            # run + gate vs baseline
    python scripts/willow_gate.py --rebase   # run + overwrite baseline

Writes out/willow_gate.json every run; the gate compares against
out/willow_gate_baseline.json (committed).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B

B._enable_compile_cache()

import numpy as np

# quality bounds: ATE must stay under the reference's measured willow ATE
# (BASELINE_MEASURED.md: ref 0.067 m); the committed baseline tightens it
ATE_HARD_BOUND_M = 0.067


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebase", action="store_true",
                    help="overwrite the committed baseline record")
    ap.add_argument("--pipelined", action="store_true",
                    help="use the double-buffered fetch pipeline")
    ap.add_argument("--depth", type=int, default=3,
                    help="pipeline depth (quality/throughput dial)")
    args = ap.parse_args()

    import jax

    from roborts_slam_tpu.utils.evaluation import ate_rmse, match_by_time
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from measure_reference import _engine_for_scene

    assert jax.default_backend() == "tpu", "gate runs on the TPU backend"

    engine, log = _engine_for_scene("willow", synchronous_backend=True)
    if args.pipelined:
        engine.pipelined_fetch = True
        engine.pipeline_depth = args.depth
    n = len(log)
    t0 = time.time()
    warm_done = False
    for i in range(n):
        engine.process(log.ranges[i], log.odom[i], float(log.times[i]))
        if not warm_done and len(engine.store) >= 2:
            engine.finish()
            engine.warm_backend()
            warm_done = True
        if i % 500 == 0:
            print(f"  scan {i}/{n} kept={len(engine.store)} "
                  f"loops={engine.backend.num_loop_closures} "
                  f"t={time.time() - t0:.0f}s", flush=True)
    engine.finish()
    wall = time.time() - t0

    traj = engine.trajectory_array()
    est, gt = match_by_time(traj, log.gt_poses, log.times)
    ate = float(ate_rmse(est, gt))
    rec = {
        "scene": "willow", "scans_fed": n, "scans_kept": len(engine.store),
        "wall_s": round(wall, 1),
        "kept_scans_per_sec": round(len(engine.store) / wall, 2),
        "fed_scans_per_sec": round(n / wall, 2),
        "ate_m": round(ate, 4),
        "loop_closures": engine.backend.num_loop_closures,
        "links": engine.backend.num_links,
        "fused_steps": engine.diag.fused_steps,
        "fused_hits": engine.backend.num_fused_hits,
        "fused_misses": engine.backend.num_fused_misses,
        "chain_dispatches": engine.backend.num_chain_dispatches,
        "pub_clip_rebuilds": engine.diag.pub_clip_rebuilds,
        "pipelined": bool(args.pipelined),
        "pipeline_depth": args.depth if args.pipelined else 0,
        "measured_at": time.strftime("%Y-%m-%d %H:%M"),
    }
    os.makedirs(os.path.join(REPO, "out"), exist_ok=True)
    out_path = os.path.join(REPO, "out", "willow_gate.json")
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec, indent=1))

    # the baseline lives in the COMMITTED records/ dir (out/ is gitignored)
    # so a fresh clone gates against the recorded run (VERDICT r4 #9)
    base_path = os.path.join(REPO, "records", "willow_gate_baseline.json")
    os.makedirs(os.path.dirname(base_path), exist_ok=True)
    if args.rebase or not os.path.exists(base_path):
        with open(base_path, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"baseline {'rebased' if args.rebase else 'created'}: "
              f"{base_path}")
        return

    with open(base_path) as fh:
        base = json.load(fh)
    fails = []
    if rec["ate_m"] > ATE_HARD_BOUND_M:
        fails.append(f"ATE {rec['ate_m']} exceeds the reference bound "
                     f"{ATE_HARD_BOUND_M}")
    if rec["ate_m"] > 1.5 * base["ate_m"] + 0.005:
        fails.append(f"ATE {rec['ate_m']} regressed vs baseline "
                     f"{base['ate_m']}")
    if abs(rec["scans_kept"] - base["scans_kept"]) > 0.05 * base["scans_kept"]:
        fails.append(f"kept-scan count {rec['scans_kept']} drifted vs "
                     f"baseline {base['scans_kept']}")
    if rec["loop_closures"] == 0 and base["loop_closures"] > 0:
        fails.append("no loop closures (baseline had "
                     f"{base['loop_closures']})")
    if rec["kept_scans_per_sec"] < 0.6 * base["kept_scans_per_sec"]:
        fails.append(f"throughput {rec['kept_scans_per_sec']}/s fell >40% "
                     f"vs baseline {base['kept_scans_per_sec']}/s")
    if fails:
        print("WILLOW GATE: FAIL")
        for f in fails:
            print("  -", f)
        sys.exit(1)
    print(f"WILLOW GATE: PASS (ATE {rec['ate_m']} m vs baseline "
          f"{base['ate_m']} m, {rec['kept_scans_per_sec']} kept/s)")


if __name__ == "__main__":
    main()
