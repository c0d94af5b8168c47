"""Export simulated benchmark scene logs for the headless reference harness.

Produces, per scene (icra / rm / willow):
  out/<scene>.npz     — ScanLog for the TPU engine (io/scan_log.py)
  out/<scene>.refbin  — flat binary for native/ref_harness (REFLOG1 format)
plus out/params_sim.txt — the reference's simulatin_param.yaml flattened to
"key value" lines for the harness's ros::NodeHandle stub.

Both sides replay the IDENTICAL log (same seed, same odometry noise draw,
same ray noise), which is what anchors the ATE / per-stage latency ratios in
BASELINE_MEASURED.md.
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roborts_slam_tpu.io.scan_log import ScanLog
from roborts_slam_tpu.io.scenes import SCENES, load_scene_map
from roborts_slam_tpu.io.simulate import simulate_log

DEFAULT_SEED = 0
DEFAULT_RANGE_NOISE = 0.005


def write_refbin(log: ScanLog, path: str) -> None:
    """REFLOG1: header (magic, n, beams, angle_min/max/inc, range_min/max),
    then per scan: time f64, odom 3f64, gt 3f64, ranges Bf32."""
    laser = log.laser
    n, beams = log.ranges.shape
    angle_inc = (laser.angle_max - laser.angle_min) / (laser.num_beams - 1)
    gt = log.gt_poses if log.gt_poses is not None else np.zeros((n, 3))
    with open(path, "wb") as f:
        f.write(b"REFLOG1\x00")
        f.write(struct.pack("<ii", n, beams))
        f.write(struct.pack("<5d", laser.angle_min, laser.angle_max,
                            angle_inc, laser.range_min, laser.range_max))
        for i in range(n):
            f.write(struct.pack("<7d", float(log.times[i]),
                                *[float(v) for v in log.odom[i]],
                                *[float(v) for v in gt[i]]))
            f.write(np.ascontiguousarray(
                log.ranges[i], dtype=np.float32).tobytes())


def flatten_yaml_params(yaml_path: str, out_path: str,
                        overrides: dict | None = None) -> None:
    """The reference YAMLs are flat scalar maps; parse without a yaml dep."""
    params: dict[str, str] = {}
    with open(yaml_path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, value = line.split(":", 1)
            params[key.strip()] = value.strip()
    for k, v in (overrides or {}).items():
        params[k] = str(v)
    with open(out_path, "w") as f:
        f.write("# flattened from %s\n" % yaml_path)
        for k, v in params.items():
            f.write(f"{k} {v}\n")


def export_scene(name: str, out_dir: str, seed: int = DEFAULT_SEED,
                 max_scans: int | None = None) -> ScanLog:
    scene = SCENES[name]
    gt_map = load_scene_map(scene)
    log = simulate_log(gt_map, scene.laser, odom_error=scene.odom_error,
                       range_noise=DEFAULT_RANGE_NOISE, seed=seed,
                       speed=scene.speed, n_waypoints=scene.n_waypoints,
                       clearance_m=scene.clearance_m)
    if max_scans is not None and len(log) > max_scans:
        log = ScanLog(ranges=log.ranges[:max_scans], odom=log.odom[:max_scans],
                      times=log.times[:max_scans], laser=log.laser,
                      gt_poses=log.gt_poses[:max_scans])
    os.makedirs(out_dir, exist_ok=True)
    log.save(os.path.join(out_dir, f"{name}.npz"))
    write_refbin(log, os.path.join(out_dir, f"{name}.refbin"))
    return log


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/ref_logs")
    ap.add_argument("--seed", type=int, default=DEFAULT_SEED)
    ap.add_argument("--scenes", nargs="*",
                    default=["icra", "rm", "willow"])
    ap.add_argument("--max-scans", type=int, default=None)
    args = ap.parse_args()

    for name in args.scenes:
        log = export_scene(name, args.out, seed=args.seed,
                           max_scans=args.max_scans)
        print(f"{name}: {len(log)} scans x {log.laser.num_beams} beams "
              f"-> {args.out}/{name}.refbin")

    flatten_yaml_params("/root/reference/config/simulatin_param.yaml",
                        os.path.join(args.out, "params_sim.txt"))
    print(f"params -> {args.out}/params_sim.txt")


if __name__ == "__main__":
    main()
