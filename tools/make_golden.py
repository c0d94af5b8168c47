"""Generate the golden-trajectory regression fixture (VERDICT r1 item 5).

Writes tests/data/golden_icra.npz: a small fixed icra scan-log slice plus
the engine's expected output trajectory on the CPU backend with the
reference simulation config. tests/test_golden.py replays the log and
asserts the trajectory byte-for-semantics: any scoring/gating/map-update
semantics drift fails loudly even when it stays under the scene ATE bound.

Regenerate ONLY after an intentional semantics change, and say why in the
commit message:

    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

N_SCANS = 120
SEED = 5
OUT = os.path.join(REPO, "tests", "data", "golden_icra.npz")


def build_engine(laser):
    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.engine import SlamEngine

    cfg = load_config("/root/reference/config/simulatin_param.yaml")
    return SlamEngine(cfg, laser, world_size=24.0, synchronous_backend=True)


def main():
    from roborts_slam_tpu.io.scenes import SCENES, load_scene_map
    from roborts_slam_tpu.io.simulate import simulate_log

    sc = SCENES["icra"]
    gt_map = load_scene_map(sc)
    log = simulate_log(gt_map, sc.laser, odom_error=sc.odom_error,
                       range_noise=0.005, seed=SEED)
    n = min(N_SCANS, len(log))

    engine = build_engine(log.laser)
    kept_ids = []
    for i in range(n):
        if engine.process(log.ranges[i], log.odom[i], float(log.times[i])):
            kept_ids.append(i)
    traj = engine.trajectory_array()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        ranges=log.ranges[:n].astype(np.float32),
        odom=log.odom[:n].astype(np.float64),
        times=log.times[:n].astype(np.float64),
        laser=log.laser.to_array(),
        kept_ids=np.asarray(kept_ids, np.int64),
        trajectory=traj.astype(np.float64),
        loops=np.int64(engine.backend.num_loop_closures),
        links=np.int64(engine.backend.num_links),
    )
    print(f"golden: {n} scans, kept {len(kept_ids)}, "
          f"links {engine.backend.num_links}, "
          f"loops {engine.backend.num_loop_closures} -> {OUT} "
          f"({os.path.getsize(OUT)//1024} KiB)")


if __name__ == "__main__":
    main()
