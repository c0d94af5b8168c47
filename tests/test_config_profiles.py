"""The shipped YAML profiles (configs/) load through the same path that
accepts reference-format parameter files (reference: src/param_config.h
reads these keys from the ROS parameter server; here load_config reads
them from YAML)."""

import math
import os

from roborts_slam_tpu.config import SlamConfig, load_config

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_simulation_profile_loads():
    cfg = load_config(os.path.join(CONFIGS, "simulation.yaml"))
    assert isinstance(cfg, SlamConfig)
    assert cfg.fine_map_resolution == 0.01
    assert cfg.use_odom_correct is False
    assert cfg.use_move_check is False
    assert cfg.coarse_use_point_size == 100
    # angle offsets land within float tolerance of the dataclass defaults
    assert math.isclose(cfg.coarse_search_angle_offset, 1.745, rel_tol=1e-6)


def test_real_robot_profile_loads():
    cfg = load_config(os.path.join(CONFIGS, "real_robot.yaml"))
    assert cfg.use_odom_correct is True
    assert cfg.use_move_check is True
    assert cfg.fine_map_resolution == 0.025
    assert cfg.match_map_window == 15.0


def test_profile_overrides_win():
    cfg = load_config(os.path.join(CONFIGS, "simulation.yaml"),
                      fine_map_resolution=0.02)
    assert cfg.fine_map_resolution == 0.02


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / "extra.yaml"
    p.write_text("map_resolution: 0.1\nsome_ros_only_param: 42\n")
    cfg = load_config(str(p))
    assert cfg.map_resolution == 0.1
