"""The shipped YAML profiles (configs/) load through the same path that
accepts reference-format parameter files (reference: src/param_config.h
reads these keys from the ROS parameter server; here load_config reads
them from YAML)."""

import math
import os

import pytest

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


REFERENCE_YAMLS = "/root/reference/config"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_YAMLS),
                    reason="reference checkout not present")
def test_reference_yaml_profiles_load_unchanged():
    """The reference's own ROS parameter YAMLs (param_config.h keys) load
    through load_config with no translation step."""
    sim = load_config(os.path.join(REFERENCE_YAMLS, "simulatin_param.yaml"))
    assert sim.fine_map_resolution == 0.01
    assert sim.coarse_map_resolution == 0.08
    assert sim.gaussian_blur_offset == 0.88
    assert sim.map_min_passthrough == 4.0

    real = load_config(os.path.join(REFERENCE_YAMLS, "real_robot_param.yaml"))
    assert isinstance(real, SlamConfig)
    assert real.map_resolution > 0
