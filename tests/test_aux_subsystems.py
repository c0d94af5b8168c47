"""Aux subsystems: log-odds cell model, stage timers, roofline accounting."""

import os
import numpy as np
import jax.numpy as jnp

from roborts_slam_tpu.models.grid_map import (
    CountMapSpec, log_odds_map_states, log_odds_to_prob, make_log_odds_map,
    prob_to_log_odds,
)
from roborts_slam_tpu.ops.raster import update_log_odds_map
from roborts_slam_tpu.utils.profiling import StageTimers, roofline_report


def test_log_odds_conversions():
    for p in (0.1, 0.3, 0.5, 0.9):
        lo = prob_to_log_odds(jnp.float32(p))
        np.testing.assert_allclose(float(log_odds_to_prob(lo)), p, atol=1e-6)


def test_log_odds_map_update():
    spec = CountMapSpec(resolution=0.1, height=128, width=128,
                        max_ray_cells=64)
    lmap = make_log_odds_map(spec, offset=[6.4, 6.4])
    P = 16
    pts = np.zeros((P, 2), np.float32)
    pts[:8, 0] = 3.0                      # 8 beams straight +x, 3 m
    msk = np.zeros(P, bool)
    msk[:8] = True
    for _ in range(3):
        lmap = update_log_odds_map(spec, lmap, jnp.asarray(pts),
                                   jnp.asarray(msk), jnp.zeros(3))
    states = np.asarray(log_odds_map_states(lmap))
    # endpoint cell occupied (log-odds(0.9) * 3 > 0)
    ex, ey = int((3.0 + 6.4) / 0.1), int(6.4 / 0.1)
    assert states[ey, ex] == 100
    # mid-ray free, untouched unknown
    assert states[ey, int((1.5 + 6.4) / 0.1)] == 0
    assert states[5, 5] == -1
    # accumulation is additive in log-odds
    lo = float(np.asarray(lmap.log_odds)[ey, ex])
    np.testing.assert_allclose(lo, 3 * np.log(0.9 / 0.1), rtol=1e-5)


def test_stage_timers_report():
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.stages["a"].count == 2
    assert t.stages["b"].count == 1
    rep = t.report()
    assert "a" in rep and "mean ms" in rep
    d = t.as_dict()
    assert d["a"]["count"] == 2


def test_roofline_report():
    r = roofline_report("corr", seconds=1e-3, flops=1e9, bytes_moved=1e8,
                        device_kind="TPU v5 lite")
    np.testing.assert_allclose(r["achieved_tflops"], 1.0)
    np.testing.assert_allclose(r["achieved_gbps"], 100.0)
    assert r["bound"] in ("memory", "compute")


def test_measurement_results_seed_from_committed_report(tmp_path, monkeypatch):
    """out/ is gitignored, so a fresh checkout has no results.json; the
    measurement driver must seed its store from the committed report's
    raw-records block instead of silently rendering empty tables (this
    regressed once: a partial e2e re-measure dropped every other section)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import measure_reference as MR

    monkeypatch.setattr(MR, "RESULTS",
                        str(tmp_path / "missing" / "results.json"))
    res = MR.load_results()
    assert any(k.startswith("ref/") for k in res), sorted(res)[:5]
    assert any(k.startswith("ours_tpu_e2e") for k in res)
    # and the seeded store renders a report with non-empty tables
    text = MR.render_report(res)
    assert "| icra |" in text and "Sustained end-to-end" in text
