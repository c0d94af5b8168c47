"""Tracing / profiling.

The reference's only instrumentation is compile-time-gated
``TIMER_START/TIMER_END`` boost::timer macros that are compiled OUT
(#define SLAM_TIME_DEBUG commented, slam_util.h:61-65) — SURVEY §5 requires
a real observability layer. This module provides:

- ``StageTimers``: always-on named wall-clock accumulators (count/total/max)
  the engine threads through its stages — the TIMER macros done properly.
  Device work must be block_until_ready'd by the caller for honest numbers
  (the engine's stage boundaries already do).
- ``trace`` / ``annotate``: thin wrappers over ``jax.profiler`` so a run
  (or one scan) can emit a TensorBoard-loadable device trace with stages
  labeled; no-ops when profiling is off, zero overhead in the hot loop.
- ``roofline_report``: per-kernel achieved-throughput accounting against
  device peaks for the bench harness.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict


@dataclasses.dataclass
class StageStat:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.max_s = max(self.max_s, dt)

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total_s / max(self.count, 1)


class StageTimers:
    """Named stage accumulators; thread-safe enough for the two-thread
    engine pipeline (GIL-atomic float adds on distinct keys)."""

    def __init__(self):
        self.stages: dict[str, StageStat] = defaultdict(StageStat)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def report(self) -> str:
        lines = [f"{'stage':<26}{'count':>7}{'mean ms':>10}{'max ms':>10}{'total s':>10}"]
        for name, s in sorted(self.stages.items(),
                              key=lambda kv: -kv[1].total_s):
            lines.append(f"{name:<26}{s.count:>7}{s.mean_ms:>10.2f}"
                         f"{1000 * s.max_s:>10.2f}{s.total_s:>10.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: dataclasses.asdict(v) for k, v in self.stages.items()}


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a device trace for the enclosed block (TensorBoard format).
    ``logdir=None`` disables tracing with zero overhead."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a captured trace (StepTraceAnnotation)."""
    import jax

    return jax.profiler.StepTraceAnnotation(name)


# ---- roofline accounting -------------------------------------------------

# per-chip peaks; v5e from public spec sheets (197 bf16 MXU TFLOPs — the
# oft-quoted 394 is the int8 figure — and 819 GB/s HBM)
DEVICE_PEAKS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "cpu": {"bf16_tflops": 0.2, "hbm_gbps": 20.0},
}


def roofline_report(kernel_name: str, seconds: float, flops: float,
                    bytes_moved: float, device_kind: str | None = None) -> dict:
    """Achieved vs peak throughput for one kernel invocation."""
    if device_kind is None:
        import jax

        device_kind = jax.devices()[0].device_kind
    peaks = DEVICE_PEAKS.get(device_kind, DEVICE_PEAKS["cpu"])
    tflops = flops / seconds / 1e12
    gbps = bytes_moved / seconds / 1e9
    return {
        "kernel": kernel_name,
        "device": device_kind,
        "time_ms": 1000.0 * seconds,
        "achieved_tflops": tflops,
        "peak_tflops": peaks["bf16_tflops"],
        "flops_frac": tflops / peaks["bf16_tflops"],
        "achieved_gbps": gbps,
        "peak_gbps": peaks["hbm_gbps"],
        "bw_frac": gbps / peaks["hbm_gbps"],
        "bound": "memory" if gbps / peaks["hbm_gbps"] > tflops / peaks["bf16_tflops"]
                 else "compute",
    }
