"""Speed-of-light accounting for the 3-tier correlative match.

SURVEY §5 prescribes per-kernel roofline accounting; this module supplies
the analytic side: the exact VPU-add count and HBM byte traffic one
``scan_match`` call induces, derived from the SAME kernel-planning helpers
the Pallas path executes (ops/pallas/correlation.py: plan_tiles,
_window_rows, deinterleave threshold), so the model cannot drift from the
implementation. Consumers divide by measured per-match seconds and the
chip's peaks:

- ``bench.py`` attaches the resulting %-of-peak to the headline JSON using
  the static public peaks (utils/profiling.DEVICE_PEAKS) — zero extra
  dispatches, driver-deadline safe.
- ``scripts/roofline.py`` MEASURES the same chip's copy bandwidth and
  VPU-add rate with microbenchmarks and reports the match against those
  (the honest "fraction of speed-of-light" number in PERFORMANCE.md).

Reference hot loop being accounted: correlate_scan_matcher.h:552-584
(serial prob sums per candidate); here the same sums are (ROWS, 128) VPU
tile adds over a VMEM slab.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TierCost:
    name: str
    n_angles: int
    n_space: int
    samples: int          # padded sample slots the kernel iterates
    rows: int             # window rows per accumulate
    deinterleaved: bool
    vpu_adds: float       # bf16 lane-adds in the kernel inner loop
    hbm_bytes: float      # slab streaming for this tier's kernel grid


@dataclasses.dataclass(frozen=True)
class MatchCost:
    tiers: tuple
    slab_build_bytes: float   # one-time f32 crop read + bf16 slab write
    total_vpu_adds: float
    total_hbm_bytes: float

    def as_dict(self) -> dict:
        return {
            "slab_build_bytes": self.slab_build_bytes,
            "total_vpu_adds": self.total_vpu_adds,
            "total_hbm_bytes": self.total_hbm_bytes,
            "tiers": [dataclasses.asdict(t) for t in self.tiers],
        }


def scan_match_cost(matcher, fine_spec) -> MatchCost:
    """Analytic per-call cost of the shared-slab 3-tier correlative match
    (frontend/matchers.scan_match on the TPU path)."""
    from ..ops.pallas.correlation import (
        ROW_PAD, ZERO_ROWS, _deint_total_rows, _window_rows, plan_tiles,
    )

    ty, tx, crop = plan_tiles(fine_spec)
    T = ty * tx
    cols = crop + 256                       # LANE_PAD
    slab_rows = crop + ROW_PAD + ZERO_ROWS
    slab_bytes = T * slab_rows * cols * 2.0           # bf16 resident slab
    # build: read the f32 crop region once + write the bf16 slab once
    build = T * crop * cols * 4.0 + slab_bytes

    tiers = []
    for name, p in (("coarse", matcher.coarse), ("fine", matcher.fine),
                    ("super_fine", matcher.super_fine)):
        st_i = int(round(p.search_space_resolution * fine_spec.inv_res))
        N = p.n_space
        span = st_i * (N - 1) + 1
        deint = st_i >= 3
        rows = _window_rows(N) if deint else _window_rows(span)
        # kernel pads the sample loop by 8 trailing zero-codes
        S = p.max_samples + 8
        adds = float(p.n_angles) * S * rows * 128.0
        if deint:
            # the deinterleave pass reads the slab and writes the plane
            plane_rows = _deint_total_rows(st_i, N, crop) + ZERO_ROWS
            reshuffle = T * (slab_rows + plane_rows) * cols * 2.0
            stream = T * plane_rows * cols * 2.0      # kernel HBM->VMEM
        else:
            reshuffle = 0.0
            stream = slab_bytes
        tiers.append(TierCost(name=name, n_angles=p.n_angles, n_space=N,
                              samples=S, rows=rows, deinterleaved=deint,
                              vpu_adds=adds, hbm_bytes=reshuffle + stream))
    return MatchCost(
        tiers=tuple(tiers),
        slab_build_bytes=build,
        total_vpu_adds=sum(t.vpu_adds for t in tiers),
        total_hbm_bytes=build + sum(t.hbm_bytes for t in tiers),
    )


def roofline_summary(cost: MatchCost, seconds: float,
                     hbm_peak_gbps: float | None = None,
                     vpu_peak_adds_per_s: float | None = None) -> dict:
    """%-of-peak for one measured match time. Peaks default to the static
    public table (utils/profiling.DEVICE_PEAKS) for the current device;
    pass microbenchmarked peaks for the honest speed-of-light number."""
    if hbm_peak_gbps is None:
        import jax

        from ..utils.profiling import DEVICE_PEAKS

        kind = jax.devices()[0].device_kind
        hbm_peak_gbps = DEVICE_PEAKS.get(kind, DEVICE_PEAKS["cpu"])["hbm_gbps"]
    out = {
        "match_us": 1e6 * seconds,
        "hbm_bytes": cost.total_hbm_bytes,
        "achieved_gbps": cost.total_hbm_bytes / seconds / 1e9,
        "hbm_peak_gbps": hbm_peak_gbps,
        "hbm_frac": cost.total_hbm_bytes / seconds / 1e9 / hbm_peak_gbps,
        "vpu_adds": cost.total_vpu_adds,
        "achieved_gadds": cost.total_vpu_adds / seconds / 1e9,
    }
    if vpu_peak_adds_per_s:
        out["vpu_peak_gadds"] = vpu_peak_adds_per_s / 1e9
        out["vpu_frac"] = cost.total_vpu_adds / seconds / vpu_peak_adds_per_s
    return out
