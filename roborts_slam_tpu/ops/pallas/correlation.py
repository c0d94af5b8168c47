"""Pallas TPU kernel for correlative candidate scoring — the hot kernel.

Replaces the XLA-gather scoring path (ops/correlative.py:score_candidates),
which lowers to element-at-a-time gathers (~8 ns/element on v5e → ~10 ms per
3-tier match). Key observation: for every tier the candidate step in map
cells (search_space_resolution / map_resolution) is an integer ``st``, so a
candidate's cell is ``base(angle, sample) + (st·ky, st·kx)`` with
``base = floor(rotated_point + window_origin + 0.5)`` — and therefore

    score[a, ky, kx] · divisor = Σ_s M[by(a,s) + st·ky, bx(a,s) + st·kx]

is a sum of S *contiguous 2D windows* of the map, one per sampled point.
The kernel holds a bf16 crop ("slab") of the map in VMEM and, per angle,
accumulates S dynamically-offset (ROWS, 128) tiles with the VPU — a handful
of wide vector loads per sample instead of 169+ scalar gathers. The strided
candidate lattice is then sliced out of the accumulated window by XLA.

Long-range coverage (the rm scene's 30 m lidar): one VMEM slab covers
``CROP`` cells per side, far less than the ~5 700-cell beam disc of a 30 m
lidar on a 0.01 m map. ``plan_tiles`` therefore derives a static tile grid
from ``ProbMapSpec.coverage_cells`` (set from the laser range by the map
spec builders): sample windows are bucketed by the slab tile containing
their base, sorted into per-(tile, angle) segments, and the kernel runs a
(T, A) grid where each tile's slab streams through VMEM while its segment
of samples accumulates. Sample bases that fall outside the tiled coverage
are — by construction of the plan — outside the map, and their constant
``default_prob`` contribution is added analytically after the kernel
(matching the reference's out-of-map read semantics, GetGridProbValue,
occu_grid_map.h:395). A map that fits entirely inside one slab is always
exact with no coverage information.

Numerics: identical cell indices and summation order as the reference
semantics; map probabilities are quantized to bf16 (~0.3% relative), far
inside the score tolerances used by the gates (tie tolerance 1e-2).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slab geometry: the VMEM-resident bf16 crop(s) of the map
CROP = 2048          # single-tile crop cells per side (slab ~9.4 MB)
TILE_CROP = 1408     # per-tile crop when tiling (two blocks pipeline ≤ 10 MB)
ROW_PAD = 96         # extra rows so windows near the crop edge stay in-slab
LANE_PAD = 256       # extra cols (aligned 128-lane load + window span)
MAX_WINDOW_ROWS = 88 # ROW_PAD minus sublane alignment slack
# trailing all-zero rows appended to every slab layout: masked samples
# (invalid slots, out-of-coverage bases, loop-bound padding) decode to this
# block and contribute exact zeros through the SAME load+rotate path — no
# per-sample select in the kernel's inner loop
ZERO_ROWS = MAX_WINDOW_ROWS + 8


def _bf16_value(x: float) -> float:
    """Static bf16 quantization of a python float (no tracing)."""
    import ml_dtypes
    import numpy as np

    return float(np.asarray(x, ml_dtypes.bfloat16))


def _window_rows(span: int) -> int:
    """Rows kept per sample window, padded to sublane granularity (loads add
    8 more rows of alignment slack)."""
    return max(((span + 7) // 8) * 8, 8)


def plan_tiles(spec) -> tuple[int, int, int]:
    """Static slab tiling (ty, tx, crop) for a map spec.

    Correctness contract: every in-map cell a gated beam can address lies
    inside the tiled coverage, because per axis either (a) one crop covers
    the whole map axis, or (b) ``tiles·crop ≥ 2·coverage_cells`` (and the
    dynamic origin is clamped so the pose-centered coverage stays in range),
    or (c) ``tiles·crop ≥ extent`` covers the whole axis. Maps larger than
    one slab with no coverage information are rejected loudly (the silent
    default-border misread this replaces).
    """
    def axis(extent: int, crop: int) -> int:
        if extent <= crop:
            return 1
        if spec.coverage_cells <= 0:
            raise ValueError(
                f"map extent {extent} exceeds one {crop}-cell slab and the "
                "spec carries no coverage_cells; set ProbMapSpec."
                "coverage_cells (≈ (range_max + margin) / resolution) so the "
                "kernel can tile, or use the XLA path (use_pallas=False)")
        need = 2 * spec.coverage_cells
        if need <= crop:
            return 1
        return min(-(-need // crop), -(-extent // crop))

    ty, tx = axis(spec.height, CROP), axis(spec.width, CROP)
    if ty == 1 and tx == 1:
        return 1, 1, CROP
    return axis(spec.height, TILE_CROP), axis(spec.width, TILE_CROP), TILE_CROP


def slab_plan_ok(spec) -> bool:
    """True when a correct slab tiling exists for this spec (used by the
    auto-selection paths to fall back to the XLA matcher instead of raising
    from plan_tiles)."""
    try:
        plan_tiles(spec)
        return True
    except ValueError:
        return False


def _clamped_origin(center_cells, n_tiles: int, crop: int, extent: int):
    """Coverage origin: center the tile span on the search pose, clamped so
    the span stays over the map (or covers all of it when it is smaller)."""
    ideal = jnp.round(center_cells).astype(jnp.int32) - (n_tiles * crop) // 2
    lo = min(0, extent - n_tiles * crop)
    hi = max(0, extent - n_tiles * crop)
    return jnp.clip(ideal, lo, hi)


def make_slab_tiles(probs, oy, ox, ty: int, tx: int, crop: int,
                    default_prob: float):
    """Crop the (H, W) prob map into a (ty·tx, crop+ROW_PAD, crop+LANE_PAD)
    bf16 tile stack. Tile (i, j) holds map cells starting at
    (oy + i·crop, ox + j·crop); cells outside the map read default_prob
    (reference out-of-map semantics). Tiles overlap by the pad region so
    windows crossing a tile's far edge still read true map content.

    Implementation: static pad + one ``dynamic_slice`` of the whole coverage
    span + static per-tile slices. An earlier version used two ``jnp.take``
    gathers (rows then columns); the lane-axis gather lowered to a ~2.9 ms
    serial path on v5e and halved the headline throughput (round-2
    regression) — contiguous slices keep this at copy bandwidth.

    Requires ``(oy, ox)`` from ``_clamped_origin`` (the static pads below
    are sized from exactly those clip bounds so the slice never clamps).
    """
    H, W = probs.shape
    SR, SC = crop + ROW_PAD, crop + LANE_PAD
    span_r, span_c = (ty - 1) * crop + SR, (tx - 1) * crop + SC
    # bf16-quantized fill (static python float) so borders match in-slab
    # quantized content
    fill = _bf16_value(default_prob)
    pb = probs.astype(jnp.bfloat16)
    lo_r, hi_r = min(0, H - ty * crop), max(0, H - ty * crop)
    lo_c, hi_c = min(0, W - tx * crop), max(0, W - tx * crop)
    pad = ((max(0, -lo_r), max(0, hi_r + span_r - H)),
           (max(0, -lo_c), max(0, hi_c + span_c - W)))
    if pad != ((0, 0), (0, 0)):
        pb = jnp.pad(pb, pad, constant_values=fill)
    cov = jax.lax.dynamic_slice(pb, (oy - lo_r, ox - lo_c), (span_r, span_c))
    tiles = [cov[i * crop:i * crop + SR, j * crop:j * crop + SC]
             for i in range(ty) for j in range(tx)]
    # masked-sample zero block (row SR.., see ZERO_ROWS)
    return jnp.pad(jnp.stack(tiles), ((0, 0), (0, ZERO_ROWS), (0, 0)))


# --- row-deinterleaved slab (large-stride tiers) -------------------------
#
# A tier whose candidate step is st map cells only reads every st-th row of
# each sample window: ky ∈ [0, N) rows at by + st·ky. Re-laying the slab so
# rows congruent mod st are contiguous ("planes") makes those N rows one
# contiguous (N, :) block — the per-sample load/rotate volume drops from
# O(st·N) rows to O(N) rows (~5x less VPU work for the reference's coarse
# tier, st=10). Plane m holds original rows {st·q + m}; a window base row
# ``by`` maps to deinterleaved row (by % st)·P_h + by // st.

def _deint_plane_height(st: int, n_space: int, crop: int) -> int:
    q_max = crop // st          # window bases lie in [0, crop)
    return ((q_max + n_space + 2 + 7) // 8) * 8


def _deint_total_rows(st: int, n_space: int, crop: int) -> int:
    rows_d = _window_rows(n_space)
    return st * _deint_plane_height(st, n_space, crop) + rows_d + 16


def make_deinterleaved_tiles(tiles, st: int, n_space: int,
                             default_prob: float, crop: int):
    """(T, crop+ROW_PAD+ZERO_ROWS, C) tiles -> row-deinterleaved layout of
    the map rows, re-terminated with the ZERO_ROWS masked-sample block."""
    T, SR_in, C = tiles.shape
    SR = crop + ROW_PAD                 # map content rows (zero block off)
    assert SR_in == SR + ZERO_ROWS, (SR_in, SR)
    P_h = _deint_plane_height(st, n_space, crop)
    pad_to = st * P_h
    fill = _bf16_value(default_prob)
    if pad_to >= SR:
        tp = jnp.pad(tiles[:, :SR], ((0, 0), (0, pad_to - SR), (0, 0)),
                     constant_values=fill)
    else:
        # rows >= st*P_h >= crop + st*(n_space+2) exceed the deepest window
        # read (base < crop, depth st*(n_space+1)) — dropping them is safe
        tp = tiles[:, :pad_to]
    deint = (tp.reshape(T, P_h, st, C).transpose(0, 2, 1, 3)
             .reshape(T, st * P_h, C))
    tail = _deint_total_rows(st, n_space, crop) - st * P_h
    deint = jnp.pad(deint, ((0, 0), (0, tail), (0, 0)), constant_values=fill)
    return jnp.pad(deint, ((0, 0), (0, ZERO_ROWS), (0, 0)))


def _correlation_kernel(starts_ref, codes_ref, slab_ref, out_ref,
                        *, rows: int, zero_code: int, n_angles: int,
                        single_segment: bool):
    """Accumulate every angle's segment of dynamically-positioned
    (rows, 128) windows for this tile.

    Mosaic requires aligned vector-load starts (sublane multiple-of-8, lane
    multiple-of-128), so each sample loads the aligned superset tile and
    dynamic-rotates it into place on both axes.

    The angle loop runs INSIDE the kernel (grid is (T,) only): a (T, A)
    grid paid ~2.2 us of per-step pipeline overhead, which at 62 grid
    steps per 3-tier match was ~135 us — more than the actual sample
    accumulation work (round-3 measurement, docs/PERFORMANCE.md). One
    grid step per tile keeps the slab VMEM-resident across all angles and
    pays the step cost once.

    starts: int32 (T+1, A) — codes[a, starts[t,a]:starts[t+1,a]] is tile t's
            segment for angle a.
    codes:  int32 (A, S) = by * 4096 + bx (tile-local). Samples whose
            contribution is not read from this map (invalid slots,
            out-of-coverage bases — compensated analytically outside) carry
            ``zero_code``, which decodes into the slab's trailing ZERO_ROWS
            block: they flow through the same load+rotate chain and add
            exact zeros, so the inner loop has NO per-sample select.
    slab:   bf16 (1, SLAB_ROWS, SLAB_COLS) — tile t's map crop, VMEM.
    out:    f32 (1, A, rows, 128) per grid step.
    """
    t = pl.program_id(0)

    def sample_window(code):
        """One sample's aligned load + 2-axis dynamic rotate -> (rows+8, 128).

        Cost-minimised pipeline (round 3): the lane rotate runs on the
        bf16 tile BITCAST to int32 — lanes are not packed by the 16->32 bit
        bitcast (only sublane pairs are), so a lane roll of the (R/2, 256)
        i32 view is exact for ANY shift at half the f32 roll cost (verified
        element-exact on v5e for rl 0/1/37/127) — and the slice to 128
        lanes happens BEFORE the f32 convert and the sublane rotate, so
        those run at half width too.
        """
        by = code >> 12
        bx = code & 4095
        r = by & 7
        by_al = pl.multiple_of(by - r, 8)
        rl = bx & 127
        bx_al = pl.multiple_of(bx - rl, 128)
        tile = slab_ref[0, pl.ds(by_al, rows + 8), pl.ds(bx_al, 256)]
        ti = pltpu.bitcast(tile, jnp.int32)        # ((rows+8)/2, 256)
        # The 256-lane dynamic roll is the single largest per-sample cost
        # (~10 ns/window: timing with it deleted measures the 3-tier total
        # at ~126 us vs ~205). Cheaper formulations were tried and LOST on
        # v5e: (a) two half-width rolls + static-iota select (intra-vreg
        # rolls, no dead upper half) measured ~226 us — the select costs
        # more than the cross-vreg movement it saves; (b) an unaligned
        # pl.ds(bx, 128) lane load is rejected by Mosaic ("index in
        # dimension 2 must be a multiple of 128"). The bitcast-to-i32 view
        # below halves the roll's data volume (lanes stay unpacked under a
        # 16->32 bitcast; sublane pairs pack) — that one stays.
        ti = pltpu.roll(ti, 256 - rl, axis=1)
        tb = pltpu.bitcast(ti[:, :128], jnp.bfloat16)
        t32 = tb.astype(jnp.float32)               # (rows+8, 128)
        return pltpu.roll(t32, (rows + 8) - r, axis=0)

    # 8-way unrolled loop over each segment (dynamic bounds); accumulation
    # lives in four loop-carried register accumulators, giving eight
    # independent load/rotate chains per iteration (the per-sample
    # load→convert→rotate→rotate chain is ~60 cycles of latency; deep ILP is
    # what hides it).
    UNROLL = 8
    zero = jnp.zeros((rows + 8, 128), jnp.float32)

    def angle_body(a, carry):
        start = starts_ref[t, a]
        end = starts_ref[t + 1, a]

        if single_segment:
            # T == 1: codes[a] is a single segment whose slots beyond
            # ``end`` (invalid samples, the 8-slot pad) already carry
            # zero_code by construction, so the per-sample bounds check
            # is redundant scalar work — read straight from SMEM
            def get(i):
                return codes_ref[a, i]
        else:
            def get(i):
                # slots past the segment end belong to other tiles — zero
                return jnp.where(i < end, codes_ref[a, i], zero_code)

        def body(s, accs):
            acc0, acc1, acc2, acc3 = accs
            base = start + UNROLL * s
            acc0 = acc0 + (sample_window(get(base)) + sample_window(get(base + 1)))
            acc1 = acc1 + (sample_window(get(base + 2)) + sample_window(get(base + 3)))
            acc2 = acc2 + (sample_window(get(base + 4)) + sample_window(get(base + 5)))
            acc3 = acc3 + (sample_window(get(base + 6)) + sample_window(get(base + 7)))
            return acc0, acc1, acc2, acc3

        cnt = end - start
        acc0, acc1, acc2, acc3 = jax.lax.fori_loop(
            0, (cnt + UNROLL - 1) // UNROLL, body, (zero, zero, zero, zero))
        out_ref[0, a] = ((acc0 + acc1) + (acc2 + acc3))[:rows]
        return carry

    jax.lax.fori_loop(0, n_angles, angle_body, 0)


@functools.partial(jax.jit, static_argnames=("rows", "zero_code",
                                             "interpret"))
def accumulate_windows(starts, codes, tiles, rows: int, zero_code: int,
                       interpret: bool = False):
    """(T+1, A) segment bounds + (A, S) codes + (T, R, C) slab tiles ->
    (T, A, rows, 128) f32 accumulated windows."""
    T, slab_rows, slab_cols = tiles.shape
    A = codes.shape[0]
    assert (zero_code >> 12) + rows + 8 <= slab_rows, (
        "zero block does not cover the window depth")
    kernel = functools.partial(_correlation_kernel, rows=rows,
                               zero_code=zero_code, n_angles=A,
                               single_segment=(T == 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, slab_rows, slab_cols),
                               lambda t, starts, codes: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, A, rows, 128),
                               lambda t, starts, codes: (t, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, A, rows, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(starts, codes, tiles)


# ---- kernel v2: same-r lane-paired windows (bf16) ----
#
# Round-5 rework of the accumulation loop, from the round-4 roofline
# diagnosis (3% of VPU peak, per-window cost ~29 ns = ~27 vector µops of
# issue): the v1 pipeline spends most of its issue slots on the f32
# convert, the f32 SUBLANE roll, and a 128-lane add — all per sample, all
# on tiles where at most half the lanes are useful. v2 shares those three
# ops between TWO samples:
#
# Samples are sorted per angle by (tile, row misalignment r = by & 7) and
# each (tile, r) group is padded to EVEN length with zero-block slots, so
# consecutive PAIRS always share r. Per pair, both members' aligned loads
# are lane-rolled in the bitcast-i32 view (the v1 trick) with the second
# window placed at lane 64 (window lane-span ≤ 64), merged with one
# select — then ONE bf16→f32 convert, ONE f32 sublane roll (legal
# aligned shapes; the shared r makes it exact for both), and ONE
# accumulate serve both windows. The candidate lattice of the second half
# is sliced from lanes [64, 64+span) and added to the first half's.
#
# The prelude builds the even-padded order with lax.sort (which carries
# the codes with the key) + one tiny (A, S') take_along_axis — measured
# ~2-8 µs total for (30, 208).
#
# Two DEAD ENDS measured on v5e (scripts/exp_v2.py, 2026-08-21) — do not
# revisit without re-measuring:
# - u8 slab (half the volume, exact integer sums): 59.5 ns/window
#   unpaired vs v1's 25.9 — the u8→i32 widen lowers through (32, 128)-
#   tile relayouts costing ~45 ns/window on their own.
# - r-bucketed segment loops (8 or 2 fori segments per angle hoisting the
#   sublane roll): 44-63 ns/window — small per-segment trip counts
#   collapse the loop's ILP, and Mosaic rejects dynamic sublane rotates
#   on the (R/2, 128) packed view ("unsupported unaligned shape") so the
#   roll cannot be hoisted in the packed domain anyway.

#
# ROUND-5 VERDICT on all of this (6 controlled A/B runs, scripts/exp_v2.py,
# same-chip same-run pairs): v2 ≈ v1 within run-to-run noise (geometric
# mean ratio 1.00; individual runs ±15%). The decisive probe: a kernel
# with a CONSTANT code — zero SMEM reads, zero decode, STATIC load
# addresses, same loads/rolls/convert/add — still measures 22.5 ns/window
# (v1: 22-28 across runs). The per-window floor is therefore the VECTOR
# pipeline itself (~20-25 issue slots for the (R, 256)-tile load + lane
# roll + convert + sublane roll + add), which pairing only partially
# shares; neither scalar-work elimination nor op-sharing moves it. v1
# stays the default (battle-tested, same speed); v2 is selectable with
# ROBORTS_CORR_KERNEL=2 and parity-tested. Closing the remaining gap to
# the analytic ~6 µs speed-of-light needs a different FORMULATION, not a
# better loop body — and the measured candidates (u8, MXU selection
# matmuls, r-bucket segments) are all recorded dead ends above/below.

_V2_ENV = "ROBORTS_CORR_KERNEL"


def kernel_version() -> int:
    import os

    try:
        return int(os.environ.get(_V2_ENV, "1"))
    except ValueError:
        return 1


def _correlation_kernel_v2(starts_ref, codes_ref, slab_ref, out_ref,
                           *, rows: int, zero_code: int, n_angles: int,
                           pack_pairs: bool, single_segment: bool):
    """v2 accumulation (see the design block above): one loop per angle
    over same-r PAIRS of windows; each pair shares the bf16→f32 convert,
    the f32 sublane roll, and the accumulate.

    starts: int32 (T+1, A) — codes[a, starts[t,a]:starts[t+1,a]] is tile
            t's (even-length) segment for angle a.
    codes:  int32 (A, S') = by · 4096 + bx (tile-local; deint-mapped rows
            for deinterleaved slabs), sorted by (tile, r = by & 7) with
            each (tile, r) group padded to even length by ``zero_code``
            slots (they decode into the zero block).
    slab:   bf16 (1, SLAB_ROWS, SLAB_COLS) — this tile's map crop.
    out:    f32 (1, A, rows, 128) — window sums; when pack_pairs, lanes
            [64, 64+span) hold the second half's sums (the caller adds
            the two lattice slices).
    """
    t = pl.program_id(0)
    R = rows + 8

    def lane_rolled(code, extra_lanes: int):
        """Aligned bf16 load + lane roll placing the window at lane
        ``extra_lanes``; returns the (R/2, 128) i32 packed view (sublane
        pairs packed by the 16→32-bit bitcast; lanes unpacked, so the
        lane roll is exact for any shift — the v1 finding). The window
        still sits at sublane offset r = (code >> 12) & 7."""
        by = code >> 12
        bx = code & 4095
        rl = bx & 127
        bx_al = pl.multiple_of(bx - rl, 128)
        r = by & 7
        by_al = pl.multiple_of(by - r, 8)
        tile = slab_ref[0, pl.ds(by_al, R), pl.ds(bx_al, 256)]
        ti = pltpu.bitcast(tile, jnp.int32)              # (R/2, 256)
        ti = pltpu.roll(ti, (256 - rl + extra_lanes) % 256, axis=1)
        return ti[:, :128]

    def to_f32(packed):
        """(R/2, 128) i32 packed bf16 pairs -> (R, 128) f32."""
        return pltpu.bitcast(packed, jnp.bfloat16).astype(jnp.float32)

    def angle_body(a, carry):
        start = starts_ref[t, a]
        end = starts_ref[t + 1, a]
        cnt = end - start

        if single_segment:
            # T == 1: slots beyond ``end`` (group padding, the loop-tail
            # pad) already carry zero_code by construction — skip the
            # per-sample bounds check (v1's single_segment optimization)
            def get(i):
                return codes_ref[a, i]
        else:
            def get(i):
                # slots past the segment end belong to other tiles — zero
                return jnp.where(i < end, codes_ref[a, i], zero_code)

        # 4 independent accumulator chains (8 windows in flight per
        # iteration): the per-window load→roll→convert→roll chain is
        # ~100+ cycles of latency — a 2-chain variant measured
        # latency-bound at 62 ns/window vs v1's 27 (exp_v2, 2026-08-21);
        # deep ILP is what hides it, exactly as in v1.
        zero = jnp.zeros((R, 128), jnp.float32)
        if pack_pairs:
            lo64 = jax.lax.broadcasted_iota(jnp.int32, (R // 2, 128), 1) < 64

            def pair(i):
                """Two same-r windows through ONE convert + sublane roll +
                accumulate (the prelude pads each (tile, r) group to even
                length, so pairs never straddle groups)."""
                c0 = get(i)
                m = jnp.where(lo64, lane_rolled(c0, 0),
                              lane_rolled(get(i + 1), 64))
                r = (c0 >> 12) & 7
                return pltpu.roll(to_f32(m), R - r, axis=0)

            def body(p, accs):
                a0, a1, a2, a3 = accs
                base = start + 16 * p
                return (a0 + (pair(base) + pair(base + 2)),
                        a1 + (pair(base + 4) + pair(base + 6)),
                        a2 + (pair(base + 8) + pair(base + 10)),
                        a3 + (pair(base + 12) + pair(base + 14)))

            accs = jax.lax.fori_loop(
                0, (cnt + 15) // 16, body, (zero, zero, zero, zero))
            a0, a1, a2, a3 = accs
            out_ref[0, a] = ((a0 + a1) + (a2 + a3))[:rows]
            return carry

        def one(i):
            c = get(i)
            r = (c >> 12) & 7
            return pltpu.roll(to_f32(lane_rolled(c, 0)), R - r, axis=0)

        def body(p, accs):
            a0, a1, a2, a3 = accs
            base = start + 4 * p
            return (a0 + one(base), a1 + one(base + 1),
                    a2 + one(base + 2), a3 + one(base + 3))

        accs = jax.lax.fori_loop(
            0, (cnt + 3) // 4, body, (zero, zero, zero, zero))
        a0, a1, a2, a3 = accs
        out_ref[0, a] = ((a0 + a1) + (a2 + a3))[:rows]
        return carry

    jax.lax.fori_loop(0, n_angles, angle_body, 0)


@functools.partial(jax.jit, static_argnames=("rows", "zero_code",
                                             "pack_pairs", "interpret"))
def accumulate_windows_v2(starts, codes, tiles, rows: int, zero_code: int,
                          pack_pairs: bool, interpret: bool = False):
    """(T+1, A) segment bounds + (A, S') group-padded sorted codes +
    (T, R, C) bf16 slab -> (T, A, rows, 128) f32 window sums."""
    T, slab_rows, slab_cols = tiles.shape
    A = codes.shape[0]
    assert (zero_code >> 12) + rows + 16 <= slab_rows, (
        "zero block does not cover the window depth")
    kernel = functools.partial(_correlation_kernel_v2, rows=rows,
                               zero_code=zero_code, n_angles=A,
                               pack_pairs=pack_pairs,
                               single_segment=(T == 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, slab_rows, slab_cols),
                               lambda t, starts, codes: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, A, rows, 128),
                               lambda t, starts, codes: (t, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, A, rows, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(starts, codes, tiles)


def score_candidates_pallas_v2(spec, params, probs, offset, points, mask,
                               n_valid, center_pose_map,
                               interpret: bool | None = None,
                               slab_cache=None):
    """v2 scoring path (see the design block above); identical outputs to
    score_candidates up to bf16 map quantization (same envelope as v1)."""
    from ..correlative import _sample_indices

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    A, N = params.n_angles, params.n_space
    inv_res = spec.inv_res
    st = params.search_space_resolution * inv_res
    st_i = int(round(st))
    assert abs(st - st_i) < 1e-6 and st_i >= 1, (
        f"pallas path requires integer candidate step, got {st}")
    span = st_i * (N - 1) + 1
    deint = st_i >= 3
    rows = _window_rows(N) if deint else _window_rows(span)
    assert rows <= MAX_WINDOW_ROWS and span <= 128, (
        f"window geometry (span={span}, rows={rows}) exceeds the slab pads; "
        "use the XLA path for this tier")
    pack_pairs = span <= 64

    ty, tx, crop = plan_tiles(spec)
    T = ty * tx

    base_angle = center_pose_map[2]
    start_angle = base_angle - params.search_angle_offset
    angles = (start_angle
              + jnp.arange(A, dtype=jnp.float32) * params.search_angle_resolution)

    sidx, svalid, divisor = _sample_indices(n_valid, params.use_point_size,
                                            params.max_samples)
    pts = points[sidx] * inv_res
    c, s = jnp.cos(angles), jnp.sin(angles)
    rx = c[:, None] * pts[None, :, 0] - s[:, None] * pts[None, :, 1]
    ry = s[:, None] * pts[None, :, 0] + c[:, None] * pts[None, :, 1]

    x0 = center_pose_map[0] - (params.search_space_size * inv_res) * 0.5
    y0 = center_pose_map[1] - (params.search_space_size * inv_res) * 0.5

    if slab_cache is not None:
        tiles, oy, ox = slab_cache
        assert tiles.shape[0] == T, (
            f"slab cache built for {tiles.shape[0]} tiles, spec plans {T}")
    else:
        oy = _clamped_origin(center_pose_map[1], ty, crop, spec.height)
        ox = _clamped_origin(center_pose_map[0], tx, crop, spec.width)
        tiles = make_slab_tiles(probs, oy, ox, ty, tx, crop,
                                spec.default_prob)

    by = jnp.floor(ry + y0 + 0.5).astype(jnp.int32) - oy
    bx = jnp.floor(rx + x0 + 0.5).astype(jnp.int32) - ox
    oob = (by < 0) | (by >= ty * crop) | (bx < 0) | (bx >= tx * crop)
    in_cov = (~oob) & svalid[None, :]
    n_default = jnp.sum(oob & svalid[None, :], axis=1).astype(jnp.float32)

    tyi = jnp.clip(by // crop, 0, ty - 1)
    txi = jnp.clip(bx // crop, 0, tx - 1)
    lby = by - tyi * crop
    lbx = bx - txi * crop
    if deint:
        P_h = _deint_plane_height(st_i, N, crop)
        tiles = make_deinterleaved_tiles(tiles, st_i, N, spec.default_prob,
                                         crop)
        lby = (lby % st_i) * P_h + lby // st_i
        zero_code = _deint_total_rows(st_i, N, crop) * 4096
    else:
        zero_code = (crop + ROW_PAD) * 4096

    codes = jnp.where(in_cov, lby * 4096 + lbx, zero_code).astype(jnp.int32)
    # sort by (tile, r): lax.sort carries the codes with the key, then each
    # (tile, r) group is padded to EVEN length so kernel pairs never
    # straddle groups (same-r pairs share the sublane roll). Invalid /
    # out-of-coverage slots sort to the tail (key 8T) and never enter a
    # segment.
    tid = jnp.where(in_cov, tyi * tx + txi, T).astype(jnp.int32)
    G = 8 * T
    key = jnp.where(in_cov, tid * 8 + (lby & 7), G).astype(jnp.int32)
    # even-pad WITHOUT any gather: count each group, then append one pad
    # slot PER GROUP carrying the group's key iff its count is odd (key G
    # otherwise, sorting to the tail) — the stable sort places appended
    # pads at their group's END, so every (tile, r) group comes out even.
    cnts = jnp.sum(key[:, None, :] == jnp.arange(G)[None, :, None],
                   axis=2).astype(jnp.int32)                       # (A, G)
    gids = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None], cnts.shape)
    pad_keys = jnp.where((cnts & 1) == 1, gids, G)
    key_all = jnp.concatenate([key, pad_keys], axis=1)
    codes_all = jnp.concatenate(
        [codes, jnp.full_like(pad_keys, zero_code)], axis=1)
    key_s, codes_p = jax.lax.sort((key_all, codes_all), dimension=1,
                                  num_keys=1)
    pad_cnts = cnts + (cnts & 1)
    pstart = jnp.cumsum(pad_cnts, axis=1) - pad_cnts               # (A, G)
    pend_tot = pstart[:, -1] + pad_cnts[:, -1]                     # (A,)
    # per-tile padded segment bounds, (T+1, A)
    tile_starts = pstart[:, ::8].T                                 # (T, A)
    starts = jnp.concatenate([tile_starts,
                              pend_tot[None, :]], axis=0).astype(jnp.int32)
    # pad so the unrolled pair loop's tail reads stay in bounds
    codes_p = jnp.pad(codes_p, ((0, 0), (0, 32)), constant_values=zero_code)

    acc = accumulate_windows_v2(starts, codes_p, tiles, rows=rows,
                                zero_code=zero_code, pack_pairs=pack_pairs,
                                interpret=interpret)
    acc = jnp.sum(acc, axis=0) if T > 1 else acc[0]
    if deint:
        lattice = acc[:, 0:N, 0:span:st_i]              # (A, N, N) [ky, kx]
        if pack_pairs:
            lattice = lattice + acc[:, 0:N, 64:64 + span:st_i]
    else:
        lattice = acc[:, 0:span:st_i, 0:span:st_i]
        if pack_pairs:
            lattice = lattice + acc[:, 0:span:st_i, 64:64 + span:st_i]
    lattice = lattice + n_default[:, None, None] * spec.default_prob
    scores = jnp.swapaxes(lattice, 1, 2) / divisor       # -> (A, kx, ky)

    space_step = params.search_space_resolution * inv_res
    xs = x0 + jnp.arange(N, dtype=jnp.float32) * space_step
    ys = y0 + jnp.arange(N, dtype=jnp.float32) * space_step
    return scores, angles, xs, ys


def build_slab_cache(spec, probs, offset, pose_world):
    """Precompute the slab tiles once per match: the crop depends only on
    (map, search center), not on tier params, so the 3-tier facade shares
    one tile stack instead of re-cropping ~10 MB per tier. Returns
    (tiles, oy, ox). The static tile plan derives from the
    spec alone (plan_tiles), so every tier agrees on the geometry.
    Inter-tier pose refinement moves the search center by well under the
    coverage margin the spec builders add (≈2 m)."""
    from ..correlative import world_to_map_pose

    ty, tx, crop = plan_tiles(spec)
    center = world_to_map_pose(offset, spec.inv_res, pose_world)
    oy = _clamped_origin(center[1], ty, crop, spec.height)
    ox = _clamped_origin(center[0], tx, crop, spec.width)
    return make_slab_tiles(probs, oy, ox, ty, tx, crop, spec.default_prob), oy, ox


def score_candidates_pallas(spec, params, probs, offset, points, mask,
                            n_valid, center_pose_map,
                            interpret: bool | None = None,
                            slab_cache=None):
    """Drop-in replacement for ops.correlative.score_candidates when the
    candidate step is an integer number of map cells.

    Returns (scores (A, N, N), angles (A,), xs (N,), ys (N,)) with identical
    semantics (up to bf16/u8 map quantization). ``slab_cache`` (from
    build_slab_cache) skips the per-tier map crop. Dispatches to the v2
    (u8, r-bucketed, lane-paired) kernel unless ROBORTS_CORR_KERNEL=1.
    """
    if kernel_version() >= 2:
        return score_candidates_pallas_v2(
            spec, params, probs, offset, points, mask, n_valid,
            center_pose_map, interpret=interpret, slab_cache=slab_cache)
    from ..correlative import _sample_indices

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    A, N = params.n_angles, params.n_space
    inv_res = spec.inv_res
    st = params.search_space_resolution * inv_res
    st_i = int(round(st))
    assert abs(st - st_i) < 1e-6 and st_i >= 1, (
        f"pallas path requires integer candidate step, got {st}")
    span = st_i * (N - 1) + 1
    # large-stride tiers read every st-th row only: use the row-deinterleaved
    # slab so each sample loads N contiguous rows instead of the whole span.
    # st=2 measured WORSE deinterleaved (fine tier 41 -> 89 us on v5e: the
    # pair-interleave transpose in make_deinterleaved_tiles dominates what
    # the 32->24-sublane window saves), so the threshold stays at 3.
    deint = st_i >= 3
    rows = _window_rows(N) if deint else _window_rows(span)
    assert rows <= MAX_WINDOW_ROWS and span <= 128, (
        f"window geometry (span={span}, rows={rows}) exceeds the slab pads; "
        "use the XLA path for this tier")

    ty, tx, crop = plan_tiles(spec)
    T = ty * tx

    base_angle = center_pose_map[2]
    start_angle = base_angle - params.search_angle_offset
    angles = (start_angle
              + jnp.arange(A, dtype=jnp.float32) * params.search_angle_resolution)

    sidx, svalid, divisor = _sample_indices(n_valid, params.use_point_size,
                                            params.max_samples)
    pts = points[sidx] * inv_res
    c, s = jnp.cos(angles), jnp.sin(angles)
    rx = c[:, None] * pts[None, :, 0] - s[:, None] * pts[None, :, 1]
    ry = s[:, None] * pts[None, :, 0] + c[:, None] * pts[None, :, 1]

    x0 = center_pose_map[0] - (params.search_space_size * inv_res) * 0.5
    y0 = center_pose_map[1] - (params.search_space_size * inv_res) * 0.5

    if slab_cache is not None:
        tiles, oy, ox = slab_cache
        assert tiles.shape[0] == T, (
            f"slab cache built for {tiles.shape[0]} tiles, spec plans {T}")
    else:
        oy = _clamped_origin(center_pose_map[1], ty, crop, spec.height)
        ox = _clamped_origin(center_pose_map[0], tx, crop, spec.width)
        tiles = make_slab_tiles(probs, oy, ox, ty, tx, crop,
                                spec.default_prob)

    by = jnp.floor(ry + y0 + 0.5).astype(jnp.int32) - oy
    bx = jnp.floor(rx + x0 + 0.5).astype(jnp.int32) - ox
    # bases outside the tiled coverage are outside the map (plan_tiles
    # contract): they contribute the constant default_prob per candidate,
    # added analytically below instead of read from a slab
    oob = (by < 0) | (by >= ty * crop) | (bx < 0) | (bx >= tx * crop)
    in_cov = (~oob) & svalid[None, :]
    n_default = jnp.sum(oob & svalid[None, :], axis=1).astype(jnp.float32)

    tyi = jnp.clip(by // crop, 0, ty - 1)
    txi = jnp.clip(bx // crop, 0, tx - 1)
    lby = by - tyi * crop
    lbx = bx - txi * crop
    if deint:
        P_h = _deint_plane_height(st_i, N, crop)
        tiles = make_deinterleaved_tiles(tiles, st_i, N, spec.default_prob,
                                         crop)
        lby = (lby % st_i) * P_h + lby // st_i
        zero_code = _deint_total_rows(st_i, N, crop) * 4096
    else:
        zero_code = (crop + ROW_PAD) * 4096

    codes = jnp.where(in_cov, lby * 4096 + lbx, zero_code).astype(jnp.int32)
    if T > 1:
        # bucket samples by tile: per-angle stable sort on tile id builds
        # contiguous per-(tile, angle) segments for the kernel
        tid = jnp.where(in_cov, tyi * tx + txi, T)
        order = jnp.argsort(tid, axis=1, stable=True)
        codes = jnp.take_along_axis(codes, order, axis=1)
        cnts = jnp.sum(tid[None, :, :] == jnp.arange(T)[:, None, None],
                       axis=2)                                     # (T, A)
        starts = jnp.concatenate(
            [jnp.zeros((1, A), jnp.int32),
             jnp.cumsum(cnts, axis=0).astype(jnp.int32)])          # (T+1, A)
    else:
        # valid slots are a prefix (see _sample_indices); masked codes
        # inside it read the zero block and are compensated via n_default
        n_prefix = jnp.sum(svalid.astype(jnp.int32))
        starts = jnp.stack([jnp.zeros((), jnp.int32), n_prefix])[
            :, None] * jnp.ones((1, A), jnp.int32)
    # pad so the unrolled loop's last iteration stays in bounds
    codes = jnp.pad(codes, ((0, 0), (0, 8)), constant_values=zero_code)

    acc = accumulate_windows(starts, codes, tiles, rows=rows,
                             zero_code=zero_code, interpret=interpret)
    acc = jnp.sum(acc, axis=0) if T > 1 else acc[0]
    if deint:
        lattice = acc[:, 0:N, 0:span:st_i]              # (A, N, N) [ky, kx]
    else:
        lattice = acc[:, 0:span:st_i, 0:span:st_i]      # (A, N, N) [ky, kx]
    lattice = lattice + n_default[:, None, None] * spec.default_prob
    scores = jnp.swapaxes(lattice, 1, 2) / divisor       # -> (A, kx, ky)

    space_step = params.search_space_resolution * inv_res
    xs = x0 + jnp.arange(N, dtype=jnp.float32) * space_step
    ys = y0 + jnp.arange(N, dtype=jnp.float32) * space_step
    return scores, angles, xs, ys
