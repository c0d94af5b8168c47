"""Pallas TPU kernel: exact ray-carve mark image for count-map updates.

Replaces the XLA scatter path of ``ops.raster.scan_mark_image`` on TPU. The
XLA path scatters P x max_ray_cells candidate slots per scan
(``_ray_cells``); TPU scatters cost ~8-10 ns per STATIC slot whether masked
or live, so a willow-class scan (1152 beams x 204 slots) is a structural
~2 ms — the dominant cost of the whole front-end step
(docs/PERFORMANCE.md). This kernel's cost is proportional to the ACTUAL
ray cells instead: per beam it walks the 8-row bands of the ray's bounding
box and evaluates a closed-form per-cell membership predicate on whole
(8, 128) tiles, read-modify-writing a VMEM-resident mark window.

Semantics are bit-identical to the reference-shaped DDA
(``OccuGridMap::UpdateMapByRange`` free/occupied marks,
occu_grid_map.h:125-188, 499-529, re-derived in ops/raster.py):

    cell(t) = floor(start + delta * t / n + 1/2),  t = 0..n,
    n = max(|dx|, |dy|, 1)

A cell (c, r) lies on the free prefix (t <= n-1) iff the integer interval

    T(c, r) = Tx(c) ∩ Ty(r) ∩ [0, n-1]

is non-empty, where Tx(c) = { t : 2*dx*t ∈ [2n(c - sx) - n, 2n(c - sx) + n - 1] }
(and symmetrically Ty). All bounds are exact int32 arithmetic; divisions go
through f32 with a one-step integer correction (values < 2^24 so f32 holds
them exactly). Endpoint cells are stamped 2 in a second phase, so occupied
beats free across the whole scan without any max-merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIAS = 2048          # endpoint coords are biased by this when packed
PACK = 8192          # code = (iy + BIAS) * PACK + (ix + BIAS); -1 = invalid


def _floor_div(p, m_i, inv_m):
    """Exact floor(p / m_i) for int32 p (|p| < 2^24) and scalar m_i > 0."""
    q = jnp.floor(p.astype(jnp.float32) * inv_m).astype(jnp.int32)
    r = p - q * m_i
    q = q + (r >= m_i).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _ceil_div(p, m_i, inv_m):
    return _floor_div(p + m_i - 1, m_i, inv_m)


def _carve_kernel(info_ref, codes_ref, out_ref, *, window: int, n_beams: int):
    """info = [sx, sy] (sensor cell, window coords); codes (P,) packed
    endpoints (window coords, BIAS-packed), -1 = skip beam entirely."""
    out_ref[:] = jnp.zeros((window, window), jnp.int32)
    sx = info_ref[0]
    sy = info_ref[1]
    ntiles_w = window // 128

    def free_phase(b, carry):
        code = codes_ref[b]

        @pl.when(code >= 0)
        def _():
            iy = code // PACK - BIAS
            ix = code % PACK - BIAS
            dx = ix - sx
            dy = iy - sy
            n = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)), 1)
            two_n = 2 * n
            # free-cell bbox (cells on t in [0, n-1] lie within the
            # start/end bbox), clipped to the window
            ymin = jnp.maximum(jnp.minimum(sy, iy), 0)
            ymax = jnp.minimum(jnp.maximum(sy, iy), window - 1)
            xmin = jnp.maximum(jnp.minimum(sx, ix), 0)
            xmax = jnp.minimum(jnp.maximum(sx, ix), window - 1)

            @pl.when((ymin <= ymax) & (xmin <= xmax))
            def _():
                band0 = (ymin // 8) * 8
                nbands = (ymax - band0) // 8 + 1
                l0 = xmin // 128
                ntiles = jnp.minimum(xmax // 128, ntiles_w - 1) - l0 + 1
                mx = jnp.maximum(2 * jnp.abs(dx), 1)
                my = jnp.maximum(2 * jnp.abs(dy), 1)
                inv_mx = 1.0 / mx.astype(jnp.float32)
                inv_my = 1.0 / my.astype(jnp.float32)

                def band_body(k, _):
                    rb = pl.multiple_of(band0 + 8 * k, 8)
                    rows = rb + jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 0)
                    ay = two_n * (rows - sy) - n
                    by = ay + two_n - 1
                    pv = jnp.where(dy > 0, ay, -by)
                    qv = jnp.where(dy > 0, by, -ay)
                    tyl = _ceil_div(pv, my, inv_my)
                    tyh = _floor_div(qv, my, inv_my)
                    on_row = rows == sy
                    tyl = jnp.where(dy == 0, jnp.where(on_row, 0, 1), tyl)
                    tyh = jnp.where(dy == 0, jnp.where(on_row, n - 1, 0), tyh)

                    def tile_body(l, _):
                        lc = pl.multiple_of((l0 + l) * 128, 128)
                        cols = lc + jax.lax.broadcasted_iota(
                            jnp.int32, (8, 128), 1)
                        axv = two_n * (cols - sx) - n
                        bxv = axv + two_n - 1
                        pxv = jnp.where(dx > 0, axv, -bxv)
                        qxv = jnp.where(dx > 0, bxv, -axv)
                        txl = _ceil_div(pxv, mx, inv_mx)
                        txh = _floor_div(qxv, mx, inv_mx)
                        on_col = cols == sx
                        txl = jnp.where(dx == 0,
                                        jnp.where(on_col, 0, 1), txl)
                        txh = jnp.where(dx == 0,
                                        jnp.where(on_col, n - 1, 0), txh)
                        lo = jnp.maximum(jnp.maximum(txl, tyl), 0)
                        hi = jnp.minimum(jnp.minimum(txh, tyh), n - 1)
                        pred = lo <= hi
                        old = out_ref[pl.ds(rb, 8), pl.ds(lc, 128)]
                        out_ref[pl.ds(rb, 8), pl.ds(lc, 128)] = jnp.where(
                            pred, 1, old)
                        return 0

                    jax.lax.fori_loop(0, ntiles, tile_body, 0,
                                      unroll=False)
                    return 0

                jax.lax.fori_loop(0, nbands, band_body, 0, unroll=False)

        return carry

    jax.lax.fori_loop(0, n_beams, free_phase, 0, unroll=False)

    def end_phase(b, carry):
        code = codes_ref[b]

        @pl.when(code >= 0)
        def _():
            iy = code // PACK - BIAS
            ix = code % PACK - BIAS

            @pl.when((iy >= 0) & (iy < window) & (ix >= 0) & (ix < window))
            def _():
                rb = pl.multiple_of((iy // 8) * 8, 8)
                lc = pl.multiple_of((ix // 128) * 128, 128)
                rows = rb + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                cols = lc + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                pred = (rows == iy) & (cols == ix)
                old = out_ref[pl.ds(rb, 8), pl.ds(lc, 128)]
                out_ref[pl.ds(rb, 8), pl.ds(lc, 128)] = jnp.where(pred, 2, old)

        return carry

    jax.lax.fori_loop(0, n_beams, end_phase, 0, unroll=False)


def _raycheck_kernel(info_ref, codes_ref, occ_ref, out_ref, *, window: int,
                     n_beams: int, thr_d2: int):
    """Count rays that cross an occupied cell farther than sqrt(thr_d2-1)
    cells from their endpoint (MapFeedbackResponsePenalty's bad-ray count,
    occu_grid_map.h:447-471). Same band walk and cell rule as the carve
    kernel, but visiting cells INCLUDING the endpoint (t <= n) and reducing
    ``any(on_ray & occupied & far)`` per beam instead of writing marks."""
    out_ref[0, 0] = jnp.int32(0)
    sx = info_ref[0]
    sy = info_ref[1]

    def beam(b, total):
        code = codes_ref[b]

        def do(total):
            iy = code // PACK - BIAS
            ix = code % PACK - BIAS
            dx = ix - sx
            dy = iy - sy
            n = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)), 1)
            two_n = 2 * n
            ymin = jnp.maximum(jnp.minimum(sy, iy), 0)
            ymax = jnp.minimum(jnp.maximum(sy, iy), window - 1)
            xmin = jnp.maximum(jnp.minimum(sx, ix), 0)
            xmax = jnp.minimum(jnp.maximum(sx, ix), window - 1)
            band0 = (ymin // 8) * 8
            nbands = (ymax - band0) // 8 + 1
            l0 = xmin // 128
            ntiles = xmax // 128 - l0 + 1
            mx = jnp.maximum(2 * jnp.abs(dx), 1)
            my = jnp.maximum(2 * jnp.abs(dy), 1)
            inv_mx = 1.0 / mx.astype(jnp.float32)
            inv_my = 1.0 / my.astype(jnp.float32)

            def band_body(k, bad):
                rb = pl.multiple_of(band0 + 8 * k, 8)
                rows = rb + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                ay = two_n * (rows - sy) - n
                by = ay + two_n - 1
                pv = jnp.where(dy > 0, ay, -by)
                qv = jnp.where(dy > 0, by, -ay)
                tyl = _ceil_div(pv, my, inv_my)
                tyh = _floor_div(qv, my, inv_my)
                on_row = rows == sy
                tyl = jnp.where(dy == 0, jnp.where(on_row, 0, 1), tyl)
                tyh = jnp.where(dy == 0, jnp.where(on_row, n, 0), tyh)

                def tile_body(l, bad):
                    lc = pl.multiple_of((l0 + l) * 128, 128)
                    cols = lc + jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 1)
                    axv = two_n * (cols - sx) - n
                    bxv = axv + two_n - 1
                    pxv = jnp.where(dx > 0, axv, -bxv)
                    qxv = jnp.where(dx > 0, bxv, -axv)
                    txl = _ceil_div(pxv, mx, inv_mx)
                    txh = _floor_div(qxv, mx, inv_mx)
                    on_col = cols == sx
                    txl = jnp.where(dx == 0, jnp.where(on_col, 0, 1), txl)
                    txh = jnp.where(dx == 0, jnp.where(on_col, n, 0), txh)
                    lo = jnp.maximum(jnp.maximum(txl, tyl), 0)
                    hi = jnp.minimum(jnp.minimum(txh, tyh), n)  # incl. endpoint
                    d2 = (cols - ix) * (cols - ix) + (rows - iy) * (rows - iy)
                    occ = occ_ref[pl.ds(rb, 8), pl.ds(lc, 128)]
                    hit = (lo <= hi) & (occ > 0) & (d2 >= thr_d2)
                    return jnp.maximum(bad, jnp.max(hit.astype(jnp.int32)))

                return jax.lax.fori_loop(0, ntiles, tile_body, bad)

            good = (ymin <= ymax) & (xmin <= xmax)
            bad = jax.lax.cond(
                good, lambda: jax.lax.fori_loop(0, nbands, band_body,
                                                jnp.int32(0)),
                lambda: jnp.int32(0))
            return total + bad

        return jax.lax.cond(code >= 0, do, lambda t: t, total)

    total = jax.lax.fori_loop(0, n_beams, beam, jnp.int32(0))
    out_ref[0, 0] = total


@functools.partial(jax.jit, static_argnames=("window", "thr_d2", "interpret"))
def ray_check_window(info, codes, occ, window: int, thr_d2: int,
                     interpret: bool = False):
    """Count bad rays against an occupancy bitmap window. ``occ`` is
    (window, window) int32 (1 = occupied); returns () int32."""
    P = codes.shape[0]
    kernel = functools.partial(_raycheck_kernel, window=window, n_beams=P,
                               thr_d2=thr_d2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec((window, window), lambda g, i, c: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(info, codes, occ)
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def ray_mark_window(info, codes, window: int, interpret: bool = False):
    """(2,) sensor cell + (P,) packed endpoint codes -> (window, window)
    int32 mark image: 0 untouched, 1 free (ray pass-through), 2 occupied
    (beam endpoint). Window coords; occupied wins over free."""
    P = codes.shape[0]
    kernel = functools.partial(_carve_kernel, window=window, n_beams=P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[],
        out_specs=pl.BlockSpec((window, window), lambda g, i, c: (0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((window, window), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(info, codes)


def pack_codes(end_cells, valid):
    """(P, 2) int32 endpoint cells (window coords) + (P,) bool -> (P,) codes."""
    ex = jnp.clip(end_cells[:, 0], -BIAS, PACK - 1 - BIAS)
    ey = jnp.clip(end_cells[:, 1], -BIAS, PACK - 1 - BIAS)
    code = (ey + BIAS) * PACK + (ex + BIAS)
    return jnp.where(valid, code, -1).astype(jnp.int32)
