"""Isolate kernel-v2 regression components (round 5).

Times, on the coarse tier's real shapes:
  v1k   — v1 accumulate_windows alone (bf16 slab)
  v2k   — v2 accumulate_windows_v2 alone (bf16, r-buckets, pairs)
  v2u   — v2 kernel with pack_pairs=False (r-buckets only)
  prel  — the v2 prelude alone (codes + lax.sort + counts)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B

B._enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from roborts_slam_tpu.bench.timing import k_slope_dynamic
from roborts_slam_tpu.ops.pallas import correlation as C

A, S = 30, 208            # coarse tier: angles x sample slots
N, ST = 13, 5
ROWS = C._window_rows(N)  # deint: 16
CROP = C.CROP


def setup():
    rng = np.random.default_rng(0)
    P_h = C._deint_plane_height(ST, N, CROP)
    total = C._deint_total_rows(ST, N, CROP)
    zero_code = total * 4096
    slab_rows = total + C.ZERO_ROWS
    slab_cols = CROP + C.LANE_PAD
    probs = rng.random((slab_rows - C.ZERO_ROWS, slab_cols), np.float32)
    tiles_bf = jnp.pad(jnp.asarray(probs, jnp.bfloat16)[None],
                       ((0, 0), (0, C.ZERO_ROWS), (0, 0)))
    # ~109 valid samples per angle at plausible deint bases
    S_real = 109
    by = rng.integers(0, ST * (P_h - 8), (A, S_real)).astype(np.int32)
    by = (by % ST) * P_h + by // ST
    bx = rng.integers(0, CROP, (A, S_real)).astype(np.int32)
    codes = np.full((A, S), zero_code, np.int32)
    codes[:, :S_real] = by * 4096 + bx
    return tiles_bf, jnp.asarray(codes), zero_code, S_real


def main():
    tiles_bf, codes, zero_code, S_real = setup()
    print("backend:", jax.default_backend(), flush=True)

    starts_v1 = jnp.tile(jnp.array([[0], [S_real]], jnp.int32), (1, A))

    def prelude(codes):
        G = 8
        key = jnp.where(codes == zero_code, G,
                        (codes >> 12) & 7).astype(jnp.int32)
        cnts = jnp.sum(key[:, None, :] == jnp.arange(G)[None, :, None],
                       axis=2).astype(jnp.int32)
        gids = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None],
                                cnts.shape)
        pad_keys = jnp.where((cnts & 1) == 1, gids, G)
        key_all = jnp.concatenate([key, pad_keys], axis=1)
        codes_all = jnp.concatenate(
            [codes, jnp.full_like(pad_keys, zero_code)], axis=1)
        key_s, codes_p = jax.lax.sort((key_all, codes_all), dimension=1,
                                      num_keys=1)
        pad_cnts = cnts + (cnts & 1)
        pend_tot = jnp.sum(pad_cnts, axis=1)
        starts = jnp.concatenate([jnp.zeros((1, A), jnp.int32),
                                  pend_tot[None, :]], axis=0)
        return starts, jnp.pad(codes_p, ((0, 0), (0, 32)),
                               constant_values=zero_code)

    starts_v2, codes_v2 = jax.jit(prelude)(codes)
    codes_v1 = jnp.pad(codes, ((0, 0), (0, 8)), constant_values=zero_code)

    def timeit(name, fn):
        @jax.jit
        def chain(c, K):
            def body(i, carry):
                cc, acc = carry
                out = fn(cc)
                s = out.astype(jnp.float32).sum()
                # data-dependence: never changes values, defeats memoize
                cc = cc + (s > 1e30).astype(jnp.int32)
                return (cc, acc + s)
            return jax.lax.fori_loop(0, K, body, (c, jnp.float32(0)))[1]

        sec, _ = k_slope_dynamic(
            lambda seed, K, c0=fn.__self__ if False else None:
            chain(codes + jnp.int32(0) * seed, jnp.int32(K)),
            k_points=(64, 256), reps=3)
        print(f"{name:5s}: {sec * 1e6:8.1f} us  "
              f"({sec / (A * S_real) * 1e9:5.1f} ns/window)", flush=True)
        return sec

    timeit("v1k", lambda c: C.accumulate_windows(
        starts_v1, jnp.pad(c, ((0, 0), (0, 8)), constant_values=zero_code),
        tiles_bf, rows=ROWS, zero_code=zero_code))
    timeit("v2k", lambda c: C.accumulate_windows_v2(
        starts_v2, codes_v2 + (c.sum() > jnp.int32(2 ** 30)).astype(jnp.int32),
        tiles_bf, rows=ROWS, zero_code=zero_code, pack_pairs=True))
    timeit("v2u", lambda c: C.accumulate_windows_v2(
        starts_v2, codes_v2 + (c.sum() > jnp.int32(2 ** 30)).astype(jnp.int32),
        tiles_bf, rows=ROWS, zero_code=zero_code, pack_pairs=False))
    timeit("prel", lambda c: prelude(c)[0])




def probe_const():
    """Upper-bound probe: v1-shaped kernel with a CONSTANT code (no SMEM
    read, no decode, same loads/rolls/adds at a fixed address). If this is
    not much faster than v1, the per-window floor is the vector pipeline,
    not scalar work, and operand pre-decoding is pointless."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tiles_bf, codes, zero_code, S_real = setup()

    def kernel(starts_ref, codes_ref, slab_ref, out_ref):
        R = ROWS + 8
        code = 5 * 4096 + 37          # static base

        def win(extra):
            by = code >> 12
            bx = code & 4095
            rl = bx & 127
            bx_al = pl.multiple_of(bx - rl, 128)
            r = by & 7
            by_al = pl.multiple_of(by - r, 8)
            tile = slab_ref[0, pl.ds(by_al + extra * 8, R),
                            pl.ds(bx_al, 256)]
            ti = pltpu.bitcast(tile, jnp.int32)
            ti = pltpu.roll(ti, 256 - rl, axis=1)
            tb = pltpu.bitcast(ti[:, :128], jnp.bfloat16)
            t32 = tb.astype(jnp.float32)
            return pltpu.roll(t32, R - r, axis=0)

        def angle_body(a, carry):
            zero = jnp.zeros((R, 128), jnp.float32)

            def body(p, accs):
                a0, a1, a2, a3 = accs
                return (a0 + (win(0) + win(1)), a1 + (win(2) + win(3)),
                        a2 + (win(4) + win(5)), a3 + (win(6) + win(7)))

            accs = jax.lax.fori_loop(0, (S_real + 7) // 8, body,
                                     (zero, zero, zero, zero))
            a0, a1, a2, a3 = accs
            out_ref[0, a] = ((a0 + a1) + (a2 + a3))[:ROWS]
            return carry

        jax.lax.fori_loop(0, A, angle_body, 0)

    @jax.jit
    def run(starts, codes, tiles):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=[pl.BlockSpec(tiles.shape,
                                   lambda t, s, c: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, A, ROWS, 128),
                                   lambda t, s, c: (0, 0, 0, 0)),
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, A, ROWS, 128), jnp.float32),
        )(starts, codes, tiles)

    starts = jnp.zeros((2, A), jnp.int32)

    @jax.jit
    def chain(c, K):
        def body(i, carry):
            cc, acc = carry
            out = run(starts, cc, tiles_bf)
            s = out.sum()
            return (cc + (s > 1e30).astype(jnp.int32), acc + s)
        return jax.lax.fori_loop(0, K, body, (c, jnp.float32(0)))[1]

    sec, _ = k_slope_dynamic(lambda seed, K: chain(codes, jnp.int32(K)),
                             k_points=(64, 256), reps=3)
    print(f"const: {sec * 1e6:8.1f} us  "
          f"({sec / (A * S_real) * 1e9:5.1f} ns/window)", flush=True)


if "--const" in sys.argv:
    probe_const()
    sys.exit(0)


if __name__ == "__main__":
    if "--const" not in sys.argv:
        main()
