"""Device probe for the kernel-v2 building blocks (round 5).

Checks, on the real TPU and in interpret mode:
1. dynamic sublane loads of a uint8 VMEM array at multiple-of-8 (NOT 32)
   row starts — the int8 layout tile is (32, 128), so Mosaic may or may
   not allow sub-tile slicing;
2. lane-exactness of pltpu.roll on the int32 bitcast view of a u8 tile
   (by analogy with the bf16 finding: bitcast packs SUBLANES, lanes stay
   unpacked, so a lane roll of the packed view is exact for any shift);
3. u8 -> i32 widening + accumulate inside the kernel.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 128, 256
ROWS = 24


def kernel(ops_ref, slab_ref, out_ref, *, n_ops):
    def body(i, acc):
        code = ops_ref[i]
        by = code >> 12
        bx_rl = code & 4095
        rl = bx_rl & 127
        bx_al = pl.multiple_of(bx_rl - rl, 128)
        r = by & 7
        by_al = pl.multiple_of(by - r, 8)
        tile = slab_ref[pl.ds(by_al, ROWS), pl.ds(bx_al, 256)]     # u8
        ti = pltpu.bitcast(tile, jnp.int32)                        # (ROWS/4,256)
        ti = pltpu.roll(ti, 256 - rl, axis=1)
        tb = pltpu.bitcast(ti[:, :128], jnp.uint8)                 # (ROWS,128)
        t32 = tb.astype(jnp.int32)
        t32 = pltpu.roll(t32, ROWS - r, axis=0)
        return acc + t32

    acc = jax.lax.fori_loop(0, n_ops, body,
                            jnp.zeros((ROWS, 128), jnp.int32))
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret", "n_ops"))
def run(ops, slab, interpret: bool, n_ops: int):
    return pl.pallas_call(
        functools.partial(kernel, n_ops=n_ops),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((R, C), lambda t, ops: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, 128), lambda t, ops: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        interpret=interpret,
    )(ops, slab)


def reference(ops, slab):
    acc = np.zeros((ROWS, 128), np.int64)
    sp = np.pad(slab, ((0, ROWS), (0, 0)), mode="wrap")  # circular rolls
    for code in ops:
        by = int(code) >> 12
        bx = int(code) & 4095
        # circular semantics of the kernel's roll chain: rows wrap mod R
        # within the loaded tile; lanes wrap mod 256 within the tile
        r = by & 7
        by_al = by - r
        rl = bx & 127
        bx_al = bx - rl
        tile = slab[by_al:by_al + ROWS, bx_al:bx_al + 256].astype(np.int64)
        tile = np.roll(tile, 256 - rl, axis=1)[:, :128]
        tile = np.roll(tile, ROWS - r, axis=0)
        acc += tile
    return acc


def main():
    rng = np.random.default_rng(0)
    slab = rng.integers(0, 256, (R, C), dtype=np.uint8)
    # random ops: by in [0, R-ROWS-8), any r; bx lane-aligned window starts
    n_ops = 16
    bys = rng.integers(0, R - ROWS - 8, n_ops)
    bxs = rng.integers(0, 128, n_ops)          # bx in [0,128): bx_al=0
    ops = (bys << 12 | bxs).astype(np.int32)
    want = reference(ops, slab)

    for interpret in (True, False):
        try:
            got = np.asarray(run(jnp.asarray(ops), jnp.asarray(slab),
                                 interpret, n_ops))
            ok = np.array_equal(got, want)
            print(f"interpret={interpret}: {'OK' if ok else 'MISMATCH'}")
            if not ok:
                bad = np.argwhere(got != want)
                print("  first diffs:", bad[:5],
                      got[tuple(bad[0])], want[tuple(bad[0])])
        except Exception as e:  # noqa: BLE001
            print(f"interpret={interpret}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
