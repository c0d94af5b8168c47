"""A/B: round-2 take-gather slab crop vs the dynamic-slice rewrite.

Runs the headline bench chain (bench.tpu_scans_per_sec) on the real TPU
twice in one process — once with the current ``make_slab_tiles``
(pad + dynamic_slice + static tile slices) and once with a local copy of
the round-2 take-based builder — to attribute the round-2 throughput
regression (BENCH_r01 3461 scans/s -> r2-review 1853 scans/s) to the
lane-axis gather. Keep for provenance; rerun after any slab change.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B  # noqa: E402

B._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roborts_slam_tpu.ops.pallas import correlation as C  # noqa: E402

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def take_builder(probs, oy, ox, ty, tx, crop, default_prob):
    """Round-2 builder (two jnp.take gathers), kept verbatim for the A/B."""
    H, W = probs.shape
    SR, SC = crop + C.ROW_PAD, crop + C.LANE_PAD
    pb = probs.astype(jnp.bfloat16)
    fill = C._bf16_value(default_prob)
    tiles = []
    oob = lambda idx, n: jnp.where(idx < 0, n, idx)  # noqa: E731
    for i in range(ty):
        iy = oob(oy + i * crop + jnp.arange(SR), H)
        rows = jnp.take(pb, iy, axis=0, mode="fill", fill_value=fill)
        for j in range(tx):
            ix = oob(ox + j * crop + jnp.arange(SC), W)
            tiles.append(jnp.take(rows, ix, axis=1, mode="fill",
                                  fill_value=fill))
    # round-3 slab layouts end in a ZERO_ROWS masked-sample block; append
    # it so the r2 builder stays drop-in for the A/B
    return jnp.pad(jnp.stack(tiles), ((0, 0), (0, C.ZERO_ROWS), (0, 0)))


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    slice_builder = C.make_slab_tiles
    results = {}
    for name, builder in [("slice", slice_builder), ("take", take_builder)]:
        C.make_slab_tiles = builder
        t = time.time()
        v, _ = B.tpu_scans_per_sec(k_points=(8, 32), reps=2)
        results[name] = v
        log(f"{name:6s}: {v:8.1f} scans/s   (wall {time.time() - t:.1f}s)")
    C.make_slab_tiles = slice_builder
    log(f"speedup slice/take = {results['slice'] / results['take']:.2f}x")


if __name__ == "__main__":
    main()
