"""One-off experiment: quantify (a) XLA glue cost (full 3-tier match at B=1
vs the kernel-only 224.7 us sum) and (b) batch scaling of the headline chain
(per-scan cost at B=16/32/64). Informs round-3 kernel work; not a shipped
bench."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as B

B._enable_compile_cache()

import jax
import jax.numpy as jnp

from roborts_slam_tpu.bench.timing import k_slope_dynamic
from roborts_slam_tpu.bench.workload import headline_workload
from roborts_slam_tpu.frontend.matchers import scan_match

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


w = headline_workload()
matcher, fine_spec, coarse_spec = w["matcher"], w["fine_spec"], w["coarse_spec"]
fine_probs, coarse_probs = w["fine_probs"], w["coarse_probs"]
offset, coff = w["offset"], w["coff"]
points, mask, n_valid = w["points"], w["mask"], w["n_valid"]
init = w["init_pose"]

log(f"backend={jax.default_backend()}")


def measure_batch(batch):
    inits = jnp.tile(init[None] + jnp.array([[0.01, 0, 0]], jnp.float32),
                     (batch, 1))

    @jax.jit
    def chained(fp, K):
        def one(p):
            out = scan_match(matcher, fine_spec, fp, offset, coarse_spec,
                             coarse_probs, coff, points, mask, n_valid, p)
            return out.pose, out.score

        def body(i, carry):
            poses, acc = carry
            p, s = jax.vmap(one)(poses)
            return (p + 1e-6 * i, acc + s.sum())

        return jax.lax.fori_loop(0, K, body, (inits, jnp.float32(0)))[1]

    f = lambda seed, K: chained(fine_probs + jnp.float32(seed) * 1e-7,
                                jnp.int32(K))
    kp = (64, 256) if batch == 1 else (16, 64)
    sec, _ = k_slope_dynamic(f, k_points=kp, reps=3)
    log(f"B={batch:3d}: {sec * 1e6:9.1f} us/iter  {sec / batch * 1e6:7.1f} "
        f"us/scan  -> {batch / sec:7.0f} scans/s")
    return sec


for b in (1, 16, 32, 64):
    measure_batch(b)
