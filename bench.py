"""Headline benchmark: correlative scan-match throughput (scans/sec/chip).

Mirrors the reference front end's per-scan hot path — the 3-tier
(coarse/fine/super-fine) correlative search with the simulation parameters
(config/simulatin_param.yaml:51-70) on a 2048x2048 fine map (0.01 m), willow
lidar beam count — against the measured single-core CPU baseline
(native/baseline_correlative.cpp, same tiers/map/scan; the reference
publishes no numbers, BASELINE.md).

Measurement notes: timed with the two-point K-scaling slope protocol
(roborts_slam_tpu/bench/timing.py) — K matches chained in ONE jitted
program (a lax.fori_loop whose carried pose feeds the next match, exactly
the online SLAM dependency chain), result fetched to host, inputs
perturbed per rep, slope of t(K2)-t(K1). This is the only protocol that
survives the tunnel's dispatch pipelining and relay-side memoization (see
timing.py for the validation).

The chain is SEQUENTIAL (batch=1): each match consumes the previous
match's pose, mirroring the reference's online front end, which is the
same serial dependency the baseline's CPU loop executes. Round-3
measurement: the vmapped batch variant (B=16/32/64) costs ~315 us/scan
against 210 us/scan sequential — the per-scan slab crop (dynamic_slice
with per-scan starts) lowers poorly under vmap — so batching is NOT used
for the headline; BENCH_BATCH>1 re-enables it for the back-end fan-out
experiment.

Driver-budget hardening (round 3): the K bound is a TRACED fori_loop
argument, so the whole bench compiles exactly ONE program (a cold tunnel
compile costs minutes; round 2 paid it per K point and timed out,
BENCH_r02.json rc=124). A watchdog-thread hard deadline (BENCH_HARD_S,
default 500 s — a thread, because the guarded failure is a compile hung
inside a blocking C++ call where SIGALRM handlers cannot run) emits a
degraded-but-honest lower bound from whatever K points completed, or the
last-known-good record for THIS metric from BENCH_LOCAL.json marked
stale, instead of overrunning. Progress timestamps go to stderr; stdout
stays one JSON line.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
NATIVE_SRC = os.path.join(REPO, "native", "baseline_correlative.cpp")
NATIVE_BIN = os.path.join(REPO, "native", "baseline_correlative")

def _enable_compile_cache():
    """Persistent compile cache: the TPU tunnel's compiles are slow and
    erratic. Must go through jax.config because jax may already be imported
    (sitecustomize preloads it)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def cpu_baseline_scans_per_sec(beams: int = 1081, iters: int = 20,
                               map_file: str | None = None,
                               scan_file: str | None = None) -> float:
    if not os.path.exists(NATIVE_BIN) or (
            os.path.getmtime(NATIVE_BIN) < os.path.getmtime(NATIVE_SRC)):
        subprocess.run(["g++", "-O2", "-std=c++17", "-o", NATIVE_BIN,
                        NATIVE_SRC], check=True)
    assert (map_file is None) == (scan_file is None), (
        "map_file and scan_file must be passed together")
    cmd = [NATIVE_BIN, str(beams), str(iters)]
    if map_file and scan_file:
        cmd += [map_file, scan_file]

    def once() -> float:
        out = subprocess.run(cmd, check=True, capture_output=True,
                             text=True).stdout
        for line in out.splitlines():
            if line.startswith("cpu_scans_per_sec"):
                return float(line.split()[1])
        raise RuntimeError(f"unexpected baseline output: {out!r}")

    # best of 3: the 2-core host is noisy; the fastest run is the fairest
    # single-core number (and the conservative one for our speedup ratio)
    return max(once() for _ in range(3))


def scene_content(name: str, n_stamp: int = 50, seed: int = 0):
    """REAL workload content from a reference benchmark scene (VERDICT r1
    weak #7 — the default pseudo-random map is the worst case for
    score-gated paths but not a real SLAM map): simulate the scene
    (io/simulate.py), stamp ``n_stamp`` scans at their GT poses into
    blurred fine/coarse match maps (exactly what the engine's match maps
    hold, ops/raster.py stamp_scan_batch), and take the next scan as the
    query. Returns everything both the TPU side and the file-fed CPU
    baseline need to score identical content."""
    import jax.numpy as jnp

    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.io.scenes import SCENES, load_scene_map
    from roborts_slam_tpu.io.simulate import simulate_log
    from roborts_slam_tpu.models.grid_map import ProbMapSpec, make_prob_map
    from roborts_slam_tpu.models.scan import scan_from_ranges
    from roborts_slam_tpu.ops.raster import stamp_scan_batch

    cfg = load_config("/root/reference/config/simulatin_param.yaml")
    sc = SCENES[name]
    log = simulate_log(load_scene_map(sc), sc.laser, odom_error=sc.odom_error,
                       range_noise=0.005, seed=seed)
    H = W = 2048
    fine_spec = ProbMapSpec(resolution=0.01, height=H, width=W,
                            deviation=cfg.fine_map_deviation,
                            blur_offset=cfg.gaussian_blur_offset)
    coarse_spec = ProbMapSpec(resolution=0.08, height=256, width=256,
                              deviation=cfg.coarse_map_deviation,
                              blur_offset=cfg.gaussian_blur_offset)

    # stamp scans spaced along the trajectory, centred on the query pose
    stride = max(1, (len(log.ranges) // 2) // n_stamp)
    ids = list(range(0, stride * n_stamp, stride))
    qid = ids[-1] + stride // 2
    query_pose = log.gt_poses[qid].astype(np.float32)

    P = cfg.max_points
    pts = np.zeros((n_stamp, P, 2), np.float32)
    msk = np.zeros((n_stamp, P), bool)
    for k, i in enumerate(ids):
        s = scan_from_ranges(log.ranges[i], sc.laser, log.gt_poses[i], 0.0, P)
        pts[k], msk[k] = np.asarray(s.points), np.asarray(s.mask)
    poses = log.gt_poses[ids].astype(np.float32)

    def build(spec):
        size = np.array([spec.width, spec.height]) * spec.resolution
        off = 0.5 * size - query_pose[:2]
        m = make_prob_map(spec, off.astype(np.float32))
        return stamp_scan_batch(spec, m, jnp.asarray(pts), jnp.asarray(msk),
                                jnp.asarray(poses),
                                jnp.ones(n_stamp, bool), use_blur=True)

    fine, coarse = build(fine_spec), build(coarse_spec)
    q = scan_from_ranges(log.ranges[qid], sc.laser, query_pose, 0.0, P)
    return {
        "fine_spec": fine_spec, "coarse_spec": coarse_spec,
        "fine": fine, "coarse": coarse,
        "points": q.points, "mask": q.mask,
        "n_valid": int(np.asarray(q.mask).sum()),
        "init_pose": query_pose, "cfg": cfg,
    }


def write_scene_files(content, out_dir: str) -> tuple[str, str]:
    """Dump the scene fine map + query scan in the CPU baseline's raw
    format (native/baseline_correlative.cpp real-content mode)."""
    import jax

    fine = content["fine"]
    spec = content["fine_spec"]
    probs = np.asarray(jax.device_get(fine.probs), np.float32)
    map_file = os.path.join(out_dir, "scene_map.f32")
    probs.tofile(map_file)
    pose = content["init_pose"]
    off = np.asarray(jax.device_get(fine.offset))
    c, s = np.cos(pose[2]), np.sin(pose[2])
    pts = np.asarray(content["points"])[np.asarray(content["mask"])]
    world = np.stack([c * pts[:, 0] - s * pts[:, 1],
                      s * pts[:, 0] + c * pts[:, 1]], -1)
    cxy = (pose[:2] + off) / spec.resolution
    buf = np.concatenate([cxy.astype(np.float32),
                          world.astype(np.float32).reshape(-1)])
    scan_file = os.path.join(out_dir, "scene_scan.f32")
    buf.tofile(scan_file)
    return map_file, scan_file


def tpu_scans_per_sec(beams: int = 1081, batch: int = 1,
                      k_points=(64, 256), reps: int = 5,
                      content: dict | None = None,
                      deadline: float | None = None, log=None,
                      partial_out: dict | None = None):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from roborts_slam_tpu.config import load_config
    from roborts_slam_tpu.frontend.matchers import MatcherParams, scan_match
    from roborts_slam_tpu.models.grid_map import ProbMapSpec

    if content is not None:
        cfg = content["cfg"]
        matcher = MatcherParams.from_config(cfg, use_center_penalty=True)
        fine_spec, coarse_spec = content["fine_spec"], content["coarse_spec"]
        fine_probs = content["fine"].probs
        coarse_probs = content["coarse"].probs
        offset, coff = content["fine"].offset, content["coarse"].offset
        points, mask = content["points"], content["mask"]
        n_valid = jnp.int32(content["n_valid"])
        p0 = content["init_pose"]
        inits = jnp.tile(jnp.asarray(p0, jnp.float32)[None]
                         + jnp.array([[0.01, 0.0, 0.0]], jnp.float32),
                         (batch, 1))
    else:
        # the ONE shared workload fixture (also what kernel_bench and the
        # smoke perf pin measure; map content matches the CPU baseline)
        from roborts_slam_tpu.bench.workload import headline_workload

        w = headline_workload(beams)
        cfg, matcher = w["cfg"], w["matcher"]
        fine_spec, coarse_spec = w["fine_spec"], w["coarse_spec"]
        fine_probs, coarse_probs = w["fine_probs"], w["coarse_probs"]
        offset, coff = w["offset"], w["coff"]
        points, mask, n_valid = w["points"], w["mask"], w["n_valid"]
        inits = jnp.tile(w["init_pose"][None], (batch, 1))

    from roborts_slam_tpu.bench.timing import k_slope_dynamic

    @jax.jit
    def chained(fp, seed, K):
        # the seed perturbation lives INSIDE the one compiled program (a
        # traced scalar): a host-side 16.8 MB re-upload per rep (~0.45 s
        # through the tunnel) swamped the K slope, and an eager add
        # compiled a fresh relay program per run (the round-4 133 s warm
        # stall). A 4-byte traced operand defeats relay memoization at
        # zero cost.
        fp = fp + seed * jnp.float32(1e-7)

        def one(init):
            out = scan_match(matcher, fine_spec, fp, offset,
                             coarse_spec, coarse_probs, coff,
                             points, mask, n_valid, init)
            return out.pose, out.score

        def body(i, carry):
            # feed the matched pose into the next match (the online SLAM
            # dependency chain); epsilon keeps the loop body live
            poses, acc = carry
            if batch == 1:
                p, s = one(poses[0])
                p, s = p[None], s[None]
            else:
                p, s = jax.vmap(one)(poses)
            return (p + 1e-6 * i, acc + s.sum())

        # K is a TRACED bound: one executable serves every K point (a cold
        # tunnel compile costs minutes — the round-2 bench paid it per
        # program and timed out, BENCH_r02 rc=124)
        out = jax.lax.fori_loop(0, K, body, (inits, jnp.float32(0)))
        return out[1]

    # AOT executable sidecar (VERDICT r3 item 1): the relay's compile time
    # for the SAME program swings 60 s .. 8+ min with its load, and the
    # driver gives bench.py a 500 s deadline. The compiled executable is
    # serialized to bench_aot/ keyed by a hash of the lowered StableHLO
    # (consts + shapes included), so a driver run deserializes in
    # milliseconds and never waits on the relay compiler. Any failure
    # falls back to the normal jit path.
    if log:
        log("workload + program built")
    call = chained
    if content is None and not os.environ.get("BENCH_NO_AOT"):
        try:
            call = _aot_cached(chained,
                               (fine_probs, jnp.float32(1), jnp.int32(1)),
                               log,
                               key_extra=f"beams={beams},batch={batch}") \
                or chained
        except Exception as e:  # noqa: BLE001
            if log:
                log(f"AOT sidecar path failed ({e!r:.120}); using jit")
            call = chained

    def f(seed, K):
        return call(fine_probs, jnp.float32(seed), jnp.int32(K))

    per_iter, detail = k_slope_dynamic(f, k_points=k_points, reps=reps,
                                       deadline=deadline, log=log,
                                       partial_out=partial_out)
    return batch / per_iter, detail


def _aot_source_key(extra: str) -> str:
    """Content key for the headline executable WITHOUT lowering: on the
    axon backend even ``jit.lower()`` makes remote calls that can stall
    for minutes, so the key hashes everything the traced program is a
    function of — the package sources, the reference config, the jax
    version and device kind. Conservative (any source edit invalidates),
    which only costs one slow re-compile + sidecar refresh."""
    import hashlib

    import jax

    h = hashlib.sha256()
    # bench.py itself defines the traced program (chained) — hash it too,
    # or an edit to the bench workload would load a stale executable under
    # an unchanged package key
    with open(os.path.abspath(__file__), "rb") as fh:
        h.update(fh.read())
    pkg = os.path.join(REPO, "roborts_slam_tpu")
    for root, _dirs, files in sorted(os.walk(pkg)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    with open("/root/reference/config/simulatin_param.yaml", "rb") as fh:
        h.update(fh.read())
    h.update((jax.__version__ + jax.devices()[0].device_kind
              + extra).encode())
    return h.hexdigest()[:16]


def _aot_cached(jitted, example_args, log=None, key_extra=""):
    """Deserialize the bench executable from the committed sidecar if the
    source key matches; otherwise compile once and (re)write the sidecar.
    Returns a callable or None.

    The sidecar holds ONLY the raw serialized-executable bytes. The
    in/out treedefs `deserialize_and_load` needs are reconstructed locally
    (tree_structure of the example args + eval_shape of the jitted fn —
    pure tracing, no compile, no device contact), so nothing from the
    checked-in file is ever unpickled (ADVICE r4: a pickle.load of a
    repo-committed blob is an arbitrary-code-execution vector on a
    tampered checkout)."""
    import jax

    key = _aot_source_key(key_extra)
    if log:
        log("source key computed")
    aot_dir = os.path.join(REPO, "bench_aot")
    blob_path = os.path.join(aot_dir, f"headline-{key}.jaxexec")
    from jax.experimental.serialize_executable import (
        deserialize_and_load, serialize,
    )

    if os.path.exists(blob_path):
        if log:
            log(f"AOT sidecar hit ({key}): loading executable")
        try:
            with open(blob_path, "rb") as fh:
                blob = fh.read()
            in_tree = jax.tree.structure((tuple(example_args), {}))
            out_tree = jax.tree.structure(
                jax.eval_shape(jitted, *example_args))
            loaded = deserialize_and_load(blob, in_tree, out_tree)
            # probe ONE execution (doubles as warm-up): a sidecar built
            # under a different runtime/topology can load fine and still
            # fail at execute time — that must fall back to compiling,
            # not crash the bench mid-measurement
            import jax as _jax

            _jax.block_until_ready(loaded(*example_args))
        except Exception as e:  # noqa: BLE001
            if log:
                log(f"sidecar unusable ({e!r:.120}); recompiling")
        else:
            if log:
                log("AOT executable loaded: compile skipped")
            return loaded
    if log:
        log(f"AOT sidecar miss ({key}): compiling + writing sidecar")
    compiled = jitted.lower(*example_args).compile()
    try:
        os.makedirs(aot_dir, exist_ok=True)
        blob, _in_tree, _out_tree = serialize(compiled)
        # drop stale sidecars: one live key keeps the repo small
        for old in os.listdir(aot_dir):
            if old.startswith("headline-") and key not in old:
                os.remove(os.path.join(aot_dir, old))
        with open(blob_path, "wb") as fh:
            fh.write(bytes(blob))
    except Exception as e:  # noqa: BLE001 — sidecar write is best-effort
        if log:
            log(f"sidecar write skipped: {e!r:.120}")
    return compiled


def main():
    import argparse
    import sys

    t0 = time.monotonic()

    def log(msg):
        print(f"[bench {time.monotonic() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None, choices=("icra", "rm", "willow"),
                    help="score REAL scene-map content (built by SLAM-style "
                         "stamping from the named reference benchmark scene) "
                         "instead of the default pseudo-random map; both the "
                         "TPU side and the CPU baseline read the identical "
                         "content")
    args = ap.parse_args()

    beams = 1081
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    metric = (f"correlative_scan_match_throughput_{args.scene}"
              if args.scene else "correlative_scan_match_throughput")

    local_path = os.path.join(REPO, "BENCH_LOCAL.json")

    def load_local() -> dict:
        try:
            with open(local_path) as fh:
                d = json.load(fh)
            if "metric" in d:          # legacy flat record
                d = {d["metric"]: d}
            return d
        except (OSError, ValueError):
            return {}

    def _roofline_fields(per_match_s: float) -> dict:
        """Analytic %-of-peak for the measured per-match time (VERDICT r3
        item 4): VPU adds + HBM slab traffic from the kernel's own planning
        helpers vs the chip's public peaks. Zero extra dispatches (deadline
        safe); scripts/roofline.py holds the microbenchmarked version."""
        from roborts_slam_tpu.bench.roofline import (
            roofline_summary, scan_match_cost,
        )
        from roborts_slam_tpu.config import load_config
        from roborts_slam_tpu.frontend.matchers import MatcherParams
        from roborts_slam_tpu.models.grid_map import ProbMapSpec

        cfg = load_config("/root/reference/config/simulatin_param.yaml")
        fine_spec = ProbMapSpec(resolution=0.01, height=2048, width=2048,
                                deviation=cfg.fine_map_deviation,
                                blur_offset=cfg.gaussian_blur_offset)
        cost = scan_match_cost(
            MatcherParams.from_config(cfg, use_center_penalty=True),
            fine_spec)
        s = roofline_summary(cost, per_match_s)
        return {"match_us": round(s["match_us"], 1),
                "hbm_frac_of_peak": round(s["hbm_frac"], 3),
                "achieved_gbps": round(s["achieved_gbps"], 1),
                "vpu_gadds_per_s": round(s["achieved_gadds"], 1)}

    def emit(tpu, cpu, degraded=False, detail=None):
        rec = {"metric": metric, "value": round(tpu, 2),
               "unit": "scans/sec/chip", "vs_baseline": round(tpu / cpu, 2)}
        if detail and detail.get("rep_times"):
            # per-rep raw times at each K point + relative spread: a ~10%
            # tunnel swing is visible as spread, not mistakable for a
            # regression (VERDICT r4 #6)
            rec["rep_times_s"] = {
                str(k): [round(t, 4) for t in v]
                for k, v in detail["rep_times"].items()}
            sp = [(max(v) - min(v)) / max(min(v), 1e-9)
                  for v in detail["rep_times"].values() if v]
            rec["rep_spread"] = round(max(sp), 3) if sp else None
        if degraded:
            rec["degraded"] = True
        if not degraded and not os.environ.get("BENCH_PLATFORM"):
            try:
                rec["roofline"] = _roofline_fields(batch / tpu)
            except Exception as e:  # noqa: BLE001 — accounting is best-effort
                log(f"roofline accounting skipped: {e!r}")
            # last-known-good for the stale fallback. Only real-platform runs
            # qualify: a BENCH_PLATFORM=cpu smoke run measures the HOST and
            # must never masquerade as the chip's last-known-good.
            try:
                d = load_local()
                d[metric] = dict(rec,
                                 measured_at=time.strftime("%Y-%m-%d %H:%M"))
                with open(local_path, "w") as fh:
                    json.dump(d, fh, indent=1)
            except OSError:
                pass
        print(json.dumps(rec), flush=True)

    # CPU baseline first: pure-host, ~10 s, and the SIGALRM fallback needs it
    if args.scene:
        content = scene_content(args.scene)
        map_file, scan_file = write_scene_files(content, "/tmp")
        cpu = cpu_baseline_scans_per_sec(beams=beams, map_file=map_file,
                                         scan_file=scan_file)
    else:
        content = None
        cpu = cpu_baseline_scans_per_sec(beams=beams)
    log(f"cpu baseline {cpu:.1f} scans/s")

    # hard stop: emit a degraded-but-honest number from whatever K points
    # completed instead of overrunning the driver's budget (BENCH_r02 was
    # rc=124 with nothing captured). A watchdog THREAD, not SIGALRM: the
    # failure being guarded is a relay compile hung inside a blocking C++
    # call on the main thread, where a signal handler could never run.
    import threading

    partial = {}
    hard_s = float(os.environ.get("BENCH_HARD_S", "500"))
    # K span sized so the device-time delta (~448 x 0.2 ms sequential)
    # dwarfs the tunnel's per-execution fixed cost (~25-50 ms, which
    # VARIES between runs: a 64,256 span once read 136 us/match from a
    # drifting K=64 point — the wider span with the spread check below
    # caught it)
    k_points = tuple(int(x) for x in
                     os.environ.get("BENCH_K", "64,512").split(","))

    def on_deadline():
        if partial:
            k = max(partial)
            # includes the dispatch floor -> a LOWER bound on throughput
            tpu = batch * k / partial[k]
            log(f"hard deadline: degraded estimate from K={k}")
            emit(tpu, cpu, degraded=True)
            sys.stdout.flush()
            os._exit(0)
        # relay compile never finished (observed 4->8+ min variance for the
        # SAME cached program): fall back to the last successful local
        # measurement OF THIS METRIC, clearly marked stale, instead of an
        # empty scoreboard
        rec = load_local().get(metric)
        if rec:
            rec["stale"] = True
            rec["note"] = "relay compile exceeded deadline; last-known-good"
            log(f"hard deadline in compile: emitting stale result from "
                f"{rec.get('measured_at')}")
            print(json.dumps(rec), flush=True)
            sys.stdout.flush()
            os._exit(0)
        log("hard deadline hit before any measurement; aborting")
        os._exit(3)

    watchdog = threading.Timer(hard_s, on_deadline)
    watchdog.daemon = True
    watchdog.start()

    deadline = t0 + float(os.environ.get("BENCH_BUDGET_S", "300"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    tpu, detail = tpu_scans_per_sec(
        beams=beams, content=content, k_points=k_points, reps=reps,
        deadline=deadline, log=log, partial_out=partial)
    sp = [(max(v) - min(v)) / max(min(v), 1e-9)
          for v in detail.get("rep_times", {}).values() if v]
    if sp and max(sp) > 0.2 and time.monotonic() < deadline:
        # noisy window (relay/host interference drifts the reps): one
        # retry — the K-slope is only trustworthy when reps are tight
        log(f"rep spread {max(sp):.2f} > 0.2: retrying once")
        tpu, detail = tpu_scans_per_sec(
            beams=beams, content=content, k_points=k_points, reps=reps,
            deadline=deadline, log=log, partial_out=partial)
    watchdog.cancel()
    emit(tpu, cpu, detail=detail)


if __name__ == "__main__":
    main()
