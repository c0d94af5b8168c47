"""The headline bench's AOT executable sidecar (bench._aot_cached) is the
driver-deadline safety mechanism: a miss must compile and write the
sidecar, a hit must load WITHOUT compiling, and the source key must track
package content exactly (it is computed with zero device interaction
because even jit.lower() can stall through the relay)."""

import os

import numpy as np
import pytest


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import bench

    # sandbox: fake package tree + sidecar dir under tmp_path
    pkg = tmp_path / "roborts_slam_tpu"
    pkg.mkdir()
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "sub").mkdir()
    (pkg / "sub" / "b.py").write_text("y = 2\n")
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return bench, pkg


def test_source_key_tracks_package_content(bench_mod, monkeypatch):
    bench, pkg = bench_mod
    # the reference yaml is part of the key; point reads at a stable stub
    real_open = open
    k1 = bench._aot_source_key("beams=1081")
    k2 = bench._aot_source_key("beams=1081")
    assert k1 == k2, "key must be deterministic"
    assert k1 != bench._aot_source_key("beams=270"), "extra must feed the key"
    (pkg / "a.py").write_text("x = 999\n")
    assert bench._aot_source_key("beams=1081") != k1, \
        "package edits must invalidate the key"


def test_aot_cached_miss_then_hit(bench_mod):
    bench, _pkg = bench_mod
    import jax
    import jax.numpy as jnp

    calls = {"n": 0}

    @jax.jit
    def f(x, k):
        calls["n"] += 1          # trace counter: hits must not re-trace
        return (x * 2.0).sum() + k

    args = (jnp.arange(8.0, dtype=jnp.float32), jnp.int32(3))
    msgs = []
    c1 = bench._aot_cached(f, args, log=msgs.append, key_extra="t")
    assert any("miss" in m for m in msgs), msgs
    aot_dir = os.path.join(bench.REPO, "bench_aot")
    files = os.listdir(aot_dir)
    assert len(files) == 1 and files[0].endswith(".jaxexec")
    v1 = float(np.asarray(c1(*args)))

    msgs.clear()
    traced_before = calls["n"]
    c2 = bench._aot_cached(f, args, log=msgs.append, key_extra="t")
    assert any("hit" in m for m in msgs), msgs
    # On the virtual 8-device CPU test platform the deserialized
    # executable may fail its execution probe (topology mismatch) — the
    # REQUIRED behavior is then an explicit fallback to recompilation,
    # never a crash. On a clean hit, no re-lowering happens.
    if any("compile skipped" in m for m in msgs):
        assert calls["n"] == traced_before, "a sidecar hit must not re-lower"
    else:
        assert any("recompiling" in m for m in msgs), msgs
    v2 = float(np.asarray(c2(*args)))
    assert v1 == v2 == float((np.arange(8.0) * 2.0).sum() + 3)

    # a different key_extra is a different program family: fresh miss,
    # and the stale sidecar for the old key is dropped (one live key)
    msgs.clear()
    bench._aot_cached(f, args, log=msgs.append, key_extra="other")
    assert any("miss" in m for m in msgs)
    assert len(os.listdir(aot_dir)) == 1
