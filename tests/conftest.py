"""Test harness: run everything on a virtual 8-device CPU mesh.

In this image jax is preloaded (sitecustomize) with the axon TPU platform;
the backend initializes lazily, so switching the platform via jax.config
before any op still works. Tests must never dispatch through the TPU tunnel
(every tiny op would pay an RPC round trip).
"""

import os

import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Every test not explicitly marked ``e2e`` is ``fast``, so both
    ``pytest -m fast`` (inner loop, < 2 min) and ``pytest -m e2e``
    (simulation-heavy integration runs) partition the suite."""
    for item in items:
        if item.get_closest_marker("e2e") is None:
            item.add_marker(pytest.mark.fast)
