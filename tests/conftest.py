"""Test harness: run everything on a virtual 8-device CPU mesh.

In this image jax is preloaded (sitecustomize) with the axon TPU platform;
the backend initializes lazily, so switching the platform via jax.config
before any op still works. Tests must never dispatch through the TPU tunnel
(every tiny op would pay an RPC round trip).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
