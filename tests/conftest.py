"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-chip sharding logic is validated without TPUs per SURVEY.md section 4
(the reference has no test suite at all; this is ours).

Note: this environment may pre-register a TPU backend at interpreter startup
(sitecustomize), which ignores JAX_PLATFORMS set afterwards.  The CPU client
is created lazily, so setting XLA_FLAGS here (before any CPU device access)
still yields 8 virtual CPU devices, and `jax_default_device` pins all test
computation to CPU for deterministic float32 numerics.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if jax.default_backend() != "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
