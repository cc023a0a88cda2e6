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
import os.path as osp

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# the in-process CPU communicator hard-ABORTS the whole process when a
# collective rendezvous misses its window (default 40 s) — routine for
# the BN-sync-heavy train step time-sliced over 8 virtual devices on
# this single-core box (verified: 3/3 aborts at 40 s, clean pass raised)
if "collective_timeout" not in flags:
    flags += " --xla_cpu_collective_timeout_seconds=3000"
os.environ["XLA_FLAGS"] = flags.strip()
# the persistent-cache AOT loader logs a spurious ERROR per hit about the
# XLA-internal prefer-no-scatter/gather pseudo-features "not supported on
# the host"; silence C++ logging in tests (python exceptions still raise)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# persistent compilation cache: this box has ONE cpu core and the suite
# is compile-bound (~45 min cold); cached reruns cut big compiles ~5x.
# Keyed by HLO hash, so edited code always recompiles.  Delete
# .jax_cache to force a cold run.
jax.config.update(
    "jax_compilation_cache_dir",
    osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
             ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

if jax.default_backend() != "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


def cpu_devices():
    return jax.devices("cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (compile-bound multi-minute e2e "
             "paths); also enabled by GDM_RUN_SLOW=1")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute compile-bound e2e path, skipped unless "
        "--runslow / GDM_RUN_SLOW=1 (fast run keeps a smaller e2e "
        "representative of each path)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or \
            os.environ.get("GDM_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or GDM_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
