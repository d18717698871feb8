"""Test harness config: force an 8-device virtual CPU mesh so all sharding /
multi-chip logic is exercised without TPU hardware (SURVEY §4: the reference has
no offline multi-device story; we make it first-class)."""

import os

# Force CPU (the ambient environment routes JAX to the TPU chip via axon,
# whose default matmul precision would break fp32 golden tests). The ambient
# sitecustomize imports jax before this file runs, so the env var alone is not
# enough — update the live config too. Set VR2_TEST_TPU=1 to run on the chip.
if not os.environ.get("VR2_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_executables():
    """Free compiled executables after each test module.

    The full suite compiles many hundreds of XLA CPU executables in one
    process; late in the run the backend compiler has both stalled
    indefinitely and SEGFAULTED inside backend_compile_and_load
    (faulthandler-verified, different tests each time, RAM free) —
    consistent with JIT code-region / vm map exhaustion
    (vm.max_map_count=65530 here). Clearing per module bounds the live
    executable count; cross-module recompiles of the tiny-model graphs
    cost seconds each."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded from the test name (stable crc32 — str hash
    # is salted per process): every test sees the same draws regardless of
    # execution order (a session-scoped rng made several tolerance-based
    # tests order-dependent).
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))
