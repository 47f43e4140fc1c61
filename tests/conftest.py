"""Test harness config: CPU backend with 8 virtual devices.

Physics/planner unit tests run on CPU (fast compile, deterministic); the
8-device virtual mesh exercises the multi-chip sharding path without TPU
hardware. TPU-only perf tests are marked ``tpu`` and skipped here.

Note: this environment's sitecustomize pins ``jax_platforms`` to the TPU
plugin, so the env-var route (``JAX_PLATFORMS=cpu`` /
``xla_force_host_platform_device_count``) is overridden; we must update the
config after import, before first backend use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("MBD_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the engine's unrolled programs are compile-heavy;
# repeated test runs hit the cache
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running integration test")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip_tpu = pytest.mark.skip(reason="requires TPU")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip_tpu)
