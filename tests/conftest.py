"""Test configuration: CPU backend, float64, 8 virtual devices.

The container's default JAX platform is the experimental single-chip `axon`
TPU tunnel (slow remote compiles, float32-only).  Tests need determinism,
float64 for 1e-10 parity oracles, and a multi-device mesh for sharding tests,
so we pin everything to the host CPU backend with 8 virtual devices.

Note: a sitecustomize on PYTHONPATH imports jax and registers the axon PJRT
plugin before pytest starts, so env vars alone are not enough — we update the
live jax config here, which runs before any backend is initialized.
"""

import os

# Must be set before the first backend initialization (not merely before
# jax import — the axon sitecustomize already imported jax).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled programs after every test module.

    The full suite accumulates hundreds of compiled CPU executables
    and jaxlib's CPU client segfaults (inside
    ``backend_compile_and_load``) after ~250 tests — reproduced at
    DIFFERENT test sites purely by suite position, with 125 GB of RAM
    free, while the round-2 tree's 267 tests ran clean and 2000
    distinct TRIVIAL compiles in one process also run clean.  The
    trigger is cumulative client state from COMPLEX programs
    (scan/eigh/shard_map-heavy), not a simple executable count.
    Clearing per module bounds that state at the cost of cross-module
    cache hits, which correctness never relies on.
    """
    yield
    jax.clear_caches()
