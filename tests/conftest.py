"""Test harness config: force an 8-virtual-device CPU backend.

Tests never need real TPU hardware; multi-device sharding paths are exercised
on a forced 8-device CPU mesh per the driver contract. Must run before any
``import jax`` in test modules, hence set here at conftest import time.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Force EXACTLY 8 virtual devices: a pre-existing flag with a different count
# would silently break every sharding/mesh test's 8-device contract.
flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)
# Bound the torch oracle's threading (2 threads: bounded oversubscription on
# this 1-CPU host; not fully single-threaded).
os.environ.setdefault("OMP_NUM_THREADS", "2")

import jax  # noqa: E402

# A site hook in this image force-updates jax_platforms to "axon,cpu" at jax
# import, overriding the env var — force it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache is OPT-IN for tests: cache (de)serialization
# (zstandard) segfaults deterministically late in a long full-suite process
# on this host (~test 185/186, fresh cache or warm, read or write paths).
# Partial-suite runs are safe and much faster with it:
#   TORCHREGISTER_TEST_CACHE=1 python -m pytest tests/test_blocked.py ...
if os.environ.get("TORCHREGISTER_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# The XLA:CPU backend segfaults when compiling fresh programs late in a long
# single process (reproduced deterministically at ~185 compiled tests, with
# and without the persistent cache, in backend_compile_and_load). Freeing
# compiled executables between test modules keeps the per-process compiler
# state bounded. Costs some recompilation of shared ops; correctness first.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()


def pytest_configure(config):
    # Two suite tiers on this 1-CPU host (full suite is 60-100 min):
    #   smoke tier:  python -m pytest tests/ -q -m "not slow"
    #   full tier:   python -m pytest tests/ -q
    config.addinivalue_line(
        "markers",
        "slow: long integration tests (engine/cascade recovery, reference "
        "parity, respawn) — deselect with -m 'not slow' for the smoke tier",
    )
