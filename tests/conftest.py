"""Test config: CPU backend with 8 virtual devices (multi-chip sharding tests).

TPU_ECC_TPU_TESTS=1 keeps the real TPU attached instead — the `-m tpu`
kernel gate (tests/test_tpu_kernels.py, run via tools/ci.sh --tpu)."""

import os

_TPU_MODE = os.environ.get("TPU_ECC_TPU_TESTS") == "1"
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the global env pins axon
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: identical jaxprs compile once across runs.
# READ-mostly under pytest: serializing some large CPU executables for cache
# WRITES segfaults this XLA build, so writes are effectively disabled here
# (dev scripts may still populate the cache; a crashed script is rerunnable,
# a crashed suite is not).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax-tpu" if _TPU_MODE else "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
if _TPU_MODE or os.environ.get("TPU_ECC_CACHE_WRITES") == "1":
    # opt-in cache-population pass: a segfaulted file only loses its own
    # chunk under tools/run_tests.sh, and the next run reads the entries
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.0"
else:
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1000000000"

import random

import pytest

# The axon sitecustomize (this box's TPU tunnel bootstrap) imports jax at
# interpreter start and pins jax.config jax_platforms="axon,cpu" — by the
# time this file runs, the JAX_PLATFORMS env var above is no longer read.
# Re-pin through the live config so the suite actually runs on the 8-device
# virtual CPU mesh (a silent axon fallback remote-compiles every test
# through the tunnel: ~10x slower and co-tenant-flaky).
if not _TPU_MODE:
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return random.Random(1234)
