"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests need a device mesh but CI has no TPU pod, so we use
XLA's host-platform device simulation (SURVEY §4 "distributed tests").  Must
be set before JAX is first imported.
"""

import os

# Force CPU (the environment pins JAX_PLATFORMS=axon for the real TPU chip;
# setdefault is not enough) and simulate 8 devices for sharding tests.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize may have already appended its platform; override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Never read the persistent compilation cache in tests: cli.py enables it at
# import (tests import cli), and a cache entry half-written by a concurrent
# TPU bench process SIGSEGVs the suite inside XLA's executable deserializer
# (observed at test_wavefront_many_lights..., jax compilation_cache.py:238).
# CPU test compiles are seconds; determinism beats reuse here.
jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop every live compiled executable after each test module.

    With the process-lifetime caches left alone, the full suite accumulates
    ~200 tests' worth of XLA:CPU executables and then SEGFAULTS
    deterministically inside `backend_compile_and_load` while compiling
    test_wavefront.py::test_wavefront_regen_via_config (~98%) — the same
    program compiles fine in isolation or after any small prefix, so the
    crash is cumulative in-process compiler state, not that program.
    Cross-module cache hits are rare (different shapes/configs), so the
    cost is a few extra compiles per module.
    """
    yield
    jax.clear_caches()
