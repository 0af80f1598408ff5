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

    GRT_KEEP_JAX_CACHES=1 disables the clearing — the A/B knob for
    re-testing whether the segfault still reproduces on a newer jax;
    leave it unset in CI.  Round-5 re-test on jax 0.9.0 (2026-08): still
    reproduces — SIGSEGV (exit 139) inside `backend_compile_and_load`
    at ~80% of the suite (~250 cumulatively compiled programs, during
    test_tri_lights), while the same suite with clearing passes 313/313.
    The crash point drifts with the test population (r4: ~98%, in
    test_wavefront) — consistent with cumulative compiler state, not any
    one program; no smaller deterministic repro exists because the
    trigger IS the accumulation.
    """
    yield
    if not os.environ.get("GRT_KEEP_JAX_CACHES"):
        jax.clear_caches()
