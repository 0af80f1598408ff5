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

# The axon sitecustomize may have already appended its platform; override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Never read the persistent compilation cache in tests: cli.py enables it at
# import (tests import cli), and a cache entry half-written by a concurrent
# TPU bench process SIGSEGVs the suite inside XLA's executable deserializer
# (observed at test_wavefront_many_lights..., jax compilation_cache.py:238).
# CPU test compiles are seconds; determinism beats reuse here.
jax.config.update("jax_enable_compilation_cache", False)
