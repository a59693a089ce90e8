"""Test env: run everything on a virtual 8-device CPU mesh.

The reference had no tests (SURVEY.md §4); our strategy is CPU-runnable
tiny-config unit tests plus multi-"chip" sharding tests over a virtual
device mesh. XLA_FLAGS must be set before jax initializes a backend;
the platform choice must ALSO be forced via jax.config because this
image's sitecustomize registers a TPU PJRT plugin that overrides the
JAX_PLATFORMS env var in-process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
