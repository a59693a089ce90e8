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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Full-suite runs on this VM intermittently SEGFAULT late in the
    process (observed at ~75-97% in three different test modules —
    test_quant twice, test_warmup once), always inside a FRESH XLA:CPU
    compile after ~200 executables have accumulated in-process; every
    crashing module passes standalone. Dropping the jit caches between
    modules bounds the live-executable count. Costs some re-compiles of
    shared tiny programs; stability of the one-command suite wins."""
    yield
    jax.clear_caches()


def resampler_torch_sd(cfg, rng: "np.random.Generator") -> dict:
    """Torch-layout IP-Adapter resampler state dict at ``cfg``'s
    geometry — shared by the convert and CLI-integration tests (lives
    here so it is importable under both `pytest` and `python -m pytest`
    without a tests package)."""
    inner = cfg.dim_head * cfg.heads

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd = {
        "image_proj.latents": r(1, cfg.num_queries, cfg.dim),
        "image_proj.proj_in.weight": r(cfg.dim, cfg.embedding_dim),
        "image_proj.proj_in.bias": r(cfg.dim),
        "image_proj.proj_out.weight": r(cfg.output_dim, cfg.dim),
        "image_proj.proj_out.bias": r(cfg.output_dim),
        "image_proj.norm_out.weight": r(cfg.output_dim),
        "image_proj.norm_out.bias": r(cfg.output_dim),
    }
    for i in range(cfg.depth):
        p = f"image_proj.layers.{i}."
        sd.update({
            p + "0.norm1.weight": r(cfg.dim), p + "0.norm1.bias": r(cfg.dim),
            p + "0.norm2.weight": r(cfg.dim), p + "0.norm2.bias": r(cfg.dim),
            p + "0.to_q.weight": r(inner, cfg.dim),
            p + "0.to_kv.weight": r(2 * inner, cfg.dim),
            p + "0.to_out.weight": r(cfg.dim, inner),
            # torch FeedForward Sequential: 0 LayerNorm, 1 Linear,
            # 2 GELU (no params), 3 Linear
            p + "1.0.weight": r(cfg.dim), p + "1.0.bias": r(cfg.dim),
            p + "1.1.weight": r(cfg.dim * cfg.ff_mult, cfg.dim),
            p + "1.3.weight": r(cfg.dim, cfg.dim * cfg.ff_mult),
        })
    return sd
