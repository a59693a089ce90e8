"""Jitted denoise loops (model-agnostic).

The reference's hot loop is a Python for-loop over scheduler timesteps
calling the UNet per step (reference: src/pipelines/lora_pipeline.py:485).
Here the whole loop is a `lax.fori_loop` inside one XLA program: the
scheduler is pure arrays, CFG is a batched compute + split, and stage-
dependent behaviour (region fusion on/off) is driven by traced inputs so
stage 1 and stage 2 share a single compilation (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from omg_tpu.diffusion import schedulers

Array = jax.Array

# model_fn(latents, t_scalar, step_index) -> epsilon prediction, same shape.
ModelFn = Callable[[Array, Array, Array], Array]


def denoise_loop(sched: schedulers.Schedule, model_fn: ModelFn,
                 latents: Array) -> Array:
    """Run the full denoise; `model_fn` owns CFG/conditioning internally."""

    state0 = schedulers.init_state(sched, latents.shape)

    def body(i, carry):
        x, st = carry
        t = sched.timesteps[i]
        x_in = schedulers.scale_model_input(sched, x, i)
        eps = model_fn(x_in, t, i)
        x_next, st = schedulers.step(sched, st, eps, i, x)
        return (x_next, st)

    x, _ = jax.lax.fori_loop(0, sched.num_steps, body, (latents, state0))
    return x


def cfg_combine(noise_pred: Array, guidance_scale: Array | float) -> Array:
    """Classifier-free guidance over a [2B, ...] (uncond; cond) batch.

    Matches reference CFG layout: noise_pred.chunk(2) then
    uncond + g * (cond - uncond) (reference: lora_pipeline.py:610-612).
    """
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    return uncond + jnp.asarray(guidance_scale, noise_pred.dtype) * (cond - uncond)
