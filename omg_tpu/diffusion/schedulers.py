"""Diffusion noise schedules as pure functions (scan-friendly).

The reference delegates to diffusers KarrasDiffusionSchedulers
(reference: src/pipelines/lora_pipeline.py:33,176; SDXL-base's default is
EulerDiscrete with scaled_linear betas, leading spacing, steps_offset=1;
inference_instantid.py:8 imports DPMSolverMultistepScheduler but never
instantiates it). Here a schedule is a NamedTuple of precomputed arrays +
two pure functions (``scale_model_input``, ``step``), so the 50-step
denoise compiles to a single XLA program with a `lax.scan`/fori loop —
no Python-side scheduler object mutating state between steps.

All schedules share one state layout (previous model output + validity
flag) so Euler/DDIM/DPM++2M are interchangeable inside the same jitted
sampler.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

EULER = 0
DDIM = 1
DPMPP_2M = 2
LCM = 3

_KINDS = {"euler": EULER, "ddim": DDIM, "dpmpp_2m": DPMPP_2M, "lcm": LCM}


class Schedule(NamedTuple):
    kind: int                 # static int (EULER/DDIM/DPMPP_2M)
    timesteps: Array          # [S] int32, descending
    sigmas: Array             # [S+1] fp32 (0-terminated); karras sigma space
    alphas_cumprod: Array     # [T] fp32 training alphas-bar
    init_noise_sigma: Array   # scalar fp32
    num_steps: int            # static


def _sched_flatten(s: "Schedule"):
    children = (s.timesteps, s.sigmas, s.alphas_cumprod, s.init_noise_sigma)
    return children, (s.kind, s.num_steps)


def _sched_unflatten(aux, children):
    kind, num_steps = aux
    return Schedule(kind, children[0], children[1], children[2], children[3],
                    num_steps)


# Override the default NamedTuple flattening: `kind` and `num_steps` drive
# static control flow (fori_loop bounds, branch selection) and must stay
# aux_data, not traced leaves.
jax.tree_util.register_pytree_node(Schedule, _sched_flatten, _sched_unflatten)


class SchedulerState(NamedTuple):
    """Uniform carry for multistep/stochastic methods (unused slots zero)."""
    prev_model_output: Array  # DPM++2M: previous converted x0 prediction
    step_count: Array         # scalar int32
    key: Array                # PRNG key (LCM re-noising); zeros if unused


def betas_scaled_linear(num_train_timesteps: int = 1000,
                        beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> np.ndarray:
    """SDXL's "scaled_linear" beta schedule."""
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                       num_train_timesteps, dtype=np.float64) ** 2


def make_schedule(kind: str, num_steps: int, *,
                  num_train_timesteps: int = 1000,
                  timestep_spacing: str = "leading",
                  steps_offset: int = 1,
                  lcm_origin_steps: int = 50,
                  dtype=jnp.float32) -> Schedule:
    """``dtype``: precision of the schedule constants — fp64 (under
    jax x64) for the torch-parity tests; fp32 in production."""
    betas = betas_scaled_linear(num_train_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas)

    if _KINDS[kind] == LCM:
        # LCM consistency sampling (LCM-LoRA few-step mode): diffusers
        # LCMScheduler.set_timesteps' skipping-step selection from the
        # distillation's origin grid — timesteps[j] counts back from the
        # last origin step by len(origin)//num_steps (torch-parity-tested
        # in tests/test_scheduler_torch_parity.py).
        k = num_train_timesteps // lcm_origin_steps
        origin = np.arange(1, lcm_origin_steps + 1) * k - 1
        skip = len(origin) // num_steps
        if skip < 1:
            raise ValueError(
                f"LCM num_steps {num_steps} exceeds the origin grid "
                f"({lcm_origin_steps} steps)")
        timesteps = origin[::-skip][:num_steps].astype(np.float64)
    elif timestep_spacing == "leading":
        ratio = num_train_timesteps // num_steps
        timesteps = (np.arange(num_steps) * ratio + steps_offset)[::-1].copy()
    elif timestep_spacing == "trailing":
        ratio = num_train_timesteps / num_steps
        timesteps = np.round(
            np.arange(num_train_timesteps, 0, -ratio)).astype(np.int64) - 1
    else:  # linspace
        timesteps = np.linspace(
            0, num_train_timesteps - 1, num_steps)[::-1].round().astype(np.int64)
    timesteps = timesteps.astype(np.float64)

    sigmas_full = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
    sigmas = np.interp(timesteps, np.arange(num_train_timesteps), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]])

    kind_i = _KINDS[kind]
    # Euler AND DPM++2M both live in karras sigma space here
    # (x = x0 + sigma*eps), so both need the expanded initial scale and the
    # 1/sqrt(sigma^2+1) model-input scaling below. DDIM/LCM samples stay
    # unit-variance (alpha-bar space).
    if kind_i in (EULER, DPMPP_2M) and timestep_spacing == "leading":
        init_noise_sigma = (sigmas.max() ** 2 + 1) ** 0.5
    elif kind_i in (EULER, DPMPP_2M):
        init_noise_sigma = sigmas.max()
    else:
        init_noise_sigma = 1.0

    return Schedule(
        kind=kind_i,
        timesteps=jnp.asarray(timesteps.astype(np.int32)),
        sigmas=jnp.asarray(sigmas, dtype),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype),
        init_noise_sigma=jnp.asarray(init_noise_sigma, dtype),
        num_steps=num_steps,
    )


def init_state(sched: Schedule, latents_shape: tuple,
               key: "Array | None" = None) -> SchedulerState:
    if key is None:
        key = jax.random.PRNGKey(0)
    return SchedulerState(
        prev_model_output=jnp.zeros(latents_shape, jnp.float32),
        step_count=jnp.zeros((), jnp.int32),
        key=key,
    )


def scale_model_input(sched: Schedule, latents: Array, i: Array) -> Array:
    """Sigma-space schedules (Euler, DPM++2M) divide by sqrt(sigma^2+1)
    so the UNet always sees a ~unit-variance input; DDIM/LCM samples are
    already unit-variance."""
    if sched.kind in (EULER, DPMPP_2M):
        sigma = sched.sigmas[i].astype(latents.dtype)
        return latents / jnp.sqrt(sigma * sigma + 1.0)
    return latents


def scale_initial_noise(sched: Schedule, noise: Array) -> Array:
    if sched.kind in (EULER, DPMPP_2M):
        return noise * sched.init_noise_sigma.astype(noise.dtype)
    return noise


def _compute_dtype(x: Array):
    """fp32 accumulation for bf16/fp32 samples (production), fp64 when
    the sample is fp64 (the torch-parity tests run under jax x64)."""
    return jnp.promote_types(x.dtype, jnp.float32)


def _euler_step(sched: Schedule, eps: Array, i: Array, x: Array) -> Array:
    # x lives in "expanded" sigma-space: x = x0 + sigma * noise.
    cdt = _compute_dtype(x)
    sigma, sigma_next = sched.sigmas[i], sched.sigmas[i + 1]
    return (x.astype(cdt)
            + eps.astype(cdt) * (sigma_next - sigma).astype(cdt)).astype(x.dtype)


def _ddim_step(sched: Schedule, eps: Array, i: Array, x: Array) -> Array:
    t = sched.timesteps[i]
    a_t = sched.alphas_cumprod[t]
    # num_train_timesteps is alphas_cumprod's length (static), not a
    # hardcoded 1000 — DDIM spacing stays correct for any training grid.
    ratio = sched.alphas_cumprod.shape[0] // sched.num_steps
    prev_t = t - ratio
    a_prev = jnp.where(prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
    cdt = _compute_dtype(x)
    xf, ef = x.astype(cdt), eps.astype(cdt)
    a_t, a_prev = a_t.astype(cdt), a_prev.astype(cdt)
    x0 = (xf - jnp.sqrt(1 - a_t) * ef) / jnp.sqrt(a_t)
    out = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * ef
    return out.astype(x.dtype)


def _dpmpp_2m_step(sched: Schedule, state: SchedulerState, eps: Array,
                   i: Array, x: Array) -> tuple[Array, SchedulerState]:
    """DPM-Solver++(2M) in sigma space (data-prediction multistep).

    lambda = -log(sigma_hat) with sigma_hat = sigma/alpha; here we use the
    karras convention x = x0 + sigma*eps (alpha=1), so lambda = -log(sigma).
    """
    cdt = _compute_dtype(x)
    sigmas = sched.sigmas.astype(cdt)
    sigma, sigma_next = sigmas[i], sigmas[i + 1]
    sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
    xf, ef = x.astype(cdt), eps.astype(cdt)
    x0 = xf - sigma * ef

    def lam(s):
        return -jnp.log(jnp.maximum(s, 1e-10))

    h = lam(sigma_next) - lam(sigma)
    h_last = lam(sigma) - lam(sigma_prev)
    r = h_last / jnp.maximum(h, 1e-10)

    # First step (or final sigma==0): first-order update.
    first = state.step_count == 0
    d = jnp.where(first | (sigma_next == 0.0), x0,
                  (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * state.prev_model_output)
    # Data-prediction form: x_next = (sigma_next/sigma) x - (e^{-h}-1) D
    ratio = sigma_next / jnp.maximum(sigma, 1e-10)
    out = ratio * xf - jnp.expm1(-h) * d
    out = jnp.where(sigma_next == 0.0, x0, out)
    new_state = SchedulerState(prev_model_output=x0,
                               step_count=state.step_count + 1,
                               key=state.key)
    return out.astype(x.dtype), new_state


def _lcm_step(sched: Schedule, state: SchedulerState, eps: Array,
              i: Array, x: Array, *,
              shared_batch_noise: bool = False
              ) -> tuple[Array, SchedulerState]:
    """Latent Consistency Model sampling step (for LCM-LoRA'd SDXL).

    Published LCM boundary-condition sampling: predict x0, blend with the
    consistency scalings (sigma_data=0.5, timestep_scaling=10), then
    re-noise to the next grid point with FRESH noise (not the eps
    prediction). Deterministic given the state key.

    ``shared_batch_noise``: draw ONE noise sample and broadcast it over
    the batch axis. The multiconcept programs set this — their batch
    axis is the two stage-1 latent COPIES of one image, which must stay
    bit-identical (the dedup/trajectory fast paths depend on it); fresh
    per-row draws would silently diverge the copies. Independent-sample
    batches (sdxl.text_to_image) keep per-row draws.
    """
    t = sched.timesteps[i]
    t_next = sched.timesteps[jnp.minimum(i + 1, sched.num_steps - 1)]
    cdt = _compute_dtype(x)
    a_t = sched.alphas_cumprod[t].astype(cdt)
    a_next = sched.alphas_cumprod[t_next].astype(cdt)
    xf, ef = x.astype(cdt), eps.astype(cdt)

    x0 = (xf - jnp.sqrt(1.0 - a_t) * ef) / jnp.sqrt(a_t)
    # scaled_timestep = t * timestep_scaling (x10), per published LCM /
    # diffusers LCMScheduler. c_skip is then ~sigma_data^2/t'^2 — tiny at
    # small t — so the final step returns essentially pure x0.
    scaled = t.astype(cdt) * 10.0
    sigma_data2 = 0.5 ** 2
    c_skip = sigma_data2 / (scaled ** 2 + sigma_data2)
    c_out = scaled / jnp.sqrt(scaled ** 2 + sigma_data2)
    denoised = c_out * x0 + c_skip * xf

    shape = ((1,) + x.shape[1:]) if shared_batch_noise else x.shape
    noise = jnp.broadcast_to(
        jax.random.normal(jax.random.fold_in(state.key, i), shape,
                          cdt), x.shape)
    renoised = jnp.sqrt(a_next) * denoised + jnp.sqrt(1.0 - a_next) * noise
    last = i == sched.num_steps - 1
    out = jnp.where(last, denoised, renoised)
    return out.astype(x.dtype), SchedulerState(
        state.prev_model_output, state.step_count + 1, state.key)


def step(sched: Schedule, state: SchedulerState, eps: Array, i: Array,
         x: Array, *, shared_batch_noise: bool = False
         ) -> tuple[Array, SchedulerState]:
    """One scheduler update. eps is the epsilon (noise) prediction.

    ``shared_batch_noise`` only affects stochastic schedules (LCM): see
    _lcm_step — set when the batch axis is latent COPIES of one image."""
    if sched.kind == LCM:
        return _lcm_step(sched, state, eps, i, x,
                         shared_batch_noise=shared_batch_noise)
    if sched.kind == EULER:
        nxt = _euler_step(sched, eps, i, x)
        return nxt, SchedulerState(state.prev_model_output,
                                   state.step_count + 1, state.key)
    if sched.kind == DDIM:
        nxt = _ddim_step(sched, eps, i, x)
        return nxt, SchedulerState(state.prev_model_output,
                                   state.step_count + 1, state.key)
    if sched.kind == DPMPP_2M:
        return _dpmpp_2m_step(sched, state, eps, i, x)
    raise ValueError(f"unknown schedule kind {sched.kind}")


def add_noise(sched: Schedule, x0: Array, noise: Array, i: Array) -> Array:
    """Forward-noise x0 to step i, in each schedule's sample space."""
    if sched.kind == EULER or sched.kind == DPMPP_2M:
        return x0 + sched.sigmas[i].astype(x0.dtype) * noise
    t = sched.timesteps[i]
    cdt = _compute_dtype(x0)
    a = sched.alphas_cumprod[t].astype(cdt)
    return (jnp.sqrt(a) * x0.astype(cdt)
            + jnp.sqrt(1 - a) * noise.astype(cdt)).astype(x0.dtype)
